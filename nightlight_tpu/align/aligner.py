"""Triangle-based star alignment.

Rebuild of the reference's Aligner (reference: internal/star/align.go) with
TPU-friendly batch math instead of KD-trees and Nelder-Mead:

* pick the K brightest mutually-distant stars (align.go:86-104)
* generate the canonical triangle per star triple with dAB < dAC < dBC
  (align.go:108-130) -- vectorized over all C(K,3) combinations
* the WHOLE candidate search runs as ONE device program per frame
  (_align_device): nearest reference triangle per frame triangle in
  side-length space (replaces the pointerless KD-trees kdtree3p.go),
  top-K candidate selection, closed-form affine from each star triple,
  projection of all stars, nearest-neighbor match against reference stars
  within 8px (replaces kdtree2.go), the >= 1/3 matched validity rule
  (align.go:193-212), and a CLOSED-FORM least-squares refine of the 6
  affine parameters on the matched correspondences -- the reference
  minimizes the same objective with Nelder-Mead (align.go:214-244); for an
  affine model with fixed pairs the optimum is two independent normal-
  equation solves (decoupled 2x2 after centering), so this is exact where
  Nelder-Mead is approximate. The best candidate by residual
  sqrt(sum distSq)/starsMatched (align.go:233) is returned.

All distance math uses the exact difference form, never |a|^2+|b|^2-2ab
matmuls: TPU matmuls default to reduced precision and coordinates in the
thousands would swamp the pixel-scale differences that decide a match.
Least-squares sums are computed about the masked centroid (the translation
decouples and the 2x2 system is well-conditioned in f32).

Array sizes are padded to buckets so the program compiles once per session,
not once per frame.
"""

from __future__ import annotations

import itertools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from nightlight_tpu.align import transform as tf
from nightlight_tpu.detect.stars import StarList

# Minimum star separation as a fraction of image height (align.go:55).
MIN_DISTANCE_FRACTION = 1.0 / 20.0
# Squared pixel distance below which a projected star matches a reference
# star (align.go:164). The reference's early-abort residual (align.go:165)
# has no analog here: the device program evaluates all k candidates in one
# launch, which is cheaper than a data-dependent exit.
DIST_SQ_LIMIT = 8.0 * 8.0


def pick_brightest_distant(xs: np.ndarray, ys: np.ndarray, min_length: float, k: int) -> np.ndarray:
    """Greedy selection of up to k stars, in brightness order, skipping stars
    closer than min_length to an already-picked star (align.go:86-104).

    Vectorized equivalent of the reference's O(n*k) scalar loop: each round
    picks the brightest remaining star (inputs are mass-descending) and
    masks out everything within min_length of it.
    """
    n = len(xs)
    avail = np.ones(n, bool)
    picked: list[int] = []
    ml2 = float(min_length) * float(min_length)
    xs64 = xs.astype(np.float64)
    ys64 = ys.astype(np.float64)
    while len(picked) < k:
        idxs = np.nonzero(avail)[0]
        if len(idxs) == 0:
            break
        s = int(idxs[0])
        picked.append(s)
        d2 = (xs64 - xs64[s]) ** 2 + (ys64 - ys64[s]) ** 2
        avail &= d2 >= ml2
    return np.array(picked, np.int32)


def generate_triangles(xs: np.ndarray, ys: np.ndarray, indices: np.ndarray,
                       scale_factor: float = 1.0):
    """All canonical triangles (dAB < dAC < dBC) over the given star indices
    (align.go:108-130). Returns (sides (T,3) float32, vertices (T,3) int32).
    """
    if len(indices) < 3:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    pts = np.stack([xs[indices] * scale_factor, ys[indices] * scale_factor], axis=-1)
    combos = np.array(list(itertools.combinations(range(len(indices)), 3)), np.int32)
    i, j, k = combos[:, 0], combos[:, 1], combos[:, 2]

    def dist(a, b):
        d = pts[a] - pts[b]
        return np.sqrt((d * d).sum(-1)).astype(np.float32)

    dij, dik, djk = dist(i, j), dist(i, k), dist(j, k)
    # For each unordered triple choose vertices (A,B,C) with
    # d(A,B) < d(A,C) < d(B,C): A joins the two shortest sides, B is the other
    # endpoint of the shortest side, C of the middle side. Degenerate triples
    # with tied side lengths are dropped, matching the strict inequalities.
    sides = np.stack([dij, dik, djk], axis=-1)  # (T,3): ij, ik, jk
    order = np.argsort(sides, axis=-1)
    s_sorted = np.take_along_axis(sides, order, axis=-1)
    valid = (s_sorted[:, 0] < s_sorted[:, 1]) & (s_sorted[:, 1] < s_sorted[:, 2])

    # endpoints of each side: side 0 = (i,j), 1 = (i,k), 2 = (j,k)
    ends = np.stack([np.stack([i, j], -1), np.stack([i, k], -1), np.stack([j, k], -1)], axis=1)  # (T,3,2)
    shortest = np.take_along_axis(ends, order[:, 0:1, None], axis=1)[:, 0]  # (T,2)
    middle = np.take_along_axis(ends, order[:, 1:2, None], axis=1)[:, 0]

    # A = common vertex of shortest and middle
    a_is_first = (shortest[:, 0:1] == middle).any(axis=1)
    A = np.where(a_is_first, shortest[:, 0], shortest[:, 1])
    B = np.where(a_is_first, shortest[:, 1], shortest[:, 0])
    C = np.where(middle[:, 0] == A, middle[:, 1], middle[:, 0])

    tris = np.stack([indices[A], indices[B], indices[C]], axis=-1)[valid]
    side_len = s_sorted[valid]
    return side_len.astype(np.float32), tris.astype(np.int32)


def _bucket(n: int, b: int) -> int:
    return max(b, ((n + b - 1) // b) * b)


# Squared-distance chunk size for the triangle NN (bounds the materialized
# (chunk, R) block to a few tens of MB).
_TRI_CHUNK = 2048


def _from_three_points_device(cp, cr):
    """Affine transform mapping the 3 frame points cp (3,2) onto the 3
    reference points cr (3,2): the device analog of transform.py's
    from_three_points (coord.go:118-137), solved as a centered 3x3 cofactor
    system for f32 robustness. Returns a 6-vector; NaN/Inf on degenerate
    (collinear) triples, which invalidates the candidate downstream."""
    c0 = jnp.mean(cp, axis=0)
    r0 = jnp.mean(cr, axis=0)
    P = cp - c0  # (3,2), centered
    Q = cr - r0
    # Solve M @ s = rhs for both target coordinates, M rows = [Px_i, Py_i, 1].
    x1, y1 = P[0, 0], P[0, 1]
    x2, y2 = P[1, 0], P[1, 1]
    x3, y3 = P[2, 0], P[2, 1]
    det = (x1 * (y2 - y3) - y1 * (x2 - x3) + (x2 * y3 - x3 * y2))
    # Adjugate rows applied to rhs (Cramer).
    c11 = y2 - y3
    c12 = y3 - y1
    c13 = y1 - y2
    c21 = x3 - x2
    c22 = x1 - x3
    c23 = x2 - x1
    c31 = x2 * y3 - x3 * y2
    c32 = x3 * y1 - x1 * y3
    c33 = x1 * y2 - x2 * y1

    def solve(rhs):
        a = (c11 * rhs[0] + c12 * rhs[1] + c13 * rhs[2]) / det
        b = (c21 * rhs[0] + c22 * rhs[1] + c23 * rhs[2]) / det
        t = (c31 * rhs[0] + c32 * rhs[1] + c33 * rhs[2]) / det
        return a, b, t

    a, b, t1 = solve(Q[:, 0])
    d, e, t2 = solve(Q[:, 1])
    c = t1 + r0[0] - a * c0[0] - b * c0[1]
    f = t2 + r0[1] - d * c0[0] - e * c0[1]
    return jnp.stack([a, b, c, d, e, f])


@partial(jax.jit, static_argnames=("k",))
def _align_device(tri_sides, tri_pts, ref_sides, ref_tri_pts, pts, ref_pts,
                  n_stars, n_ref, k: int):
    """The full candidate search for one frame in one device program.

    tri_sides (T,3) / tri_pts (T,3,2): frame triangles (padded with 1e30
    sides); ref_sides (R,3) / ref_tri_pts (R,3,2): reference triangles
    (padded likewise); pts (S,2) frame stars, ref_pts (S2,2) reference stars
    (both padded with 1e30 coordinates so padded entries never match);
    n_stars/n_ref: true counts. Returns (trans (6,), residual, matched).
    """
    T = tri_sides.shape[0]

    # Phase 1: nearest reference triangle per frame triangle, chunked so the
    # (chunk, R) distance block stays small (kdtree3p.go replacement).
    def chunk_nn(chunk):
        d2 = jnp.sum((chunk[:, None, :] - ref_sides[None, :, :]) ** 2, axis=-1)
        return jnp.argmin(d2, axis=1), jnp.min(d2, axis=1)

    n_chunks = T // _TRI_CHUNK
    nn_idx, nn_d2 = jax.lax.map(chunk_nn, tri_sides.reshape(n_chunks, _TRI_CHUNK, 3))
    nn_idx = nn_idx.reshape(T)
    nn_d2 = nn_d2.reshape(T)

    # Phase 2: the k closest triangle matches become candidates
    # (closestTriangleMatches, align.go:132-161).
    _, order = jax.lax.top_k(-nn_d2, k)
    cand_pts = tri_pts[order]               # (k, 3, 2)
    cand_ref = ref_tri_pts[nn_idx[order]]   # (k, 3, 2)

    min_distinct = jnp.minimum(4, n_ref)

    # Phases 3-6 per candidate, sequential lax.map to bound the (S, S2)
    # distance block at one candidate's worth.
    def eval_cand(args):
        cp, cr = args
        t0 = _from_three_points_device(cp, cr)
        px = t0[0] * pts[:, 0] + t0[1] * pts[:, 1] + t0[2]
        py = t0[3] * pts[:, 0] + t0[4] * pts[:, 1] + t0[5]
        d2 = ((px[:, None] - ref_pts[None, :, 0]) ** 2
              + (py[:, None] - ref_pts[None, :, 1]) ** 2)  # (S, S2)
        # mask padding by the true counts, not by the 1e30 sentinel
        # surviving arithmetic: under an exactly-identity candidate a padded
        # frame star projects to exactly 1e30 and "matches" a padded
        # reference star at d2=0, and its 1e30 coordinates overflow the LSQ
        # sums to NaN, invalidating a perfect candidate
        real_ref = jnp.arange(ref_pts.shape[0]) < n_ref
        d2 = jnp.where(real_ref[None, :], d2, jnp.inf)
        ridx = jnp.argmin(d2, axis=1)
        rmin = jnp.min(d2, axis=1)
        real_star = jnp.arange(pts.shape[0]).astype(jnp.float32) < n_stars
        m = (rmin < DIST_SQ_LIMIT) & real_star
        cnt = jnp.sum(m)
        cntf = jnp.maximum(cnt, 1).astype(jnp.float32)

        # Distinct matched reference stars: a 6-parameter affine fits <= 3
        # correspondences exactly, so degenerate candidates on sparse fields
        # would otherwise win with zero residual (beyond-reference guard).
        sentinel = jnp.int32(1 << 30)
        s = jnp.sort(jnp.where(m, ridx, sentinel))
        distinct = (jnp.sum((s[1:] != s[:-1]) & (s[1:] < sentinel))
                    + (s[0] < sentinel).astype(jnp.int32))

        # Closed-form LSQ refine about the masked centroid: translation
        # decouples, leaving a well-conditioned 2x2 system per output row.
        mf = m.astype(jnp.float32)
        q = ref_pts[ridx]  # (S,2)
        mpx = jnp.sum(mf * pts[:, 0]) / cntf
        mpy = jnp.sum(mf * pts[:, 1]) / cntf
        mqx = jnp.sum(mf * q[:, 0]) / cntf
        mqy = jnp.sum(mf * q[:, 1]) / cntf
        Px = jnp.where(m, pts[:, 0] - mpx, 0.0)
        Py = jnp.where(m, pts[:, 1] - mpy, 0.0)
        Qx = jnp.where(m, q[:, 0] - mqx, 0.0)
        Qy = jnp.where(m, q[:, 1] - mqy, 0.0)
        sxx = jnp.sum(Px * Px)
        sxy = jnp.sum(Px * Py)
        syy = jnp.sum(Py * Py)
        det = sxx * syy - sxy * sxy
        det_ok = jnp.abs(det) > 1e-6
        det_safe = jnp.where(det_ok, det, 1.0)

        def row(bx, by):
            return ((syy * bx - sxy * by) / det_safe,
                    (sxx * by - sxy * bx) / det_safe)

        a, b = row(jnp.sum(Px * Qx), jnp.sum(Py * Qx))
        d_, e = row(jnp.sum(Px * Qy), jnp.sum(Py * Qy))
        c = mqx - a * mpx - b * mpy
        f = mqy - d_ * mpx - e * mpy
        refined = jnp.stack([a, b, c, d_, e, f])

        rx = a * pts[:, 0] + b * pts[:, 1] + c - q[:, 0]
        ry = d_ * pts[:, 0] + e * pts[:, 1] + f - q[:, 1]
        # select, not multiply-by-mask: padded rows square to inf and
        # 0 * inf would poison the sum with NaN
        rr = jnp.where(m, rx * rx + ry * ry, 0.0)
        residual = jnp.sqrt(jnp.sum(rr)) / cntf

        valid = ((cnt.astype(jnp.float32) >= n_stars / 3.0)
                 & (distinct >= min_distinct)
                 & det_ok
                 & jnp.all(jnp.isfinite(t0)))
        return refined, jnp.where(valid, residual, jnp.inf), cnt

    # Vmapped candidate groups, lax.map over groups: the strictly sequential
    # per-candidate map serialized k tiny steps; grouping cuts the
    # sequential depth to k/g while the (g, S, S2) distance block stays
    # under ~32 MB (measured 8.8 -> 6.4 ms/frame device time at k=50,
    # S=256 buckets on v5e-1).
    S, S2 = pts.shape[0], ref_pts.shape[0]
    g = max(1, min(k, (32 << 20) // max(4 * S * S2, 1)))
    pad_k = (-k) % g
    if pad_k:
        # zero-filled padding candidates are degenerate triangles: their
        # affine is non-finite, `valid` is False, residual inf -- and the
        # [:k] slices below drop them regardless
        cand_pts = jnp.concatenate(
            [cand_pts, jnp.zeros((pad_k, 3, 2), cand_pts.dtype)])
        cand_ref = jnp.concatenate(
            [cand_ref, jnp.zeros((pad_k, 3, 2), cand_ref.dtype)])
    trans_g, res_g, cnt_g = jax.lax.map(
        lambda a: jax.vmap(lambda cp, cr: eval_cand((cp, cr)))(*a),
        (cand_pts.reshape(-1, g, 3, 2), cand_ref.reshape(-1, g, 3, 2)))
    trans_all = trans_g.reshape(-1, 6)[:k]
    res_all = res_g.reshape(-1)[:k]
    cnt_all = cnt_g.reshape(-1)[:k]
    best = jnp.argmin(res_all)
    return trans_all[best], res_all[best], cnt_all[best]


def _pad_rows(arr: np.ndarray, n: int, fill: float) -> np.ndarray:
    if arr.shape[0] >= n:
        return arr[:n]
    pad = np.full((n - arr.shape[0],) + arr.shape[1:], fill, arr.dtype)
    return np.concatenate([arr, pad])


class Aligner:
    """Star aligner against a fixed reference frame (align.go:28-71).

    Reference-side arrays are prepared (and uploaded) once; each align()
    call is host triangle generation (cheap numpy) plus ONE device dispatch.
    """

    def __init__(self, naxisn, ref_stars: StarList, k: int):
        self.naxisn = list(naxisn)
        self.ref_stars = ref_stars
        self.k = int(k)
        self.ref_pts = np.stack([ref_stars.x, ref_stars.y], axis=-1).astype(np.float32)

        min_length = float(naxisn[1]) * MIN_DISTANCE_FRACTION
        idx = pick_brightest_distant(ref_stars.x, ref_stars.y, min_length, self.k)
        self.ref_tri_sides, self.ref_tris = generate_triangles(ref_stars.x, ref_stars.y, idx, 1.0)

        # Padded device-resident reference arrays (uploaded once per run).
        r_bucket = _bucket(len(self.ref_tri_sides), _TRI_CHUNK)
        s2_bucket = _bucket(len(self.ref_pts), 256)
        ref_tri_pts = (self.ref_pts[self.ref_tris]
                       if len(self.ref_tris) else np.zeros((0, 3, 2), np.float32))
        # Padding sentinel must differ from the FRAME triangle padding
        # (+1e30): equal sentinels would make padded-vs-padded distances
        # zero and crowd real triangles out of the top-k candidates.
        self._ref_sides_dev = jnp.asarray(_pad_rows(self.ref_tri_sides, r_bucket, -1.0e30))
        self._ref_tri_pts_dev = jnp.asarray(_pad_rows(ref_tri_pts, r_bucket, 0.0))
        self._ref_pts_dev = jnp.asarray(_pad_rows(self.ref_pts, s2_bucket, 1.0e30))

    def align_deferred(self, naxisn, stars: StarList, id: int = 0):
        """Dispatch the alignment search; returns (trans, residual, matched)
        as pending device values (pipeline.deferred.Deferred), or None when
        no triangles exist. Nothing is fetched here."""
        if len(stars) == 0 or len(self.ref_tris) == 0:
            return None

        min_length = float(self.naxisn[1]) * MIN_DISTANCE_FRACTION
        idx = pick_brightest_distant(stars.x, stars.y, min_length, self.k)
        scale = float(self.naxisn[0]) / float(naxisn[0])
        tri_sides, tris = generate_triangles(stars.x, stars.y, idx, scale)
        if len(tris) == 0:
            return None

        pts = np.stack([stars.x, stars.y], axis=-1).astype(np.float32)
        n_stars = len(stars)
        tri_pts = pts[tris]  # (T, 3, 2) -- NOTE: unscaled coordinates, like
        # the host matching in the reference (align.go:193: original stars)

        t_bucket = _bucket(len(tri_sides), _TRI_CHUNK)
        s_bucket = _bucket(n_stars, 256)
        trans, residual, matched = _align_device(
            jnp.asarray(_pad_rows(tri_sides, t_bucket, 1.0e30)),
            jnp.asarray(_pad_rows(tri_pts, t_bucket, 0.0)),
            self._ref_sides_dev, self._ref_tri_pts_dev,
            jnp.asarray(_pad_rows(pts, s_bucket, 1.0e30)),
            self._ref_pts_dev,
            jnp.float32(n_stars), jnp.int32(len(self.ref_pts)), self.k)

        from nightlight_tpu.deferred import defer

        return defer(trans, conv=np.asarray), defer(residual), defer(matched, conv=int)

    def align(self, naxisn, stars: StarList, id: int = 0):
        """Align a frame's stars to the reference (align.go:74-83).

        Returns (transform 6-vector, residual). Residual is +inf when no
        candidate produced a valid match.
        """
        out = self.align_deferred(naxisn, stars, id)
        if out is None:
            return tf.identity(), float("inf")
        trans, residual, _ = out
        res = float(residual)
        if not np.isfinite(res):
            return tf.identity(), float("inf")
        return np.asarray(trans.value, np.float32), res
