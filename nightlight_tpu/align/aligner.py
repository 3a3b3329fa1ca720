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

    The distance test runs in float32 difference form, like the reference
    (coord.go:85-88 computes Dist2DSquared on float32) and like the device
    pick in _pick_device — so the batch-align and per-frame paths agree on
    boundary pairs (residual sub-ULP divergence from XLA FMA contraction is
    covered by the gradient-aware test bands, CLAUDE.md).
    """
    n = len(xs)
    avail = np.ones(n, bool)
    picked: list[int] = []
    ml2 = np.float32(min_length) * np.float32(min_length)
    xs32 = xs.astype(np.float32)
    ys32 = ys.astype(np.float32)
    while len(picked) < k:
        idxs = np.nonzero(avail)[0]
        if len(idxs) == 0:
            break
        s = int(idxs[0])
        picked.append(s)
        d2 = (xs32 - xs32[s]) ** 2 + (ys32 - ys32[s]) ** 2
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


def _search_one(tri_sides, tri_pts, ref_sides, ref_tri_pts, pts, ref_pts,
                n_stars, n_ref, k: int):
    """The full candidate search for one frame (traced body; see
    _align_device for the jitted per-frame entry and _align_batch_device
    for the whole-batch entry).

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


_align_device = partial(jax.jit, static_argnames=("k",))(_search_one)


def _pick_device(xs, ys, count, ml2, k: int):
    """Device analog of pick_brightest_distant: greedy selection of up to k
    stars in brightness (= input) order, masking everything within
    sqrt(ml2) of each pick (align.go:86-104). xs/ys (K,) with entries past
    `count` ignored. Returns (k,) int32 indices, -1 past exhaustion."""
    K = xs.shape[0]
    idxs = jnp.arange(K, dtype=jnp.int32)
    avail0 = idxs < count

    def body(i, st):
        avail, picked = st
        any_av = jnp.any(avail)
        # arrays are mass-descending, so the first available index is the
        # brightest remaining star (argmax returns the first True)
        s = jnp.argmax(avail).astype(jnp.int32)
        d2 = (xs - xs[s]) ** 2 + (ys - ys[s]) ** 2
        keep = avail & (d2 >= ml2) & (idxs != s)
        picked = picked.at[i].set(jnp.where(any_av, s, jnp.int32(-1)))
        avail = jnp.where(any_av, keep, avail)
        return avail, picked

    _, picked = jax.lax.fori_loop(
        0, k, body, (avail0, jnp.full((k,), -1, jnp.int32)))
    return picked


def _tris_device(xs, ys, picked, combos, scale):
    """Device analog of generate_triangles: canonical triangles (sides
    sorted ascending, vertices ordered so dAB < dAC < dBC) over the picked
    star indices (align.go:108-130). combos (T,3) is the static index table
    over the k pick slots. Invalid slots (picked -1, degenerate/tied sides)
    get 1e30 sentinel sides in place instead of being compacted, which the
    search excludes the same way it excludes padding rows. Sides are scaled
    by `scale`; vertex coordinates stay UNSCALED like the host matching
    (align.go:193)."""
    pk_ok = picked >= 0
    sel = jnp.where(pk_ok, picked, 0)
    px = jnp.where(pk_ok, xs[sel], 0.0)
    py = jnp.where(pk_ok, ys[sel], 0.0)
    sx, sy = px * scale, py * scale
    i, j, k3 = combos[:, 0], combos[:, 1], combos[:, 2]

    def dist(a, b):
        dx = sx[a] - sx[b]
        dy = sy[a] - sy[b]
        return jnp.sqrt(dx * dx + dy * dy)

    sides = jnp.stack([dist(i, j), dist(i, k3), dist(j, k3)], axis=-1)  # (T,3)
    order = jnp.argsort(sides, axis=-1)  # stable, like the strict-tie drop needs
    s_sorted = jnp.take_along_axis(sides, order, axis=-1)
    tri_ok = (pk_ok[i] & pk_ok[j] & pk_ok[k3]
              & (s_sorted[:, 0] < s_sorted[:, 1])
              & (s_sorted[:, 1] < s_sorted[:, 2]))

    # endpoints of each side: side 0 = (i,j), 1 = (i,k), 2 = (j,k)
    ends = jnp.stack([jnp.stack([i, j], -1), jnp.stack([i, k3], -1),
                      jnp.stack([j, k3], -1)], axis=1)  # (T,3,2)
    T = combos.shape[0]
    shortest = jnp.take_along_axis(
        ends, jnp.broadcast_to(order[:, 0:1, None], (T, 1, 2)), axis=1)[:, 0]
    middle = jnp.take_along_axis(
        ends, jnp.broadcast_to(order[:, 1:2, None], (T, 1, 2)), axis=1)[:, 0]
    a_first = (shortest[:, 0:1] == middle).any(axis=1)
    A = jnp.where(a_first, shortest[:, 0], shortest[:, 1])
    B = jnp.where(a_first, shortest[:, 1], shortest[:, 0])
    C = jnp.where(middle[:, 0] == A, middle[:, 1], middle[:, 0])

    tri_pts = jnp.stack(
        [jnp.stack([px[A], py[A]], -1), jnp.stack([px[B], py[B]], -1),
         jnp.stack([px[C], py[C]], -1)], axis=1)  # (T,3,2)
    tri_sides = jnp.where(tri_ok[:, None], s_sorted, 1.0e30)
    tri_pts = jnp.where(tri_ok[:, None, None], tri_pts, 0.0)
    return tri_sides, tri_pts


@partial(jax.jit, static_argnames=("k",))
def _align_batch_device(stars_xy, counts, scales, ref_sides, ref_tri_pts,
                        ref_pts, n_ref, combos, ml2, k: int):
    """The align phase for a WHOLE batch of frames in one device program:
    per frame (lax.map, so temporaries stay one frame's worth) run the
    greedy star pick, triangle generation, and the full candidate search.

    stars_xy (m,2,K): per-frame star coordinates (entries past counts[f]
    ignored); counts (m,) int32; scales (m,) per-frame side scale factors;
    combos (C(k,3),3) static triple-index table. Returns
    (trans (m,6), residual (m,), matched (m,)). Replaces m per-frame
    dispatches each fed by ~3/4 MB of host-generated triangle uploads --
    the per-frame H2D fixed cost dominated the match+align phase on
    many-small-frame configs (BASELINE.md round-3: 500x1MP)."""
    T = combos.shape[0]
    Tb = _bucket(T, _TRI_CHUNK)
    K = stars_xy.shape[2]
    idxs = jnp.arange(K)

    def one(args):
        xy, cnt, scale = args
        xs, ys = xy[0], xy[1]
        picked = _pick_device(xs, ys, cnt, ml2, k)
        tri_sides, tri_pts = _tris_device(xs, ys, picked, combos, scale)
        if Tb > T:
            tri_sides = jnp.concatenate(
                [tri_sides, jnp.full((Tb - T, 3), 1.0e30, tri_sides.dtype)])
            tri_pts = jnp.concatenate(
                [tri_pts, jnp.zeros((Tb - T, 3, 2), tri_pts.dtype)])
        valid = idxs < cnt
        pts = jnp.stack([jnp.where(valid, xs, 1.0e30),
                         jnp.where(valid, ys, 1.0e30)], axis=-1)
        return _search_one(tri_sides, tri_pts, ref_sides, ref_tri_pts,
                           pts, ref_pts, cnt.astype(jnp.float32), n_ref, k)

    return jax.lax.map(one, (stars_xy, counts, scales))


_combos_cache: dict[int, np.ndarray] = {}


def _combos_for(k: int) -> np.ndarray:
    """Static (C(k,3), 3) int32 triple-index table over the k pick slots."""
    c = _combos_cache.get(k)
    if c is None:
        c = np.array(list(itertools.combinations(range(k), 3)), np.int32)
        _combos_cache[k] = c
    return c


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

    def align_batch_deferred(self, frames_meta):
        """Align MANY frames with ONE device dispatch.

        frames_meta: list of (naxisn, StarList) with len(stars) >= 3 each.
        Returns a list of (trans, residual) pairs of pending deferred values
        (pipeline.deferred.DeferredRow views over two whole-batch arrays),
        parallel to frames_meta. The star pick and triangle generation run
        on device (_pick_device/_tris_device), so the only upload is the
        stacked (m,2,K) coordinate tensor -- per-frame host triangle
        generation plus its ~3/4 MB upload and per-frame dispatch are the
        match+align wall on many-small-frame configs (BASELINE.md)."""
        from nightlight_tpu.deferred import DeferredRow, defer

        m = len(frames_meta)
        counts = [len(s) for _, s in frames_meta]
        k_cap = _bucket(max(counts), 256)
        # power-of-two frame-count buckets (min 8): each distinct shape pays
        # a remote compile; padded frames (count 0) cost one no-op search each
        mb = 8
        while mb < m:
            mb *= 2
        arr = np.zeros((mb, 2, k_cap), np.float32)
        cnt = np.zeros(mb, np.int32)
        scales = np.ones(mb, np.float32)
        for r, (naxisn, stars) in enumerate(frames_meta):
            n = stars.count
            arr[r, 0, :n] = stars.x[:n]
            arr[r, 1, :n] = stars.y[:n]
            cnt[r] = n
            scales[r] = float(self.naxisn[0]) / float(naxisn[0])

        if getattr(self, "_combos_dev", None) is None:
            self._combos_dev = jnp.asarray(_combos_for(self.k))
        min_length = float(self.naxisn[1]) * MIN_DISTANCE_FRACTION
        trans_all, res_all, _ = _align_batch_device(
            jnp.asarray(arr), jnp.asarray(cnt), jnp.asarray(scales),
            self._ref_sides_dev, self._ref_tri_pts_dev, self._ref_pts_dev,
            jnp.int32(len(self.ref_pts)), self._combos_dev,
            jnp.float32(min_length * min_length), self.k)

        trans_parent = defer(trans_all, conv=np.asarray)
        res_parent = defer(res_all, conv=np.asarray)
        return [(DeferredRow(trans_parent, r,
                             conv=lambda v: np.asarray(v, np.float32)),
                 DeferredRow(res_parent, r, conv=float))
                for r in range(m)]

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
