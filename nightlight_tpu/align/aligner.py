"""Triangle-based star alignment.

Rebuild of the reference's Aligner (reference: internal/star/align.go) with
TPU-friendly batch math instead of KD-trees and Nelder-Mead:

* pick the K brightest mutually-distant stars (align.go:86-104)
* generate the canonical triangle per star triple with dAB < dAC < dBC
  (align.go:108-130) -- vectorized over all C(K,3) combinations
* match frame triangles to reference triangles by nearest side-length
  triple: a dense (T x R) squared-distance computation on device
  (replaces the pointerless KD-trees kdtree3p.go)
* for the best K triangle matches: build the initial affine from the star
  triple (closed form), project all stars, brute-force nearest-neighbor
  match against reference stars within 8px (replaces kdtree2.go), require
  >= 1/3 matched (align.go:193-212)
* refine the 6 affine parameters by CLOSED-FORM least squares on the fixed
  correspondences -- the reference minimizes the same objective with
  Nelder-Mead (align.go:214-244); for an affine model with fixed pairs the
  optimum is two independent 3x3 normal-equation solves, so this is exact
  where Nelder-Mead is approximate
* keep the candidate with the smallest residual
  sqrt(sum distSq)/starsMatched (align.go:233)
"""

from __future__ import annotations

import itertools
import math

import jax.numpy as jnp
import numpy as np

from nightlight_tpu.align import transform as tf
from nightlight_tpu.detect.stars import StarList

# Minimum star separation as a fraction of image height (align.go:55).
MIN_DISTANCE_FRACTION = 1.0 / 20.0
# Squared pixel distance below which a projected star matches a reference
# star (align.go:164).
DIST_SQ_LIMIT = 8.0 * 8.0
# Early abort when a candidate residual is below this (align.go:165).
EARLY_ABORT_RESIDUAL = 0.01


def pick_brightest_distant(xs: np.ndarray, ys: np.ndarray, min_length: float, k: int) -> np.ndarray:
    """Greedy selection of up to k stars, in brightness order, skipping stars
    closer than min_length to an already-picked star (align.go:86-104)."""
    picked: list[int] = []
    for s in range(len(xs)):
        ok = True
        for j in picked:
            if math.hypot(xs[s] - xs[j], ys[s] - ys[j]) < min_length:
                ok = False
                break
        if ok:
            picked.append(s)
            if len(picked) == k:
                break
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


def _nearest_triangles(tri_sides: np.ndarray, ref_sides: np.ndarray, chunk: int = 4096):
    """For each frame triangle, the index and squared distance of the nearest
    reference triangle in side-length space (replaces kdtree3p NN).

    Distances use the exact difference form, NOT |a|^2+|b|^2-2ab matmuls:
    TPU matmuls default to reduced precision and side lengths in the
    thousands would swamp the pixel-scale differences that decide a match.
    """
    t = jnp.asarray(tri_sides)
    r = jnp.asarray(ref_sides)
    best_idx = []
    best_d2 = []
    for lo in range(0, t.shape[0], chunk):
        tc = t[lo : lo + chunk]
        d2 = jnp.sum((tc[:, None, :] - r[None, :, :]) ** 2, axis=-1)
        best_idx.append(jnp.argmin(d2, axis=1))
        best_d2.append(jnp.min(d2, axis=1))
    return np.asarray(jnp.concatenate(best_idx)), np.asarray(jnp.concatenate(best_d2))


def _nn_match_batch(pts: np.ndarray, ref_pts: np.ndarray, transforms: np.ndarray):
    """Nearest reference star for every star under EVERY candidate transform,
    in one device dispatch (replaces kdtree2 NN; the reference loops
    candidates sequentially, align.go:167-254 -- per-candidate dispatch
    latency dominates on tunneled TPU setups).

    pts (N,2), ref_pts (R,2), transforms (C,6) ->
    (nearest idx (C,N) int, squared dist (C,N)). Exact difference form --
    see _nearest_triangles.
    """
    p = jnp.asarray(pts)
    r = jnp.asarray(ref_pts)
    t = jnp.asarray(transforms)
    px = t[:, 0:1] * p[None, :, 0] + t[:, 1:2] * p[None, :, 1] + t[:, 2:3]  # (C,N)
    py = t[:, 3:4] * p[None, :, 0] + t[:, 4:5] * p[None, :, 1] + t[:, 5:6]
    d2 = ((px[:, :, None] - r[None, None, :, 0]) ** 2
          + (py[:, :, None] - r[None, None, :, 1]) ** 2)  # (C,N,R)
    idx = jnp.argmin(d2, axis=2)
    best = jnp.min(d2, axis=2)
    packed = np.asarray(jnp.concatenate([idx.astype(jnp.float32), best], axis=0))
    c = transforms.shape[0]
    return packed[:c].astype(np.int64), packed[c:]


def _lsq_affine(pts: np.ndarray, ref: np.ndarray, mask: np.ndarray) -> np.ndarray | None:
    """Closed-form affine least squares over masked correspondences.

    Minimizes sum |T(p_i) - ref_i|^2, the same objective Nelder-Mead
    approximates in align.go:216-235 (sqrt/normalization is monotone).
    """
    m = mask
    if m.sum() < 3:
        return None
    x, y = pts[m, 0].astype(np.float64), pts[m, 1].astype(np.float64)
    A = np.stack([x, y, np.ones_like(x)], axis=-1)  # (n, 3)
    ata = A.T @ A
    try:
        sol_x = np.linalg.solve(ata, A.T @ ref[m, 0].astype(np.float64))
        sol_y = np.linalg.solve(ata, A.T @ ref[m, 1].astype(np.float64))
    except np.linalg.LinAlgError:
        return None
    return np.concatenate([sol_x, sol_y]).astype(np.float32)


class Aligner:
    """Star aligner against a fixed reference frame (align.go:28-71)."""

    def __init__(self, naxisn, ref_stars: StarList, k: int):
        self.naxisn = list(naxisn)
        self.ref_stars = ref_stars
        self.k = int(k)
        self.ref_pts = np.stack([ref_stars.x, ref_stars.y], axis=-1).astype(np.float32)

        min_length = float(naxisn[1]) * MIN_DISTANCE_FRACTION
        idx = pick_brightest_distant(ref_stars.x, ref_stars.y, min_length, self.k)
        self.ref_tri_sides, self.ref_tris = generate_triangles(ref_stars.x, ref_stars.y, idx, 1.0)

    def align(self, naxisn, stars: StarList, id: int = 0):
        """Align a frame's stars to the reference (align.go:74-83).

        Returns (transform 6-vector, residual). Residual is +inf when no
        candidate produced a valid match.
        """
        best_trans = tf.identity()
        best_residual = float("inf")
        if len(stars) == 0 or len(self.ref_tris) == 0:
            return best_trans, best_residual

        min_length = float(self.naxisn[1]) * MIN_DISTANCE_FRACTION
        idx = pick_brightest_distant(stars.x, stars.y, min_length, self.k)
        scale = float(self.naxisn[0]) / float(naxisn[0])
        tri_sides, tris = generate_triangles(stars.x, stars.y, idx, scale)
        if len(tris) == 0:
            return best_trans, best_residual

        nn_idx, nn_d2 = _nearest_triangles(tri_sides, self.ref_tri_sides)
        order = np.argsort(nn_d2, kind="stable")[: min(self.k, len(nn_d2))]

        pts = np.stack([stars.x, stars.y], axis=-1).astype(np.float32)
        n_stars = len(stars)

        # Build all candidate transforms on the host (closed form, cheap),
        # then match every candidate in ONE device dispatch.
        cand_transforms = []
        for ti in order:
            tri = tris[ti]
            ref_tri = self.ref_tris[nn_idx[ti]]
            p = [pts[v] for v in tri]
            pp = [self.ref_pts[v] for v in ref_tri]
            try:
                cand_transforms.append(tf.from_three_points(p[0], p[1], p[2], pp[0], pp[1], pp[2]))
            except ValueError:
                continue
        if not cand_transforms:
            return best_trans, best_residual
        # Pad candidate count to k and star count to a 256 bucket so the
        # batched matcher compiles once per session, not once per frame.
        n_cand = len(cand_transforms)
        while len(cand_transforms) < self.k:
            cand_transforms.append(cand_transforms[0])
        pts_padded = pts
        n_bucket = ((n_stars + 255) // 256) * 256
        if n_bucket > n_stars:
            pts_padded = np.concatenate(
                [pts, np.full((n_bucket - n_stars, 2), 1.0e30, np.float32)])
        all_idx, all_d2 = _nn_match_batch(pts_padded, self.ref_pts,
                                          np.stack(cand_transforms))
        all_idx, all_d2 = all_idx[:, :n_stars], all_d2[:, :n_stars]

        for ci in range(n_cand):
            ref_idx, d2 = all_idx[ci], all_d2[ci]
            mask = d2 < DIST_SQ_LIMIT
            # Require >= 1/3 matched (align.go:210), and -- beyond the
            # reference -- at least 4 DISTINCT reference stars: a 6-parameter
            # affine fits <= 3 correspondences exactly, so degenerate
            # candidates would otherwise win with zero residual on sparse
            # star fields.
            distinct = len(np.unique(ref_idx[mask]))
            if mask.sum() < n_stars / 3 or distinct < min(4, len(self.ref_pts)):
                continue
            ref_match = self.ref_pts[ref_idx]

            refined = _lsq_affine(pts, ref_match, mask)
            if refined is None:
                continue
            proj2 = tf.apply(refined, pts)
            dd = proj2[mask] - ref_match[mask]
            residual = float(np.sqrt((dd * dd).sum())) / int(mask.sum())

            if residual < best_residual:
                best_trans, best_residual = refined, residual
                if best_residual < EARLY_ABORT_RESIDUAL:
                    return best_trans, best_residual

        return best_trans, best_residual
