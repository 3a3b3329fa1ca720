"""Geometric projection: bilinear warp into a reference coordinate system.

Rebuild of the reference's Image.Project (reference: internal/fits/project.go:
26-76) as one fused gather on device: invert the transform on the host,
generate the destination grid, sample with bilinear interpolation, and fill
out-of-bounds pixels with a given value (NaN marks missing data for stacking).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from nightlight_tpu.align import transform as tf


@partial(jax.jit, static_argnames=("dest_h", "dest_w"))
def _warp(img: jax.Array, inv: jax.Array, out_of_bounds: float, dest_h: int, dest_w: int) -> jax.Array:
    h, w = img.shape
    col = jnp.arange(dest_w, dtype=jnp.float32)[None, :]
    row = jnp.arange(dest_h, dtype=jnp.float32)[:, None]
    px = inv[0] * col + inv[1] * row + inv[2]
    py = inv[3] * col + inv[4] * row + inv[5]

    xl = jnp.floor(px)
    yl = jnp.floor(py)
    xr = px - xl
    yr = py - yl
    xl_i = xl.astype(jnp.int32)
    yl_i = yl.astype(jnp.int32)

    oob = (xl_i < 0) | (xl_i + 1 >= w) | (yl_i < 0) | (yl_i + 1 >= h)
    xc = jnp.clip(xl_i, 0, w - 2)
    yc = jnp.clip(yl_i, 0, h - 2)

    v00 = img[yc, xc]
    v01 = img[yc, xc + 1]
    v10 = img[yc + 1, xc]
    v11 = img[yc + 1, xc + 1]
    vyl = v00 * (1 - xr) + v01 * xr
    vyh = v10 * (1 - xr) + v11 * xr
    v = vyl * (1 - yr) + vyh * yr
    return jnp.where(oob, jnp.float32(out_of_bounds), v)


# The shift-blend warp pads the source by a static margin so integer row/
# column shifts become dynamic slices; translations beyond this fall back to
# the gather path.
_SHIFT_PAD = 256
# bucketed number of distinct integer shifts per axis (static for jit)
_SHIFT_COUNTS = (2, 4, 8)


def _warp_shift_impl(img: jax.Array, inv: jax.Array, out_of_bounds,
                     kmin, mmin, dest_h: int, dest_w: int,
                     n_kshift: int, n_mshift: int) -> jax.Array:
    """Gather-free bilinear warp for near-identity affine transforms.

    XLA's 2D gather executes element-wise on TPU (~1.8s for one 16MP warp,
    the single hottest op of the stacking pipeline). For alignment
    transforms the linear part is within ~1e-3 of identity, so the integer
    source offset floor(px) - col takes only a few distinct values across
    the whole image: bilinear interpolation becomes a blend of a handful of
    SHIFTED copies of the image (dynamic slices of a padded copy) with
    per-pixel one-hot weights -- pure vector math, 164x faster than the
    gather (completion-fetch measured 882 ms vs 5.4 ms per 16MP frame,
    scripts/microbench_warp_gather.py; round 2's ~1000x used the
    dispatch-biased clock). Numerically identical to _warp: same px/py, same floor/fraction
    arithmetic, same out-of-bounds rule; only the addressing differs.

    kmin/mmin: smallest integer column/row offset (traced scalars, so one
    compiled program serves every dither). n_kshift/n_mshift: static count
    of shifted copies per axis (bucketed); the host guarantees every
    in-bounds pixel's offset fits, out-of-bounds pixels read padding and
    are masked exactly like the gather path.
    """
    h, w = img.shape
    col = jnp.arange(dest_w, dtype=jnp.float32)[None, :]
    row = jnp.arange(dest_h, dtype=jnp.float32)[:, None]
    px = inv[0] * col + inv[1] * row + inv[2]
    py = inv[3] * col + inv[4] * row + inv[5]

    xl = jnp.floor(px)
    yl = jnp.floor(py)
    xr = px - xl
    yr = py - yl
    xl_i = xl.astype(jnp.int32)
    yl_i = yl.astype(jnp.int32)

    oob = (xl_i < 0) | (xl_i + 1 >= w) | (yl_i < 0) | (yl_i + 1 >= h)

    # integer shift indices relative to the smallest shift
    k_idx = xl_i - jnp.arange(dest_w, dtype=jnp.int32)[None, :] - kmin
    m_idx = yl_i - jnp.arange(dest_h, dtype=jnp.int32)[:, None] - mmin

    # Blend on a sanitized copy: a non-finite source pixel would otherwise
    # poison every destination pixel whose shift window overlaps it through
    # 0*NaN=NaN. Track non-finiteness separately with INDICATOR weights so a
    # destination pixel goes NaN iff one of its 4 true bilinear neighbors is
    # non-finite -- the exact propagation rule of the gather path (_warp),
    # whose multiply-by-zero also poisons zero-weight neighbors.
    finite = jnp.isfinite(img)
    padded = jnp.pad(jnp.where(finite, img, 0.0), _SHIFT_PAD)
    padded_bad = jnp.pad((~finite).astype(jnp.float32), _SHIFT_PAD)

    out = jnp.zeros((dest_h, dest_w), jnp.float32)
    bad = jnp.zeros((dest_h, dest_w), jnp.float32)
    for i in range(n_mshift):
        wy = jnp.where(m_idx == i, 1.0 - yr, 0.0) + jnp.where(m_idx == i - 1, yr, 0.0)
        by = ((m_idx == i) | (m_idx == i - 1)).astype(jnp.float32)
        shifted_rows = jax.lax.dynamic_slice(
            padded, (mmin + i + _SHIFT_PAD, 0), (dest_h, w + 2 * _SHIFT_PAD))
        shifted_bad = jax.lax.dynamic_slice(
            padded_bad, (mmin + i + _SHIFT_PAD, 0), (dest_h, w + 2 * _SHIFT_PAD))
        acc = jnp.zeros((dest_h, dest_w), jnp.float32)
        bacc = jnp.zeros((dest_h, dest_w), jnp.float32)
        for j in range(n_kshift):
            wx = jnp.where(k_idx == j, 1.0 - xr, 0.0) + jnp.where(k_idx == j - 1, xr, 0.0)
            bx = ((k_idx == j) | (k_idx == j - 1)).astype(jnp.float32)
            v = jax.lax.dynamic_slice(shifted_rows, (0, kmin + j + _SHIFT_PAD),
                                      (dest_h, dest_w))
            vb = jax.lax.dynamic_slice(shifted_bad, (0, kmin + j + _SHIFT_PAD),
                                       (dest_h, dest_w))
            acc = acc + wx * v
            bacc = bacc + bx * vb
        out = out + wy * acc
        bad = bad + by * bacc
    out = jnp.where(bad > 0, jnp.float32(jnp.nan), out)
    return jnp.where(oob, jnp.float32(out_of_bounds), out)


_warp_shift = partial(jax.jit, static_argnames=(
    "dest_h", "dest_w", "n_kshift", "n_mshift"))(_warp_shift_impl)


@partial(jax.jit, static_argnames=("n_kshift", "n_mshift"), donate_argnums=(0,))
def _warp_shift_batch(frames: jax.Array, invs: jax.Array, oobs: jax.Array,
                      kmins: jax.Array, mmins: jax.Array, flags: jax.Array,
                      n_kshift: int, n_mshift: int) -> jax.Array:
    """Shift-blend warp for a WHOLE frame batch as one device program.

    frames: (N, H, W); invs (N, 6); oobs/kmins/mmins (N,); flags (N,) bool
    -- False passes the frame through unwarped (the alignment reference
    keeps its pixels untouched, no bilinear NaN border). The static shift
    counts are the batch maxima: a frame needing fewer shifts contributes
    zero weight on the extra slices (and lax.dynamic_slice clamps their
    starts), so sharing the bucket is exact. The input batch is DONATED --
    XLA reuses its HBM for the output, so warping costs ~1x the batch.

    Frames are processed with lax.map (sequential inside the one program),
    NOT vmap: vmapping the shift warp batch-materializes the padded source
    copies and lifts every dynamic slice into batched while-loop temps --
    25 GB of HLO temp at 12x16MP (93% fragmentation), an instant OOM. The
    warp is HBM-bandwidth-bound anyway, so per-frame sequencing inside the
    program loses nothing."""
    n, dest_h, dest_w = frames.shape

    def one(args):
        img, inv, oob, kmin, mmin, flag = args
        w = _warp_shift_impl(img, inv, oob, kmin, mmin, dest_h, dest_w,
                             n_kshift, n_mshift)
        return jnp.where(flag, w, img)

    return jax.lax.map(one, (frames, invs, oobs, kmins, mmins, flags))


def plan_batch_shift_warp(shapes, dest_naxisn, invs):
    """Host-side plan for _warp_shift_batch: per-frame integer shift ranges
    under a SHARED static (n_k, n_m) bucket (the batch maxima). Returns
    (kmins, mmins, n_k, n_m) as numpy arrays / ints, or None when any
    frame's transform needs the general gather warp (the caller then falls
    back to per-frame projection)."""
    kmins, mmins = [], []
    n_k = n_m = 2
    for shape, inv in zip(shapes, invs):
        plan = _shift_plan(np.asarray(inv, np.float64), shape, dest_naxisn)
        if plan is None:
            return None
        kmin, mmin, nk, nm = plan
        kmins.append(kmin)
        mmins.append(mmin)
        n_k = max(n_k, nk)
        n_m = max(n_m, nm)
    return (np.asarray(kmins, np.int32), np.asarray(mmins, np.int32),
            int(n_k), int(n_m))


def _shift_plan(inv: np.ndarray, src_shape, dest_naxisn):
    """Host-side eligibility for the shift-blend warp: the integer offset
    ranges over the destination grid, bucketed to a static shift count.
    Returns (kmin, mmin, n_kshift, n_mshift) or None when the transform
    needs the general gather (large rotation/scale or huge translation)."""
    dest_w, dest_h = int(dest_naxisn[0]), int(dest_naxisn[1])
    a, b, c, d, e, f = (float(v) for v in inv)
    corners = [(0.0, 0.0), (dest_w - 1.0, 0.0), (0.0, dest_h - 1.0),
               (dest_w - 1.0, dest_h - 1.0)]
    dxs = [a * x + b * y + c - x for (x, y) in corners]
    dys = [d * x + e * y + f - y for (x, y) in corners]
    import math

    kmin = math.floor(min(dxs))
    kmax = math.floor(max(dxs))
    mmin = math.floor(min(dys))
    mmax = math.floor(max(dys))
    n_k = kmax - kmin + 2  # +1 distinct values, +1 for the bilinear neighbor
    n_m = mmax - mmin + 2
    if n_k > _SHIFT_COUNTS[-1] or n_m > _SHIFT_COUNTS[-1]:
        return None
    if max(abs(kmin), abs(kmax + 1), abs(mmin), abs(mmax + 1)) >= _SHIFT_PAD:
        return None
    n_k = next(s for s in _SHIFT_COUNTS if s >= n_k)
    n_m = next(s for s in _SHIFT_COUNTS if s >= n_m)
    # every dynamic slice must stay inside the padded source
    h, w = int(src_shape[0]), int(src_shape[1])
    if mmin + _SHIFT_PAD < 0 or kmin + _SHIFT_PAD < 0:
        return None
    if mmin + n_m + _SHIFT_PAD + dest_h > h + 2 * _SHIFT_PAD:
        return None
    if kmin + n_k + _SHIFT_PAD + dest_w > w + 2 * _SHIFT_PAD:
        return None
    return kmin, mmin, n_k, n_m


def project(img: jax.Array, dest_naxisn, trans: np.ndarray, out_of_bounds: float) -> jax.Array:
    """Project a (H, W) image into dest dimensions under `trans`
    (project.go:26-76). trans maps source -> dest; sampling uses its inverse.

    Near-identity transforms (the alignment case) route to the gather-free
    shift-blend warp; anything else uses the general gather."""
    inv = tf.invert(trans)
    dest_w, dest_h = int(dest_naxisn[0]), int(dest_naxisn[1])
    plan = _shift_plan(inv, img.shape, dest_naxisn)
    if plan is not None:
        kmin, mmin, n_k, n_m = plan
        return _warp_shift(img, jnp.asarray(inv, jnp.float32),
                           jnp.float32(out_of_bounds),
                           jnp.int32(kmin), jnp.int32(mmin),
                           dest_h, dest_w, n_k, n_m)
    return _warp(img, jnp.asarray(inv), float(out_of_bounds), dest_h, dest_w)
