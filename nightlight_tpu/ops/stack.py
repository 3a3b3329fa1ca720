"""Stacking engine: median / mean / sigma-clip / winsorized / MAD-sigma /
linear-fit stacking with NaN-as-missing semantics and optional per-frame
weights.

TPU-native rebuild of the reference's per-pixel stacking loops
(reference: internal/ops/stack/stack.go:274-918). The reference gathers each
pixel's values across frames and runs quickselect + iterative clipping per
pixel on the CPU. Here the whole (frames x pixels) block is processed as one
vectorized program:

* The frame axis is sorted ONCE per pixel (NaNs pushed to the end as +inf).
  Sigma clipping only ever removes values outside an interval, so the active
  set per pixel remains a CONTIGUOUS RANGE [lo, hi) of the sorted order; the
  clip iteration then reduces to index arithmetic over precomputed prefix
  sums -- no per-iteration re-sort, no data movement.
* Values are centered per pixel before building prefix sums so float32
  sum-of-squares stays accurate.
* The per-pixel "repeat until stable" loops become one lax.while_loop over
  the whole block with per-pixel running masks; iteration count is bounded
  by the frame count.

Semantics match stack.go exactly where it matters:
* median of an even count averages the two middle values (qsort.go:68-82)
* clip bounds are median +/- sigma * stddev-about-the-MEAN (stack.go:404-409)
* the stacked value for a pixel is the MEAN computed at the top of its final
  clip iteration (stack.go:427-430)
* pixels with zero valid samples get RefFrameLoc (stack.go:288-297)
* winsorized stddev: replace outliers at median +/- 1.5 sigma, recompute
  stddev * 1.134, iterate until change <= 0.05% (stack.go:646-672)
* linear fit regresses value against sorted rank, rejects by mean absolute
  residual, and returns the fitted mean (stack.go:832-918)
"""

from __future__ import annotations

import os as _os
from enum import IntEnum
from functools import partial

import jax
import jax.numpy as jnp


class StackMode(IntEnum):
    """Stacking modes (stack.go:33-42)."""

    Median = 0
    Mean = 1
    Sigma = 2
    WinsorSigma = 3
    MADSigma = 4
    LinearFit = 5
    Auto = 6


class StackWeighting(IntEnum):
    """Weighting modes (stack.go:57-63)."""

    NoWeight = 0
    Exposure = 1
    InverseNoise = 2
    InverseHFR = 3


def auto_select_mode(num_frames: int) -> StackMode:
    """Frame-count based auto mode selection (stack.go:45-55)."""
    if num_frames >= 25:
        return StackMode.LinearFit
    if num_frames >= 15:
        return StackMode.WinsorSigma
    if num_frames >= 6:
        return StackMode.Sigma
    return StackMode.Mean


_BIG = jnp.float32(3.0e38)


def _prepare(frames: jax.Array, weights):
    """Sort the frame axis ascending with NaNs pushed to the end.

    Returns (sorted centered values, permuted weights or None, valid counts,
    per-pixel center). frames: (N, P).

    Values are centered by the per-pixel MEDIAN of the valid samples: the
    prefix sums of squares otherwise suffer float32 cancellation when the
    surviving cluster sits far from zero (the mean is no help -- outlier
    frames drag it away from the cluster).
    """
    n = frames.shape[0]
    valid = jnp.isfinite(frames)
    cnt = jnp.sum(valid, axis=0)
    filled = jnp.where(valid, frames, _BIG)
    if weights is None:
        svals = jnp.sort(filled, axis=0)
        sw = None
    else:
        order = jnp.argsort(filled, axis=0)
        svals = jnp.take_along_axis(filled, order, axis=0)
        sw = weights[order]
    center = _median_range(svals, jnp.zeros_like(cnt), cnt)
    center = jnp.where(cnt > 0, center, 0.0)
    idx = jnp.arange(n)[:, None]
    svals = jnp.where(idx < cnt[None, :], svals - center[None, :], 0.0)
    return svals, sw, cnt, center


def _prefix(svals: jax.Array):
    """Inclusive->exclusive prefix sums with leading zero row: S[k] = sum of
    the first k sorted values. Shapes: (N+1, P)."""
    zero = jnp.zeros((1,) + svals.shape[1:], svals.dtype)
    s1 = jnp.concatenate([zero, jnp.cumsum(svals, axis=0)], axis=0)
    s2 = jnp.concatenate([zero, jnp.cumsum(svals * svals, axis=0)], axis=0)
    return s1, s2


def _take(arr: jax.Array, idx: jax.Array) -> jax.Array:
    """arr[(idx, pixel), pixel] gather along axis 0."""
    return jnp.take_along_axis(arr, idx[None, :], axis=0)[0]


def _median_range(svals: jax.Array, lo: jax.Array, cnt: jax.Array) -> jax.Array:
    """Median of svals[lo:lo+cnt] per pixel (QSelect semantics)."""
    cnt1 = jnp.maximum(cnt, 1)
    upper = _take(svals, lo + cnt1 // 2)
    lower = _take(svals, lo + jnp.maximum(cnt1 // 2 - 1, 0))
    return jnp.where(cnt1 % 2 == 1, upper, 0.5 * (lower + upper))


def _count_range(svals: jax.Array, lo: jax.Array, hi: jax.Array, pred) -> jax.Array:
    """Count of values in sorted range [lo, hi) satisfying pred(v)."""
    n = svals.shape[0]
    idx = jnp.arange(n)[:, None]
    in_range = (idx >= lo[None, :]) & (idx < hi[None, :])
    return jnp.sum(in_range & pred(svals), axis=0)


# ---------------------------------------------------------------------------
# Simple modes
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=())
def stack_median(frames: jax.Array, ref_frame_loc: float) -> jax.Array:
    """NaN-skipping median (stack.go:274-303)."""
    valid = jnp.isfinite(frames)
    cnt = jnp.sum(valid, axis=0)
    svals = jnp.sort(jnp.where(valid, frames, _BIG), axis=0)
    med = _median_range(svals, jnp.zeros_like(cnt), cnt)
    return jnp.where(cnt == 0, ref_frame_loc, med)


@jax.jit
def stack_mean(frames: jax.Array, ref_frame_loc: float) -> jax.Array:
    """NaN-skipping mean (stack.go:307-333)."""
    valid = jnp.isfinite(frames)
    cnt = jnp.sum(valid, axis=0)
    s = jnp.sum(jnp.where(valid, frames, 0.0), axis=0)
    return jnp.where(cnt == 0, ref_frame_loc, s / jnp.maximum(cnt, 1))


@jax.jit
def stack_mean_weighted(frames: jax.Array, weights: jax.Array, ref_frame_loc: float) -> jax.Array:
    """NaN-skipping weighted mean (stack.go:337-366)."""
    valid = jnp.isfinite(frames)
    w = jnp.where(valid, weights[:, None], 0.0)
    ws = jnp.sum(w, axis=0)
    s = jnp.sum(jnp.where(valid, frames, 0.0) * weights[:, None], axis=0)
    return jnp.where(ws == 0, ref_frame_loc, s / jnp.where(ws == 0, 1.0, ws))


# ---------------------------------------------------------------------------
# Sigma-clip family (shared contiguous-range iteration)
# ---------------------------------------------------------------------------


def _sigma_clip_core(frames, weights, ref_frame_loc, sigma_low, sigma_high, winsorize: bool):
    """Shared core of StackSigma(Weighted) and StackWinsorSigma(Weighted)."""
    n = frames.shape[0]
    svals, sw, cnt0, center = _prepare(frames, weights)
    s1, s2 = _prefix(svals)
    if sw is not None:
        zero = jnp.zeros((1,) + svals.shape[1:], svals.dtype)
        w1 = jnp.concatenate([zero, jnp.cumsum(sw, axis=0)], axis=0)
        wv1 = jnp.concatenate([zero, jnp.cumsum(sw * svals, axis=0)], axis=0)

    p = frames.shape[1]
    lo0 = jnp.zeros(p, jnp.int32)
    hi0 = cnt0.astype(jnp.int32)
    running0 = cnt0 > 0
    result0 = jnp.full(p, jnp.float32(ref_frame_loc))

    def mean_range(lo, hi):
        c = jnp.maximum(hi - lo, 1)
        return (_take(s1, hi) - _take(s1, lo)) / c

    def std_range(lo, hi):
        c = jnp.maximum(hi - lo, 1)
        m = mean_range(lo, hi)
        var = (_take(s2, hi) - _take(s2, lo)) / c - m * m
        return jnp.sqrt(jnp.maximum(var, 0.0))

    def winsor_std(lo, hi, median, std0):
        """Iteratively winsorized stddev (stack.go:646-672), computed on the
        sorted range via clamped-sum index arithmetic. `std0` seeds the
        fixed-point iteration: the first clip round starts from the plain
        std (reference behavior), later rounds from the previous round's
        converged value, which is near the new fixed point and cuts the
        iteration count severalfold. The stopping rule (relative change
        <= 5e-4 or no clamped samples) is unchanged, so every start
        converges to the same fixed point within tolerance.

        The reference clamps ONE copy progressively across iterations
        (stack.go:655-660): when the 1.134-adjusted std GROWS, the new
        bounds widen past the old ones and previously-clamped samples keep
        their old bound value. A composition of clips equals a single clip
        at (running max of lower bounds, running min of upper bounds), so
        the iteration carries those running bounds instead of re-clamping
        fresh — and a sample counts as "changed" only against a bound that
        actually tightened this application (tests/test_go_oracles.py pins
        this against the transliterated per-pixel loop)."""
        c = jnp.maximum(hi - lo, 1)

        def f(std, lo_r, hi_r):
            wlo = median - 1.5 * std
            whi = median + 1.5 * std
            nlo = jnp.maximum(lo_r, wlo)  # progressive-clamp running bounds
            nhi = jnp.minimum(hi_r, whi)
            # index of first value >= nlo and first value > nhi within range
            below = _count_range(svals, lo, hi, lambda v: v < nlo)
            above = _count_range(svals, lo, hi, lambda v: v > nhi)
            a = lo + below
            b = hi - above
            mid_sum = _take(s1, b) - _take(s1, a)
            mid_sq = _take(s2, b) - _take(s2, a)
            wsum = mid_sum + below * nlo + above * nhi
            wsq = mid_sq + below * nlo * nlo + above * nhi * nhi
            m = wsum / c
            var = wsq / c - m * m
            # samples move only past a bound that tightened this iteration
            ch = (jnp.where(wlo > lo_r, below, 0)
                  + jnp.where(whi < hi_r, above, 0))
            return 1.134 * jnp.sqrt(jnp.maximum(var, 0.0)), ch, nlo, nhi

        def body(state):
            # 4 plain applications per control trip, mirroring the Pallas
            # kernel exactly (ops/stack_pallas.py winsor_std): per-pixel
            # iterate sequence identical to the reference's, converged
            # pixels frozen. Aitken/Steffensen acceleration basin-hops on
            # this map (multiple fixed points from the clamp-count steps)
            # and is deliberately not used.
            std, lo_r, hi_r, done, it = state
            for _ in range(4):
                s1, ch, nlo, nhi = f(std, lo_r, hi_r)
                fac = jnp.abs(s1 - std) / jnp.maximum(std, 1e-30)
                new_done = done | (ch == 0) | (fac <= 0.0005)
                std = jnp.where(done, std, s1)
                lo_r = jnp.where(done, lo_r, nlo)
                hi_r = jnp.where(done, hi_r, nhi)
                done = new_done
            return std, lo_r, hi_r, done, it + 1

        def cond(state):
            _, _, _, done, it = state
            return jnp.logical_and(jnp.logical_not(jnp.all(done)), it < 8)

        inf = jnp.full_like(std0, jnp.inf)
        std, _, _, _, _ = jax.lax.while_loop(
            cond, body, (std0, -inf, inf, jnp.zeros_like(std0, bool), 0))
        return std

    def body(state):
        lo, hi, running, result, clip_lo, clip_hi, it = state
        c = hi - lo
        median = _median_range(svals, lo, c)
        mean = mean_range(lo, hi)
        std = std_range(lo, hi)
        if winsorize:
            # plain-std seed of the CURRENT range, as in the reference and
            # the Pallas kernel (warm-starting from the previous round can
            # exit unwinsorized when the warm window clamps nothing)
            std = winsor_std(lo, hi, median, std)
        low_bound = median - sigma_low * std
        high_bound = median + sigma_high * std

        below = _count_range(svals, lo, hi, lambda v: v < low_bound)
        above = _count_range(svals, lo, hi, lambda v: v > high_bound)
        below = jnp.where(running, below, 0)
        above = jnp.where(running, above, 0)
        new_lo = lo + below
        new_hi = hi - above
        new_cnt = new_hi - new_lo

        stop = running & ((below + above == 0) | (new_cnt <= 1))
        if sw is None:
            final_val = mean
        else:
            wsum = _take(w1, new_hi) - _take(w1, new_lo)
            wvsum = _take(wv1, new_hi) - _take(wv1, new_lo)
            # If a pixel's set emptied entirely (only possible through float
            # rounding of the clip bounds; the reference would compute 0/0
            # NaN here, stack.go:813-818), fall back to the pre-removal set.
            wsum_pre = _take(w1, hi) - _take(w1, lo)
            wvsum_pre = _take(wv1, hi) - _take(wv1, lo)
            final_val = jnp.where(
                new_cnt > 0,
                wvsum / jnp.maximum(wsum, 1e-30),
                wvsum_pre / jnp.maximum(wsum_pre, 1e-30))
        result = jnp.where(stop, final_val, result)

        clip_lo = clip_lo + jnp.sum(below)
        clip_hi = clip_hi + jnp.sum(above)
        return new_lo, new_hi, running & ~stop, result, clip_lo, clip_hi, it + 1

    def cond(state):
        _, _, running, _, _, _, it = state
        return jnp.logical_and(jnp.any(running), it < n + 1)

    state = (lo0, hi0, running0, result0, jnp.int32(0), jnp.int32(0), 0)
    _, _, _, result, clip_lo, clip_hi, _ = jax.lax.while_loop(cond, body, state)
    result = jnp.where(cnt0 > 0, result + center, jnp.float32(ref_frame_loc))
    return result, clip_lo, clip_hi


@partial(jax.jit, static_argnames=())
def stack_sigma(frames, ref_frame_loc, sigma_low, sigma_high):
    """Iterative sigma-clipped mean (stack.go:372-436)."""
    return _sigma_clip_core(frames, None, ref_frame_loc, sigma_low, sigma_high, False)


@partial(jax.jit, static_argnames=())
def stack_sigma_weighted(frames, weights, ref_frame_loc, sigma_low, sigma_high):
    """Weighted sigma-clipped mean (stack.go:442-531)."""
    return _sigma_clip_core(frames, weights, ref_frame_loc, sigma_low, sigma_high, False)


@partial(jax.jit, static_argnames=())
def stack_winsor_sigma(frames, ref_frame_loc, sigma_low, sigma_high):
    """Winsorized sigma-clipped mean (stack.go:611-705)."""
    return _sigma_clip_core(frames, None, ref_frame_loc, sigma_low, sigma_high, True)


@partial(jax.jit, static_argnames=())
def stack_winsor_sigma_weighted(frames, weights, ref_frame_loc, sigma_low, sigma_high):
    """Weighted winsorized sigma-clipped mean (stack.go:710-829)."""
    return _sigma_clip_core(frames, weights, ref_frame_loc, sigma_low, sigma_high, True)


@jax.jit
def stack_mad_sigma(frames, ref_frame_loc, sigma_low, sigma_high):
    """Single-pass MAD-sigma clipped mean (stack.go:536-605)."""
    valid = jnp.isfinite(frames)
    cnt = jnp.sum(valid, axis=0)
    svals = jnp.sort(jnp.where(valid, frames, _BIG), axis=0)
    n = frames.shape[0]
    idx = jnp.arange(n)[:, None]
    in_cnt = idx < cnt[None, :]
    median = _median_range(svals, jnp.zeros_like(cnt), cnt)

    absdev = jnp.where(in_cnt, jnp.abs(svals - median[None, :]), _BIG)
    sdev = jnp.sort(absdev, axis=0)
    mad = _median_range(sdev, jnp.zeros_like(cnt), cnt)
    std = mad * 1.4826

    lo_b = median - sigma_low * std
    hi_b = median + sigma_high * std
    keep = in_cnt & (svals >= lo_b[None, :]) & (svals <= hi_b[None, :])
    kept = jnp.sum(keep, axis=0)
    mean = jnp.sum(jnp.where(keep, svals, 0.0), axis=0) / jnp.maximum(kept, 1)
    clip_lo = jnp.sum(in_cnt & (svals < lo_b[None, :]))
    clip_hi = jnp.sum(in_cnt & (svals > hi_b[None, :]))
    result = jnp.where(cnt == 0, ref_frame_loc, mean)
    return result, clip_lo, clip_hi


@jax.jit
def stack_linear_fit(frames, ref_frame_loc, sigma_low, sigma_high):
    """Linear-fit stacking (stack.go:832-918): per pixel, regress the sorted
    values against their rank, reject by mean absolute residual, iterate."""
    n, p = frames.shape
    valid0 = jnp.isfinite(frames)
    cnt0 = jnp.sum(valid0, axis=0)
    svals = jnp.sort(jnp.where(valid0, frames, _BIG), axis=0)
    idx = jnp.arange(n)[:, None]
    active0 = idx < cnt0[None, :]
    svals = jnp.where(active0, svals, 0.0)

    running0 = cnt0 > 0
    result0 = jnp.full(p, jnp.float32(ref_frame_loc))

    def body(state):
        active, running, result, clip_lo, clip_hi, it = state
        cnt = jnp.sum(active, axis=0)
        c = jnp.maximum(cnt, 1).astype(jnp.float32)
        # ranks among active values (xs in the reference)
        ranks = jnp.cumsum(active, axis=0) - 1
        xs = ranks.astype(jnp.float32)
        ys = svals

        xmean = jnp.sum(jnp.where(active, xs, 0.0), axis=0) / c
        ymean = jnp.sum(jnp.where(active, ys, 0.0), axis=0) / c
        xvar = jnp.sum(jnp.where(active, (xs - xmean) ** 2, 0.0), axis=0) / c
        yvar = jnp.sum(jnp.where(active, (ys - ymean) ** 2, 0.0), axis=0) / c
        xstd = jnp.sqrt(xvar)
        ystd = jnp.sqrt(yvar)
        corr = jnp.sum(jnp.where(active, (xs - xmean) * (ys - ymean), 0.0), axis=0)
        corr = corr / (xstd * ystd * (c + 1.0) + 1e-30)
        slope = corr * ystd / (xstd + 1e-30)
        intercept = ymean - slope * xmean

        lin = xs * slope[None, :] + intercept[None, :]
        resid = ys - lin
        sigma = jnp.sum(jnp.where(active, jnp.abs(resid), 0.0), axis=0) / c

        low_b = sigma_low * sigma
        high_b = sigma_high * sigma
        rej_lo = active & ((-resid) > low_b[None, :])
        rej_hi = active & (resid > high_b[None, :])
        n_rej = jnp.sum(rej_lo | rej_hi, axis=0)
        n_rej = jnp.where(running, n_rej, 0)

        stop = running & ((n_rej == 0) | (cnt < 3))
        result = jnp.where(stop, ymean, result)
        clip_lo = clip_lo + jnp.sum(jnp.where(running[None, :], rej_lo, False))
        clip_hi = clip_hi + jnp.sum(jnp.where(running[None, :], rej_hi, False))
        # Only still-running, non-stopping pixels actually drop their rejects
        # (the reference breaks before reslicing, stack.go:906-909).
        new_active = jnp.where(running[None, :] & ~stop[None, :], active & ~(rej_lo | rej_hi), active)
        return new_active, running & ~stop, result, clip_lo, clip_hi, it + 1

    def cond(state):
        _, running, _, _, _, it = state
        return jnp.logical_and(jnp.any(running), it < n + 1)

    state = (active0, running0, result0, jnp.int32(0), jnp.int32(0), 0)
    _, _, result, clip_lo, clip_hi, _ = jax.lax.while_loop(cond, body, state)
    return result, clip_lo, clip_hi


# ---------------------------------------------------------------------------
# Dispatcher and incremental stacking
# ---------------------------------------------------------------------------


def _xla_chunk_for(n: int) -> int:
    """Pixels per lax.map step for the XLA fallback paths. The sort-based
    modes materialize ~6 (N, chunk)-sized f32 temporaries (sorted values,
    two prefix-sum arrays, sort workspace); unchunked at 12x16MP that is
    several GB and OOM-kills the remote TPU worker. Bound the live set to
    ~300MB regardless of frame count."""
    env = _os.environ.get("NIGHTLIGHT_XLA_STACK_CHUNK", "")
    if env:
        return max(1, int(env))
    budget = 300 * (1 << 20)
    return max(1024, min(1 << 20, budget // (max(n, 1) * 4 * 6) // 1024 * 1024))


def _map_pixel_chunks(fn, flat: jax.Array):
    """Run a per-pixel stack `fn((N, chunk)) -> (data, clip_lo, clip_hi)`
    over pixel chunks of `flat` (N, P) with lax.map, so the XLA path's
    frame-axis sort/prefix temporaries stay bounded. Per-pixel results are
    unchanged (every reduction runs along the frame axis); padding pixels
    are NaN (count 0, no clip contribution) and cropped after."""
    n, p = flat.shape
    chunk = _xla_chunk_for(n)
    if p <= chunk:
        return fn(flat)
    n_chunks = -(-p // chunk)
    p_pad = n_chunks * chunk
    if p_pad > p:
        flat = jnp.pad(flat, ((0, 0), (0, p_pad - p)), constant_values=jnp.nan)
    blocks = jnp.moveaxis(flat.reshape(n, n_chunks, chunk), 1, 0)
    data, cl, ch = jax.lax.map(fn, blocks)
    return data.reshape(p_pad)[:p], jnp.sum(cl), jnp.sum(ch)


def _pallas_available() -> bool:
    """The Mosaic kernel path needs a real TPU backend (or interpret mode)."""
    try:
        import jax.extend.backend as jeb

        platform = jeb.get_backend().platform
    except Exception:  # noqa: BLE001
        return False
    return platform == "tpu"


def stack_sharded(frames: jax.Array, mesh, mode: StackMode, weights=None,
                  sigma_low: float = 2.75, sigma_high: float = 2.75,
                  ref_frame_loc: float = 0.0, axis: str = "pix",
                  use_pallas: bool | None = None):
    """Row-sharded stacking reduction over a device mesh, running the Pallas
    kernels PER SHARD.

    XLA's sharding propagation cannot auto-partition a pallas_call, so the
    sharded pipeline used to fall back to the XLA stack path (~130x slower
    than the kernels for sigma-clip at 40 frames by honest completion-fetch
    timing, BASELINE.md round-3 correction). shard_map hands each
    shard its local (N, rows/n, W) block explicitly: the reduction is
    per-pixel independent, so the kernel runs unmodified on the local block
    and only the scalar clip counters cross shards (one psum over ICI).
    This is the TPU scaling analog of the reference's pixel-sliced work
    packages (stack.go:134-218).

    frames: (N, H, W) with H divisible by the mesh size. Returns
    (stacked (H, W) sharded P(axis, None), clip_lo, clip_hi replicated).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    mode = StackMode(mode)
    if mode == StackMode.Auto:
        mode = auto_select_mode(frames.shape[0])

    def local(fl, w, slo, shi, rloc):
        data, cl, ch = stack(fl, mode, weights=w, sigma_low=slo,
                             sigma_high=shi, ref_frame_loc=rloc,
                             use_pallas=use_pallas)
        return data, jax.lax.psum(cl, axis), jax.lax.psum(ch, axis)

    slo = jnp.float32(sigma_low)
    shi = jnp.float32(sigma_high)
    rloc = jnp.float32(ref_frame_loc)
    out_specs = (P(axis, *([None] * (frames.ndim - 2))), P(), P())
    frame_spec = P(None, axis, *([None] * (frames.ndim - 2)))
    if weights is None:
        return shard_map(
            lambda fl, a, b, c: local(fl, None, a, b, c), mesh=mesh,
            in_specs=(frame_spec, P(), P(), P()), out_specs=out_specs,
            check_vma=False,
        )(frames, slo, shi, rloc)
    return shard_map(
        local, mesh=mesh,
        in_specs=(frame_spec, P(), P(), P(), P()), out_specs=out_specs,
        check_vma=False,
    )(frames, weights, slo, shi, rloc)


def stack(frames: jax.Array, mode: StackMode, weights=None,
          sigma_low: float = 2.75, sigma_high: float = 2.75,
          ref_frame_loc: float = 0.0, use_pallas: bool | None = None,
          mesh=None, axis: str = "pix"):
    """Stack (N, ...) frames along axis 0. Returns (stacked, clip_lo, clip_hi).

    `frames` may be any shape with the frame axis first; NaNs mark missing
    samples (e.g. out-of-bounds after projection).

    Sigma, winsorized, and linear-fit modes route to the VMEM-resident Pallas
    kernels (ops/stack_pallas.py) on TPU -- ~4000x faster than the XLA loop
    at 40 frames -- unless `use_pallas=False`. Linear fit (the auto mode for
    >=25 frames, stack.go:45-55) has no weighted variant, matching the
    reference.

    With `mesh` set, the reduction runs row-sharded over the mesh via
    shard_map (stack_sharded), which keeps the kernel path available under
    SPMD: a pallas_call cannot be auto-partitioned by sharding annotations,
    but runs unchanged on each shard's local block.
    """
    if mesh is not None and frames.ndim >= 3 \
            and frames.shape[1] % int(mesh.devices.size) == 0:
        return stack_sharded(frames, mesh, mode, weights=weights,
                             sigma_low=sigma_low, sigma_high=sigma_high,
                             ref_frame_loc=ref_frame_loc, axis=axis,
                             use_pallas=use_pallas)
    shape = frames.shape[1:]
    flat = frames.reshape(frames.shape[0], -1)
    if mode == StackMode.Auto:
        mode = auto_select_mode(frames.shape[0])
    if use_pallas is None:
        use_pallas = (mode in (StackMode.Sigma, StackMode.WinsorSigma, StackMode.LinearFit,
                               StackMode.MADSigma, StackMode.Median)
                      and _pallas_available())
    if use_pallas and mode in (StackMode.Sigma, StackMode.WinsorSigma):
        from nightlight_tpu.ops.stack_pallas import stack_sigma_pallas

        data, cl, ch = stack_sigma_pallas(
            flat, ref_frame_loc, sigma_low, sigma_high, weights=weights,
            winsorize=(mode == StackMode.WinsorSigma))
        return data.reshape(shape), cl, ch
    if use_pallas and mode == StackMode.LinearFit:
        from nightlight_tpu.ops.stack_pallas import stack_linfit_pallas

        data, cl, ch = stack_linfit_pallas(flat, ref_frame_loc, sigma_low, sigma_high)
        return data.reshape(shape), cl, ch
    if use_pallas and mode == StackMode.Median:
        # median stacking has no weighted variant (weights ignored, as in
        # the XLA path and stack.go:274-303)
        from nightlight_tpu.ops.stack_pallas import stack_single_pass_pallas

        data, cl, ch = stack_single_pass_pallas(flat, ref_frame_loc, mad=False)
        return data.reshape(shape), cl, ch
    if use_pallas and mode == StackMode.MADSigma and weights is None:
        from nightlight_tpu.ops.stack_pallas import stack_single_pass_pallas

        data, cl, ch = stack_single_pass_pallas(
            flat, ref_frame_loc, sigma_low, sigma_high, mad=True)
        return data.reshape(shape), cl, ch
    zero = jnp.int32(0)
    if mode == StackMode.Mean:
        # no frame-axis sort/prefix temporaries: run unchunked
        if weights is None:
            res = stack_mean(flat, ref_frame_loc), zero, zero
        else:
            res = stack_mean_weighted(flat, weights, ref_frame_loc), zero, zero
    elif mode == StackMode.Median:
        res = _map_pixel_chunks(
            lambda fl: (stack_median(fl, ref_frame_loc), zero, zero), flat)
    elif mode == StackMode.Sigma:
        if weights is None:
            res = _map_pixel_chunks(
                lambda fl: stack_sigma(fl, ref_frame_loc, sigma_low, sigma_high), flat)
        else:
            res = _map_pixel_chunks(
                lambda fl: stack_sigma_weighted(fl, weights, ref_frame_loc, sigma_low, sigma_high), flat)
    elif mode == StackMode.WinsorSigma:
        if weights is None:
            res = _map_pixel_chunks(
                lambda fl: stack_winsor_sigma(fl, ref_frame_loc, sigma_low, sigma_high), flat)
        else:
            res = _map_pixel_chunks(
                lambda fl: stack_winsor_sigma_weighted(fl, weights, ref_frame_loc, sigma_low, sigma_high), flat)
    elif mode == StackMode.MADSigma:
        if weights is not None:
            raise NotImplementedError("MADSigma stacking with weights is unimplemented (as in the reference)")
        res = _map_pixel_chunks(
            lambda fl: stack_mad_sigma(fl, ref_frame_loc, sigma_low, sigma_high), flat)
    elif mode == StackMode.LinearFit:
        res = _map_pixel_chunks(
            lambda fl: stack_linear_fit(fl, ref_frame_loc, sigma_low, sigma_high), flat)
    else:
        raise ValueError(f"invalid stacking mode {mode}")
    data, cl, ch = res
    return data.reshape(shape), cl, ch


@jax.jit
def stack_incremental(acc, light: jax.Array, weight: float):
    """Weighted running sum for stack-of-stacks (stack.go:924-937)."""
    if acc is None:
        return light * weight
    return acc + light * weight


@jax.jit
def stack_incremental_finalize(acc: jax.Array, weight_sum: float) -> jax.Array:
    """Divide by total weight (stack.go:940-944)."""
    return acc * (1.0 / weight_sum)


def get_weights(images, weighting: StackWeighting):
    """Per-frame weights from image metadata (stack.go:231-270).

    `images` is a list of pipeline Image objects; returns a jnp vector or None.
    """
    import numpy as np

    if weighting == StackWeighting.NoWeight:
        return None
    if weighting == StackWeighting.Exposure:
        ws = []
        for f in images:
            if f.exposure == 0:
                raise ValueError(f"{f.id}: Missing exposure information for exposure-weighted stacking")
            ws.append(f.exposure)
        return jnp.asarray(np.array(ws, np.float32))
    if weighting == StackWeighting.InverseNoise:
        noises = [f.stats.noise for f in images]
        lo, hi = min(noises), max(noises)
        rng = hi - lo if hi > lo else 1.0
        return jnp.asarray(np.array([1.0 / (1.0 + 4.0 * (x - lo) / rng) for x in noises], np.float32))
    if weighting == StackWeighting.InverseHFR:
        hfrs = [f.hfr for f in images]
        lo, hi = min(hfrs), max(hfrs)
        rng = hi - lo if hi > lo else 1.0
        return jnp.asarray(np.array([1.0 / (1.0 + 4.0 * (x - lo) / rng) for x in hfrs], np.float32))
    raise ValueError(f"Invalid weighting mode {weighting}")
