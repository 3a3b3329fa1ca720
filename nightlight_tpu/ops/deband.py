"""Banding removal (horizontal/vertical row/column gain correction).

Rebuild of the reference's debander (reference: internal/ops/pre/banding.go):
per-row (or column) percentile excluding pixels above location+sigma*scale,
then a windowed median of percentiles with linear gradient extrapolation at
the window edges, and a multiplicative per-row correction.

The whole pass runs on device: one masked sort of the image for the
per-row percentiles, then the sliding window-median over all rows as one
(rows x window) batched median with the edge-extrapolation rule applied by
mask (the reference's per-row host loop, banding.go:96-162, vectorized).
The original host helpers remain as the cross-check reference for
tests/test_gauss_deband_background.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=())
def _row_percentiles(img: jax.Array, percentile: float, threshold: float) -> jax.Array:
    """k-th percentile of each row, excluding values above threshold
    (banding.go:82-93). QSelectFloat32(buf, k) selects the k-th lowest
    (1-based), i.e. sorted[k-1]."""
    big = jnp.float32(3.4e38)
    masked = jnp.where(img <= threshold, img, big)
    s = jnp.sort(masked, axis=1)
    cnt = jnp.sum(img <= threshold, axis=1)
    k = (cnt.astype(jnp.float32) * percentile * 0.01).astype(jnp.int32)
    idx = jnp.clip(k - 1, 0, jnp.maximum(cnt - 1, 0))
    return jnp.take_along_axis(s, idx[:, None], axis=1)[:, 0]


def _median(a: np.ndarray) -> float:
    """QSelectMedianFloat32 semantics = numpy median (average of middles)."""
    return float(np.median(a))


def _fix_window_edge(window: np.ndarray, missing: int) -> None:
    """Replace out-of-range window entries with a linear gradient
    extrapolation from the two half-window medians (banding.go:134-162)."""
    n = len(window)
    half = n // 2
    left_med = _median(window[:half])
    right_med = _median(window[half:])
    mean_of_medians = 0.5 * (left_med + right_med)
    center = 0.5 * (half + (n - half))
    slope = (right_med - left_med) / center
    if missing < 0:
        for i in range(n + missing, n):
            offset = (i - n) - center
            window[i] = mean_of_medians + slope * offset
    else:
        for i in range(missing):
            offset = (i + n) - center
            window[i] = mean_of_medians + slope * offset


def _window_median_factors(percentiles: np.ndarray, window: int) -> np.ndarray:
    """Median-of-percentiles in a sliding window with edge extrapolation,
    returning per-row correction factors (banding.go:96-127)."""
    n = len(percentiles)
    window = min(window, n)
    factors = np.empty(n, np.float32)
    for row in range(n):
        start = row - (window >> 1)
        missing = 0
        if start < 0:
            missing = start
            start = 0
        end = start + window
        if end > n:
            missing = end - n
            end = n
            start = end - window
        clone = percentiles[start:end].astype(np.float32).copy()
        if missing != 0:
            _fix_window_edge(clone, missing)
        med = _median(clone)
        factors[row] = med / percentiles[row]
    return factors


def _median_axis1(a: jax.Array) -> jax.Array:
    """Median along axis 1 (QSelectMedianFloat32 semantics: average of the
    two middles for even counts)."""
    s = jnp.sort(a, axis=1)
    m = a.shape[1]
    if m % 2 == 1:
        return s[:, m // 2]
    return 0.5 * (s[:, m // 2 - 1] + s[:, m // 2])


@partial(jax.jit, static_argnames=("window",))
def _window_median_factors_device(percentiles: jax.Array, window: int) -> jax.Array:
    """Vectorized window-median factors (banding.go:96-162): all rows'
    windows as one (n, window) gather, half-window medians + the linear
    gradient extrapolation for out-of-range entries applied by mask."""
    n = percentiles.shape[0]
    w = window
    rows = jnp.arange(n)
    start_raw = rows - (w >> 1)
    # missing<0: left edge (|missing| entries conceptually past the end);
    # missing>0: right edge (first `missing` entries past the start)
    missing = jnp.where(start_raw < 0, start_raw,
                        jnp.maximum(start_raw + w - n, 0))
    start = jnp.clip(start_raw, 0, n - w)
    j = jnp.arange(w)[None, :]
    win = percentiles[start[:, None] + j]  # (n, w)

    half = w // 2
    left_med = _median_axis1(win[:, :half]) if half > 0 else win[:, 0]
    right_med = _median_axis1(win[:, half:])
    mean_of_medians = 0.5 * (left_med + right_med)
    center = 0.5 * w
    slope = (right_med - left_med) / center

    # left edge (missing<0): replace i in [w+missing, w), offset=(i-w)-center
    # right edge (missing>0): replace i in [0, missing), offset=(i+w)-center
    jf = j.astype(jnp.float32)
    replace_left = (missing[:, None] < 0) & (j >= w + missing[:, None])
    replace_right = (missing[:, None] > 0) & (j < missing[:, None])
    extrap_left = mean_of_medians[:, None] + slope[:, None] * ((jf - w) - center)
    extrap_right = mean_of_medians[:, None] + slope[:, None] * ((jf + w) - center)
    adjusted = jnp.where(replace_left, extrap_left,
                         jnp.where(replace_right, extrap_right, win))
    med = _median_axis1(adjusted)
    return med / percentiles


def deband_core(img: jax.Array, percentile, window: int, threshold,
                horizontal: bool):
    """Pure traced deband pass (usable inside larger jitted programs, e.g.
    the fused batch preprocess): returns (corrected, lowest, highest) with
    the extrema as 0-d device values."""
    work = img if horizontal else img.T
    percentiles = _row_percentiles(work, jnp.float32(percentile), threshold)
    factors = _window_median_factors_device(percentiles, window)
    lowest = jnp.minimum(1.0, jnp.min(factors))
    highest = jnp.maximum(0.0, jnp.max(factors))
    out = img * (factors[:, None] if horizontal else factors[None, :])
    return out, lowest, highest


def deband(img: jax.Array, percentile: float, window: int, sigma: float,
           location, scale, horizontal: bool):
    """Remove banding. Returns (corrected image, lowest factor, highest
    factor, threshold) for log output (banding.go:61-131, 197-269).

    Dispatch-only: location/scale may be device scalars and the returned
    factor extrema / threshold are pending Deferreds; nothing synchronizes
    here (the per-frame debanders used to pay a host round trip plus a
    4096-iteration numpy loop per frame)."""
    from nightlight_tpu.deferred import defer

    if sigma != 0:
        threshold = jnp.float32(location) + sigma * jnp.float32(scale)
    else:
        threshold = jnp.float32(3.4e38)
    threshold_out = defer(threshold) if sigma != 0 else 3.4e38

    n = img.shape[0] if horizontal else img.shape[1]
    out, lowest, highest = deband_core(img, percentile, min(int(window), n),
                                       threshold, horizontal)
    return out, defer(lowest), defer(highest), threshold_out
