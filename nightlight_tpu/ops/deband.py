"""Banding removal (horizontal/vertical row/column gain correction).

Rebuild of the reference's debander (reference: internal/ops/pre/banding.go):
per-row (or column) percentile excluding pixels above location+sigma*scale,
then a windowed median of percentiles with linear gradient extrapolation at
the window edges, and a multiplicative per-row correction.

The per-row masked percentiles run on device (one sort of the image); the
tiny per-row window-median pass runs on the host.
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


def deband(img: jax.Array, percentile: float, window: int, sigma: float,
           location: float, scale: float, horizontal: bool):
    """Remove banding. Returns (corrected image, lowest factor, highest
    factor) for log output (banding.go:61-131, 197-269)."""
    threshold = np.float32(3.4e38)
    if sigma != 0:
        threshold = np.float32(location + sigma * scale)

    work = img if horizontal else img.T
    percentiles = np.asarray(_row_percentiles(work, float(percentile), float(threshold)))
    factors = _window_median_factors(percentiles, int(window))
    lowest = float(min(1.0, factors.min()))
    highest = float(max(0.0, factors.max()))

    f = jnp.asarray(factors)
    if horizontal:
        out = img * f[:, None]
    else:
        out = img * f[None, :]
    return out, lowest, highest, float(threshold)
