"""Remaining estimator inventory: exact sigma-clipped median/MAD, bounded
sampled estimators, half-sample mode, perceptual histogram, and the
Gaussian-fit histogram mode.

Completes the reference's stats surface (reference: internal/stats/stats.go:
290-332, 349-430, 591-637; histogram.go:44-190) beyond the hot-path
estimators in ops/stats.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from nightlight_tpu.ops.stats import (
    MAD_SCALE,
    NUM_SAMPLES,
    QN_SCALE,
    _median_of_sorted_range,
    _qn_pairs_from,
    _sample,
    first_quartile_sorted,
    median_sorted,
)


@jax.jit
def sigma_clipped_median_and_mad(data: jax.Array, sigma_low: float, sigma_high: float):
    """EXACT iterative sigma-clipped median + final full-data MAD
    (stats.go:290-332).

    Clipping removes values outside [median - sigmaLow*std, median +
    sigmaHigh*std] with std about the MEDIAN scaled by 1.134; since the kept
    set is always an interval, it stays contiguous in sorted order and the
    loop is index arithmetic over prefix sums (the same reformulation as the
    stacking engine). The final MAD is over the ORIGINAL data w.r.t. the
    final median (stats.go:322-325), scaled by 1.4826.
    """
    xs = jnp.sort(data.reshape(-1))
    n = xs.shape[0]
    zero = jnp.zeros((1,), xs.dtype)
    s1 = jnp.concatenate([zero, jnp.cumsum(xs)])
    s2 = jnp.concatenate([zero, jnp.cumsum(xs * xs)])

    def body(state):
        lo, hi, _, _ = state
        cnt = hi - lo
        med = _median_of_sorted_range(xs, lo, cnt)
        c = jnp.maximum(cnt, 1).astype(xs.dtype)
        # stddev about the median: E[x^2] - 2 m E[x] + m^2
        ex2 = (s2[hi] - s2[lo]) / c
        ex = (s1[hi] - s1[lo]) / c
        std = jnp.sqrt(jnp.maximum(ex2 - 2 * med * ex + med * med, 0.0)) * 1.134
        lo_b = med - sigma_low * std
        hi_b = med + sigma_high * std
        new_lo = jnp.searchsorted(xs, lo_b, side="left")
        new_hi = jnp.searchsorted(xs, hi_b, side="right")
        new_lo = jnp.maximum(new_lo, lo)
        new_hi = jnp.minimum(new_hi, hi)
        rejected = (new_lo - lo) + (hi - new_hi)
        done = jnp.logical_or(rejected == 0, (new_hi - new_lo) <= 3)
        return new_lo, new_hi, med, done

    def cond(state):
        return jnp.logical_not(state[3])

    lo, hi, med, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(n), xs[n // 2], jnp.bool_(False)))
    # recompute the median of the final window for the return value
    med = _median_of_sorted_range(xs, lo, jnp.maximum(hi - lo, 1))
    mad = median_sorted(jnp.sort(jnp.abs(data.reshape(-1) - med))) * MAD_SCALE
    return med, mad


# ---------------------------------------------------------------------------
# Bounded sampled estimators (stats.go:349-430, 450-472)
# ---------------------------------------------------------------------------


def _bounded_sorted_sample(data, key, num_samples):
    return jnp.sort(_sample(data, key, num_samples))


@partial(jax.jit, static_argnames="num_samples")
def fast_approx_bounded_median(data, low_bound, high_bound, key,
                               num_samples: int = NUM_SAMPLES):
    """Sampled median restricted to [low, high] (stats.go:349-364); the
    reference's rejection resampling becomes a sorted-sample window."""
    ss = _bounded_sorted_sample(data, key, num_samples)
    lo = jnp.searchsorted(ss, low_bound, side="left")
    hi = jnp.searchsorted(ss, high_bound, side="right")
    return _median_of_sorted_range(ss, lo, jnp.maximum(hi - lo, 1))


@partial(jax.jit, static_argnames="num_samples")
def fast_approx_bounded_mad(data, location, low_bound, high_bound, key,
                            num_samples: int = NUM_SAMPLES):
    """Sampled bounded MAD (stats.go:413-430)."""
    s = _sample(data, key, num_samples)
    ok = (s >= low_bound) & (s <= high_bound)
    dev = jnp.where(ok, jnp.abs(s - location), jnp.float32(3.4e38))
    sd = jnp.sort(dev)
    cnt = jnp.sum(ok)
    return _median_of_sorted_range(sd, jnp.int32(0), jnp.maximum(cnt, 1)) * MAD_SCALE


@partial(jax.jit, static_argnames="num_samples")
def fast_approx_bounded_stddev(data, location, low_bound, high_bound, key,
                               num_samples: int = NUM_SAMPLES):
    """Sampled bounded stddev about a location (stats.go:381-398)."""
    s = _sample(data, key, num_samples)
    ok = (s >= low_bound) & (s <= high_bound)
    d2 = jnp.where(ok, (s - location) ** 2, 0.0)
    return jnp.sqrt(jnp.sum(d2) / jnp.maximum(jnp.sum(ok), 1))


@partial(jax.jit, static_argnames="num_samples")
def fast_approx_bounded_qn(data, low_bound, high_bound, key,
                           num_samples: int = NUM_SAMPLES):
    """Sampled bounded Qn (stats.go:450-472)."""
    k1, k2 = jax.random.split(key)
    ss = _bounded_sorted_sample(data, k1, num_samples)
    lo = jnp.searchsorted(ss, low_bound, side="left")
    hi = jnp.searchsorted(ss, high_bound, side="right")
    diffs = _qn_pairs_from(ss, lo, jnp.maximum(hi - lo, 2), k2, num_samples)
    return first_quartile_sorted(jnp.sort(diffs)) * QN_SCALE


# ---------------------------------------------------------------------------
# Half-sample mode (stats.go:591-637; dead code in the reference)
# ---------------------------------------------------------------------------


def half_sample_mode(data: np.ndarray) -> float:
    """Bickel & Fruehwirth 2006 half-sample mode estimate (stats.go:591-637).

    Recursively narrows to the densest half-sample. The reference's tie
    bookkeeping is degenerate (it accumulates every non-improving index,
    stats.go:620-635) and the function is dead code there; this implements
    the standard first-minimal-window variant.
    """
    xs = np.sort(np.asarray(data, np.float64).reshape(-1))
    while True:
        n = len(xs)
        if n == 1:
            return float(xs[0])
        if n == 2:
            return float(0.5 * (xs[0] + xs[1]))
        if n == 3:
            # The reference returns half the WIDTH of the tighter pair here
            # (stats.go:608-614), which cannot be a mode location; return the
            # midpoint of the tighter pair instead (dead code there anyway).
            width_diff = (xs[1] - xs[0]) - (xs[2] - xs[1])
            if width_diff < 0:
                return float(0.5 * (xs[1] + xs[0]))
            if width_diff > 0:
                return float(0.5 * (xs[2] + xs[1]))
            return float(xs[1])
        half = n // 2
        widths = xs[half - 1 :] - xs[: n - half + 1]
        i = int(np.argmin(widths))
        xs = xs[i : i + half]


# ---------------------------------------------------------------------------
# Histogram peak utilities (histogram.go:44-190)
# ---------------------------------------------------------------------------


def get_peak(bins: np.ndarray, vmin: float, vmax: float):
    """Location and value of the histogram peak (histogram.go:45-56)."""
    bins = np.asarray(bins)
    max_index = int(np.argmax(bins))
    x = vmin + (max_index + 0.5) * (vmax - vmin) / (len(bins) - 1)
    y = 0.5 * float(bins[max_index] + bins[min(max_index + 1, len(bins) - 1)])
    return x, y


def get_mode_stddev_from_histogram(bins: np.ndarray, vmin: float, vmax: float):
    """Gaussian fit to the histogram via Nelder-Mead (histogram.go:59-95).
    Returns (mode, stddev)."""
    from scipy.optimize import minimize

    bins = np.asarray(bins, np.float64)
    peak, peak_val = get_peak(bins, vmin, vmax)
    xs = vmin + (np.arange(len(bins)) + 0.5) * (vmax - vmin) / (len(bins) - 1)

    def objective(p):
        alpha, mu, sigma = p
        scaler = alpha / (abs(sigma) * np.sqrt(2 * np.pi) + 1e-30)
        pred = scaler * np.exp(-0.5 * ((xs - mu) / (sigma + 1e-30)) ** 2)
        return float(np.sqrt(np.mean((bins - pred) ** 2)))

    res = minimize(objective, [peak_val, peak, 5.0], method="Nelder-Mead")
    return float(res.x[1]), float(abs(res.x[2]))


_PERCEPTUAL_GAMMA = 2.4


def perceptual_histogram(data, vmin: float, vmax: float, num_bins: int):
    """Histogram with perceptually (gamma-2.4) spaced bins
    (histogram.go:97-121)."""
    d = np.asarray(data).reshape(-1)
    idx = (np.power(np.clip((d - vmin) / max(vmax - vmin, 1e-30), 0, 1),
                    1.0 / _PERCEPTUAL_GAMMA) * (num_bins - 1)).astype(np.int64)
    return np.bincount(np.clip(idx, 0, num_bins - 1), minlength=num_bins).astype(np.int32)


def get_perceptual_histogram_peak(bins, vmin: float, vmax: float):
    """Peak of a perceptual histogram mapped back to data space
    (histogram.go:124-137)."""
    bins = np.asarray(bins)
    max_index = int(np.argmax(bins))
    x = (float(max_index + 0.5) / (len(bins) - 1)) ** _PERCEPTUAL_GAMMA * (vmax - vmin) + vmin
    y = 0.5 * float(bins[max_index] + bins[min(max_index + 1, len(bins) - 1)])
    return x, y
