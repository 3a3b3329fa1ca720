"""Robust statistics engine, as jitted XLA reductions.

Reimplements the estimator suite of the reference's stats layer
(reference: internal/stats/stats.go, histogram.go, noise.go) with
TPU-friendly, fixed-shape algorithms:

* min/mean/max and variance: plain XLA reductions.
* sampled median / MAD / Qn: fixed-size random gathers with jax.random
  (replacing the reference's fastrand subsampling, stats.go:336-472).
* iterative sigma-clipped median + Qn (the default location/scale estimator,
  stats.go:477-499): one fixed-size sample is drawn and *sorted once*; the
  bounded re-estimation loop then works on the sorted sample via searchsorted
  index arithmetic inside a lax.while_loop. This replaces the reference's
  per-iteration rejection resampling with statistically equivalent masking
  (documented divergence: sampling noise differs, tests use tolerance bands).
* IKSS (stats.go:535-566): full device sort + masked biweight midvariance
  loop, with the active [i:j) window tracked via searchsorted.
* histogram peak location/scale (stats.go:640-688): bincount + cumulative
  ring sums.
* Immerkaer noise estimate (noise.go): 3x3 Laplacian via shifted adds, fused
  by XLA (replaces the AVX2 kernel noise_amd64.s).

Selection semantics match the reference's quickselect (qsort.go:61-82):
median of an even-length array is the average of the two middle elements;
first quartile is the (n>>2)-th element (0-indexed).
"""

from __future__ import annotations

import math
from enum import IntEnum
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Number of random samples used by the sampling-based estimators.
# Matches the reference (stats.go:226: numSamples := 128 * 1024).
NUM_SAMPLES = 128 * 1024

# Qn normalization constant for large n (stats.go:444).
QN_SCALE = 2.21914
# MAD normalization to Gaussian standard deviation (stats.go:408).
MAD_SCALE = 1.4826
# Adjustment applied to scale estimates within a sigma-clipping loop
# (stats.go:304,488).
CLIP_SCALE_ADJUST = 1.134


class LSEstimatorMode(IntEnum):
    """Location and scale estimator selection (stats.go:29-37)."""

    MeanStdDev = 0
    MedianMAD = 1
    IKSS = 2
    SCMedianQn = 3  # default: sigma-clipped sampled median + sampled Qn
    Histogram = 4


# ---------------------------------------------------------------------------
# Basic reductions
# ---------------------------------------------------------------------------


@jax.jit
def min_mean_max(data: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Single pass min/mean/max (stats.go:264-277)."""
    flat = data.reshape(-1)
    return jnp.min(flat), jnp.mean(flat), jnp.max(flat)


@jax.jit
def variance(data: jax.Array, mean: jax.Array) -> jax.Array:
    """Population variance about the given mean (stats.go:280-287)."""
    flat = data.reshape(-1)
    diff = flat - mean
    return jnp.mean(diff * diff)


@jax.jit
def mean_stddev(data: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Mean and population standard deviation (stats.go:246-261)."""
    flat = data.reshape(-1)
    m = jnp.mean(flat)
    return m, jnp.sqrt(jnp.mean((flat - m) ** 2))


# ---------------------------------------------------------------------------
# Sorted-array order statistics (quickselect-compatible)
# ---------------------------------------------------------------------------


def _median_of_sorted_range(ss: jax.Array, lo: jax.Array, cnt: jax.Array) -> jax.Array:
    """Median of ss[lo:lo+cnt] for a sorted array ss.

    Matches QSelectMedianFloat32 (qsort.go:68-82): middle element for odd
    counts, average of the two middle elements for even counts.
    """
    cnt = jnp.maximum(cnt, 1)
    upper = ss[lo + cnt // 2]
    lower = ss[lo + jnp.maximum(cnt // 2 - 1, 0)]
    return jnp.where(cnt % 2 == 1, upper, 0.5 * (lower + upper))


def median_sorted(ss: jax.Array) -> jax.Array:
    """Median of a sorted 1D array with quickselect-compatible semantics."""
    n = ss.shape[0]
    if n % 2 == 1:
        return ss[n // 2]
    return 0.5 * (ss[n // 2 - 1] + ss[n // 2])


def first_quartile_sorted(ss: jax.Array) -> jax.Array:
    """First quartile: the (n>>2)-th element, 0-indexed (qsort.go:61-63)."""
    return ss[ss.shape[0] >> 2]


# ---------------------------------------------------------------------------
# Sampling-based estimators
# ---------------------------------------------------------------------------


def _sample(data: jax.Array, key: jax.Array, num_samples: int) -> jax.Array:
    """Random sample with replacement, like the fastrand gathers of the
    reference (stats.go:336-345)."""
    flat = data.reshape(-1)
    idx = jax.random.randint(key, (num_samples,), 0, flat.shape[0])
    return flat[idx]


@partial(jax.jit, static_argnames="num_samples")
def fast_approx_median(data: jax.Array, key: jax.Array, num_samples: int = NUM_SAMPLES) -> jax.Array:
    """Sampled median (stats.go:336-345)."""
    return median_sorted(jnp.sort(_sample(data, key, num_samples)))


@partial(jax.jit, static_argnames="num_samples")
def fast_approx_mad(
    data: jax.Array, location: jax.Array, key: jax.Array, num_samples: int = NUM_SAMPLES
) -> jax.Array:
    """Sampled median absolute deviation, Gaussian-normalized (stats.go:401-410)."""
    s = jnp.abs(_sample(data, key, num_samples) - location)
    return median_sorted(jnp.sort(s)) * MAD_SCALE


def _qn_pairs_from(values: jax.Array, lo, cnt, key: jax.Array, num_samples: int) -> jax.Array:
    """Absolute differences of random index pairs drawn from values[lo:lo+cnt].

    The reference's FastApproxQn (stats.go:436-447) draws index1 uniform in
    [1, n) and index2 uniform in [0, index1) over *unsorted* data, which is a
    uniform unordered pair of values. Here `values` may be sorted, so the
    same index scheme would bias pair selection; instead draw uniform
    unordered pairs directly (i1 uniform, i2 uniform over the rest).
    """
    k1, k2 = jax.random.split(key)
    u1 = jax.random.randint(k1, (num_samples,), 0, 1 << 30)
    u2 = jax.random.randint(k2, (num_samples,), 0, 1 << 30)
    cnt = jnp.maximum(cnt, 2)
    i1 = u1 % cnt
    i2 = u2 % (cnt - 1)
    i2 = jnp.where(i2 >= i1, i2 + 1, i2)  # uniform pair without replacement
    return jnp.abs(values[lo + i1] - values[lo + i2])


def _qn_diffs_roll(sample: jax.Array, mask, key: jax.Array,
                   rolls: int = 1) -> jax.Array:
    """|s[i] - s[(i+k) mod n]| for `rolls` random shifts k of an UNSORTED
    iid sample -- uniform random pairs of independent sample entries without
    XLA's element-wise random-index gather, which dominated the sigma-clip
    estimator at 2.6 ms/frame/iteration on v5e-1 (the rolls are plain
    shifts, ~0.1 ms). Each pair (i, i+k) is two distinct iid draws, the same
    marginal pair distribution the reference's random index pairs produce
    (stats.go:436-447); pairs within one shift share k, which leaves the
    quantile estimator consistent with the same O(1/sqrt(n)) noise.

    `mask` selects the sample entries inside the current clip bounds (None
    for all); a pair is valid iff both endpoints are. Invalid pairs are
    +inf so a single sort + the valid-count quartile index drops them.
    """
    n = sample.shape[0]
    shifts = jax.random.randint(key, (rolls,), 1, n)
    parts = []
    for r in range(rolls):
        rolled = jnp.roll(sample, shifts[r])
        d = jnp.abs(sample - rolled)
        if mask is not None:
            valid = mask & jnp.roll(mask, shifts[r])
            d = jnp.where(valid, d, jnp.inf)
        parts.append(d)
    return parts[0] if rolls == 1 else jnp.concatenate(parts)


def _first_quartile_valid(diffs: jax.Array) -> jax.Array:
    """First quartile of the finite entries of `diffs` ((n>>2)-th element,
    0-indexed, matching qsort.go:61-63 over the valid pairs)."""
    sd = jnp.sort(diffs)
    n = sd.shape[0]
    valid = jnp.sum(jnp.isfinite(sd))
    q = sd[jnp.clip(valid >> 2, 0, n - 1)]
    return jnp.where(valid > 0, q, 0.0)


@partial(jax.jit, static_argnames="num_samples")
def fast_approx_qn(data: jax.Array, key: jax.Array, num_samples: int = NUM_SAMPLES) -> jax.Array:
    """Sampled Qn scale estimate (stats.go:436-447): first quartile of
    absolute pairwise differences, Gaussian-normalized. One random sample
    plus roll-pairs (_qn_diffs_roll) replaces the reference's 2*num_samples
    random-index gathers."""
    k_s, k_r = jax.random.split(key)
    s = _sample(data, k_s, num_samples)
    diffs = _qn_diffs_roll(s, None, k_r)
    return first_quartile_sorted(jnp.sort(diffs)) * QN_SCALE


@partial(jax.jit, static_argnames="num_samples")
def fast_approx_stddev(
    data: jax.Array, location: jax.Array, key: jax.Array, num_samples: int = NUM_SAMPLES
) -> jax.Array:
    """Sampled standard deviation about a location (stats.go:367-378)."""
    s = _sample(data, key, num_samples) - location
    return jnp.sqrt(jnp.mean(s * s))


@partial(jax.jit, static_argnames=("num_samples", "max_iter"))
def sigma_clipped_median_qn(
    data: jax.Array,
    sigma_low: float = 2.0,
    sigma_high: float = 2.0,
    epsilon: float = 1e-4,
    key: jax.Array | None = None,
    num_samples: int = NUM_SAMPLES,
    max_iter: int = 10,
) -> tuple[jax.Array, jax.Array]:
    """Iteratively sigma-clipped sampled median and sampled Qn.

    The default location/scale estimator (stats.go:477-499). One sample is
    drawn and sorted once; each clip iteration restricts to the sorted
    subrange [lowBound, highBound] via searchsorted and re-estimates median
    and Qn from it. Keeps the reference's quirk of using sigma_low for *both*
    clip bounds (stats.go:483-484). Returns (location, scale).
    """
    del sigma_high  # reference quirk: both bounds use sigma_low
    if key is None:
        key = jax.random.PRNGKey(0)
    k_sample, k_qn0, k_loop, k_final = jax.random.split(key, 4)

    sr = _sample(data, k_sample, num_samples)  # unsorted: roll-pairs source
    ss = jnp.sort(sr)

    loc0 = median_sorted(ss)
    scale0 = first_quartile_sorted(jnp.sort(_qn_diffs_roll(sr, None, k_qn0))) * QN_SCALE

    def body(state):
        i, loc, scale, _ = state
        lo_bound = loc - sigma_low * scale
        hi_bound = loc + sigma_low * scale
        lo = jnp.searchsorted(ss, lo_bound, side="left")
        hi = jnp.searchsorted(ss, hi_bound, side="right")
        cnt = jnp.maximum(hi - lo, 2)

        new_loc = _median_of_sorted_range(ss, lo, cnt)
        k_iter = jax.random.fold_in(k_loop, i)
        # Qn over the clipped subset: roll-pairs on the unsorted sample with
        # both endpoints required in-bounds (two shifts keep the valid-pair
        # count high even under heavy clipping), instead of 2*num_samples
        # random-index gathers per iteration -- see _qn_diffs_roll.
        in_bounds = (sr >= lo_bound) & (sr <= hi_bound)
        diffs = _qn_diffs_roll(sr, in_bounds, k_iter, rolls=2)
        sd = jnp.sort(diffs)
        n_valid = jnp.sum(jnp.isfinite(sd))
        q = sd[jnp.clip(n_valid >> 2, 0, sd.shape[0] - 1)]
        # no valid pair (heavy clipping left <2 in-bounds samples at the
        # roll distances): keep the previous scale instead of collapsing
        # the window to a point
        new_scale = jnp.where(n_valid > 0,
                              q * QN_SCALE * CLIP_SCALE_ADJUST, scale)

        delta = jnp.abs(new_loc - loc) + jnp.abs(new_scale - scale)
        converged = delta <= epsilon
        # On convergence the reference returns the *previous* location
        # (stats.go:491-494), so only advance when not converged.
        loc = jnp.where(converged, loc, new_loc)
        scale = jnp.where(converged, scale, new_scale)
        return i + 1, loc, scale, converged

    def cond(state):
        i, _, _, converged = state
        return jnp.logical_and(i < max_iter, jnp.logical_not(converged))

    _, loc, _, _ = jax.lax.while_loop(cond, body, (0, loc0, scale0, False))

    # Final scale is an unbounded Qn over the sample (stats.go:492).
    final_scale = (
        first_quartile_sorted(jnp.sort(_qn_diffs_roll(sr, None, k_final))) * QN_SCALE
    )
    return loc, final_scale


# ---------------------------------------------------------------------------
# IKSS
# ---------------------------------------------------------------------------


def _masked_median_absdev_sorted(xs: jax.Array, i, j, m, iters: int = 30) -> jax.Array:
    """Median of |xs[i:j] - m| where xs is sorted ascending.

    Because xs is sorted, the count of values with |x - m| <= r is
    searchsorted(m+r, right) - searchsorted(m-r, left); the median absolute
    deviation is found by bisecting r. Avoids materializing/sorting the
    deviations each IKSS iteration.
    """
    cnt = jnp.maximum(j - i, 1)
    half = (cnt + 1) // 2  # need at least this many within radius
    lo_r = jnp.float32(0.0)
    hi_r = jnp.maximum(jnp.abs(xs[j - 1] - m), jnp.abs(xs[i] - m)) + 1e-30

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        c = jnp.searchsorted(xs, m + mid, side="right") - jnp.searchsorted(xs, m - mid, side="left")
        c = c - jnp.maximum(i - jnp.searchsorted(xs, m - mid, side="left"), 0)  # clamp to window
        # Clamp the count to the active window [i, j).
        lo_idx = jnp.maximum(jnp.searchsorted(xs, m - mid, side="left"), i)
        hi_idx = jnp.minimum(jnp.searchsorted(xs, m + mid, side="right"), j)
        c = jnp.maximum(hi_idx - lo_idx, 0)
        return jnp.where(c >= half, lo, mid), jnp.where(c >= half, mid, hi)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo_r, hi_r))
    return hi


@jax.jit
def ikss(data: jax.Array, epsilon: float = 1e-6, e: float = float(2.0**-23)) -> tuple[jax.Array, jax.Array]:
    """Iterative k-sigma location/scale estimator (stats.go:535-566).

    Sorts once, then iteratively shrinks the active window [i, j) to
    median +/- 4*sqrt(bwmv) until the scale stabilizes.
    """
    del e  # reference accepts but does not use its `e` parameter meaningfully
    xs = jnp.sort(data.reshape(-1))
    n = xs.shape[0]
    idx = jnp.arange(n)

    def bwmv(i, j, m):
        """Biweight midvariance of xs[i:j] about m (stats.go:502-532)."""
        mad = _masked_median_absdev_sorted(xs, i, j, m)
        active = jnp.logical_and(idx >= i, idx < j)
        y = (xs - m) / (9.0 * mad + 1e-30)
        a = jnp.logical_and(y > -1.0, y < 1.0)
        w = jnp.where(jnp.logical_and(active, a), 1.0, 0.0)
        xm = xs - m
        one_m_y2 = 1.0 - y * y
        num = jnp.sum(w * xm * xm * one_m_y2**4)
        den = jnp.sum(w * one_m_y2 * (1.0 - 5.0 * y * y))
        cnt = jnp.sum(active)
        return cnt * num / (den * den + 1e-30)

    def body(state):
        i, j, s0, _, _, _ = state
        m = xs[(i + j) // 2]
        s = jnp.sqrt(bwmv(i, j, m))
        done_small = s < epsilon
        done_conv = (s0 - s) < s * epsilon
        done = jnp.logical_or(done_small, done_conv)
        scale = jnp.where(done_small, 0.0, 0.991 * s)
        xlow = m - 4.0 * s
        xhigh = m + 4.0 * s
        new_i = jnp.maximum(i, jnp.searchsorted(xs, xlow, side="left"))
        new_j = jnp.minimum(j, jnp.searchsorted(xs, xhigh, side="right"))
        degenerate = (new_j - new_i) < 1
        return new_i, new_j, s, m, scale, jnp.logical_or(done, degenerate)

    def cond(state):
        return jnp.logical_not(state[5])

    state = (jnp.int32(0), jnp.int32(n), jnp.float32(1.0), xs[n // 2], jnp.float32(0.0), jnp.bool_(False))
    _, _, _, loc, scale, _ = jax.lax.while_loop(cond, body, state)
    return loc, scale


# ---------------------------------------------------------------------------
# Histograms
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames="num_bins")
def histogram(data: jax.Array, vmin: jax.Array, vmax: jax.Array, num_bins: int) -> jax.Array:
    """Histogram with the reference's rounding bin mapping (stats.go:649-654,
    histogram.go:33-42): bin = int((d - min) * (bins-1)/(max-min) + 0.5)."""
    flat = data.reshape(-1)
    value_to_bin = (num_bins - 1) / (vmax - vmin)
    bins = jnp.clip(((flat - vmin) * value_to_bin + 0.5).astype(jnp.int32), 0, num_bins - 1)
    return jnp.zeros(num_bins, jnp.int32).at[bins].add(1)


@partial(jax.jit, static_argnames="num_bins")
def histogram_scale_loc(
    data: jax.Array, vmin: jax.Array, vmax: jax.Array, num_bins: int = 4096
) -> tuple[jax.Array, jax.Array]:
    """Histogram-peak location and 68.27%-interval scale (stats.go:640-688)."""
    bins = histogram(data, vmin, vmax, num_bins)
    n = data.size
    value_to_bin = (num_bins - 1) / (vmax - vmin)

    # Inner peak, avoiding the clipped edge bins (stats.go:657-663).
    inner = bins[1 : num_bins - 1]
    peak_bin = jnp.argmax(inner) + 1
    peak_count = bins[peak_bin]
    loc = vmin + peak_bin.astype(jnp.float32) / value_to_bin

    # Accumulate rings of adjacent bins until one sigma of mass is covered.
    sigma_threshold = jnp.int32(n * 0.6827)
    interval_limit = jnp.minimum(peak_bin, num_bins - 1 - peak_bin)
    i_range = jnp.arange(1, num_bins)
    ring = jnp.where(
        i_range <= interval_limit,
        bins[jnp.clip(peak_bin - i_range, 0, num_bins - 1)]
        + bins[jnp.clip(peak_bin + i_range, 0, num_bins - 1)],
        0,
    )
    cum = peak_count + jnp.cumsum(ring)
    # First ring index i (1-based) at which cum >= threshold.
    reached = cum >= sigma_threshold
    first = jnp.argmax(reached) + 1  # valid when jnp.any(reached)
    i_eff = jnp.where(
        peak_count >= sigma_threshold,
        0,
        jnp.where(jnp.any(reached), jnp.minimum(first, interval_limit), interval_limit),
    )
    scale = 0.5 * (2.0 * i_eff.astype(jnp.float32) + 1.0) / value_to_bin
    scale = jnp.where(vmin == vmax, 0.0, scale)
    loc = jnp.where(vmin == vmax, vmin, loc)
    return loc, scale


# ---------------------------------------------------------------------------
# Noise estimation
# ---------------------------------------------------------------------------


@jax.jit
def estimate_noise(img: jax.Array) -> jax.Array:
    """Immerkaer 1996 noise estimate on a 2D image (noise.go:32-55).

    Applies the 3x3 Laplacian-difference kernel [1,-2,1; -2,4,-2; 1,-2,1]
    via shifted adds (fused elementwise on the VPU), sums absolute responses
    over the interior, and normalizes.
    """
    d = img
    conv = (
        d[:-2, :-2] - 2 * d[:-2, 1:-1] + d[:-2, 2:]
        - 2 * d[1:-1, :-2] + 4 * d[1:-1, 1:-1] - 2 * d[1:-1, 2:]
        + d[2:, :-2] - 2 * d[2:, 1:-1] + d[2:, 2:]
    )
    s = jnp.sum(jnp.abs(conv))
    h, w = img.shape
    factor = math.sqrt(0.5 * math.pi) / (6.0 * (w - 2) * (h - 2))
    return s * factor


# ---------------------------------------------------------------------------
# Linear regression (for linear-fit stacking, stats.go:569-586)
# ---------------------------------------------------------------------------


def linear_regression(xs: jax.Array, ys: jax.Array, axis: int = -1, mask=None):
    """Slope/intercept via the reference's correlation formula
    (stats.go:569-586), vectorized along `axis`. With an optional validity
    mask (for NaN-skipping stacks). Note the reference divides the
    correlation by (n+1), not n; reproduced as-is."""
    if mask is None:
        n = xs.shape[axis]
        xmean = jnp.mean(xs, axis=axis, keepdims=True)
        ymean = jnp.mean(ys, axis=axis, keepdims=True)
        xvar = jnp.mean((xs - xmean) ** 2, axis=axis, keepdims=True)
        yvar = jnp.mean((ys - ymean) ** 2, axis=axis, keepdims=True)
        corr = jnp.sum((xs - xmean) * (ys - ymean), axis=axis, keepdims=True)
        cnt = n
    else:
        cnt = jnp.maximum(jnp.sum(mask, axis=axis, keepdims=True), 1)
        xmean = jnp.sum(jnp.where(mask, xs, 0), axis=axis, keepdims=True) / cnt
        ymean = jnp.sum(jnp.where(mask, ys, 0), axis=axis, keepdims=True) / cnt
        xvar = jnp.sum(jnp.where(mask, (xs - xmean) ** 2, 0), axis=axis, keepdims=True) / cnt
        yvar = jnp.sum(jnp.where(mask, (ys - ymean) ** 2, 0), axis=axis, keepdims=True) / cnt
        corr = jnp.sum(jnp.where(mask, (xs - xmean) * (ys - ymean), 0), axis=axis, keepdims=True)
    xstd = jnp.sqrt(xvar)
    ystd = jnp.sqrt(yvar)
    corr = corr / (xstd * ystd * (cnt + 1) + 1e-30)
    slope = corr * ystd / (xstd + 1e-30)
    intercept = ymean - slope * xmean
    return slope, intercept, xmean, xstd, ymean, ystd


# ---------------------------------------------------------------------------
# Lazy Stats object
# ---------------------------------------------------------------------------

# Global default, like stats.LSEstimator (stats.go:41).
DEFAULT_LS_ESTIMATOR = LSEstimatorMode.SCMedianQn


class Stats:
    """Lazily-computed, cached statistics for an image plane.

    Mirrors the caching/invalidation behavior of the reference Stats object
    (stats.go:44-244): min/mean/max, stddev, location/scale, and noise are
    computed on first access and cached; linear transforms update the cache
    in O(1) via update_cached_with().

    Cached values are either host floats or pipeline.deferred.Deferred
    handles to 0-d device arrays. Computing statistics only DISPATCHES the
    reductions; the first host read resolves every pending value of every
    frame in one batched transfer (see pipeline/deferred.py). Accessors
    return whatever is stored -- Deferred mimics float, so callers are
    oblivious -- and device_location_scale() hands back raw device scalars
    for chaining into further device programs with zero synchronization.
    """

    __slots__ = (
        "_data", "_width", "_min", "_max", "_mean", "_stddev",
        "_location", "_scale", "_noise",
        "_have_mmm", "_have_stddev", "_have_locscale", "_have_noise",
        "mode",
    )

    def __init__(self, data, width: int, mode: LSEstimatorMode | None = None):
        self._data = data  # jax.Array (any shape; flattened for reductions)
        self._width = int(width)
        self.mode = DEFAULT_LS_ESTIMATOR if mode is None else mode
        self._min = self._max = self._mean = self._stddev = 0.0
        self._location = self._scale = self._noise = 0.0
        self._have_mmm = self._have_stddev = self._have_locscale = self._have_noise = False

    @classmethod
    def with_mmm(cls, data, width: int, vmin: float, vmax: float, mean: float,
                 mode: LSEstimatorMode | None = None) -> "Stats":
        s = cls(data, width, mode)
        s._min, s._max, s._mean = float(vmin), float(vmax), float(mean)
        s._have_mmm = True
        return s

    @classmethod
    def with_all(cls, data, width: int, vmin: float, vmax: float, mean: float,
                 location: float, scale: float,
                 mode: LSEstimatorMode | None = None) -> "Stats":
        """Stats with min/mean/max AND location/scale precomputed (the fused
        batch preprocess computes all five in one device program)."""
        s = cls.with_mmm(data, width, vmin, vmax, mean, mode)
        s._location, s._scale = float(location), float(scale)
        s._have_locscale = True
        return s

    @classmethod
    def from_stddev(cls, stddev) -> "Stats":
        """Data-free Stats carrying only a stddev (the median-diff stats kept
        for star detection after BadPixelMap frees its data,
        badpixels.go:37-40). Accepts a float or a pending Deferred."""
        s = cls(None, 0)
        s._stddev = stddev
        s._have_stddev = True
        return s

    @classmethod
    def for_channel(cls, data, width: int, ch: int, mode: LSEstimatorMode | None = None) -> "Stats":
        """Stats over one channel of a (3, H, W) cube (stats.go:70-76)."""
        return cls(data[ch], width, mode)

    # -- data management ---------------------------------------------------
    def set_data(self, data) -> None:
        self._data = data
        self.clear()

    def replace_data(self, data) -> None:
        """Swap the underlying array WITHOUT invalidating caches; pair with
        update_cached_with() after a linear transform (pixelops.go:131-134)."""
        self._data = data

    def free_data(self) -> None:
        self._data = None

    def clear(self) -> None:
        self._have_mmm = self._have_stddev = self._have_locscale = self._have_noise = False

    def _flat(self):
        """1D view of the data for the estimator kernels. Flattening OUTSIDE
        jit makes all image shapes with equal pixel counts share one compiled
        program -- the (H, W)-shaped variants compile ~10x slower on TPU and
        fragment the persistent compilation cache."""
        d = self._data
        if d is None:
            raise ValueError("cannot calculate stats on freed data")
        if hasattr(d, "reshape") and d.ndim != 1:
            return d.reshape(-1)
        return d

    @staticmethod
    def _lin(v, multiplier, offset):
        """x*multiplier + offset on a cached value, staying on device when
        the value is an unresolved Deferred."""
        from nightlight_tpu.deferred import Deferred, defer

        if isinstance(v, Deferred) and not v.resolved:
            return defer(v.array * multiplier + offset)
        return float(v) * multiplier + offset

    def update_cached_with(self, multiplier: float, offset: float) -> None:
        """O(1) cache update after x -> x*multiplier + offset (stats.go:91-99)."""
        self._min = self._lin(self._min, multiplier, offset)
        self._max = self._lin(self._max, multiplier, offset)
        self._mean = self._lin(self._mean, multiplier, offset)
        self._stddev = self._lin(self._stddev, multiplier, 0.0)
        self._location = self._lin(self._location, multiplier, offset)
        self._scale = self._lin(self._scale, multiplier, 0.0)
        self._noise = self._lin(self._noise, multiplier, 0.0)

    # -- accessors ----------------------------------------------------------
    def _ensure_mmm(self) -> None:
        if not self._have_mmm:
            from nightlight_tpu.deferred import defer

            mn, me, mx = min_mean_max(self._flat())
            self._min, self._mean, self._max = defer(mn), defer(me), defer(mx)
            self._have_mmm = True

    @staticmethod
    def _unwrap(v):
        """Resolved Deferreds decay to plain floats (so they can cross jit
        boundaries); pending ones pass through to stay lazy."""
        from nightlight_tpu.deferred import Deferred

        if isinstance(v, Deferred) and v.resolved:
            return float(v.value)
        return v

    @property
    def min(self) -> float:
        self._ensure_mmm()
        return self._unwrap(self._min)

    @property
    def max(self) -> float:
        self._ensure_mmm()
        return self._unwrap(self._max)

    @property
    def mean(self) -> float:
        self._ensure_mmm()
        return self._unwrap(self._mean)

    @property
    def stddev(self) -> float:
        if not self._have_stddev:
            from nightlight_tpu.deferred import defer

            self._ensure_mmm()
            mean_dev = self._device_value(self._mean)
            self._stddev = defer(jnp.sqrt(variance(self._flat(), mean_dev)))
            self._have_stddev = True
        return self._unwrap(self._stddev)

    @property
    def location(self) -> float:
        if not self._have_locscale:
            self._update_location_scale()
        return self._unwrap(self._location)

    @property
    def scale(self) -> float:
        if not self._have_locscale:
            self._update_location_scale()
        return self._unwrap(self._scale)

    @property
    def noise(self) -> float:
        if not self._have_noise:
            from nightlight_tpu.deferred import defer

            d = self._data
            if d.ndim == 1:
                d = d.reshape(-1, self._width)
            elif d.ndim == 3:
                d = d[0]
            self._noise = defer(estimate_noise(d))
            self._have_noise = True
        return self._unwrap(self._noise)

    @staticmethod
    def _device_value(v):
        """A value usable inside jit: the device array of an unresolved
        Deferred (no sync), else the host float."""
        from nightlight_tpu.deferred import Deferred

        if isinstance(v, Deferred) and not v.resolved:
            return v.array
        return jnp.float32(float(v))

    def device_location_scale(self):
        """(location, scale) as device scalars (or floats) WITHOUT host
        synchronization -- for chaining into further device programs
        (star detection thresholds etc.)."""
        if not self._have_locscale:
            self._update_location_scale()
        return self._device_value(self._location), self._device_value(self._scale)

    def device_min_max(self):
        """(min, max) as device scalars (or floats) without synchronization
        -- the dispatch-only counterpart of .min/.max for chaining."""
        self._ensure_mmm()
        return self._device_value(self._min), self._device_value(self._max)

    def _update_location_scale(self) -> None:
        """Dispatch on estimator mode (stats.go:225-244)."""
        from nightlight_tpu.deferred import defer

        mode = self.mode
        if mode == LSEstimatorMode.MeanStdDev:
            self._ensure_mmm()
            _ = self.stddev  # dispatches; stays deferred
            self._location, self._scale = self._mean, self._stddev
        elif mode == LSEstimatorMode.MedianMAD:
            key = jax.random.PRNGKey(0)
            loc = fast_approx_median(self._flat(), key)
            self._location = defer(loc)
            self._scale = defer(fast_approx_mad(self._flat(), loc, jax.random.PRNGKey(1)))
        elif mode == LSEstimatorMode.IKSS:
            loc, scale = ikss(self._flat())
            self._location, self._scale = defer(loc), defer(scale)
        elif mode == LSEstimatorMode.SCMedianQn:
            # Everything DISPATCHES here; nothing is fetched. min/mean/max
            # feed the clip epsilon on device, and all five results resolve
            # together in the pool's next batched transfer.
            flat = self._flat()
            if not self._have_mmm:
                mn, me, mx = min_mean_max(flat)
                self._min, self._mean, self._max = defer(mn), defer(me), defer(mx)
                self._have_mmm = True
            else:
                mn = self._device_value(self._min)
                mx = self._device_value(self._max)
            loc, scale = sigma_clipped_median_qn(
                flat, 2.0, 2.0, (mx - mn) / 65535.0, jax.random.PRNGKey(0))
            self._location, self._scale = defer(loc), defer(scale)
        elif mode == LSEstimatorMode.Histogram:
            self._ensure_mmm()
            loc, scale = histogram_scale_loc(
                self._flat(), self._device_value(self._min),
                self._device_value(self._max), 4096
            )
            self._location, self._scale = defer(loc), defer(scale)
        else:
            raise ValueError(f"unknown LS estimator mode {mode}")
        self._have_locscale = True

    # -- printing (log-format compatible with stats.go:177-222) -------------
    def snapshot_for_log(self) -> "_StatsSnapshot":
        """Immutable view of the current cached values for deferred log
        rendering: later update_cached_with() calls replace the field
        bindings, so the snapshot keeps the values as of the log call."""
        return _StatsSnapshot(
            self._min, self._max, self._mean, self._stddev,
            self._location, self._scale, self._noise,
            self._have_mmm, self._have_stddev, self._have_locscale,
            self._have_noise)

    def __str__(self) -> str:
        return str(self.snapshot_for_log())


class _StatsSnapshot:
    """Frozen Stats field values for a single log line (resolves any pending
    device values only when rendered)."""

    __slots__ = ("_min", "_max", "_mean", "_stddev", "_location", "_scale",
                 "_noise", "_have_mmm", "_have_stddev", "_have_locscale",
                 "_have_noise")

    def __init__(self, mn, mx, mean, stddev, location, scale, noise,
                 have_mmm, have_stddev, have_locscale, have_noise):
        self._min, self._max, self._mean = mn, mx, mean
        self._stddev, self._location, self._scale = stddev, location, scale
        self._noise = noise
        self._have_mmm, self._have_stddev = have_mmm, have_stddev
        self._have_locscale, self._have_noise = have_locscale, have_noise

    def render_deferred(self) -> str:
        return str(self)

    def __str__(self) -> str:
        precision = 6
        if self._have_mmm:
            m = float(self._max)
            if m >= 1_000_000:
                precision = 0
            elif m >= 100_000:
                precision = 1
            elif m >= 10_000:
                precision = 2
            elif m >= 1_000:
                precision = 3
            elif m > 100:
                precision = 4
            elif m > 10:
                precision = 5
        parts = []
        if self._have_mmm:
            parts.append(
                f"Min {self._min:.{precision}f} Max {self._max:.{precision}f} Mean {self._mean:.{precision}f}"
            )
        if self._have_stddev:
            parts.append(f"StdDev {self._stddev:.{precision}f}")
        if self._have_locscale:
            parts.append(f"Location {self._location:.{precision}f} Scale {self._scale:.{precision}f}")
        if self._have_noise:
            parts.append(f"Noise {self._noise:.{precision}f}")
        if not parts:
            return "(no stats yet)"
        return " ".join(parts)
