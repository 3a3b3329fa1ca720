"""Statistics engine tests: estimator correctness against analytic values and
numpy references (the Go reference ships no stats tests; SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nightlight_tpu.ops import stats as st


@pytest.fixture
def gaussian(rng):
    return rng.normal(100.0, 15.0, size=1 << 18).astype(np.float32)


class TestBasicReductions:
    def test_min_mean_max(self, rng):
        d = rng.uniform(-50, 50, size=10000).astype(np.float32)
        mn, me, mx = st.min_mean_max(jnp.asarray(d))
        assert float(mn) == pytest.approx(d.min())
        assert float(mx) == pytest.approx(d.max())
        assert float(me) == pytest.approx(d.mean(), rel=1e-5)

    def test_variance(self, rng):
        d = rng.normal(0, 3, size=10000).astype(np.float32)
        v = st.variance(jnp.asarray(d), jnp.float32(d.mean()))
        assert float(v) == pytest.approx(d.var(), rel=1e-4)


class TestMedianSemantics:
    """Match QSelectMedianFloat32 (qsort.go:68-82)."""

    def test_odd(self):
        d = jnp.asarray(np.array([5.0, 1.0, 3.0], np.float32))
        assert float(st.median_sorted(jnp.sort(d))) == 3.0

    def test_even_averages_middles(self):
        d = jnp.asarray(np.array([4.0, 1.0, 3.0, 2.0], np.float32))
        assert float(st.median_sorted(jnp.sort(d))) == 2.5

    def test_first_quartile_index(self):
        # k = (n>>2)+1 th lowest, i.e. sorted[n>>2] (qsort.go:61-63)
        d = jnp.sort(jnp.asarray(np.arange(8, dtype=np.float32)))
        assert float(st.first_quartile_sorted(d)) == 2.0


class TestSampledEstimators:
    def test_sampled_median_gaussian(self, gaussian):
        loc = st.fast_approx_median(jnp.asarray(gaussian), jax.random.PRNGKey(0))
        assert float(loc) == pytest.approx(100.0, abs=0.5)

    def test_sampled_mad_gaussian(self, gaussian):
        scale = st.fast_approx_mad(jnp.asarray(gaussian), jnp.float32(100.0), jax.random.PRNGKey(0))
        assert float(scale) == pytest.approx(15.0, rel=0.03)

    def test_sampled_qn_gaussian(self, gaussian):
        scale = st.fast_approx_qn(jnp.asarray(gaussian), jax.random.PRNGKey(0))
        assert float(scale) == pytest.approx(15.0, rel=0.03)

    def test_sigma_clipped_median_qn_plain_gaussian(self, gaussian):
        loc, scale = st.sigma_clipped_median_qn(jnp.asarray(gaussian), 2.0, 2.0, 1e-3,
                                                jax.random.PRNGKey(0))
        assert float(loc) == pytest.approx(100.0, abs=0.5)
        assert float(scale) == pytest.approx(15.0, rel=0.05)

    def test_sigma_clipped_rejects_outliers(self, rng):
        # 95% gaussian background + 5% bright "stars": the clipped location
        # must stay near the background peak.
        n = 1 << 18
        d = rng.normal(100.0, 5.0, size=n).astype(np.float32)
        stars = rng.integers(0, n, size=n // 20)
        d[stars] += rng.uniform(100, 5000, size=n // 20).astype(np.float32)
        loc, scale = st.sigma_clipped_median_qn(jnp.asarray(d), 2.0, 2.0, 1e-3,
                                                jax.random.PRNGKey(0))
        assert float(loc) == pytest.approx(100.0, abs=1.5)
        assert float(scale) < 12.0  # un-clipped stddev would be way bigger


class TestIKSS:
    def test_gaussian(self, gaussian):
        loc, scale = st.ikss(jnp.asarray(gaussian))
        assert float(loc) == pytest.approx(100.0, abs=0.3)
        assert float(scale) == pytest.approx(15.0, rel=0.05)

    def test_outlier_robustness(self, rng):
        n = 1 << 16
        d = rng.normal(50.0, 2.0, size=n).astype(np.float32)
        d[rng.integers(0, n, size=n // 50)] = 10000.0
        loc, scale = st.ikss(jnp.asarray(d))
        assert float(loc) == pytest.approx(50.0, abs=0.5)
        assert float(scale) == pytest.approx(2.0, rel=0.2)


class TestHistogram:
    def test_histogram_counts(self, rng):
        d = rng.uniform(0, 1, size=10000).astype(np.float32)
        bins = st.histogram(jnp.asarray(d), jnp.float32(0.0), jnp.float32(1.0), 64)
        assert int(jnp.sum(bins)) == 10000

    def test_scale_loc_gaussian(self, gaussian):
        g = jnp.asarray(gaussian)
        loc, scale = st.histogram_scale_loc(g, jnp.float32(gaussian.min()),
                                            jnp.float32(gaussian.max()), 4096)
        # histogram-peak argmax has inherent Poisson jitter of a few units
        # (the reference estimator behaves identically)
        assert float(loc) == pytest.approx(100.0, abs=5.0)
        assert float(scale) == pytest.approx(15.0, rel=0.1)

    def test_degenerate_range(self):
        d = jnp.ones(100, jnp.float32) * 5.0
        loc, scale = st.histogram_scale_loc(d, jnp.float32(5.0), jnp.float32(5.0), 64)
        assert float(loc) == 5.0
        assert float(scale) == 0.0


class TestNoise:
    def test_pure_gaussian_noise(self, rng):
        img = rng.normal(0, 3.0, size=(256, 256)).astype(np.float32)
        noise = st.estimate_noise(jnp.asarray(img))
        assert float(noise) == pytest.approx(3.0, rel=0.05)

    def test_smooth_image_low_noise(self):
        y, x = np.mgrid[0:128, 0:128].astype(np.float32)
        img = x * 2.0 + y * 3.0  # smooth gradient: Laplacian kernel nulls it
        noise = st.estimate_noise(jnp.asarray(img))
        assert float(noise) == pytest.approx(0.0, abs=1e-3)


class TestLinearRegression:
    def test_perfect_line(self):
        xs = jnp.arange(20, dtype=jnp.float32)
        ys = 2.5 * xs + 1.0
        slope, intercept, *_ = st.linear_regression(xs, ys)
        # Note: reference divides correlation by (n+1), biasing the slope by
        # n/(n+1) (stats.go:579); we reproduce that bias.
        n = 20
        assert float(slope.squeeze()) == pytest.approx(2.5 * n / (n + 1), rel=1e-3)


class TestStatsObject:
    def test_lazy_and_cached(self, rng):
        d = jnp.asarray(rng.uniform(0, 100, size=(64, 64)).astype(np.float32))
        s = st.Stats(d, 64)
        m1 = s.mean
        s.update_cached_with(2.0, 10.0)
        assert s.mean == pytest.approx(m1 * 2.0 + 10.0, rel=1e-6)

    def test_location_scale_default_mode(self, gaussian):
        s = st.Stats(jnp.asarray(gaussian), 512)
        assert s.location == pytest.approx(100.0, abs=0.5)
        assert s.scale == pytest.approx(15.0, rel=0.05)

    def test_str_format(self, rng):
        d = jnp.asarray(rng.uniform(0, 50, size=(32, 32)).astype(np.float32))
        s = st.Stats(d, 32)
        assert str(s) == "(no stats yet)"
        _ = s.min
        out = str(s)
        assert out.startswith("Min ") and "Max " in out and "Mean " in out


class TestRollPairsQn:
    """The roll-pair Qn sampler (_qn_diffs_roll) vs the random-index-gather
    pair sampler it replaced on the hot path: same pair distribution (two
    distinct iid sample entries), so the quartile estimates must agree to
    sampling noise on a known-sigma gaussian."""

    def test_unbiased_vs_gather_pairs(self):
        import jax

        from nightlight_tpu.ops.stats import (NUM_SAMPLES, QN_SCALE, _sample,
                                              _qn_diffs_roll, _qn_pairs_from,
                                              first_quartile_sorted)

        data = jax.random.normal(jax.random.PRNGKey(99), (1 << 20,)) * 2.0
        g, r = [], []
        for i in range(8):
            k1, k2 = jax.random.split(jax.random.PRNGKey(i))
            s = _sample(data, k1, NUM_SAMPLES)
            g.append(float(first_quartile_sorted(jnp.sort(
                _qn_pairs_from(s, 0, NUM_SAMPLES, k2, NUM_SAMPLES))) * QN_SCALE))
            r.append(float(first_quartile_sorted(jnp.sort(
                _qn_diffs_roll(s, None, k2))) * QN_SCALE))
        # each mean has se ~ 0.011/sqrt(8) ~ 0.004; 4 sigma band
        assert abs(np.mean(g) - np.mean(r)) < 0.016
        assert abs(np.mean(r) - 2.0) < 0.016

    def test_masked_pairs_drop_clipped_endpoints(self):
        import jax

        from nightlight_tpu.ops.stats import (_first_quartile_valid,
                                              _qn_diffs_roll)

        s = jnp.asarray(np.r_[np.full(500, 5.0), np.full(500, 1000.0)],
                        jnp.float32)
        mask = s < 100.0  # clip the high half
        d = _qn_diffs_roll(s, mask, jax.random.PRNGKey(0), rolls=2)
        finite = np.asarray(d)[np.isfinite(np.asarray(d))]
        # all valid pairs are 5-vs-5 -> diff 0; any 1000-crossing pair would
        # show up as 995
        assert finite.size > 0 and np.all(finite == 0.0)
        assert float(_first_quartile_valid(d)) == 0.0

    def test_quartile_all_invalid_is_zero(self):
        from nightlight_tpu.ops.stats import _first_quartile_valid

        assert float(_first_quartile_valid(jnp.full(64, jnp.inf))) == 0.0
