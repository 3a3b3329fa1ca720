"""Tests for the auxiliary inventory: OkLab/B-V color, exact sigma-clipped
median/MAD, bounded estimators, half-sample mode, perceptual histogram,
Gaussian-fit mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nightlight_tpu.ops import color_extra as ce
from nightlight_tpu.ops import stats_extra as se
from nightlight_tpu.ops.stats import histogram


class TestOkLab:
    def test_white_point(self):
        # OkLab maps linear white (1,1,1) to L=1, a=b=0
        rgb = jnp.ones((3, 1, 1), jnp.float32)
        lab = np.asarray(ce.linrgb_to_oklab(rgb)).ravel()
        assert lab[0] == pytest.approx(1.0, abs=1e-3)
        assert abs(lab[1]) < 1e-3 and abs(lab[2]) < 1e-3

    def test_roundtrip(self, rng):
        rgb = jnp.asarray(rng.uniform(0.05, 0.95, size=(3, 4, 4)).astype(np.float32))
        back = ce.oklab_to_linrgb(ce.linrgb_to_oklab(rgb))
        np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=2e-3)

    def test_hcl_roundtrip(self, rng):
        rgb = jnp.asarray(rng.uniform(0.05, 0.95, size=(3, 4, 4)).astype(np.float32))
        lab = ce.linrgb_to_oklab(rgb)
        back = ce.okhcl_to_oklab(ce.oklab_to_okhcl(lab))
        np.testing.assert_allclose(np.asarray(back), np.asarray(lab), atol=1e-5)


class TestBV:
    def test_table_endpoints(self):
        # bv.go table: -0.4 -> blue-ish, 2.0 -> orange/red
        blue = ce.bv_to_rgb(-0.4)
        red = ce.bv_to_rgb(2.0)
        np.testing.assert_allclose(blue, [0.60784, 0.69804, 1.0], atol=1e-5)
        np.testing.assert_allclose(red, [1.0, 0.32157, 0.0], atol=1e-5)

    def test_interpolation_and_clamping(self):
        mid = ce.bv_to_rgb(-0.375)  # halfway between first two entries
        np.testing.assert_allclose(mid, [(0.60784 + 0.61961) / 2, (0.69804 + 0.70980) / 2, 1.0],
                                   atol=1e-5)
        np.testing.assert_allclose(ce.bv_to_rgb(-5.0), ce.bv_to_rgb(-0.4))
        np.testing.assert_allclose(ce.bv_to_rgb(9.0), ce.bv_to_rgb(2.0))


class TestSigmaClippedMedianMAD:
    def test_gaussian(self, rng):
        d = rng.normal(10.0, 2.0, size=20000).astype(np.float32)
        med, mad = se.sigma_clipped_median_and_mad(jnp.asarray(d), 3.0, 3.0)
        assert float(med) == pytest.approx(10.0, abs=0.1)
        assert float(mad) == pytest.approx(2.0, rel=0.05)

    def test_outlier_robust_location(self, rng):
        d = rng.normal(10.0, 1.0, size=20000).astype(np.float32)
        d[:500] = 1000.0
        med, mad = se.sigma_clipped_median_and_mad(jnp.asarray(d), 2.0, 2.0)
        assert float(med) == pytest.approx(10.0, abs=0.2)


class TestBoundedEstimators:
    def test_bounded_median_excludes_outliers(self, rng):
        d = rng.normal(50.0, 2.0, size=100000).astype(np.float32)
        d[:5000] = 500.0
        med = se.fast_approx_bounded_median(jnp.asarray(d), 40.0, 60.0, jax.random.PRNGKey(0))
        assert float(med) == pytest.approx(50.0, abs=0.3)

    def test_bounded_mad(self, rng):
        d = rng.normal(50.0, 2.0, size=100000).astype(np.float32)
        mad = se.fast_approx_bounded_mad(jnp.asarray(d), jnp.float32(50.0), 40.0, 60.0,
                                         jax.random.PRNGKey(0))
        assert float(mad) == pytest.approx(2.0, rel=0.1)

    def test_bounded_stddev(self, rng):
        d = rng.normal(50.0, 2.0, size=100000).astype(np.float32)
        sd = se.fast_approx_bounded_stddev(jnp.asarray(d), jnp.float32(50.0), 40.0, 60.0,
                                           jax.random.PRNGKey(0))
        assert float(sd) == pytest.approx(2.0, rel=0.1)

    def test_bounded_qn(self, rng):
        d = rng.normal(50.0, 2.0, size=100000).astype(np.float32)
        qn = se.fast_approx_bounded_qn(jnp.asarray(d), 40.0, 60.0, jax.random.PRNGKey(0))
        assert float(qn) == pytest.approx(2.0, rel=0.1)


class TestHalfSampleMode:
    def test_finds_mode(self, rng):
        # bimodal: narrow dense mode at 5, broad spread at 20
        d = np.concatenate([rng.normal(5.0, 0.2, size=5000),
                            rng.normal(20.0, 5.0, size=3000)])
        assert se.half_sample_mode(d) == pytest.approx(5.0, abs=0.3)

    def test_small_inputs(self):
        assert se.half_sample_mode([3.0]) == 3.0
        assert se.half_sample_mode([3.0, 5.0]) == 4.0


class TestHistogramUtilities:
    def test_get_peak(self, rng):
        d = rng.normal(100.0, 5.0, size=100000).astype(np.float32)
        bins = np.asarray(histogram(jnp.asarray(d), jnp.float32(d.min()), jnp.float32(d.max()), 512))
        x, y = se.get_peak(bins, float(d.min()), float(d.max()))
        assert x == pytest.approx(100.0, abs=2.0)
        assert y > 0

    def test_gaussian_fit_mode(self, rng):
        d = rng.normal(100.0, 5.0, size=200000).astype(np.float32)
        bins = np.asarray(histogram(jnp.asarray(d), jnp.float32(d.min()), jnp.float32(d.max()), 256))
        mode, stddev = se.get_mode_stddev_from_histogram(bins, float(d.min()), float(d.max()))
        assert mode == pytest.approx(100.0, abs=1.0)
        assert stddev == pytest.approx(5.0, rel=0.15)

    def test_perceptual_histogram_roundtrip(self, rng):
        d = rng.uniform(0.0, 1.0, size=50000).astype(np.float32) ** 3  # skewed dark
        bins = se.perceptual_histogram(d, 0.0, 1.0, 256)
        assert bins.sum() == 50000
        x, _ = se.get_perceptual_histogram_peak(bins, 0.0, 1.0)
        assert 0.0 <= x <= 1.0
