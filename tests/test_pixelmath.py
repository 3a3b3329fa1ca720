"""Point-op/curve tests (reference: internal/fits/pixelops.go)."""

import numpy as np
import jax.numpy as jnp
import pytest

from nightlight_tpu.ops import pixelmath as pm


class TestLinearOps:
    def test_scale_offset(self, rng):
        d = rng.uniform(size=100).astype(np.float32)
        out = np.asarray(pm.scale_offset(jnp.asarray(d), 2.0, 0.5))
        np.testing.assert_allclose(out, d * 2 + 0.5, rtol=1e-6)

    def test_normalize(self, rng):
        d = rng.uniform(10, 50, size=100).astype(np.float32)
        out = np.asarray(pm.normalize(jnp.asarray(d), float(d.min()), float(d.max())))
        assert out.min() == pytest.approx(0.0, abs=1e-6)
        assert out.max() == pytest.approx(1.0, abs=1e-6)

    def test_match_histogram(self, rng):
        d = rng.normal(5, 2, size=1000).astype(np.float32)
        out = np.asarray(pm.match_histogram(jnp.asarray(d), 5.0, 2.0, 10.0, 4.0))
        np.testing.assert_allclose(out, d * 2.0 + 0.0, rtol=1e-5)


class TestGamma:
    def test_gamma(self, rng):
        d = rng.uniform(size=100).astype(np.float32)
        out = np.asarray(pm.gamma(jnp.asarray(d), 2.0))
        np.testing.assert_allclose(out, d ** 0.5, rtol=1e-5)

    def test_partial_gamma_outside_unchanged(self, rng):
        d = np.array([0.05, 0.5, 0.95], np.float32)
        out = np.asarray(pm.partial_gamma(jnp.asarray(d), 0.1, 0.9, 2.0))
        assert out[0] == pytest.approx(0.05)
        assert out[2] == pytest.approx(0.95)
        # inside gets boosted
        dd = (0.5 - 0.1) / 0.8
        assert out[1] == pytest.approx(0.1 + dd ** 0.5 * 0.8, rel=1e-5)


class TestMidtones:
    def test_endpoint_mapping(self):
        # the reference's MTF keeps 1 -> 1 and maps `black`-relative shadows down
        d = np.array([1.0], np.float32)
        out = np.asarray(pm.midtones(jnp.asarray(d), 0.2, 0.05))
        assert out[0] == pytest.approx(1.0, rel=1e-5)


class TestShiftBlack:
    def test_before_maps_to_after(self):
        d = np.array([0.3], np.float32)
        out = np.asarray(pm.shift_black_to_move(jnp.asarray(d), 0.3, 0.1))
        assert out[0] == pytest.approx(0.1, rel=1e-5)

    def test_clamps_at_zero(self):
        d = np.array([0.0], np.float32)
        out = np.asarray(pm.shift_black_to_move(jnp.asarray(d), 0.3, 0.1))
        assert out[0] >= 0.0


class TestSetBlackWhite:
    def test_clip_percentages(self, rng):
        d = rng.uniform(0, 1, size=(100, 100)).astype(np.float32)
        out, black_x, white_x, bf, wf = pm.set_black_white(jnp.asarray(d), 1.0, 1.0)
        out = np.asarray(out)
        assert out.min() >= 0.0 and out.max() <= 1.0
        # roughly 1% clipped at each end
        assert float(bf) <= 0.011
        assert float(wf) <= 0.011
        assert 0.0 < float(black_x) < float(white_x) < 1.0
