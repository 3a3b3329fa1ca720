"""Gaussian kernel/USM (golden vectors modeled on the reference's
usm_test.go:29-228), debanding, and background extraction tests."""

import io

import numpy as np
import jax.numpy as jnp
import pytest

from nightlight_tpu.ops.gauss import gaussian_kernel_1d, gaussian_blur, unsharp_mask
from nightlight_tpu.ops.deband import deband
from nightlight_tpu.ops.background import Background


class TestGaussianKernel:
    """Golden vectors from the reference's usm_test.go:31-37."""

    GOLDEN = {
        1.0: [0.27901, 0.44198, 0.27901],
        2.0: [0.028532, 0.067234, 0.124009, 0.179044, 0.20236,
              0.179044, 0.124009, 0.067234, 0.028532],
        3.0: [0.018816, 0.034474, 0.056577, 0.083173, 0.109523, 0.129188,
              0.136498, 0.129188, 0.109523, 0.083173, 0.056577, 0.034474,
              0.018816],
    }

    @pytest.mark.parametrize("sigma", [1.0, 2.0, 3.0])
    def test_golden_kernels(self, sigma):
        k = gaussian_kernel_1d(sigma)
        np.testing.assert_allclose(k, self.GOLDEN[sigma], atol=1e-5)

    @pytest.mark.parametrize("sigma", [0.5, 1.0, 1.5, 2.0, 3.0])
    def test_kernel_sums_to_one(self, sigma):
        assert gaussian_kernel_1d(sigma).sum() == pytest.approx(1.0, abs=1e-6)

    def test_kernel_symmetric(self):
        k = gaussian_kernel_1d(2.0)
        np.testing.assert_allclose(k, k[::-1])


class TestGaussBlur:
    def test_delta_impulse_spreads_to_kernel(self):
        """usm_test.go:100+: blurring a delta impulse reproduces the kernel
        as the outer product."""
        img = np.zeros((15, 15), np.float32)
        img[7, 7] = 1.0
        out = np.asarray(gaussian_blur(jnp.asarray(img), 1.0))
        k = gaussian_kernel_1d(1.0)
        expected = np.outer(k, k)
        r = len(k) // 2
        np.testing.assert_allclose(out[7 - r : 7 + r + 1, 7 - r : 7 + r + 1], expected, atol=1e-6)
        assert out.sum() == pytest.approx(1.0, abs=1e-5)

    def test_constant_image_unchanged(self):
        img = np.full((16, 16), 5.0, np.float32)
        out = np.asarray(gaussian_blur(jnp.asarray(img), 2.0))
        np.testing.assert_allclose(out, img, rtol=1e-5)


class TestUnsharpMask:
    def test_sharpens_edge_above_threshold(self, rng):
        img = np.full((16, 32), 1.0, np.float32)
        img[:, 16:] = 10.0
        out = np.asarray(unsharp_mask(jnp.asarray(img), 1.5, 1.0, 1.0, 10.0, 2.0))
        # overshoot at the bright side of the edge would exceed 10 but clips to max
        assert out.max() <= 10.0
        assert out.min() >= 1.0
        # below-threshold pixels unchanged
        np.testing.assert_allclose(out[:, :8], img[:, :8])

    def test_zero_gain_identity_above_threshold(self, rng):
        img = rng.uniform(2, 5, size=(12, 12)).astype(np.float32)
        out = np.asarray(unsharp_mask(jnp.asarray(img), 1.5, 0.0, 0.0, 10.0, 0.0))
        np.testing.assert_allclose(out, img, rtol=1e-6)


class TestDeband:
    def test_removes_row_banding(self, rng):
        h, w = 64, 128
        img = rng.normal(100.0, 1.0, size=(h, w)).astype(np.float32)
        gains = 1.0 + 0.1 * np.sin(np.arange(h) * 1.3).astype(np.float32)
        banded = img * gains[:, None]
        out, lo, hi, _ = deband(jnp.asarray(banded), 50.0, 32, 0.0, 100.0, 1.0, True)
        out = np.asarray(out)
        row_means = out.mean(axis=1)
        assert row_means.std() < banded.mean(axis=1).std() * 0.3
        assert lo < 1.0 < hi

    def test_vertical(self, rng):
        h, w = 64, 64
        img = rng.normal(100.0, 1.0, size=(h, w)).astype(np.float32)
        gains = 1.0 + 0.1 * np.sin(np.arange(w) * 1.1).astype(np.float32)
        banded = img * gains[None, :]
        out, *_ = deband(jnp.asarray(banded), 50.0, 32, 0.0, 100.0, 1.0, False)
        col_means = np.asarray(out).mean(axis=0)
        assert col_means.std() < banded.mean(axis=0).std() * 0.3

    def test_window_zero_is_noop(self, rng):
        """window<=0 must no-op on BOTH ops (OpDebandHoriz mirrors the
        reference guard banding.go:62; the reference's vertical op lacks it
        and panics — deliberate divergence). Reaching deband_core with w=0
        would fail at trace time on the (n, 0) window gather."""
        from nightlight_tpu.image import Image
        from nightlight_tpu.pipeline.context import Context
        from nightlight_tpu.pipeline.ops_pre import OpDebandHoriz, OpDebandVert

        img = Image.from_naxisn(
            [16, 16], rng.normal(100.0, 1.0, size=(16, 16)).astype(np.float32))
        c = Context(log=io.StringIO())
        for op in (OpDebandVert(percentile=50.0, window=0, sigma=3.0),
                   OpDebandHoriz(percentile=50.0, window=-5, sigma=3.0)):
            assert op.is_noop()
            out = op.apply(img, c)
            np.testing.assert_array_equal(np.asarray(out.data),
                                          np.asarray(img.data))

    def test_threshold_excludes_stars(self, rng):
        h, w = 32, 256
        img = rng.normal(100.0, 1.0, size=(h, w)).astype(np.float32)
        img[10, 50:60] = 10000.0  # bright star should not skew row percentile
        out, lo, hi, thresh = deband(jnp.asarray(img), 50.0, 16, 3.0, 100.0, 1.0, True)
        assert thresh == pytest.approx(103.0)
        assert 0.95 < lo <= hi < 1.05


class TestBackground:
    def test_recovers_gradient(self, rng):
        h, w = 128, 128
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        gradient = 50.0 + 0.2 * xx + 0.1 * yy
        img = gradient + rng.normal(0, 0.5, size=(h, w)).astype(np.float32)
        bg = Background(jnp.asarray(img), grid_spacing=32, sigma=1.5, back_clip=0,
                        stars=None, hfr_factor=4.0)
        rendered = np.asarray(bg.render())
        assert rendered.shape == (h, w)
        # interior of the model should track the gradient closely
        err = np.abs(rendered - gradient)[16:-16, 16:-16]
        assert err.mean() < 1.0

    def test_subtract_flattens(self, rng):
        h, w = 128, 128
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        gradient = 50.0 + 0.3 * xx
        img = gradient + rng.normal(0, 0.5, size=(h, w)).astype(np.float32)
        bg = Background(jnp.asarray(img), 32, 1.5, 0, None, 4.0)
        flat = np.asarray(bg.subtract(jnp.asarray(img)))
        assert np.abs(flat[16:-16, 16:-16].mean()) < 1.0
        assert flat[16:-16, 16:-16].std() < 2.0

    def test_star_masking(self, rng):
        from tests.test_stars import synth_field
        from nightlight_tpu.detect.stars import find_stars

        img = synth_field(rng, h=128, w=128, stars=[(64.0, 64.0)], flux=50000, noise=0.5)
        stars, _ = find_stars(jnp.asarray(img), 100.0, 0.5, 10.0, 0.0, 1.4, 16)
        assert len(stars) == 1
        bg = Background(jnp.asarray(img), 32, 1.5, 0, stars, hfr_factor=4.0)
        # the star must not pull the background up
        assert bg.max < 103.0

    def test_string_format(self, rng):
        img = rng.normal(10, 1, size=(64, 64)).astype(np.float32)
        bg = Background(jnp.asarray(img), 16, 1.5, 0, None, 4.0)
        s = str(bg)
        assert s.startswith("Background grid 16 cells 4x4 outliers 0 range [")


class TestDebandDeviceFactors:
    """The vectorized device window-median must equal the original host loop
    (banding.go:96-162 semantics) including the edge extrapolation."""

    def test_matches_host_loop(self, rng):
        import jax.numpy as jnp
        import numpy as np

        from nightlight_tpu.ops.deband import (
            _window_median_factors, _window_median_factors_device)

        for n, w in [(64, 16), (64, 15), (100, 100), (37, 8), (256, 33)]:
            p = rng.uniform(50.0, 150.0, size=n).astype(np.float32)
            host = _window_median_factors(p, w)
            dev = np.asarray(_window_median_factors_device(
                jnp.asarray(p), min(w, n)))
            np.testing.assert_allclose(dev, host, rtol=1e-6, atol=1e-6,
                                       err_msg=f"n={n} w={w}")

    def test_deband_is_dispatch_only(self, rng):
        """deband() must not synchronize: its scalar returns are pending
        Deferreds resolved at the next pool flush."""
        import jax.numpy as jnp

        from nightlight_tpu.deferred import get_pool, is_pending
        from nightlight_tpu.ops.deband import deband

        img = jnp.asarray(rng.normal(100, 3, size=(64, 48)).astype(np.float32))
        before = get_pool().flush_count
        out, lo, hi, thr = deband(img, 50.0, 16, 3.0,
                                  jnp.float32(100.0), jnp.float32(3.0), True)
        assert get_pool().flush_count == before
        assert is_pending(lo) and is_pending(hi) and is_pending(thr)
        assert 0.5 < float(lo) <= 1.0 and float(hi) >= float(lo)
