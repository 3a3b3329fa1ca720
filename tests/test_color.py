"""Color-space conversion tests: HSLuv reference values from hsluv.org's
published snapshot, round-trips, and chroma/hue kernel behavior."""

import numpy as np
import jax.numpy as jnp
import pytest

from nightlight_tpu.ops import color as col


def cube(*pixels):
    """Build a (3, 1, N) cube from (c0, c1, c2) pixel tuples."""
    arr = np.array(pixels, np.float32).T.reshape(3, 1, -1)
    return jnp.asarray(arr)


def pix(c, i=0):
    return np.asarray(c)[:, 0, i]


class TestHSLuv:
    """Reference values from the hsluv.org test snapshot (sRGB hex -> HSLuv).
    Our pipeline starts from LINEAR rgb, so sRGB values are uncompanded
    first -- matching the reference which feeds colorful.LinearRgb
    (pixelops.go:380-388)."""

    @pytest.mark.parametrize(
        "srgb,expected",
        [
            ((1.0, 0.0, 0.0), (12.177, 1.0, 0.53237)),   # #ff0000
            ((0.0, 1.0, 0.0), (127.715, 1.0, 0.87736)),  # #00ff00
            ((0.0, 0.0, 1.0), (265.874, 1.0, 0.32301)),  # #0000ff
        ],
    )
    def test_known_values(self, srgb, expected):
        lin = col.srgb_uncompand(jnp.asarray(np.array(srgb, np.float32)))
        c = cube(tuple(np.asarray(lin)))
        out = pix(col.linrgb_to_hsluv(c))
        assert out[0] == pytest.approx(expected[0], abs=0.05)
        assert out[1] == pytest.approx(expected[1], abs=1e-3)
        assert out[2] == pytest.approx(expected[2], abs=1e-3)

    def test_roundtrip(self, rng):
        rgb = jnp.asarray(rng.uniform(0.01, 0.95, size=(3, 8, 8)).astype(np.float32))
        back = col.hsluv_to_linrgb(col.linrgb_to_hsluv(rgb))
        np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=2e-3)

    def test_gray_has_zero_saturation(self):
        c = cube((0.5, 0.5, 0.5))
        out = pix(col.linrgb_to_hsluv(c))
        assert out[1] == pytest.approx(0.0, abs=1e-4)

    def test_color_preserving_clamp(self):
        # Out-of-gamut (saturation forced beyond max): result scaled so
        # max channel == 1, preserving hue ratios (pixelops.go:417-428).
        hsl = cube((12.0, 1.0, 0.999))
        rgb = pix(col.hsluv_to_linrgb(hsl))
        assert rgb.max() <= 1.0 + 1e-5

    def test_mono_lum_matches_full_path(self, rng):
        vals = rng.uniform(0.01, 1.0, size=16).astype(np.float32)
        lum_fast = np.asarray(col.mono_to_hsluv_lum(jnp.asarray(vals)))
        gray = jnp.asarray(np.broadcast_to(vals, (3, 1, 16)).copy())
        lum_full = np.asarray(col.linrgb_to_hsluv(gray))[2, 0]
        np.testing.assert_allclose(lum_fast, lum_full, atol=1e-5)


class TestHCL:
    def test_roundtrip(self, rng):
        rgb = jnp.asarray(rng.uniform(0.05, 0.9, size=(3, 4, 4)).astype(np.float32))
        back = col.hcl_to_linrgb(col.linrgb_to_hcl(rgb))
        np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=2e-3)

    def test_red_hue(self):
        c = cube((0.8, 0.05, 0.05))
        h = pix(col.linrgb_to_hcl(c))[0]
        assert 0 <= h <= 60 or 340 <= h < 360


class TestXyy:
    def test_roundtrip(self, rng):
        rgb = jnp.asarray(rng.uniform(0.05, 0.9, size=(3, 4, 4)).astype(np.float32))
        back = col.xyy_to_linrgb(col.linrgb_to_xyy(rgb))
        np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=2e-3)

    def test_luminance_channel(self):
        c = cube((0.2, 0.4, 0.1))
        xyy = pix(col.linrgb_to_xyy(c))
        xyz = np.asarray(col.linrgb_to_xyz(c))[:, 0, 0]
        assert xyy[2] == pytest.approx(float(xyz[1]), rel=1e-5)


class TestChromaKernels:
    def test_adjust_chroma_thresholded(self):
        c = cube((100.0, 0.25, 0.1), (100.0, 0.25, 0.9))
        out = col.adjust_chroma(c, 2.0, 0.5)
        assert pix(out, 0)[1] == pytest.approx(0.25)  # below threshold: unchanged
        assert pix(out, 1)[1] == pytest.approx(0.25 ** 0.5, rel=1e-5)

    def test_selective_saturation_range(self):
        c = cube((300.0, 0.5, 0.5), (100.0, 0.5, 0.5))
        out = col.adjust_chroma_for_hues(c, 295.0, 40.0, 0.0)  # wraps through 0
        assert pix(out, 0)[1] == pytest.approx(0.0)
        assert pix(out, 1)[1] == pytest.approx(0.5)

    def test_rotate_colors(self):
        c = cube((150.0, 0.5, 0.8), (150.0, 0.5, 0.1))
        out = col.rotate_colors(c, 100.0, 190.0, -30.0, 0.5)
        assert pix(out, 0)[0] == pytest.approx(120.0)
        assert pix(out, 1)[0] == pytest.approx(150.0)  # below lum threshold

    def test_scnr_reduces_green(self):
        green = cube((127.7, 1.0, 0.6))
        out = pix(col.scnr(green, 1.0))
        rgb_before = pix(col.hsluv_to_linrgb(green))
        rgb_after = pix(col.hsluv_to_linrgb(cube(tuple(out))))
        # green dominance must drop
        assert rgb_after[1] - 0.5 * (rgb_after[0] + rgb_after[2]) < \
               rgb_before[1] - 0.5 * (rgb_before[0] + rgb_before[2])

    def test_neutralize_background(self):
        c = cube((10.0, 0.8, 0.1), (10.0, 0.8, 0.9))
        out = col.neutralize_background(c, 0.5, 0.7)
        assert pix(out, 0)[1] == pytest.approx(0.0)  # below low: chroma zeroed
        assert pix(out, 1)[1] == pytest.approx(0.8)  # above: kept


class TestStarColorDevice:
    def test_device_matches_host(self, rng):
        """mean_star_intensity_device is the production path (OpRGBBalance);
        the host implementation is the retained reference (rgb.go:223-281).
        Cross-check the two on a random cube with edge-hugging stars so a
        numerical divergence in the device masks cannot land silently."""
        import jax.numpy as jnp

        from nightlight_tpu.detect.stars import StarList
        from nightlight_tpu.ops.rgb import (mean_star_intensity,
                                            mean_star_intensity_device)

        h, w = 64, 96
        cube = rng.uniform(0.0, 1000.0, size=(3, h, w)).astype(np.float32)
        n = 12
        xs = rng.uniform(4, w - 5, n).astype(np.float32)
        ys = rng.uniform(4, h - 5, n).astype(np.float32)
        xs[0], ys[0] = 0.4, 1.2            # window clipped at the corner
        xs[1], ys[1] = w - 1.2, h - 0.6    # opposite corner
        stars = StarList(
            x=xs, y=ys, value=np.ones(n, np.float32),
            mass=np.linspace(5000, 100, n).astype(np.float32),
            hfr=rng.uniform(1.0, 4.0, n).astype(np.float32), count=n)
        clip = (900.0, 920.0, 940.0)
        for skip_b, skip_d in ((0.0, 0.0), (0.15, 0.15), (0.5, 0.5)):
            want = mean_star_intensity(cube, stars, skip_b, skip_d, clip)
            got = mean_star_intensity_device(
                jnp.asarray(cube), stars, skip_b, skip_d,
                tuple(jnp.float32(c) for c in clip))
            got3 = (0.0, 0.0, 0.0) if got is None else tuple(np.asarray(got))
            np.testing.assert_allclose(got3, want, rtol=2e-5, atol=1e-4)

    def test_empty_and_all_skipped(self):
        from nightlight_tpu.detect.stars import StarList
        from nightlight_tpu.ops.rgb import mean_star_intensity_device

        cube = np.zeros((3, 8, 8), np.float32)
        assert mean_star_intensity_device(cube, StarList.empty(), 0.0, 0.0,
                                          (1.0, 1.0, 1.0)) is None
