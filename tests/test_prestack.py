"""Pre-stack kernel tests: 3x3 median network, bad-pixel repair, calibration,
debayer (modeled on the reference's debayer_test.go and
badpixels_bayer_test.go), and bayer cosmetic correction."""

import numpy as np
import jax.numpy as jnp
import pytest

from nightlight_tpu.ops import prestack as ps


class TestMedian9:
    def test_network_equals_numpy_median(self, rng):
        planes = [jnp.asarray(rng.normal(size=(16, 16)).astype(np.float32)) for _ in range(9)]
        out = ps.median9(planes)
        stacked = np.stack([np.asarray(p) for p in planes])
        np.testing.assert_allclose(np.asarray(out), np.median(stacked, axis=0), rtol=1e-6)


class TestMedianFilter3x3:
    def test_interior_matches_numpy(self, rng):
        img = rng.normal(100, 10, size=(12, 17)).astype(np.float32)
        out = np.asarray(ps.median_filter_3x3(jnp.asarray(img)))
        for y in range(1, 11):
            for x in range(1, 16):
                patch = img[y - 1 : y + 2, x - 1 : x + 2]
                assert out[y, x] == pytest.approx(np.median(patch), rel=1e-6)

    def test_borders_pass_through(self, rng):
        img = rng.normal(size=(8, 8)).astype(np.float32)
        out = np.asarray(ps.median_filter_3x3(jnp.asarray(img)))
        np.testing.assert_array_equal(out[0], img[0])
        np.testing.assert_array_equal(out[-1], img[-1])
        np.testing.assert_array_equal(out[:, 0], img[:, 0])
        np.testing.assert_array_equal(out[:, -1], img[:, -1])


class TestBadPixelRepair:
    def test_hot_pixel_removed(self, rng):
        img = rng.normal(100, 2, size=(32, 32)).astype(np.float32)
        img[10, 12] = 5000.0  # hot pixel
        img[20, 5] = -3000.0  # cold pixel
        repaired, n_bad, std = ps.bad_pixel_repair(jnp.asarray(img), 3.0, 3.0)
        repaired = np.asarray(repaired)
        assert abs(repaired[10, 12] - 100) < 20
        assert abs(repaired[20, 5] - 100) < 20
        assert int(n_bad) >= 2

    def test_clean_image_mostly_untouched(self, rng):
        img = rng.normal(100, 2, size=(64, 64)).astype(np.float32)
        repaired, n_bad, _ = ps.bad_pixel_repair(jnp.asarray(img), 5.0, 5.0)
        # with 5-sigma thresholds, almost nothing should trip
        assert int(n_bad) < 10


class TestCalibration:
    def test_dark_subtract(self, rng):
        light = rng.uniform(100, 200, size=(8, 8)).astype(np.float32)
        dark = rng.uniform(0, 10, size=(8, 8)).astype(np.float32)
        out = np.asarray(ps.subtract(jnp.asarray(light), jnp.asarray(dark)))
        np.testing.assert_allclose(out, light - dark, rtol=1e-6)

    def test_flat_divide_with_degenerate(self, rng):
        light = rng.uniform(100, 200, size=(8, 8)).astype(np.float32)
        flat = rng.uniform(0.5, 1.0, size=(8, 8)).astype(np.float32)
        flat[2, 3] = 0.0
        flat[4, 5] = -1.0
        out = np.asarray(ps.flat_divide(jnp.asarray(light), jnp.asarray(flat), 1.0))
        # degenerate flat pixels pass the light through (badpixels.go:114-123)
        assert out[2, 3] == light[2, 3]
        assert out[4, 5] == light[4, 5]
        assert out[0, 0] == pytest.approx(light[0, 0] * 1.0 / flat[0, 0], rel=1e-6)


class TestDebayer:
    """Modeled on debayer_test.go:23-86: R pixels of an RGGB mosaic must pass
    through unchanged at even (row, col); dimensions are even-cropped."""

    def _mosaic(self, h=8, w=10):
        # value encodes position so pass-through positions are verifiable
        return (np.arange(h)[:, None] * 100 + np.arange(w)[None, :]).astype(np.float32)

    def test_red_passthrough_rggb(self):
        img = self._mosaic()
        out = np.asarray(ps.debayer_bilinear(jnp.asarray(img), "R", "RGGB"))
        assert out.shape == img.shape  # already even
        np.testing.assert_array_equal(out[0::2, 0::2], img[0::2, 0::2])

    def test_red_interpolation_rggb(self):
        img = self._mosaic()
        out = np.asarray(ps.debayer_bilinear(jnp.asarray(img), "R", "RGGB"))
        # interior horizontal interpolation: out[0,1] = (r00 + r02)/2
        assert out[0, 1] == pytest.approx(0.5 * (img[0, 0] + img[0, 2]))
        assert out[1, 0] == pytest.approx(0.5 * (img[0, 0] + img[2, 0]))
        assert out[1, 1] == pytest.approx(0.25 * (img[0, 0] + img[0, 2] + img[2, 0] + img[2, 2]))

    def test_red_edge_clamping(self):
        img = self._mosaic(6, 6)
        out = np.asarray(ps.debayer_bilinear(jnp.asarray(img), "R", "RGGB"))
        # last column/row use clamped neighbors (debayer.go:93-103)
        assert out[5, 5] == pytest.approx(img[4, 4])  # r, rRight=r, rDown=r, rRD=r at corner

    def test_blue_passthrough_rggb(self):
        img = self._mosaic()
        out = np.asarray(ps.debayer_bilinear(jnp.asarray(img), "B", "RGGB"))
        np.testing.assert_array_equal(out[1::2, 1::2], img[1::2, 1::2])

    def test_green_passthrough_rggb(self):
        img = self._mosaic()
        out = np.asarray(ps.debayer_bilinear(jnp.asarray(img), "G", "RGGB"))
        np.testing.assert_array_equal(out[0::2, 1::2], img[0::2, 1::2])
        np.testing.assert_array_equal(out[1::2, 0::2], img[1::2, 0::2])

    def test_bggr_offsets(self):
        img = self._mosaic()
        out = np.asarray(ps.debayer_bilinear(jnp.asarray(img), "B", "BGGR"))
        # BGGR: blue at (odd+1, odd+1) of the (1,1)-offset crop -> original (2,2) grid
        np.testing.assert_array_equal(out[1::2, 1::2], img[2::2, 2::2])

    def test_odd_size_crops_even(self):
        img = self._mosaic(7, 9)
        out = np.asarray(ps.debayer_bilinear(jnp.asarray(img), "R", "RGGB"))
        assert out.shape == (6, 8)

    def test_unknown_cfa_raises(self):
        with pytest.raises(ValueError):
            ps.debayer_bilinear(jnp.zeros((4, 4)), "R", "XYZW")


class TestBayerCosmetic:
    """Modeled on badpixels_bayer_test.go:23-114: plant one hot pixel in a
    structured CFA pattern; exactly that pixel must change."""

    def _cfa(self, h=12, w=12):
        # smooth same-color planes: R=100, G=50, B=25 with small gradients
        img = np.zeros((h, w), np.float32)
        img[0::2, 0::2] = 100.0
        img[0::2, 1::2] = 50.0
        img[1::2, 0::2] = 50.0
        img[1::2, 1::2] = 25.0
        return img

    def test_hot_red_pixel_removed(self):
        img = self._cfa()
        img[4, 6] = 1000.0  # red position in RGGB
        out, n = ps.cosmetic_correction_bayer(jnp.asarray(img), "R", "RGGB", 3.0, 3.0)
        out = np.asarray(out)
        assert int(n) == 1
        assert out[4, 6] == pytest.approx(100.0)
        # everything else untouched
        mask = np.ones_like(img, bool)
        mask[4, 6] = False
        np.testing.assert_array_equal(out[mask], img[mask])

    def test_cold_green_pixel_removed(self):
        img = self._cfa()
        img[3, 6] = 0.0  # green position (odd row, even col)
        out, n = ps.cosmetic_correction_bayer(jnp.asarray(img), "G", "RGGB", 3.0, 3.0)
        out = np.asarray(out)
        assert int(n) == 1
        assert out[3, 6] == pytest.approx(50.0)

    def test_blue_channel(self):
        img = self._cfa()
        img[5, 7] = 500.0  # blue position
        out, n = ps.cosmetic_correction_bayer(jnp.asarray(img), "B", "RGGB", 3.0, 3.0)
        out = np.asarray(out)
        assert int(n) == 1
        assert out[5, 7] == pytest.approx(25.0)


class TestMaskedMedian9Network:
    """The CFA cosmetic median runs as a 25-comparator network over separate
    planes (the stacked jnp.sort form OOMed the chip at 12x16MP: the (9,H,W)
    temp plus its sort iota pad the 9-axis to 16 sublanes = 24 GB of HLO
    temps). Pin the network against the straightforward stacked-sort form."""

    def test_network_sorts_all_01_inputs(self):
        # 0-1 principle: a comparator network sorts iff it sorts 0-1 inputs
        import itertools

        from nightlight_tpu.ops.prestack import _SORT9_NET
        for bits in itertools.product([0, 1], repeat=9):
            v = list(bits)
            for i, j in _SORT9_NET:
                if v[i] > v[j]:
                    v[i], v[j] = v[j], v[i]
            assert v == sorted(bits), bits

    def test_matches_stacked_sort_form(self):
        import jax.numpy as jnp

        from nightlight_tpu.ops.prestack import _masked_median9
        rng = np.random.default_rng(11)
        h = w = 16
        stacks = [jnp.asarray(rng.normal(100, 10, (h, w)).astype(np.float32))
                  for _ in range(9)]
        # validity patterns like _shifted's edge masks plus a random one
        valids = [jnp.asarray(rng.random((h, w)) > p) for p in
                  (0.0, 0.0, 0.1, 0.3, 0.5, 0.0, 0.2, 0.4, 0.0)]
        valids[0] = jnp.ones((h, w), bool)  # center always valid
        got = np.asarray(_masked_median9(stacks, valids))

        big = np.float32(3.4e38)
        s = np.sort(np.where(np.stack(valids), np.stack(stacks), big), axis=0)
        cnt = np.stack(valids).sum(axis=0)
        up = np.clip(cnt // 2, 0, 8)
        lo = np.clip(np.maximum(cnt // 2 - 1, 0), 0, 8)
        upper = np.take_along_axis(s, up[None], axis=0)[0]
        lower = np.take_along_axis(s, lo[None], axis=0)[0]
        want = np.where(cnt % 2 == 1, upper, 0.5 * (lower + upper))
        np.testing.assert_array_equal(got, want)
