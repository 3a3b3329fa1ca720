"""Pallas stacking kernel vs the XLA reference path (interpret mode on CPU;
the compiled Mosaic path is exercised on real TPU by bench.py)."""

import os

os.environ["NIGHTLIGHT_PALLAS_INTERPRET"] = "1"

import numpy as np
import jax.numpy as jnp
import pytest

import nightlight_tpu.ops.stack_pallas as sp

sp.INTERPRET = True

from nightlight_tpu.ops import stack as stk
from nightlight_tpu.ops.stack_pallas import stack_sigma_pallas


def frames_with_nans(rng, n=12, p=3000):
    f = rng.normal(1000.0, 10.0, size=(n, p)).astype(np.float32)
    f[rng.uniform(size=(n, p)) < 0.1] = np.nan
    f[rng.uniform(size=(n, p)) < 0.05] += 2000.0
    f[:, 0] = np.nan
    return f


class TestSortNetwork:
    def test_oddeven_pairs_zero_one_principle(self):
        """A comparator network sorts all inputs iff it sorts all 0-1
        sequences (Knuth TAOCP 5.3.4); check exhaustively up to n=16."""
        for n in (2, 4, 8, 16):
            pairs = sp._oddeven_pairs(n)
            # (n, 2^n) matrix whose columns enumerate every 0-1 sequence
            cols = (((np.arange(2 ** n)[None, :] >> np.arange(n)[:, None]) & 1)
                    .astype(np.int8))
            for i, l in pairs:
                lo = np.minimum(cols[i], cols[l])
                hi = np.maximum(cols[i], cols[l])
                cols[i], cols[l] = lo, hi
            assert (np.diff(cols.astype(np.int16), axis=0) >= 0).all(), n

    def test_oddeven_pairs_cheaper_than_bitonic(self):
        # the documented exchange counts the kernel relies on
        assert len(sp._oddeven_pairs(16)) == 63
        assert len(sp._oddeven_pairs(64)) == 543

    def test_sortnet_rows_with_padding(self, rng):
        for n_real, n_pad in ((5, 8), (12, 16), (40, 64)):
            lanes = 37
            data = rng.normal(0.0, 100.0, size=(n_real, lanes)).astype(np.float32)
            data[rng.uniform(size=data.shape) < 0.2] = sp._BIG  # masked lanes
            rows = [jnp.asarray(data[i]) for i in range(n_real)]
            rows += [jnp.full((lanes,), sp._BIG, jnp.float32)] * (n_pad - n_real)
            out = np.stack([np.asarray(r) for r in sp._sortnet_rows(rows, n_real)])
            expect = np.sort(np.concatenate(
                [data, np.full((n_pad - n_real, lanes), sp._BIG, np.float32)]), axis=0)
            np.testing.assert_array_equal(out, expect)

    def test_sortnet_kv_weights_follow_keys(self, rng):
        n_real, n_pad, lanes = 12, 16, 29
        # distinct keys so the expected permutation is unique
        keys_np = rng.permutation(n_real * lanes).reshape(n_real, lanes) \
            .astype(np.float32)
        w_np = rng.uniform(0.5, 2.0, size=(n_real, lanes)).astype(np.float32)
        keys = [jnp.asarray(keys_np[i]) for i in range(n_real)]
        keys += [jnp.full((lanes,), sp._BIG, jnp.float32)] * (n_pad - n_real)
        vals = [jnp.asarray(w_np[i]) for i in range(n_real)]
        vals += [jnp.zeros((lanes,), jnp.float32)] * (n_pad - n_real)
        sk, sv = sp._sortnet_rows_kv(keys, vals, n_real)
        sk = np.stack([np.asarray(r) for r in sk])[:n_real]
        sv = np.stack([np.asarray(r) for r in sv])[:n_real]
        order = np.argsort(keys_np, axis=0)
        np.testing.assert_array_equal(sk, np.take_along_axis(keys_np, order, axis=0))
        np.testing.assert_array_equal(sv, np.take_along_axis(w_np, order, axis=0))


class TestPallasVsXLA:
    def test_sigma_matches(self, rng):
        f = frames_with_nans(rng)
        ref, cl, ch = stk.stack(jnp.asarray(f), stk.StackMode.Sigma,
                                sigma_low=2.0, sigma_high=2.0, ref_frame_loc=7.0)
        out, pcl, pch = stack_sigma_pallas(jnp.asarray(f), 7.0, 2.0, 2.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-3)
        assert int(pcl) == int(cl)
        assert int(pch) == int(ch)

    def test_winsor_matches(self, rng):
        f = frames_with_nans(rng, n=16)
        ref, _, _ = stk.stack(jnp.asarray(f), stk.StackMode.WinsorSigma,
                              sigma_low=2.5, sigma_high=2.5, ref_frame_loc=7.0)
        out, _, _ = stack_sigma_pallas(jnp.asarray(f), 7.0, 2.5, 2.5, winsorize=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-3)

    def test_weighted_matches(self, rng):
        f = frames_with_nans(rng)
        w = rng.uniform(0.5, 2.0, size=f.shape[0]).astype(np.float32)
        ref, _, _ = stk.stack(jnp.asarray(f), stk.StackMode.Sigma, weights=jnp.asarray(w),
                              sigma_low=2.0, sigma_high=2.0, ref_frame_loc=7.0)
        out, _, _ = stack_sigma_pallas(jnp.asarray(f), 7.0, 2.0, 2.0, weights=jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-3)

    def test_all_nan_pixel_gets_ref_loc(self, rng):
        f = frames_with_nans(rng)
        out, _, _ = stack_sigma_pallas(jnp.asarray(f), 42.5, 2.0, 2.0)
        assert float(np.asarray(out)[0]) == pytest.approx(42.5)

    def test_non_tile_multiple_pixel_count(self, rng):
        # pixel count not a multiple of TILE exercises the NaN padding path
        f = rng.normal(100.0, 3.0, size=(8, 777)).astype(np.float32)
        ref, _, _ = stk.stack(jnp.asarray(f), stk.StackMode.Sigma,
                              sigma_low=2.75, sigma_high=2.75)
        out, _, _ = stack_sigma_pallas(jnp.asarray(f), 0.0, 2.75, 2.75)
        assert out.shape == (777,)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-3)


class TestLinfitPallas:
    def test_linfit_matches_xla(self, rng):
        from nightlight_tpu.ops.stack_pallas import stack_linfit_pallas

        f = frames_with_nans(rng, n=26)  # auto mode picks LinearFit at >=25
        ref, cl, ch = stk.stack(jnp.asarray(f), stk.StackMode.LinearFit,
                                sigma_low=2.0, sigma_high=2.0, ref_frame_loc=7.0,
                                use_pallas=False)
        out, pcl, pch = stack_linfit_pallas(jnp.asarray(f), 7.0, 2.0, 2.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-3)
        assert int(pcl) == int(cl)
        assert int(pch) == int(ch)
        assert int(pcl) + int(pch) > 0  # the planted outliers were rejected

    def test_linfit_all_nan_pixel_gets_ref_loc(self, rng):
        from nightlight_tpu.ops.stack_pallas import stack_linfit_pallas

        f = frames_with_nans(rng, n=26)
        out, _, _ = stack_linfit_pallas(jnp.asarray(f), 42.5, 2.0, 2.0)
        assert float(np.asarray(out)[0]) == pytest.approx(42.5)

    def test_linfit_gradient_signal_survives(self, rng):
        """Per-pixel linear drift over frames (e.g. sky brightening) must fit
        and reject only the planted outliers, not the trend."""
        from nightlight_tpu.ops.stack_pallas import stack_linfit_pallas

        n, p = 30, 2048
        base = rng.normal(100.0, 0.5, size=(n, p)).astype(np.float32)
        drift = np.linspace(0.0, 5.0, n, dtype=np.float32)[:, None]
        f = base + drift
        f[4, :100] += 300.0  # outlier samples
        ref, _, _ = stk.stack(jnp.asarray(f), stk.StackMode.LinearFit,
                              sigma_low=3.0, sigma_high=3.0, use_pallas=False)
        out, _, chi = stack_linfit_pallas(jnp.asarray(f), 0.0, 3.0, 3.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-3)
        assert int(chi) >= 100


class TestSinglePassPallas:
    def test_median_matches_xla(self, rng):
        from nightlight_tpu.ops.stack_pallas import stack_single_pass_pallas

        f = frames_with_nans(rng, n=11)
        ref, _, _ = stk.stack(jnp.asarray(f), stk.StackMode.Median,
                              ref_frame_loc=7.0, use_pallas=False)
        out, cl, ch = stack_single_pass_pallas(jnp.asarray(f), 7.0, mad=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-4)
        assert int(cl) == 0 and int(ch) == 0
        assert float(np.asarray(out)[0]) == pytest.approx(7.0)  # all-NaN pixel

    def test_madsigma_matches_xla(self, rng):
        from nightlight_tpu.ops.stack_pallas import stack_single_pass_pallas

        f = frames_with_nans(rng, n=14)
        ref, cl, ch = stk.stack(jnp.asarray(f), stk.StackMode.MADSigma,
                                sigma_low=2.0, sigma_high=2.0, ref_frame_loc=7.0,
                                use_pallas=False)
        out, pcl, pch = stack_single_pass_pallas(jnp.asarray(f), 7.0, 2.0, 2.0, mad=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-3)
        assert int(pcl) == int(cl) and int(pch) == int(ch)
        assert int(pch) > 0


class TestKernelFrameCountSweep:
    """n_pad edge coverage: every kernel must match its XLA path at frame
    counts straddling the pow2 padding boundaries.

    Comparison is statistical, not bit-exact: when a clip threshold lands
    EXACTLY on a sample (common at tiny counts, where the threshold is
    computed from the few samples it tests), the last ulp of two
    differently-ordered float32 computations decides whether one more clip
    round runs. Both answers are valid; the Go reference would likewise
    diverge from either. Allow <=0.5% of pixels to differ and clip counts
    to differ by <=1%."""

    @staticmethod
    def _check(out, ref, pclips, clips, n):
        out, ref = np.asarray(out), np.asarray(ref)
        frac = float(np.mean(np.abs(out - ref) > 1e-3))
        assert frac <= 0.005, (n, frac)
        for pc, c in zip(pclips, clips):
            assert abs(int(pc) - int(c)) <= max(2, 0.01 * max(int(c), 1)), n

    @pytest.mark.parametrize("n", [5, 8, 9, 16, 17, 33])
    def test_sigma_sweep(self, rng, n):
        f = frames_with_nans(rng, n=n, p=sp.TILE)
        ref, cl, ch = stk.stack(jnp.asarray(f), stk.StackMode.Sigma,
                                sigma_low=2.0, sigma_high=2.0, ref_frame_loc=7.0,
                                use_pallas=False)
        out, pcl, pch = stack_sigma_pallas(jnp.asarray(f), 7.0, 2.0, 2.0)
        self._check(out, ref, (pcl, pch), (cl, ch), n)

    @pytest.mark.parametrize("n", [5, 9, 17, 33])
    def test_linfit_sweep(self, rng, n):
        from nightlight_tpu.ops.stack_pallas import stack_linfit_pallas

        f = frames_with_nans(rng, n=n, p=sp.TILE)
        ref, cl, ch = stk.stack(jnp.asarray(f), stk.StackMode.LinearFit,
                                sigma_low=2.0, sigma_high=2.0, ref_frame_loc=7.0,
                                use_pallas=False)
        out, pcl, pch = stack_linfit_pallas(jnp.asarray(f), 7.0, 2.0, 2.0)
        self._check(out, ref, (pcl, pch), (cl, ch), n)

    @pytest.mark.parametrize("n", [5, 9, 17])
    def test_madsigma_sweep(self, rng, n):
        from nightlight_tpu.ops.stack_pallas import stack_single_pass_pallas

        f = frames_with_nans(rng, n=n, p=sp.TILE)
        ref, cl, ch = stk.stack(jnp.asarray(f), stk.StackMode.MADSigma,
                                sigma_low=2.0, sigma_high=2.0, ref_frame_loc=7.0,
                                use_pallas=False)
        out, pcl, pch = stack_single_pass_pallas(jnp.asarray(f), 7.0, 2.0, 2.0, mad=True)
        self._check(out, ref, (pcl, pch), (cl, ch), n)
