"""Goal-seek sigma and supplementary color conversion tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from nightlight_tpu.ops import color as col
from nightlight_tpu.ops import stack as stk
from nightlight_tpu.ops.findsigma import find_sigmas_and_stack


class TestFindSigma:
    def test_hits_clip_targets(self, rng):
        n, p = 20, 5000
        f = rng.normal(1000.0, 10.0, size=(n, p)).astype(np.float32)
        out, cl, ch, sig_lo, sig_hi = find_sigmas_and_stack(
            jnp.asarray(f), stk.StackMode.Sigma, clip_perc_low=0.5, clip_perc_high=0.5)
        total = n * p
        assert float(cl) * 100.0 / total == pytest.approx(0.5, abs=0.02)
        assert float(ch) * 100.0 / total == pytest.approx(0.5, abs=0.02)
        assert 1.0 <= sig_lo <= 11.0 and 1.0 <= sig_hi <= 11.0

    def test_linear_fit_uses_newton_and_converges(self, rng):
        """Linear fit couples both sigma bounds (every clip re-fits the
        line), so goal-seek routes to the Newton joint update
        (newtonMethodAndStack, stackfindsigma.go:101-169)."""
        import io

        # the epsilon derivative probe needs enough samples that a 0.005
        # sigma step moves the clip count (same granularity limit as the
        # reference's float32 percentages at real image sizes)
        n, p = 25, 60000
        f = rng.normal(1000.0, 10.0, size=(n, p)).astype(np.float32)
        f += rng.normal(0, 0.2, size=(n, 1)).astype(np.float32).cumsum(0)  # drift
        log = io.StringIO()
        out, cl, ch, sig_lo, sig_hi = find_sigmas_and_stack(
            jnp.asarray(f), stk.StackMode.LinearFit,
            clip_perc_low=0.5, clip_perc_high=0.5, log=log)
        total = n * p
        assert float(cl) * 100.0 / total == pytest.approx(0.5, abs=0.05)
        assert float(ch) * 100.0 / total == pytest.approx(0.5, abs=0.05)
        assert 0.1 <= sig_lo <= 20.0 and 0.1 <= sig_hi <= 20.0
        assert "Reached 0.50% and 0.50% clipping" in log.getvalue()
        assert np.isfinite(np.asarray(out)).all()

    def test_linear_fit_newton_flat_start_falls_back(self, rng):
        """With no clipping at the 6.0/6.0 start the Newton derivative probe
        is flat; the search must fall back to the bracket walk and still hit
        the targets instead of returning the reference dead-code's 'last
        approximation'."""
        import io

        n, p = 25, 60000
        f = rng.normal(1000.0, 2.0, size=(n, p)).astype(np.float32)  # clean
        log = io.StringIO()
        out, cl, ch, sig_lo, sig_hi = find_sigmas_and_stack(
            jnp.asarray(f), stk.StackMode.LinearFit,
            clip_perc_low=0.5, clip_perc_high=0.5, log=log)
        total = n * p
        if "retrying with binary search" in log.getvalue():
            assert float(cl) * 100.0 / total == pytest.approx(0.5, abs=0.05)
            assert float(ch) * 100.0 / total == pytest.approx(0.5, abs=0.05)
        else:  # Newton converged directly; equally fine
            assert "Reached 0.50% and 0.50% clipping" in log.getvalue()

    def test_non_sigma_mode_falls_through(self, rng):
        f = rng.normal(10.0, 1.0, size=(4, 100)).astype(np.float32)
        out, cl, ch, sig_lo, sig_hi = find_sigmas_and_stack(jnp.asarray(f), stk.StackMode.Mean)
        assert sig_lo == 0.0 and sig_hi == 0.0
        np.testing.assert_allclose(np.asarray(out), f.mean(axis=0), rtol=1e-5)

    def test_op_stack_negative_sigma_goal_seeks(self, rng):
        import io

        from nightlight_tpu.image import Image
        from nightlight_tpu.pipeline.context import new_context
        from nightlight_tpu.pipeline.ops_stack import OpStack

        log = io.StringIO()
        c = new_context(log=log)
        fs = []
        for i in range(12):
            img = Image.from_naxisn([64, 64],
                                    rng.normal(100, 3, size=(64, 64)).astype(np.float32))
            img.id, img.exposure = i, 10.0
            fs.append(img)
        op = OpStack(mode=int(stk.StackMode.Sigma), sigma_low=-1.0, sigma_high=-1.0)
        out = op.apply(fs, c)
        assert "stSigLow" in log.getvalue()
        assert out.data.shape == (64, 64)


class TestCIEHSL:
    def test_roundtrip(self, rng):
        rgb = jnp.asarray(rng.uniform(0.1, 0.8, size=(3, 4, 4)).astype(np.float32))
        back = col.ciehsl_to_linrgb(col.linrgb_to_ciehsl(rgb))
        np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=5e-3)

    def test_saturation_in_unit_range(self, rng):
        rgb = jnp.asarray(rng.uniform(0.05, 0.95, size=(3, 8, 8)).astype(np.float32))
        s = np.asarray(col.linrgb_to_ciehsl(rgb))[1]
        assert (s >= 0).all() and (s <= 1).all()


class TestMonoHclLum:
    def test_matches_full_path(self, rng):
        vals = rng.uniform(0.01, 1.0, size=16).astype(np.float32)
        fast = np.asarray(col.mono_to_hcl_lum(jnp.asarray(vals)))
        gray = jnp.asarray(np.broadcast_to(vals, (3, 1, 16)).copy())
        full = np.asarray(col.linrgb_to_hcl(gray))[2, 0]
        np.testing.assert_allclose(fast, full, atol=1e-5)


class TestRGBHelpers:
    def test_offset_and_scale(self, rng):
        cube = jnp.asarray(rng.uniform(0.2, 0.6, size=(3, 4, 4)).astype(np.float32))
        off = np.asarray(col.offset_rgb(cube, jnp.asarray([0.1, 0.0, -0.1], jnp.float32)))
        np.testing.assert_allclose(off[0], np.asarray(cube)[0] + 0.1, rtol=1e-6)
        sc = np.asarray(col.scale_rgb(cube, jnp.asarray([2.0, 1.0, 3.0], jnp.float32)))
        assert sc.max() <= 1.0
        np.testing.assert_allclose(sc[1], np.asarray(cube)[1], rtol=1e-6)


class TestSearchSubsample:
    """The search-phase pixel subsample (>= 4M pixels searches on a 1/16
    stride, then finalizes at full resolution -- ops/findsigma.py)."""

    def test_large_frame_converges_with_exact_final_counts(self, rng):
        from nightlight_tpu.ops.findsigma import (_SEARCH_SUBSAMPLE_MIN,
                                                  find_sigmas_and_stack)

        h = w = 2048  # 4.2M pixels: smallest shape on the subsampled path
        assert h * w >= _SEARCH_SUBSAMPLE_MIN
        frames = jnp.asarray(
            rng.normal(100.0, 2.0, size=(6, h, w)).astype(np.float32))
        out, cl, ch, sig_lo, sig_hi = find_sigmas_and_stack(
            frames, stk.StackMode.Sigma, ref_frame_loc=100.0)
        total = frames.size
        # converged on the subsample estimate AND the exact counts agree to
        # the same 0.01% rounding grid
        assert round(float(cl) * 10000.0 / total) == 50
        assert round(float(ch) * 10000.0 / total) == 50
        # the final counts must be EXACTLY a full-resolution stack at the
        # returned sigmas (the finalization pass contract)
        out2, cl2, ch2 = stk.stack(frames, stk.StackMode.Sigma,
                                   sigma_low=sig_lo, sigma_high=sig_hi,
                                   ref_frame_loc=100.0)
        assert int(cl2) == int(cl) and int(ch2) == int(ch)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
