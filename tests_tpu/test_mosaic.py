"""Mosaic-compiled Pallas kernels vs the XLA path on the real chip.

The unit suite runs every kernel in interpret mode on CPU
(tests/test_stack_pallas.py); this opt-in lane compiles the same kernels
through Mosaic on the attached TPU and checks numerics against the XLA
reference path computed on the same device, so a Mosaic-only regression
(tiling, loop-carry, SMEM overflow) cannot pass CI silently. Covers all
stacking modes the engine dispatches to Pallas (reference semantics:
internal/stack/stack.go:33-63), the weighted variants, goal-seek sigma, and
one end-to-end CLI stack.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def frames_with_outliers(rng, n=12, p=3000):
    f = rng.normal(1000.0, 10.0, size=(n, p)).astype(np.float32)
    f[rng.uniform(size=(n, p)) < 0.1] = np.nan
    f[rng.uniform(size=(n, p)) < 0.05] += 2000.0
    f[:, 0] = np.nan
    return f


@pytest.fixture(scope="module")
def jnp_frames(tpu_cache):
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    return jnp.asarray(frames_with_outliers(rng))


class TestMosaicVsXLA:
    """Each test compiles one kernel family through Mosaic on the chip."""

    def test_sigma(self, jnp_frames):
        import nightlight_tpu.ops.stack_pallas as sp
        from nightlight_tpu.ops import stack as stk

        assert not sp.INTERPRET
        ref, cl, ch = stk.stack_sigma(jnp_frames, 7.0, 2.0, 2.0)
        out, pcl, pch = sp.stack_sigma_pallas(jnp_frames, 7.0, 2.0, 2.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-3)
        assert int(pcl) == int(cl) and int(pch) == int(ch)

    def test_winsor(self, jnp_frames):
        import nightlight_tpu.ops.stack_pallas as sp
        from nightlight_tpu.ops import stack as stk

        ref, _, _ = stk.stack_winsor_sigma(jnp_frames, 7.0, 2.5, 2.5)
        out, _, _ = sp.stack_sigma_pallas(jnp_frames, 7.0, 2.5, 2.5, winsorize=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-3)

    def test_sigma_weighted(self, jnp_frames):
        import jax.numpy as jnp
        import nightlight_tpu.ops.stack_pallas as sp
        from nightlight_tpu.ops import stack as stk

        w = jnp.asarray(np.linspace(0.5, 2.0, jnp_frames.shape[0]), jnp.float32)
        ref, _, _ = stk.stack_sigma_weighted(jnp_frames, w, 7.0, 2.0, 2.0)
        out, _, _ = sp.stack_sigma_pallas(jnp_frames, 7.0, 2.0, 2.0, weights=w)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-3)

    def test_median(self, jnp_frames):
        import nightlight_tpu.ops.stack_pallas as sp
        from nightlight_tpu.ops import stack as stk

        ref = stk.stack_median(jnp_frames, 7.0)
        out, _, _ = sp.stack_single_pass_pallas(jnp_frames, 7.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-3)

    def test_mad_sigma(self, jnp_frames):
        import nightlight_tpu.ops.stack_pallas as sp
        from nightlight_tpu.ops import stack as stk

        ref, cl, ch = stk.stack_mad_sigma(jnp_frames, 7.0, 2.5, 2.5)
        out, pcl, pch = sp.stack_single_pass_pallas(jnp_frames, 7.0, 2.5, 2.5, mad=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-3)
        assert int(pcl) == int(cl) and int(pch) == int(ch)

    def test_linfit(self, tpu_cache):
        import jax.numpy as jnp
        import nightlight_tpu.ops.stack_pallas as sp
        from nightlight_tpu.ops import stack as stk

        rng = np.random.default_rng(11)
        f = jnp.asarray(frames_with_outliers(rng, n=30))
        ref, cl, ch = stk.stack_linear_fit(f, 7.0, 2.5, 2.5)
        out, pcl, pch = sp.stack_linfit_pallas(f, 7.0, 2.5, 2.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=5e-3)
        assert int(pcl) == int(cl) and int(pch) == int(ch)

    def test_goal_seek_converges_on_chip(self, tpu_cache):
        import jax.numpy as jnp
        from nightlight_tpu.ops import stack as stk
        from nightlight_tpu.ops.findsigma import find_sigmas_and_stack

        rng = np.random.default_rng(13)
        f = jnp.asarray(rng.normal(1000.0, 10.0, size=(16, 4096)).astype(np.float32))
        out, cl, ch, slo, shi = find_sigmas_and_stack(
            f, stk.StackMode.Sigma, ref_frame_loc=1000.0,
            clip_perc_low=0.5, clip_perc_high=0.5)
        total = f.size
        assert abs(100.0 * cl / total - 0.5) < 0.25
        assert abs(100.0 * ch / total - 0.5) < 0.25
        assert np.isfinite(np.asarray(out)).all()

    def test_goal_seek_subsampled_exact_counts_on_chip(self, tpu_cache):
        """The >=4M-pixel goal-seek path (1/17 subsampled search rounds +
        full-resolution finalization, ops/findsigma.py) on the real chip:
        the returned clip counts must be EXACTLY those of a direct stack at
        the returned sigmas."""
        import jax.numpy as jnp
        from nightlight_tpu.ops import stack as stk
        from nightlight_tpu.ops.findsigma import (_SEARCH_SUBSAMPLE_MIN,
                                                  find_sigmas_and_stack)

        rng = np.random.default_rng(7)
        h, w = 2048, 2048
        assert h * w >= _SEARCH_SUBSAMPLE_MIN
        f = jnp.asarray(rng.normal(1000.0, 10.0, size=(6, h, w)).astype(np.float32))
        out, cl, ch, slo, shi = find_sigmas_and_stack(
            f, stk.StackMode.Sigma, ref_frame_loc=1000.0,
            clip_perc_low=0.5, clip_perc_high=0.5)
        out2, cl2, ch2 = stk.stack(f, stk.StackMode.Sigma, sigma_low=slo,
                                   sigma_high=shi, ref_frame_loc=1000.0)
        assert int(cl2) == int(cl) and int(ch2) == int(ch)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


    def test_sharded_kernel_single_device_mesh(self, jnp_frames):
        """stack_sharded (shard_map + psum'd clip counters) compiling the
        Mosaic kernel on the chip: a 1-device mesh is the degenerate SPMD
        case, proving the pallas_call runs under shard_map on real hardware
        (multi-chip scaling path, parallel/mesh.py)."""
        import jax
        import jax.numpy as jnp
        from nightlight_tpu.ops import stack as stk
        from nightlight_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(jax.devices()[:1])
        frames3d = jnp_frames.reshape(jnp_frames.shape[0], 24, -1)
        k_out, k_lo, k_hi = stk.stack_sharded(
            frames3d, mesh, stk.StackMode.Sigma, sigma_low=2.0, sigma_high=2.0,
            use_pallas=True)
        u_out, u_lo, u_hi = stk.stack(frames3d, stk.StackMode.Sigma,
                                      sigma_low=2.0, sigma_high=2.0,
                                      use_pallas=True)
        np.testing.assert_array_equal(np.asarray(k_out), np.asarray(u_out))
        assert (int(k_lo), int(k_hi)) == (int(u_lo), int(u_hi))


class TestPatchGatherOnChip:
    def test_dma_gather_matches_xla(self, tpu_cache):
        """The Mosaic DMA patch-gather vs the XLA gather path on the chip
        (incl. the clamped-window + roll addressing for edge candidates)."""
        import jax.numpy as jnp
        import nightlight_tpu.ops.gather_pallas as gp
        from nightlight_tpu.detect.stars import _patches

        assert not gp.INTERPRET and gp.pallas_gather_available()
        rng = np.random.default_rng(3)
        img = jnp.asarray(rng.normal(1000, 10, size=(1024, 1536)).astype(np.float32))
        cy = jnp.asarray(np.r_[rng.integers(0, 1024, 500), [0, 2, 1022, 1023]], np.int32)
        cx = jnp.asarray(np.r_[rng.integers(0, 1536, 500), [0, 1535, 3, 1533]], np.int32)
        for radius in (16, 15):  # odd radius: non-tile-aligned patch size
            p1, ok1 = gp.gather_patches_pallas(img, cy, cx, radius)
            p2, ok2 = _patches(img, cy, cx, radius)
            ok = np.asarray(ok1)
            assert (ok == np.asarray(ok2)).all(), radius
            np.testing.assert_allclose(np.asarray(p1)[ok], np.asarray(p2)[ok],
                                       err_msg=f"radius {radius}")


class TestEndToEndOnChip:
    def test_small_cli_stack(self, tpu_cache, tmp_path, rng, capsys):
        """One real CLI stack on the chip: decode, calibrate, detect, align,
        goal-seek sigma stack, save."""
        from tests.test_pipeline_e2e import run_cli, write_frames

        write_frames(tmp_path, rng, n_frames=4, h=256, w=256)
        rc = run_cli(["-out", "out.fits", "-log", "", "stack", "light*.fits"], tmp_path)
        out = capsys.readouterr().out
        assert rc == 0
        assert "Found 4 files." in out
        assert (tmp_path / "out.fits").exists()
