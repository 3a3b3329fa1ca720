"""Sharded pipeline step over the virtual 8-device mesh: the row-sharded
calibrate+match+stack must be numerically identical to the single-device
path (the reference has no distributed mode, SURVEY.md section 2.7; this is
the TPU-native scaling axis)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nightlight_tpu.ops import stack as stk
from nightlight_tpu.parallel.mesh import (
    make_mesh, run_sharded_stack, sharded_pipeline_step, shard_rows, _pipeline_step)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()


def _mk_inputs(rng, n=10, h=64, w=48):
    frames = rng.normal(100.0, 2.0, size=(n, h, w)).astype(np.float32)
    frames[3, 10, 10] += 400.0  # outlier to exercise clipping
    dark = rng.normal(5.0, 0.1, size=(h, w)).astype(np.float32)
    flat = rng.uniform(0.8, 1.0, size=(h, w)).astype(np.float32)
    return frames, dark, flat


class TestShardedStack:
    def test_mesh_uses_all_devices(self, mesh):
        assert mesh.devices.size == len(jax.devices()) == 8

    def test_sharded_matches_single_device(self, mesh, rng):
        frames, dark, flat = _mk_inputs(rng)
        stacked, lo, hi = run_sharded_stack(frames, dark, flat, mesh=mesh)

        n = frames.shape[0]
        ones = jnp.ones(n, jnp.float32)
        ref, rlo, rhi = _pipeline_step(
            jnp.asarray(frames), jnp.asarray(dark), jnp.asarray(flat),
            jnp.float32(flat.max()), ones, ones, ones,
            jnp.float32(1.0), jnp.float32(1.0),
            jnp.float32(2.75), jnp.float32(2.75), mode=int(stk.StackMode.Sigma))

        np.testing.assert_allclose(np.asarray(stacked), np.asarray(ref),
                                   rtol=0, atol=1e-5)
        assert int(lo) == int(rlo) and int(hi) == int(rhi)
        assert int(hi) >= 1  # the planted outlier was clipped

    def test_output_is_row_sharded(self, mesh, rng):
        frames, dark, flat = _mk_inputs(rng, n=8)
        stacked, _, _ = run_sharded_stack(frames, dark, flat, mesh=mesh)
        # output stays sharded over rows: one addressable shard per device,
        # each holding rows/8
        shards = stacked.addressable_shards
        assert len(shards) == 8
        assert shards[0].data.shape == (frames.shape[1] // 8, frames.shape[2])

    def test_input_row_sharding_spec(self, mesh):
        s = shard_rows(mesh)
        assert s.spec == jax.sharding.PartitionSpec(None, "pix", None)

    def test_all_stack_modes_compile_sharded(self, mesh, rng):
        frames, dark, flat = _mk_inputs(rng, n=6, h=32, w=32)
        for mode in (stk.StackMode.Median, stk.StackMode.Mean,
                     stk.StackMode.WinsorSigma, stk.StackMode.LinearFit):
            fn = sharded_pipeline_step(mesh, int(mode))
            n = frames.shape[0]
            ones = jnp.ones(n, jnp.float32)
            dev = jax.device_put(jnp.asarray(frames), shard_rows(mesh))
            plane = jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec("pix", None))
            out, _, _ = fn(dev, jax.device_put(jnp.asarray(dark), plane),
                           jax.device_put(jnp.asarray(flat), plane),
                           jnp.float32(flat.max()), ones, ones, ones,
                           jnp.float32(1.0), jnp.float32(1.0),
                           jnp.float32(2.75), jnp.float32(2.75))
            assert np.isfinite(np.asarray(out)).all(), mode


class TestShardedPallasKernels:
    """Pallas stacking kernels under SPMD: stack_sharded shard_maps the
    kernel onto each shard's local rows (interpret mode here; Mosaic on real
    chips). The reduction is per-pixel independent, so sharding must not
    change a single bit vs the unsharded kernel."""

    @pytest.fixture(autouse=True)
    def interpret(self):
        from nightlight_tpu.ops import stack_pallas as sp

        old = sp.INTERPRET
        sp.INTERPRET = True
        yield
        sp.INTERPRET = old

    def test_sharded_kernel_matches_unsharded(self, mesh, rng):
        frames, _, _ = _mk_inputs(rng, n=10, h=64, w=128)
        frames[2, 5, 7] = np.nan  # missing-data lane
        dev = jax.device_put(jnp.asarray(frames), shard_rows(mesh))
        k_out, k_lo, k_hi = stk.stack_sharded(
            dev, mesh, stk.StackMode.Sigma, sigma_low=2.0, sigma_high=2.0,
            use_pallas=True)
        u_out, u_lo, u_hi = stk.stack(
            jnp.asarray(frames), stk.StackMode.Sigma, sigma_low=2.0,
            sigma_high=2.0, use_pallas=True)
        np.testing.assert_array_equal(np.asarray(k_out), np.asarray(u_out))
        assert (int(k_lo), int(k_hi)) == (int(u_lo), int(u_hi))
        assert int(k_hi) >= 1

    def test_sharded_kernel_weighted_winsor(self, mesh, rng):
        frames, _, _ = _mk_inputs(rng, n=8, h=32, w=128)
        w = jnp.asarray(np.linspace(0.5, 1.5, 8), jnp.float32)
        dev = jax.device_put(jnp.asarray(frames), shard_rows(mesh))
        k_out, k_lo, k_hi = stk.stack_sharded(
            dev, mesh, stk.StackMode.WinsorSigma, weights=w,
            sigma_low=2.0, sigma_high=2.0, use_pallas=True)
        u_out, u_lo, u_hi = stk.stack(
            jnp.asarray(frames), stk.StackMode.WinsorSigma, weights=w,
            sigma_low=2.0, sigma_high=2.0, use_pallas=True)
        np.testing.assert_array_equal(np.asarray(k_out), np.asarray(u_out))
        assert (int(k_lo), int(k_hi)) == (int(u_lo), int(u_hi))

    def test_stack_mesh_param_routes_sharded(self, mesh, rng):
        frames, _, _ = _mk_inputs(rng, n=6, h=32, w=64)
        dev = jax.device_put(jnp.asarray(frames), shard_rows(mesh))
        out, lo, hi = stk.stack(dev, stk.StackMode.Sigma, mesh=mesh,
                                use_pallas=True)
        # result is row-sharded (came back through shard_map out_specs)
        assert len(out.addressable_shards) == 8
        u_out, u_lo, u_hi = stk.stack(jnp.asarray(frames), stk.StackMode.Sigma,
                                      use_pallas=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(u_out))
        assert (int(lo), int(hi)) == (int(u_lo), int(u_hi))

    def test_sharded_goal_seek_matches(self, mesh, rng):
        from nightlight_tpu.ops.findsigma import find_sigmas_and_stack

        frames, _, _ = _mk_inputs(rng, n=10, h=32, w=128)
        dev = jax.device_put(jnp.asarray(frames), shard_rows(mesh))
        g_s = find_sigmas_and_stack(dev, stk.StackMode.Sigma,
                                    mesh=mesh, use_pallas=True)
        g_u = find_sigmas_and_stack(jnp.asarray(frames), stk.StackMode.Sigma,
                                    use_pallas=True)
        np.testing.assert_array_equal(np.asarray(g_s[0]), np.asarray(g_u[0]))
        assert (int(g_s[1]), int(g_s[2])) == (int(g_u[1]), int(g_u[2]))
        assert (g_s[3], g_s[4]) == (g_u[3], g_u[4])

    def test_sharded_goal_seek_linfit_newton(self, mesh, rng):
        from nightlight_tpu.ops.findsigma import find_sigmas_and_stack

        frames, _, _ = _mk_inputs(rng, n=8, h=16, w=128)
        dev = jax.device_put(jnp.asarray(frames), shard_rows(mesh))
        g_s = find_sigmas_and_stack(dev, stk.StackMode.LinearFit,
                                    mesh=mesh, use_pallas=True)
        g_u = find_sigmas_and_stack(jnp.asarray(frames), stk.StackMode.LinearFit,
                                    use_pallas=True)
        np.testing.assert_array_equal(np.asarray(g_s[0]), np.asarray(g_u[0]))
        assert (int(g_s[1]), int(g_s[2])) == (int(g_u[1]), int(g_u[2]))


class TestShardedFullStep:
    """calibrate+match+WARP+stack: the warp's gather crosses row shards
    (pixels move between rows under the transform), so this exercises the
    collective XLA inserts on the frames operand."""

    def test_full_step_matches_single_device(self, mesh, rng):
        frames, dark, flat = _mk_inputs(rng, n=6, h=64, w=48)
        # per-frame pure translations: frame i shifted by (i, -i); the
        # inverse transform maps dest->src coordinates
        invs = np.array([[1.0, 0.0, float(i), 0.0, 1.0, float(-i)]
                         for i in range(6)], np.float32)
        from nightlight_tpu.parallel.mesh import (
            _full_pipeline_step, run_sharded_full_stack)

        stacked, lo, hi = run_sharded_full_stack(frames, dark, flat, invs, mesh=mesh)

        ones = jnp.ones(6, jnp.float32)
        ref, rlo, rhi = _full_pipeline_step(
            jnp.asarray(frames), jnp.asarray(dark), jnp.asarray(flat),
            jnp.float32(flat.max()), ones, ones, ones,
            jnp.float32(1.0), jnp.float32(1.0), jnp.asarray(invs),
            jnp.float32(2.75), jnp.float32(2.75), mode=int(stk.StackMode.Sigma))

        out, expect = np.asarray(stacked), np.asarray(ref)
        # edge rows/cols are NaN where all warps fell out of bounds
        np.testing.assert_array_equal(np.isnan(out), np.isnan(expect))
        m = ~np.isnan(expect)
        np.testing.assert_allclose(out[m], expect[m], rtol=0, atol=1e-5)
        assert (int(lo), int(hi)) == (int(rlo), int(rhi))

    def test_identity_warp_equals_plain_step(self, mesh, rng):
        frames, dark, flat = _mk_inputs(rng, n=8)
        invs = np.tile(np.array([1, 0, 0, 0, 1, 0], np.float32), (8, 1))
        from nightlight_tpu.parallel.mesh import run_sharded_full_stack

        full, flo, fhi = run_sharded_full_stack(frames, dark, flat, invs, mesh=mesh)
        plain, plo, phi = run_sharded_stack(frames, dark, flat, mesh=mesh)
        # bilinear sampling needs the x+1/y+1 neighbor, so the last row and
        # column are out-of-bounds even under an identity transform -- the
        # reason the reference's align op skips identity transforms entirely
        # (postprocess.go:148-156). Compare the interior.
        np.testing.assert_allclose(np.asarray(full)[:-1, :-1],
                                   np.asarray(plain)[:-1, :-1],
                                   rtol=0, atol=1e-5)


class TestHaloWarp:
    """Halo-exchange warp: boundary rows travel by ppermute instead of an
    all-gather of the frames operand."""

    def _run(self, mesh, frames, dark, flat, invs, halo=8):
        from nightlight_tpu.parallel.mesh import sharded_full_pipeline_step_halo

        n = frames.shape[0]
        fn = sharded_full_pipeline_step_halo(mesh, halo=halo)
        dev = jax.device_put(jnp.asarray(frames), shard_rows(mesh))
        plane = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("pix", None))
        ones = jnp.ones(n, jnp.float32)
        return fn(dev, jax.device_put(jnp.asarray(dark), plane),
                  jax.device_put(jnp.asarray(flat), plane),
                  jnp.float32(flat.max()), ones, ones, ones,
                  jnp.float32(1.0), jnp.float32(1.0), jnp.asarray(invs),
                  jnp.float32(2.75), jnp.float32(2.75))

    def test_matches_gather_warp_within_halo(self, mesh, rng):
        from nightlight_tpu.parallel.mesh import _full_pipeline_step

        frames, dark, flat = _mk_inputs(rng, n=6, h=64, w=48)
        # translations up to 5 rows: within the 8-row halo
        invs = np.array([[1.0, 0.0, float(i), 0.0, 1.0, float(-i)]
                         for i in range(6)], np.float32)
        out, lo, hi = self._run(mesh, frames, dark, flat, invs, halo=8)

        ones = jnp.ones(6, jnp.float32)
        ref, rlo, rhi = _full_pipeline_step(
            jnp.asarray(frames), jnp.asarray(dark), jnp.asarray(flat),
            jnp.float32(flat.max()), ones, ones, ones,
            jnp.float32(1.0), jnp.float32(1.0), jnp.asarray(invs),
            jnp.float32(2.75), jnp.float32(2.75), mode=int(stk.StackMode.Sigma))

        out, expect = np.asarray(out), np.asarray(ref)
        np.testing.assert_array_equal(np.isnan(out), np.isnan(expect))
        m = ~np.isnan(expect)
        np.testing.assert_allclose(out[m], expect[m], rtol=0, atol=1e-5)
        assert (int(lo), int(hi)) == (int(rlo), int(rhi))

    def test_beyond_halo_becomes_nan(self, mesh, rng):
        """A displacement larger than the halo cannot be resolved locally:
        those pixels become NaN missing data rather than wrong values."""
        frames, dark, flat = _mk_inputs(rng, n=4, h=64, w=48)
        # shift all frames by 20 rows with a 4-row halo: every interior pixel
        # needs rows from 2+ shards away
        invs = np.tile(np.array([1, 0, 0, 0, 1, 20.0], np.float32), (4, 1))
        out, _, _ = self._run(mesh, frames, dark, flat, invs, halo=4)
        out = np.asarray(out)
        # with rows_per=8 and halo=4, a +20-row displacement always exceeds
        # the halo, so every pixel of every frame is NaN missing data; the
        # stacker then fills every pixel with RefFrameLoc (=1.0,
        # stack.go:288-297) rather than leaking wrong neighbor-row values
        assert np.all(out == 1.0)


class TestHaloAutoDispatch:
    """The auto dispatcher must size the halo from the batch's transforms or
    fall back to the gather warp -- silent NaN rows beyond a fixed halo are
    the failure mode it exists to prevent."""

    def test_required_halo_exact_for_translation(self):
        from nightlight_tpu.parallel.mesh import required_halo

        invs = np.array([[1, 0, 0, 0, 1, 12.3], [1, 0, 0, 0, 1, -3.0]], np.float32)
        assert required_halo(invs, 64, 48) == 14  # floor(12.3) + 2

    def test_small_shift_picks_halo_step(self, mesh):
        import io

        from nightlight_tpu.parallel.mesh import sharded_full_pipeline_step_auto

        invs = np.array([[1, 0, 0, 0, 1, 2.0]], np.float32)
        log = io.StringIO()
        sharded_full_pipeline_step_auto(mesh, invs, dest_h=64, dest_w=48, log=log)
        assert "exchanging 8 boundary rows" in log.getvalue()

    def test_large_shift_falls_back_to_gather(self, mesh, rng):
        import io

        from nightlight_tpu.parallel.mesh import (
            sharded_full_pipeline_step, sharded_full_pipeline_step_auto)

        frames, dark, flat = _mk_inputs(rng, n=6, h=64, w=48)
        n = frames.shape[0]
        invs = np.array([[1.0, 0.0, 0.0, 0.0, 1.0, 40.0]] * n, np.float32)
        log = io.StringIO()
        fn = sharded_full_pipeline_step_auto(
            mesh, invs, dest_h=64, dest_w=48, halo_cap=16, log=log)
        assert "gather-warp step" in log.getvalue()

        plane = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("pix", None))
        ones = jnp.ones(n, jnp.float32)
        args = (jax.device_put(jnp.asarray(frames), shard_rows(mesh)),
                jax.device_put(jnp.asarray(dark), plane),
                jax.device_put(jnp.asarray(flat), plane),
                jnp.float32(flat.max()), ones, ones, ones,
                jnp.float32(1.0), jnp.float32(1.0), jnp.asarray(invs),
                jnp.float32(2.75), jnp.float32(2.75))
        out_a, _, _ = fn(*args)
        out_g, _, _ = sharded_full_pipeline_step(mesh)(*args)
        a, g = np.asarray(out_a), np.asarray(out_g)
        np.testing.assert_array_equal(np.isnan(a), np.isnan(g))
        # a 40 px shift keeps most rows valid through the gather; the halo
        # step at halo<=16 would have NaN'ed everything below row 40
        assert np.isfinite(a[45:, :40]).all()

    def test_halo_clamped_to_shard_height(self, mesh):
        import io

        from nightlight_tpu.parallel.mesh import sharded_full_pipeline_step_auto

        # 64 rows / 8 shards = 8 rows per shard; a 10 px shift needs halo 12
        # which no exchange can reach -> gather fallback
        invs = np.array([[1, 0, 0, 0, 1, 10.0]], np.float32)
        log = io.StringIO()
        sharded_full_pipeline_step_auto(mesh, invs, dest_h=64, dest_w=48,
                                        halo_cap=128, log=log)
        assert "exceeds shard height" in log.getvalue()


class TestShardedDetectAndStretch:
    """Explicit sharded wrappers for the remaining pipeline phases: star
    detection (global top-k/reductions become collectives) and the iterative
    auto-stretch (histogram statistics become psums)."""

    def test_sharded_star_detect_matches(self, mesh, rng):
        from nightlight_tpu.detect.stars import _find_stars_device
        from nightlight_tpu.parallel.mesh import place_on_mesh, sharded_star_detect
        from tests.test_stars import synth_field

        stars = [(40.0, 50.0), (120.0, 80.0), (200.0, 200.0), (60.0, 180.0),
                 (150.0, 30.0), (230.0, 120.0)]
        img = synth_field(rng, h=256, w=256, stars=stars, bg=100.0, noise=2.0,
                          flux=8000.0, fwhm=8.0)
        sharded = place_on_mesh(jnp.asarray(img), mesh)
        assert not sharded.sharding.is_fully_replicated
        args = (jnp.float32(100.0), jnp.float32(2.0), jnp.float32(10.0),
                jnp.float32(0.0), jnp.float32(1.4), jnp.float32(1.0))
        det = sharded_star_detect(mesh, radius=16, max_candidates=128)
        got = det(sharded, *args)
        want = _find_stars_device(jnp.asarray(img), *args[:5], 16, args[5], 128)
        assert int(got[5]) == int(want[5]) == len(stars)
        np.testing.assert_allclose(np.asarray(got[0])[:len(stars)],
                                   np.asarray(want[0])[:len(stars)], atol=1e-4)
        np.testing.assert_allclose(np.asarray(got[4])[:len(stars)],
                                   np.asarray(want[4])[:len(stars)], atol=1e-4)

    def test_sharded_auto_stretch_matches(self, mesh, rng):
        from nightlight_tpu.ops.autostretch import auto_stretch
        from nightlight_tpu.parallel.mesh import place_on_mesh, sharded_auto_stretch

        img = rng.normal(0.1, 0.01, size=(64, 64)).astype(np.float32).clip(0, 1)
        st = sharded_auto_stretch(mesh, max_iter=8)
        s_out, _, s_n, _ = st(place_on_mesh(jnp.asarray(img), mesh),
                              jnp.float32(0.25), jnp.float32(0.05))
        u_out, _, u_n, _ = auto_stretch(jnp.asarray(img), 0.25, 0.05, max_iter=8)
        assert int(s_n) == int(u_n)
        np.testing.assert_allclose(np.asarray(s_out), np.asarray(u_out),
                                   rtol=1e-5, atol=1e-6)
        assert len(s_out.addressable_shards) == 8

    def test_place_on_mesh_replicates_indivisible_rows(self, mesh):
        from nightlight_tpu.parallel.mesh import place_on_mesh

        odd = place_on_mesh(jnp.zeros((63, 16)), mesh)
        assert odd.sharding.is_fully_replicated
        even = place_on_mesh(jnp.zeros((3, 64, 16)), mesh)  # (C, H, W)
        assert not even.sharding.is_fully_replicated


class TestMeshContextPipeline:
    """Context.mesh: frames load row-sharded and the whole operator job
    (load -> bad pixel -> detect -> select ref -> match -> align -> stack ->
    save) runs SPMD via sharding propagation. Results must match the
    unsharded job."""

    def _run_job(self, tmp_path, sub, mesh):
        import io
        import os

        # serialize device work: queued 8-way collective programs can starve
        # an XLA:CPU rendezvous participant past its termination deadline on
        # few-core hosts (same mitigation as the multichip dryrun)
        os.environ["NIGHTLIGHT_SYNC_FLUSH"] = "1"

        from nightlight_tpu.pipeline import materialize_all, op_from_dict
        from nightlight_tpu.pipeline.context import new_context

        job = {"type": "seq", "steps": [
            {"type": "loadMany", "filePatterns": ["light*.fits"]},
            {"type": "badPixel", "sigmaLow": 3.0, "sigmaHigh": 5.0},
            {"type": "starDetect", "radius": 16, "sigma": 10.0,
             "badPixelSigma": 5.0, "inOutRatio": 1.4},
            {"type": "selectRef", "target": 1, "mode": "%starsHFR"},
            {"type": "selectRef", "target": 0, "mode": "%starsHFR"},
            {"type": "matchHist", "mode": 2},
            {"type": "align", "k": 20, "threshold": 1.0, "oobMode": 0},
            {"type": "stack", "mode": 2, "sigmaLow": 2.75, "sigmaHigh": 2.75},
            {"type": "save", "filePattern": os.path.join(str(tmp_path), sub)},
        ]}
        log = io.StringIO()
        c = new_context(log=log)
        c.mesh = mesh
        op = op_from_dict(job)
        cwd = os.getcwd()
        os.chdir(tmp_path)
        try:
            promises = op.make_promises([], c)
            _, err = materialize_all(promises, c.max_threads, True)
            if err is not None:
                raise err
            c.finalize()
        finally:
            os.chdir(cwd)
            os.environ.pop("NIGHTLIGHT_SYNC_FLUSH", None)
        return log.getvalue()

    def test_full_job_sharded_matches_unsharded(self, mesh, rng, tmp_path):
        from nightlight_tpu.io import fits as nlfits
        from tests.test_pipeline_e2e import write_frames

        write_frames(tmp_path, rng, n_frames=4)
        log_s = self._run_job(tmp_path, "sharded.fits", mesh)
        log_u = self._run_job(tmp_path, "unsharded.fits", None)
        assert "Stacking 4 frames" in log_s

        out_s = nlfits.read_file(str(tmp_path / "sharded.fits"))
        out_u = nlfits.read_file(str(tmp_path / "unsharded.fits"))
        a, b = np.asarray(out_s.data), np.asarray(out_u.data)
        m = ~(np.isnan(a) | np.isnan(b))
        assert m.mean() > 0.9
        np.testing.assert_allclose(a[m], b[m], rtol=1e-4, atol=1e-3)

    def test_star_detect_disables_pallas_gather_under_mesh(self, mesh, rng, tmp_path):
        """A pallas_call cannot address global rows of a mesh-sharded
        operand, so OpStarDetect must force the XLA gather when a mesh is
        set -- regardless of what backend auto-detection says."""
        from unittest import mock

        from nightlight_tpu.pipeline import ops_pre
        from nightlight_tpu.pipeline.context import new_context
        from nightlight_tpu.pipeline.operators import OpLoad
        from tests.test_pipeline_e2e import write_frames

        names = write_frames(tmp_path, rng, n_frames=1)
        c = new_context()
        c.mesh = mesh
        f = OpLoad(id=0, file_name=names[0]).apply(None, c)
        import nightlight_tpu.detect.stars as stars_mod

        with mock.patch.object(stars_mod, "find_stars",
                               wraps=stars_mod.find_stars) as spy:
            ops_pre.OpStarDetect(radius=16, sigma=10.0, bad_pixel_sigma=5.0,
                                 in_out_ratio=1.4).apply(f, c)
        assert spy.called
        assert spy.call_args.kwargs.get("use_pallas_gather") is False

    def test_loaded_frame_is_row_sharded(self, mesh, rng, tmp_path):
        from nightlight_tpu.pipeline.context import new_context
        from nightlight_tpu.pipeline.operators import OpLoad
        from tests.test_pipeline_e2e import write_frames

        names = write_frames(tmp_path, rng, n_frames=1)
        c = new_context()
        c.mesh = mesh
        f = OpLoad(id=0, file_name=names[0]).apply(None, c)
        assert not f.data.sharding.is_fully_replicated
        assert len(f.data.addressable_shards) == 8
