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
