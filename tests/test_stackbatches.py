"""Out-of-core batch solver and multi-batch stacking tests
(reference: internal/ops/stack/stackbatches.go)."""

import io

import numpy as np
import jax.numpy as jnp
import pytest

from nightlight_tpu.image import Image
from nightlight_tpu.pipeline.context import new_context
from nightlight_tpu.pipeline.operators import OpSequence
from nightlight_tpu.pipeline.ops_stack import OpStack, OpStackBatches
from nightlight_tpu.ops.stack import StackMode


def image_promise(rng, value, w=32, h=32, i=0):
    def p():
        img = Image.from_naxisn([w, h],
                                np.full((h, w), value, np.float32)
                                + rng.normal(0, 0.1, size=(h, w)).astype(np.float32))
        img.id = i
        img.exposure = 10.0
        return img
    return p


class TestPartition:
    def _ctx(self, st_memory_mb):
        return new_context(log=io.StringIO(), st_memory=st_memory_mb)

    def test_single_batch_when_memory_ample(self, rng):
        c = self._ctx(10_000)
        op = OpStackBatches(per_batch=OpSequence(steps=[OpStack(mode=int(StackMode.Mean))]))
        ins = [image_promise(rng, 10.0, i=i) for i in range(6)]
        ins_perm, num_batches, batch_size, max_threads = op._partition(ins, c)
        assert num_batches == 1
        assert batch_size >= 6
        assert len(ins_perm) == 6

    def test_multi_batch_when_memory_tight(self, rng):
        # 32x32 f32 = 4KiB per frame; 1 MiB budget with overheads forces
        # multiple batches for ~600 frames
        c = self._ctx(1)
        c.max_threads = 2
        op = OpStackBatches(per_batch=OpSequence(steps=[OpStack(mode=int(StackMode.Mean))]))
        ins = [image_promise(rng, 10.0, i=i) for i in range(600)]
        ins_perm, num_batches, batch_size, max_threads = op._partition(ins, c)
        assert num_batches > 1
        assert batch_size * num_batches >= 600
        # randomized permutation preserves the full set
        assert len(ins_perm) == 600

    def test_partition_covers_all_frames_in_the_ceil_window(self, rng):
        """Regression (round 4, found by the first literal 100x16MP run):
        the reference computes numBatches from the PRE-subtraction batch
        size (stackbatches.go:168-184), so 100 frames at an available-frame
        budget of 27 solve to 4 batches of 24 = 96 frames and the batch
        loop silently never stacks the last 4. We recompute the batch count
        from the final batch size; every frame must land in a batch."""
        c = self._ctx(54)  # 1024x512 f32 = 2 MiB/frame -> 27 available
        c.max_threads = 1
        op = OpStackBatches(per_batch=OpSequence(steps=[OpStack(mode=int(StackMode.Mean))]))
        ins = [image_promise(rng, 10.0, w=1024, h=512, i=i) for i in range(100)]
        ins_perm, num_batches, batch_size, _ = op._partition(ins, c)
        assert len(ins_perm) == 100
        assert num_batches * batch_size >= 100
        covered = sum(
            len(ins_perm[b * batch_size:(b + 1) * batch_size])
            for b in range(num_batches))
        assert covered == 100

    def test_infeasible_memory_raises(self, rng):
        c = self._ctx(0)
        c.stack_memory_mb = 0
        op = OpStackBatches(per_batch=OpSequence(steps=[OpStack(mode=int(StackMode.Mean))]))
        ins = [image_promise(rng, 10.0, i=i) for i in range(4)]
        with pytest.raises(ValueError, match="memory constraints"):
            op._partition(ins, c)

    def test_device_budget_caps_host_budget(self, rng, monkeypatch):
        c = self._ctx(10_000_000)  # absurd host budget
        monkeypatch.setattr(OpStackBatches, "_device_memory_mb", staticmethod(lambda: 10))
        op = OpStackBatches(per_batch=OpSequence(steps=[OpStack(mode=int(StackMode.Mean))]))
        ins = [image_promise(rng, 10.0, i=i) for i in range(3000)]
        _, num_batches, batch_size, _ = op._partition(ins, c)
        # 10 MiB * 0.6 = 6 MiB -> ~1536 32x32 frames max per batch
        assert num_batches >= 2


class TestMultiBatchStack:
    def test_incremental_combination_matches_global_mean(self, rng):
        """Stack-of-stacks over randomized batches equals the global mean for
        mean stacking (stackbatches.go:96-118 semantics)."""
        c = new_context(log=io.StringIO(), st_memory=1)
        c.max_threads = 2
        op = OpStackBatches(per_batch=OpSequence(steps=[OpStack(mode=int(StackMode.Mean))]))
        values = rng.uniform(5, 15, size=40)
        ins = [image_promise(rng, v, i=i) for i, v in enumerate(values)]
        out = op.apply(ins, c)
        assert out is not None
        got = float(np.asarray(out.data).mean())
        assert got == pytest.approx(float(values.mean()), abs=0.05)
        assert out.exposure == pytest.approx(400.0)

    def test_log_reports_batching(self, rng):
        log = io.StringIO()
        c = new_context(log=log, st_memory=1)
        c.max_threads = 2
        op = OpStackBatches(per_batch=OpSequence(steps=[OpStack(mode=int(StackMode.Mean))]))
        ins = [image_promise(rng, 10.0, i=i) for i in range(40)]
        op.apply(ins, c)
        text = log.getvalue()
        assert "random batches of size" in text
        assert "Starting batch 1 of" in text
