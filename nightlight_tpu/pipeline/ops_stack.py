"""Stacking operators: OpStack (n->1 barrier) and OpStackBatches (the
larger-than-memory randomized batching engine)
(reference: internal/ops/stack/stack.go, stackbatches.go)."""

from __future__ import annotations

import random
from dataclasses import dataclass

import jax.numpy as jnp

from nightlight_tpu.image import Image
from nightlight_tpu.ops import stack as stk
from nightlight_tpu.pipeline.context import Context
from nightlight_tpu.pipeline.operators import OpSequence, Operator, materialize_all, register


@dataclass
class FusedPreprocessSpec:
    """Parameters for the fused whole-batch preprocess executor
    (models/fastpath.run_fused_preprocess). Attached to OpStackBatches by
    the CLI preset builder when the per-batch DAG is the canonical
    calibrate -> badPixel -> starDetect [-> exportStats] chain; the fused
    program replaces exactly per_batch.steps[0] (the preprocess OpSequence),
    and the remaining steps run unchanged. Wiring-only, like the reference's
    json:"-" operator links -- never part of the JSON schema."""

    dark: str = ""
    flat: str = ""
    bp_sigma_low: float = 3.0
    bp_sigma_high: float = 5.0
    star_radius: int = 16
    star_sig: float = 15.0
    star_bp_sig: float = 5.0
    star_in_out: float = 1.4
    export_stats: str | None = None
    # OSC/color chain stages (all no-ops at these defaults): CFA-aware
    # bad-pixel repair + single-channel debayer, pixel math, NxN binning --
    # the reference's one-shot-color configs (debayer.go:26-263).
    debayer: str = ""
    cfa: str = "RGGB"
    pre_scale: float = 1.0
    pre_offset: float = 0.0
    binning: int = 1
    # deband stages as (percentile, window, sigma) or None (banding.go)
    deband_h: tuple | None = None
    deband_v: tuple | None = None
    # automated background extraction (background.go:30-515); grid 0 = off
    back_grid: int = 0
    back_sigma: float = 1.5
    back_clip: int = 0
    back_hfr_factor: float = 4.0


@register
class OpStack(Operator):
    """Stack all input frames into one image (stack.go:66-227)."""

    TYPE = "stack"
    PARAMS = {
        "mode": ("mode", int(stk.StackMode.Auto)),
        "weighting": ("weighting", int(stk.StackWeighting.NoWeight)),
        "sigma_low": ("sigmaLow", 2.75),
        "sigma_high": ("sigmaHigh", 2.75),
        # Goal-seek targets used when a sigma is negative ("-1: use clipping
        # percentage to find", main.go:112-113 -- dead code in the reference,
        # live here).
        "clip_perc_low": ("clipPercLow", 0.5),
        "clip_perc_high": ("clipPercHigh", 0.5),
    }

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.ref_frame_loc = 0.0  # json:"-" in the reference

    def make_promises(self, ins, c):
        if not ins:
            raise ValueError(f"{self.TYPE} operator needs inputs")

        def out():
            fs, err = materialize_all(ins, c.max_threads, False)
            if err is not None:
                raise err
            # Apply any deferred alignment threshold decisions: resolving the
            # first residual flushes the whole pool in one transfer.
            # project=False keeps the warps pending so apply() can project
            # the whole batch as one device program (fused tail).
            from nightlight_tpu.pipeline.ops_post import check_align_drop

            fs = [check_align_drop(f, c, project=False) for f in fs]
            fs = [f for f in fs if f is not None]
            if not fs:
                raise ValueError("No frames left to stack after alignment")
            return self.apply(fs, c)

        return [out]

    @staticmethod
    def _batch_frames(fs: list[Image], c: Context):
        """Device (N, H, W) batch of the input frames with pending warps
        applied -- as ONE donated vmapped shift-warp program when every
        pending transform is shift-eligible and shapes are uniform (the
        fused warp+stack tail), else per-frame projection (the general
        path: gather warps, mesh-sharded frames, mixed shapes)."""
        import numpy as np

        from nightlight_tpu.align import transform as tf
        from nightlight_tpu.deferred import resolve_maybe
        from nightlight_tpu.ops.resample import (
            _warp_shift_batch, plan_batch_shift_warp)

        pending = [f for f in fs if getattr(f, "pending_warp_oob", None) is not None]
        shape0 = fs[0].data.shape
        fused = None
        if pending and c.mesh is None and all(
                f.data.ndim == 2 and f.data.shape == shape0
                and list(f.naxisn) == [shape0[1], shape0[0]] for f in fs):
            invs = []
            for f in fs:
                if getattr(f, "pending_warp_oob", None) is not None:
                    invs.append(tf.invert(np.asarray(resolve_maybe(f.trans), np.float32)))
                else:
                    invs.append(tf.invert(tf.identity()))
            fused = plan_batch_shift_warp([f.data.shape for f in fs],
                                          fs[0].naxisn, invs)
        if fused is not None:
            kmins, mmins, n_k, n_m = fused
            flags = np.array(
                [getattr(f, "pending_warp_oob", None) is not None for f in fs])
            oobs = np.array(
                [float(resolve_maybe(getattr(f, "pending_warp_oob", None) or 0.0))
                 for f in fs], np.float32)
            batch = jnp.stack([f.data for f in fs])
            for f in fs:  # free originals; the batch is donated to the warp
                f.data = None
                f.pending_warp_oob = None
            return _warp_shift_batch(
                batch, jnp.asarray(np.stack(invs), jnp.float32),
                jnp.asarray(oobs), jnp.asarray(kmins), jnp.asarray(mmins),
                jnp.asarray(flags), n_k, n_m)
        # fallback: per-frame projection (gather warps, mixed shapes, mesh)
        from nightlight_tpu.ops.resample import project

        for f in fs:
            oob = getattr(f, "pending_warp_oob", None)
            if oob is None:
                continue
            trans = np.asarray(resolve_maybe(f.trans), np.float32)
            f.trans = trans
            f.set_data(project(f.data, f.naxisn, trans, float(resolve_maybe(oob))))
            f.pending_warp_oob = None
        frames = jnp.stack([f.data for f in fs])
        for f in fs:
            f.data = None
        return frames

    def apply(self, fs: list[Image], c: Context) -> Image:
        mode = stk.StackMode(self.mode)
        if mode == stk.StackMode.Auto:
            mode = stk.auto_select_mode(len(fs))
        c.logf("Stacking %d frames with stacking mode %d and sigma low %g high %g:\n",
               len(fs), int(mode), self.sigma_low, self.sigma_high)

        weights = stk.get_weights(fs, stk.StackWeighting(self.weighting))

        exposure_sum = sum(f.exposure for f in fs)
        naxisn0 = list(fs[0].naxisn)
        ls_mode0 = fs[0].stats.mode if fs[0].stats else None
        # The fused warp+stack tail: any pending deferred warps apply to the
        # whole batch as ONE donated device program (per-frame source
        # buffers are freed as they are batched -- the reference frees
        # primaries after stacking too, stackbatches.go:104-111).
        frames = self._batch_frames(fs, c)
        for f in fs:
            if f.stats is not None:
                f.stats.free_data()
        # c.mesh routes the reduction through shard_map (stack_sharded /
        # _sharded_search): each shard runs the stack -- Pallas kernels
        # included -- on its local rows with psum'd clip counters.
        if self.sigma_low < 0 or self.sigma_high < 0:
            from nightlight_tpu.ops.findsigma import find_sigmas_and_stack

            data, clip_lo, clip_hi, sig_lo, sig_hi = find_sigmas_and_stack(
                frames, mode, weights=weights, ref_frame_loc=self.ref_frame_loc,
                clip_perc_low=self.clip_perc_low, clip_perc_high=self.clip_perc_high,
                log=c.log, mesh=c.mesh)
        else:
            data, clip_lo, clip_hi = stk.stack(
                frames, mode, weights=weights,
                sigma_low=self.sigma_low, sigma_high=self.sigma_high,
                ref_frame_loc=self.ref_frame_loc, mesh=c.mesh)

        if mode >= stk.StackMode.Sigma:
            total = len(fs) * fs[0].pixels
            c.logf("Clipped low %d (%.2f%%) high %d (%.2f%%)\n",
                   int(clip_lo), float(clip_lo) * 100.0 / total,
                   int(clip_hi), float(clip_hi) * 100.0 / total)

        result = Image.from_naxisn(naxisn0, data, ls_mode=ls_mode0)
        result.exposure = exposure_sum
        return result


@register
class OpStackBatches(Operator):
    """Larger-than-memory stacking: solve a memory-feasible batch size,
    randomly permute frames into batches, run the per-batch sub-DAG, and
    combine incrementally (stackbatches.go:30-210)."""

    TYPE = "stackBatches"
    PARAMS = {}

    def __init__(self, per_batch: OpSequence | None = None,
                 fused_spec: FusedPreprocessSpec | None = None,
                 fused_reason: str | None = None, **kwargs):
        super().__init__(**kwargs)
        self.per_batch = per_batch or OpSequence()
        # wiring-only (set by the CLI preset builder): fused whole-batch
        # preprocess replacing per_batch.steps[0]; fused_reason says WHY the
        # fused path is unavailable when fused_spec is None (logged once per
        # batch so losing the fast path is never silent)
        self.fused_spec = fused_spec
        self.fused_reason = fused_reason
        # raw-byte budget for next-batch upload prefetch; set by _partition
        # when the run is multi-batch (double-buffered streaming)
        self._prefetch_bytes = 0

    def to_dict(self) -> dict:
        return {"type": self.TYPE, "perBatch": self.per_batch.to_dict()}

    @classmethod
    def from_dict(cls, d: dict) -> "OpStackBatches":
        from nightlight_tpu.pipeline.operators import op_from_dict

        pb = d.get("perBatch")
        return cls(per_batch=op_from_dict(pb) if pb else None)

    def make_promises(self, ins, c):
        if not ins:
            raise ValueError("No frames to batch process")
        return [lambda: self.apply(ins, c)]

    def apply(self, ins, c: Context) -> Image:
        ins_perm, num_batches, batch_size, max_threads = self._partition(ins, c)
        c.max_threads = max_threads
        c.stats_total = len(ins_perm)
        c.stats_processed = 0

        stack_acc = None
        stack_img = None
        stack_frames = 0
        for b in range(num_batches):
            batch = ins_perm[b * batch_size : (b + 1) * batch_size]
            next_batch = ins_perm[(b + 1) * batch_size : (b + 2) * batch_size]
            c.logf("\nStarting batch %d of %d with %d frames...\n", b + 1, num_batches, len(batch))
            promises = self._batch_promises(batch, c, next_batch=next_batch)
            if len(promises) != 1:
                raise ValueError("stacking returned more than one promise")
            batch_img = promises[0]()
            if num_batches > 1:
                if stack_img is None:
                    stack_img = Image.like(batch_img)
                    stack_img.exposure = 0.0
                stack_acc = stk.stack_incremental(stack_acc, batch_img.data, float(len(batch)))
                stack_img.exposure += batch_img.exposure
                stack_frames += len(batch)
            else:
                stack_img = batch_img

        c.dark_frame, c.flat_frame = None, None

        if num_batches > 1:
            stack_img.set_data(stk.stack_incremental_finalize(stack_acc, float(stack_frames)))
        return stack_img

    @staticmethod
    def _batch_loader(batch):
        """(load order, bulk-ingest loader) discovered from a batch's load
        promises (io/ingest.BulkUploader)."""
        names, loader = [], None
        for p in batch:
            op = getattr(p, "op", None)
            fn = getattr(op, "file_name", None)
            if fn:
                names.append(fn)
                loader = getattr(op, "_prefetcher", None) or loader
        return names, loader

    @classmethod
    def _announce_batch(cls, batch) -> None:
        """Tell a shared bulk-ingest loader this batch's load order so
        upload grouping follows batch membership — an out-of-core run must
        not upload other batches' frames (io/ingest.BulkUploader)."""
        names, loader = cls._batch_loader(batch)
        if names and hasattr(loader, "reorder"):
            loader.reorder(names)

    def _prefetch_next(self, next_batch, c: Context) -> None:
        """Double-buffered streaming (SURVEY §5): dispatch the NEXT batch's
        host reads + H2D uploads now, so they stream over the wire while
        THIS batch's preprocess/align/stack programs execute and sync. The
        uploads stay undecoded in HBM (raw integer size) inside the memory
        reserve _partition budgeted; the reference's batch loop is strictly
        sequential because host RAM is its constraint (stackbatches.go:
        56-107) — here the wire is, and it must never idle.
        NIGHTLIGHT_NO_PREFETCH=1 disables (A/B control)."""
        import os

        if not next_batch or not self._prefetch_bytes \
                or os.environ.get("NIGHTLIGHT_NO_PREFETCH"):
            return
        names, loader = self._batch_loader(next_batch)
        if not names or not hasattr(loader, "prefetch_ahead"):
            return
        n = loader.prefetch_ahead(names, self._prefetch_bytes)
        if n:
            c.logf("Prefetched %d frames of the next batch during this batch's compute.\n", n)

    def _batch_promises(self, batch, c: Context, next_batch=None):
        """Promise chain for one batch: the fused whole-batch executor when
        eligible (one device program + one sync for calibrate/badPixel/
        starDetect, models/fastpath.py), else the general per-frame DAG.
        Every fallback to the per-frame path logs its reason (a config one
        flag away from the fused path must be able to tell it lost it)."""
        self._announce_batch(batch)
        if self.fused_spec is None or not self.per_batch.steps:
            if self.per_batch.steps and self.fused_reason:
                c.logf("Fused batch executor off (%s); using the per-frame "
                       "operator path.\n", self.fused_reason)
            return self.per_batch.make_promises(batch, c)

        from nightlight_tpu.models.fastpath import (
            fused_batch_eligible, run_fused_preprocess)

        # materialize the loads (each logs its "Loaded" line as usual)
        images, err = materialize_all(batch, c.max_threads, False)
        if err is not None:
            raise err
        # this batch's uploads are dispatched (in flight); queue the next
        # batch's behind them before any compute sync blocks this thread
        self._prefetch_next(next_batch, c)
        wrapped = [lambda img=img: img for img in images]
        eligible, reason = fused_batch_eligible(images, c)
        if not eligible:
            c.logf("Fused batch executor off (%s); using the per-frame "
                   "operator path.\n", reason)
            return self.per_batch.make_promises(wrapped, c)
        run_fused_preprocess(images, c, self.fused_spec)
        tail = OpSequence(steps=list(self.per_batch.steps[1:]))
        return tail.make_promises(wrapped, c)

    @staticmethod
    def _device_memory_mb() -> int:
        """Usable accelerator memory in MiB. The reference budgets host RAM
        (stackbatches.go:146); on TPU the frame batch must also fit HBM, which
        is usually the binding constraint. Falls back to a conservative v5e
        figure when the backend does not report memory stats."""
        import jax

        try:
            stats = jax.devices()[0].memory_stats()
            if stats and "bytes_limit" in stats:
                return int(stats["bytes_limit"] // (1 << 20))
        except Exception:  # noqa: BLE001
            pass
        try:
            if jax.devices()[0].platform == "tpu":
                return 16 * 1024  # v5e HBM
        except Exception:  # noqa: BLE001
            pass
        return 1 << 30  # effectively unbounded (CPU host memory governs)

    def _partition(self, ins, c: Context):
        """Memory-budget solver + random permutation (stackbatches.go:121-210).

        The budget is min(host stacking budget, ~60% of device memory): the
        stacked (frames x pixels) batch plus kernel working set must be
        HBM-resident.
        """
        num_frames = len(ins)
        if c.dark_frame is not None:
            width, height = c.dark_frame.naxisn[0], c.dark_frame.naxisn[1]
        elif c.flat_frame is not None:
            width, height = c.flat_frame.naxisn[0], c.flat_frame.naxisn[1]
        else:
            first = ins[0]()
            c.logf("\nEstimating memory needs for %d images from %s:\n", num_frames, first.file_name)
            width, height = first.naxisn[0], first.naxisn[1]
            # keep the materialized first frame so it is not loaded twice
            ins = [(lambda img=first: img)] + list(ins[1:])
        pixels = width * height
        nbytes = pixels * 4
        mib = nbytes // (1 << 20)
        c.logf("%d images of %dx%d pixels (%.1f MPixels), which each take %d MiB in-memory"
               " as floating point.\n", num_frames, width, height, pixels * 1e-6, mib)

        detect_ws_mb = 0
        if self.fused_spec is not None:
            # The fused executor donates the input batch (fastpath.py), so
            # its HBM peak is ~1x the frame pixels (repaired batch aliasing
            # the raw one) PLUS detection's candidate working set, which is
            # per-CHUNK, not per-frame (DETECT_CHUNK x K x patch buffers --
            # it dominated and OOMed a 250x1MP batch when budgeted per
            # pixel). The buffer factor 6 covers the CoM/HFR temporaries:
            # the compiled program's measured temp allocation is ~4.1
            # patch-buffers' worth (memory_analysis at (8,512,512) and
            # (8,1024,1024): 1.14 GB vs 0.83 GB for 3 unpadded buffers), so
            # 6 gives ~1.5x margin on top of the measured peak. The frame
            # term keeps factor 2 as margin for the downstream warp+stack
            # phase, whose input and output batches coexist. Host stacking
            # memory budgets the frames alone, like the reference's
            # -stMemory.
            from nightlight_tpu.models.fastpath import DETECT_CHUNK
            from nightlight_tpu.detect.stars import MAX_CANDIDATES

            patch = 4 * (self.fused_spec.star_radius or 16) + 1
            detect_ws_mb = (DETECT_CHUNK * MAX_CANDIDATES
                            * ((patch + 15) // 8 * 8) * ((patch + 127) // 128 * 128)
                            * 4 * 6) >> 20
            dev_budget_mb = self._device_memory_mb() * 5 // 10
            dev_frames = max(0, dev_budget_mb - detect_ws_mb) // max(1, 2 * mib)
            available_frames = min((c.stack_memory_mb << 20) // nbytes, dev_frames)
        else:
            budget_mb = min(c.stack_memory_mb, self._device_memory_mb() * 6 // 10)
            available_frames = (budget_mb << 20) // nbytes
        c.logf("CPU has %d threads. Physical memory is %d MiB, -op.Memory is %d MiB,"
               " this fits %d frames.\n", c.max_threads, c.memory_mb, c.stack_memory_mb,
               available_frames)

        def solve(avail):
            max_threads = c.max_threads
            num_batches = batch_size = 0
            while max_threads >= 1:
                batch_size = avail - max_threads
                if c.dark_frame is not None:
                    batch_size -= 1
                if c.flat_frame is not None:
                    batch_size -= 1
                if batch_size < 2:
                    max_threads -= 1
                    continue
                num_batches = (num_frames + batch_size - 1) // batch_size
                if num_batches > 1:
                    batch_size -= 2  # reference frame + stack of stacks
                if batch_size < 2 or batch_size < max_threads:
                    max_threads -= 1
                    continue
                break
            if max_threads < 1 or batch_size < 2:
                raise ValueError("Cannot find a stacking execution path within the given memory constraints.")
            # DIVERGENCE from stackbatches.go:168-184: the reference computes
            # numBatches from the PRE-subtraction batch size, so for inputs
            # where ceil(n/bs)*(bs-2) < n (e.g. 100 frames at bs=26 ->
            # 4 batches of 24 = 96) its batch loop silently never stacks the
            # last frames. Recompute the batch count from the final batch
            # size so coverage holds; the shrink loop below then preserves
            # batch_size*num_batches >= num_frames while minimizing the
            # per-batch memory footprint, which is the reference's intent.
            num_batches = (num_frames + batch_size - 1) // batch_size
            while (batch_size - 1) * num_batches >= num_frames:
                batch_size -= 1
            return num_batches, batch_size, max_threads

        num_batches, batch_size, max_threads = solve(available_frames)
        self._prefetch_bytes = 0
        if num_batches > 1 and self.fused_spec is not None:
            # Double-buffered streaming reserve: the NEXT batch prefetches at
            # raw integer size (~nbytes/2 per frame) while this batch still
            # holds its f32 frames through the warp (2x nbytes margin), so
            # the per-frame HBM budget grows from 2x to 2.5x. Re-solve with
            # the reserve; prefetch is capped to the solved batch size.
            dev_budget_mb = self._device_memory_mb() * 5 // 10
            dev_frames_r = max(0, dev_budget_mb - detect_ws_mb) \
                // max(1, 2 * mib + (mib + 1) // 2)
            avail_r = min((c.stack_memory_mb << 20) // nbytes, dev_frames_r)
            num_batches, batch_size, max_threads = solve(avail_r)
            self._prefetch_bytes = batch_size * (nbytes // 2)
        c.logf("Using %d random batches of size %d with %d images in parallel.\n",
               num_batches, batch_size, max_threads)

        ins_perm = list(ins)
        if num_batches > 1:
            c.logf("Randomizing input files into batches...\n")
            perm = list(range(len(ins)))
            random.shuffle(perm)
            for i in range(num_batches):
                lo, hi = i * batch_size, min((i + 1) * batch_size, len(perm))
                perm[lo:hi] = sorted(perm[lo:hi])
            ins_perm = [ins[p] for p in perm]
        return ins_perm, num_batches, batch_size, max_threads
