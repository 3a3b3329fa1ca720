"""Histogram normalization and alignment operators
(reference: internal/ops/post/postprocess.go)."""

from __future__ import annotations

import threading
from enum import IntEnum


from nightlight_tpu.image import Image
from nightlight_tpu.ops import pixelmath as pm
from nightlight_tpu.pipeline.context import Context
from nightlight_tpu.pipeline.operators import UnaryOperator, register


class HistoNormMode(IntEnum):
    """Histogram normalization modes (postprocess.go:33-39)."""

    NoNorm = 0
    Location = 1
    LocScale = 2
    LocBlack = 3
    Auto = 4


class OutOfBoundsMode(IntEnum):
    """Out-of-bounds fill for projection (postprocess.go:99-103)."""

    NaN = 0
    RefLocation = 1
    OwnLocation = 2


@register
class OpMatchHistogram(UnaryOperator):
    """Match histogram against the context reference (postprocess.go:41-94)."""

    TYPE = "matchHist"
    PARAMS = {"mode": ("mode", int(HistoNormMode.LocScale))}

    def apply(self, f: Image, c: Context):
        if f is None:
            return None
        mode = HistoNormMode(self.mode)
        if mode == HistoNormMode.NoNorm:
            return f
        if c.match_histo is None:
            raise ValueError("missing histogram reference")
        if mode == HistoNormMode.Location:
            multiplier = c.match_histo.location / f.stats.location
            f.data = pm.match_location(f.data, f.stats.location, c.match_histo.location)
            f.stats.replace_data(f.data)
            f.stats.update_cached_with(multiplier, 0.0)
        elif mode == HistoNormMode.LocScale:
            multiplier = c.match_histo.scale / f.stats.scale
            offset = c.match_histo.location - f.stats.location * multiplier
            f.data = pm.match_histogram(f.data, f.stats.location, f.stats.scale,
                                        c.match_histo.location, c.match_histo.scale)
            f.stats.replace_data(f.data)
            f.stats.update_cached_with(multiplier, offset)
        elif mode == HistoNormMode.LocBlack:
            f.data = pm.shift_black_to_move(f.data, f.stats.location, c.match_histo.location)
            f.stats.set_data(f.data)
        c.logf("%d: %s after matching reference histogram %s\n", f.id, f.stats, c.match_histo)
        return f


@register
class OpAlign(UnaryOperator):
    """Align each frame to the context reference and project it
    (postprocess.go:105-207)."""

    TYPE = "align"
    PARAMS = {
        "k": ("k", 50),
        "threshold": ("threshold", 1.0),
        "oob_mode": ("oobMode", int(OutOfBoundsMode.NaN)),
    }

    def __init__(self, defer_warp: bool = False, **kwargs):
        super().__init__(**kwargs)
        self._mutex = threading.Lock()
        self._aligner = None
        # wiring-only (set by the CLI stack preset): postpone the projection
        # to the stack/save barrier, where the transform is host-resolved
        # anyway for the drop decision -- the warp then runs through the
        # gather-free shift-blend path (ops/resample.py), 164x faster than
        # the on-device gather warp for alignment-sized transforms. Only
        # valid when every downstream consumer applies check_align_drop
        # before reading frame data (OpStack and OpSave do).
        self.defer_warp = defer_warp

    def _init_aligner(self, c: Context) -> None:
        with self._mutex:
            if self.k <= 0 or self._aligner is not None:
                return
            if c.align_naxisn is None or c.align_stars is None:
                raise ValueError("Unable to align without reference frame")
            if len(c.align_stars) == 0:
                raise ValueError("Unable to align without star detections in reference frame")
            from nightlight_tpu.align.aligner import Aligner

            self._aligner = Aligner(c.align_naxisn, c.align_stars, self.k)

    def make_promises(self, ins, c):
        """Batch prepass: the first promise to run materializes ALL inputs
        (the selectRef barrier upstream already materialized them) and runs
        the WHOLE batch's alignment searches as ONE device program
        (Aligner.align_batch_deferred) -- star pick and triangle generation
        included. Each per-frame promise then applies with its precomputed
        deferred result. Per-frame dispatch (one host triangle build plus a
        ~3/4 MB upload per frame) dominated the match+align phase on
        many-small-frame configs. NIGHTLIGHT_NO_BATCH_ALIGN=1 restores the
        per-frame path."""
        import os

        if (not ins or self.k <= 0
                or os.environ.get("NIGHTLIGHT_NO_BATCH_ALIGN")):
            return super().make_promises(ins, c)

        state = {"frames": None, "results": None, "error": None}
        lock = threading.Lock()

        def _materialize_positional():
            """materialize_all, position-preserving: dropped frames stay as
            None in place so promise i still maps to frame i."""
            from nightlight_tpu.pipeline.operators import materialize_all

            return materialize_all(ins, c.max_threads, forget=False,
                                   compact=False)

        def mk(i: int):
            def out():
                with lock:
                    if state["error"] is not None:
                        raise RuntimeError("same error")
                    if state["frames"] is None:
                        frames, err = _materialize_positional()
                        if err is not None:
                            state["error"] = err
                            raise err
                        state["frames"] = frames
                        try:
                            state["results"] = self._batch_align(frames, c)
                        except Exception as e:
                            state["error"] = e
                            raise
                f = state["frames"][i]
                state["frames"][i] = None
                if f is None:
                    return None
                results = state["results"]
                return self.apply(f, c, _batch_result=results.get(i) if results else None)

            return out

        return [mk(i) for i in range(len(ins))]

    def _batch_align(self, frames, c: Context):
        """One batched device dispatch covering every alignable frame.
        Returns {frame index: (trans, residual) deferred pair} or None when
        no frame qualifies; frames outside the dict take the per-frame path
        in apply() (ref frame, too few stars, missing star lists)."""
        if not any(f is not None and f.stars is not None and len(f.stars) > 0
                   for f in frames):
            return None
        self._init_aligner(c)
        aligner = self._aligner
        if aligner is None or len(aligner.ref_stars) == 0 or not aligner.ref_tris.size:
            return None
        eligible = [i for i, f in enumerate(frames)
                    if f is not None and f.stars is not None
                    and f.stars is not aligner.ref_stars and len(f.stars) >= 3]
        if not eligible:
            return None
        rows = aligner.align_batch_deferred(
            [(frames[i].naxisn, frames[i].stars) for i in eligible])
        return dict(zip(eligible, rows))

    def apply(self, f: Image, c: Context, _batch_result=None):
        if f is None:
            return None
        from nightlight_tpu.align import transform as tf

        self._init_aligner(c)
        aligner = self._aligner

        if self.k <= 0 or aligner is None or len(aligner.ref_stars) == 0:
            f.trans = tf.identity()
        elif f.stars is aligner.ref_stars:
            # reference frame itself (postprocess.go:155-157)
            f.trans = tf.identity()
        elif f.stars is None or len(f.stars) == 0:
            c.logf("%d: No alignment stars found, skipping frame\n", f.id)
            return None
        else:
            mode = OutOfBoundsMode(self.oob_mode)
            if mode == OutOfBoundsMode.NaN:
                oob = float("nan")
            elif mode == OutOfBoundsMode.RefLocation:
                oob = c.match_histo.location
            else:
                oob = f.stats.location

            # Dispatch-only: the alignment search stays on device. With
            # defer_warp the residual and transform resolve at the next
            # consumer (stack barrier or a save), where check_align_drop
            # applies the reference's frame-dropping rule
            # (postprocess.go:177-180) with the same log line and projects
            # the kept frames. _batch_result carries this frame's row of the
            # whole-batch program (make_promises prepass) when present.
            if _batch_result is not None:
                trans, residual = _batch_result
            else:
                out_def = aligner.align_deferred(f.naxisn, f.stars, f.id)
                if out_def is None:
                    c.logf("%d: No alignment stars found, skipping frame\n", f.id)
                    return None
                trans, residual, _ = out_def
            f.trans, f.residual = trans, residual
            c.logf("%d: Transform %s; residual %.3g oob %.3g\n",
                   f.id, _LazyTransformStr(trans), residual, oob)

            if self.defer_warp:
                # keep the un-warped data; check_align_drop projects kept
                # frames with the host-resolved transform (shift-blend path)
                out = Image.from_naxisn(list(aligner.naxisn), f.data,
                                        ls_mode=f.stats.mode if f.stats else None)
                out.pending_warp_oob = oob
            else:
                # resolve the transform now (one batched pool flush) and warp
                # through the host-transform path: for alignment-sized
                # transforms the gather-free shift-blend warp is 164x
                # faster than the on-device gather, far outweighing the
                # flush round trip
                import numpy as np

                from nightlight_tpu.deferred import resolve_maybe
                from nightlight_tpu.ops.resample import project

                trans_host = np.asarray(resolve_maybe(trans), np.float32)
                # apply the residual-threshold drop HERE like the reference
                # (postprocess.go:177-180): downstream ops in arbitrary
                # JSON/REST jobs (rgbCombine, stretch chains, ...) must never
                # see a frame the reference would have dropped. Only the
                # stack preset defers the decision, and its consumers
                # (OpSave/OpStack) all run check_align_drop.
                res = float(resolve_maybe(residual))
                if res > self.threshold:
                    c.logf("%d: Alignment residual %g is above threshold %g, "
                           "skipping frame\n", f.id, res, self.threshold)
                    return None
                projected = project(f.data, aligner.naxisn, trans_host,
                                    float(resolve_maybe(oob)))
                out = Image.from_naxisn(list(aligner.naxisn), projected,
                                        ls_mode=f.stats.mode if f.stats else None)
                out.id, out.exposure = f.id, f.exposure
                out.stars, out.hfr = f.stars, f.hfr
                out.trans, out.residual = trans_host, res
                return out
            out.id, out.exposure = f.id, f.exposure
            out.stars, out.hfr = f.stars, f.hfr
            out.trans, out.residual = trans, residual
            out.align_threshold = self.threshold
            f = out
        return f


class _LazyTransformStr:
    """Deferred-render wrapper for the Transform log formatting."""

    def __init__(self, trans):
        self._trans = trans

    def render_deferred(self):
        return str(self)

    def __str__(self):
        from nightlight_tpu.align import transform as tf
        from nightlight_tpu.deferred import resolve_maybe

        return tf.to_string(resolve_maybe(self._trans))


def check_align_drop(f: Image, c: Context, project: bool = True):
    """Apply the deferred alignment threshold decision: returns None (and
    logs the reference's skip line) when the frame's residual exceeded the
    threshold, else the frame. Resolving the residual here batches with
    everything else pending in the deferred pool.

    project=False keeps pending_warp_oob set (transform host-resolved, data
    unwarped) so the caller can project the whole batch as ONE device
    program (OpStack's fused warp+stack tail); every other consumer
    projects per frame here."""
    if f is None:
        return None
    thr = getattr(f, "align_threshold", None)
    if thr is None:
        return f
    res = float(f.residual)
    f.align_threshold = None
    f.residual = res
    if res > thr:
        c.logf("%d: Alignment residual %g is above threshold %g, skipping frame\n",
               f.id, res, thr)
        return None
    oob = getattr(f, "pending_warp_oob", None)
    if oob is not None:
        import numpy as np

        from nightlight_tpu.deferred import resolve_maybe

        trans = np.asarray(resolve_maybe(f.trans), np.float32)
        f.trans = trans
        if project:
            # deferred projection: the transform is host-resolved now (same
            # flush as the residual), so the warp routes through the
            # gather-free shift-blend path for alignment-sized transforms
            from nightlight_tpu.ops.resample import project as _project

            f.set_data(_project(f.data, f.naxisn, trans, oob))
            f.pending_warp_oob = None
    return f
