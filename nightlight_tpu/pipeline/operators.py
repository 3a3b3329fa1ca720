"""Operator framework: lazy promise DAG, JSON-polymorphic operator registry,
and the built-in load/save/sequence operators.

Rebuild of the reference's operator layer (reference: internal/ops/operator.go).
The JSON job spec -- operator `type` tags and field names -- is kept exactly
compatible because it is the REST/UI/test contract (SURVEY.md section 7).
Execution differs: promises materialize through a thread pool that overlaps
host FITS I/O with device compute (the device side serializes through JAX's
async dispatch queue).
"""

from __future__ import annotations

import glob as globmod
import json
import os
import threading
from concurrent.futures import ThreadPoolExecutor
from enum import IntEnum
from typing import Callable, Optional

from nightlight_tpu.image import Image
from nightlight_tpu.pipeline.context import Context

# A promise yields an Image or raises; like ops.Promise (operator.go:70).
Promise = Callable[[], Optional[Image]]

_operator_factories: dict[str, type] = {}


def register(cls):
    """Register an operator class for JSON decoding (operator.go:159-166).
    Class decorator; duplicate registration raises."""
    t = cls.TYPE
    if t in _operator_factories:
        raise ValueError(f"error: re-registering operator key {t}")
    _operator_factories[t] = cls
    return cls


def get_operator_factory(t: str):
    return _operator_factories.get(t)


def op_from_dict(d: dict) -> "Operator":
    """Decode a polymorphic operator from a JSON dict (operator.go:484-513)."""
    t = d.get("type")
    cls = get_operator_factory(t)
    if cls is None:
        raise ValueError(f"unknown operator type '{t}' in raw JSON message '{json.dumps(d)}'")
    return cls.from_dict(d)


class Operator:
    """Base operator: JSON round-trip via PARAMS and the promise interface
    (operator.go:133-166).

    Subclasses define TYPE (the JSON tag) and PARAMS: a dict of
    python_field -> (json_name, default). Fields are set as attributes.
    """

    TYPE = ""
    PARAMS: dict[str, tuple[str, object]] = {}

    def __init__(self, **kwargs):
        for field, (_, default) in self.PARAMS.items():
            setattr(self, field, kwargs.pop(field, default))
        if kwargs:
            raise TypeError(f"{self.TYPE}: unknown arguments {sorted(kwargs)}")

    # -- JSON ---------------------------------------------------------------
    def to_dict(self) -> dict:
        d = {"type": self.TYPE}
        for field, (json_name, _) in self.PARAMS.items():
            v = getattr(self, field)
            if isinstance(v, Operator):
                v = v.to_dict()
            elif isinstance(v, IntEnum):
                v = int(v)
            d[json_name] = v
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "Operator":
        kwargs = {}
        for field, (json_name, default) in cls.PARAMS.items():
            if json_name in d:
                v = d[json_name]
                if isinstance(default, Operator) or (v is not None and isinstance(v, dict) and "type" in v):
                    v = op_from_dict(v) if isinstance(v, dict) else v
                kwargs[field] = v
        return cls(**kwargs)

    def to_json(self, indent=2) -> str:
        return json.dumps(self.to_dict(), indent=indent)

    # -- promises -------------------------------------------------------------
    def make_promises(self, ins: list[Promise], c: Context) -> list[Promise]:
        raise NotImplementedError

    def is_noop(self) -> bool:
        """True when apply() is a pass-through under the current parameters.

        Mirrors each op's own first-line guard; the fused batch executor
        derives its eligibility from these (models/presets.py) so the gate
        cannot drift from the DAG. Conservative default: not a no-op."""
        return False

    def __repr__(self):
        return f"<{type(self).__name__} {self.to_dict()}>"


class UnaryOperator(Operator):
    """1-in/1-out operator fanning over n inputs (operator.go:170-207)."""

    def make_promises(self, ins: list[Promise], c: Context) -> list[Promise]:
        if not ins:
            raise ValueError(f"unary operator with 0 inputs")
        return [self.make_promise(i, c) for i in ins]

    def make_promise(self, in_p: Promise, c: Context) -> Promise:
        def out() -> Optional[Image]:
            f = in_p()
            if f is None:
                return None
            return self.apply(f, c)

        return out

    def apply(self, f: Image, c: Context) -> Optional[Image]:
        raise NotImplementedError


def materialize_all(ins: list[Promise], max_threads: int, forget: bool,
                    compact: bool = True):
    """Materialize promises with bounded concurrency, aggregating and
    deduplicating errors, compacting None results (operator.go:73-131).
    With compact=False, results stay position-preserving (dropped frames
    remain None in place, so result i still maps to promise i)."""
    if not ins:
        return [], None
    outs: list[Optional[Image]] = [None] * len(ins)
    errors: list[Optional[Exception]] = [None] * len(ins)

    def run(i: int):
        try:
            f = ins[i]()
            if not forget:
                outs[i] = f
        except Exception as e:  # noqa: BLE001 - error aggregation by design
            errors[i] = e

    if max_threads <= 1 or len(ins) == 1:
        for i in range(len(ins)):
            run(i)
    else:
        with ThreadPoolExecutor(max_workers=max_threads) as pool:
            list(pool.map(run, range(len(ins))))

    err: Optional[Exception] = None
    seen: set[str] = set()
    msgs: list[str] = []
    for e in errors:
        if e is None:
            continue
        s = str(e)
        if s in seen:
            continue
        seen.add(s)
        msgs.append(s)
        if err is None:
            err = e
    if err is not None and len(msgs) > 1:
        err = RuntimeError("; ".join(msgs))
    if compact:
        outs = [o for o in outs if o is not None]
    return outs, err


def is_path_allowed(p: str) -> bool:
    """Path sandboxing: relative, no '..' (operator.go:258-266)."""
    if os.path.isabs(p):
        return False
    if ".." in p:
        return False
    return True


# Set True by the CLI to allow absolute paths locally; the REST server keeps
# the sandbox on (the reference achieves this with chroot, sandbox_unix.go).
ALLOW_ABSOLUTE_PATHS = False


def _check_path(p: str) -> None:
    if not ALLOW_ABSOLUTE_PATHS and not is_path_allowed(p):
        raise ValueError("filename outside current directory tree, aborting")


@register
class OpLoad(Operator):
    """Load one FITS/TIFF image (operator.go:210-282)."""

    TYPE = "load"
    PARAMS = {"id": ("id", 0), "file_name": ("fileName", "")}

    def __init__(self, prefetcher=None, **kwargs):
        super().__init__(**kwargs)
        self._prefetcher = prefetcher  # host-side decode pipeline, optional

    def make_promises(self, ins, c):
        if ins:
            raise ValueError(f"{self.TYPE} operator with non-zero input")
        _check_path(self.file_name)

        def promise():
            return self.apply(None, c)

        # batch schedulers discover load order through this (ops_stack.py
        # announces each out-of-core batch to the bulk-ingest loader)
        promise.op = self
        return [promise]

    def apply(self, _unused, c: Context) -> Image:
        import jax.numpy as jnp

        if self._prefetcher is not None:
            # prefetched images were decoded host-side on numpy-only threads
            # (_DecodePrefetcher) or arrive device-resident from a grouped
            # upload (io.ingest.BulkUploader); jnp.asarray is a no-op for the
            # latter. Upload happens on the consuming thread (the one
            # device-access thread).
            f = self._prefetcher.get(self.file_name)
            f.data = jnp.asarray(f.data)
        else:
            # direct load: integer payloads upload raw and decode on device
            # (half the host->device bytes for BITPIX 16, fits.py)
            from nightlight_tpu.io.fits import read_file

            f = read_file(self.file_name, id=self.id, log=c.log, to_device=True)
        if c.mesh is not None:
            # Row-shard across the context mesh; every downstream device
            # program then runs sharded via XLA propagation (parallel/mesh.py)
            from nightlight_tpu.parallel.mesh import place_on_mesh

            f.data = place_on_mesh(f.data, c.mesh)
        if f.stats is not None:
            f.stats.replace_data(f.data)
            f.stats.mode = c.ls_estimator_mode
        # The low-dynamic-range warning must not force a per-frame fetch:
        # evaluate the min/max spread lazily with the rest of the log line.
        f.stats._ensure_mmm()  # dispatch only

        class _RangeWarn:
            def __init__(self, mn, mx):
                self._mn, self._mx = mn, mx

            def render_deferred(self):
                return str(self)

            def __str__(self):
                low = float(self._mx) - float(self._mn) < 1e-8
                return "; WARNING low dynamic range" if low else ""

        c.logf("%d: Loaded %s image with %s from %s%s\n",
               f.id, f.dimensions_string(), f.stats, f.file_name,
               _RangeWarn(f.stats._min, f.stats._max))
        return f


class _DecodePrefetcher:
    """Host-only FITS decode pipeline for OpLoadMany.

    Decodes the next few files into NUMPY arrays on background threads while
    the (possibly single-threaded) promise executor works the device. The
    threads never touch jax, so this is safe even on backends that reject
    concurrent device access. Files may be consumed in any order.
    """

    def __init__(self, specs: list[tuple[int, str]], log, depth: int = 3, lookahead: int = 6):
        import queue
        import threading

        self._results: dict[str, object] = {}
        self._errors: dict[str, BaseException] = {}
        self._done: dict[str, threading.Event] = {}
        self._queue = queue.Queue()
        # Bounded lookahead so decode-ahead cannot buffer an out-of-core run's
        # entire input set in host RAM.
        self._slots = threading.BoundedSemaphore(lookahead)
        self._ids = {}
        # claim protocol: the consumer may decode a frame inline when no
        # worker has started it yet — the queue decodes in spec order while
        # OpStackBatches consumes in PERMUTED batch order, so blocking on
        # the done-event alone can deadlock once the lookahead slots fill
        # with frames of later batches.
        self._lock = threading.Lock()
        self._started: set[str] = set()
        self._held: set[str] = set()  # results occupying a lookahead slot
        for id_, name in specs:
            self._done[name] = threading.Event()
            self._ids[name] = id_
            self._queue.put((id_, name))
        self._log = log
        self._threads = [
            threading.Thread(target=self._worker, daemon=True) for _ in range(depth)
        ]
        for t in self._threads:
            t.start()

    def _decode(self, id_, name, hold_slot: bool):
        from nightlight_tpu.io.fits import read_file

        try:
            img = read_file(name, id=id_, log=self._log, to_device=False)
            self._results[name] = img
            if hold_slot:
                # record BEFORE done.set() so get() cannot miss the flag
                self._held.add(name)
        except BaseException as e:  # noqa: BLE001 - handed to the consumer
            self._errors[name] = e
            if hold_slot:
                self._slots.release()  # no result occupies the slot
        self._done[name].set()

    def _worker(self):
        import queue as queue_mod

        while True:
            try:
                id_, name = self._queue.get_nowait()
            except queue_mod.Empty:
                return
            # acquire the slot BEFORE claiming: a worker blocked on a full
            # lookahead window must leave the frame claimable, or a consumer
            # arriving out of spec order deadlocks against results it has
            # not reached yet
            self._slots.acquire()
            with self._lock:
                if name in self._started:
                    self._slots.release()  # consumer claimed it inline
                    continue
                self._started.add(name)
            self._decode(id_, name, hold_slot=True)

    def get(self, name: str):
        with self._lock:
            claim = name not in self._started
            if claim:
                self._started.add(name)
        if claim and not self._done[name].is_set():
            # no worker has begun this frame: decode it on this thread
            # without waiting for (or occupying) a lookahead slot
            self._decode(self._ids[name], name, hold_slot=False)
        self._done[name].wait()
        if name in self._errors:
            raise self._errors[name]
        img = self._results.pop(name)
        if name in self._held:
            self._held.discard(name)
            self._slots.release()
        return img


@register
class OpLoadMany(Operator):
    """Glob file patterns into n load promises (operator.go:286-345)."""

    TYPE = "loadMany"
    PARAMS = {"file_patterns": ("filePatterns", None)}

    def make_promises(self, ins, c):
        if ins:
            raise ValueError(f"{self.TYPE} operator with non-zero input")
        specs: list[tuple[int, str]] = []
        for pattern in self.file_patterns or []:
            for match in sorted(globmod.glob(pattern)):
                if not ALLOW_ABSOLUTE_PATHS and not is_path_allowed(match):
                    c.logf("Pattern match outside current directory tree, skipping\n")
                    continue
                specs.append((len(specs), match))
        if not specs:
            raise ValueError(
                f"{self.TYPE} operator with no files to load from pattern {self.file_patterns}")
        # Small integer frames: grouped uploads (one transfer per ~32MB of
        # frames) beat per-frame device_put by the fixed per-transfer round
        # trip (io/ingest.BulkUploader; no threads — device access stays on
        # the consuming thread).
        from nightlight_tpu.io.ingest import BulkUploader

        prefetcher = BulkUploader.try_create(specs, c.log)
        # Else a host-side decode pipeline across the load promises. Only
        # profitable with spare cores: on a single-CPU host the decode
        # threads contend with the consuming thread and slow the run down.
        if prefetcher is None and len(specs) > 1 and (os.cpu_count() or 1) > 1:
            prefetcher = _DecodePrefetcher(specs, c.log)
        outs: list[Promise] = []
        for id_, match in specs:
            op = OpLoad(id=id_, file_name=match, prefetcher=prefetcher)
            outs.extend(op.make_promises([], c))
        c.logf("Found %d files.\n", len(outs))
        return outs


class ExportMode(IntEnum):
    """Export value ranges (operator.go:348-355)."""

    MinMax = 0
    Zero1 = 1
    Zero255 = 2
    Zero65535 = 3


@register
class OpSave(Operator):
    """Save to FITS/TIFF/JPEG by suffix, %d expanded with the image id
    (operator.go:359-462). Passes its input through."""

    TYPE = "save"
    PARAMS = {
        "file_pattern": ("filePattern", ""),
        "export_mode": ("saveMode", int(ExportMode.MinMax)),
        "gamma": ("gamma", 1.0),
    }

    def is_noop(self) -> bool:
        return not self.file_pattern

    def make_promises(self, ins, c):
        if not ins:
            raise ValueError("save operator needs inputs")
        return [self.make_promise(p, c) for p in ins]

    def make_promise(self, in_p: Promise, c: Context) -> Promise:
        def out():
            f = in_p()
            if f is None:
                return None
            return self.apply(f, c)

        return out

    def apply(self, f: Image, c: Context) -> Image:
        if not self.file_pattern:
            return f
        if f is None:
            raise ValueError(f"cannot save nil file to {self.file_pattern}")
        # Apply a pending alignment drop decision before materializing pixels
        # (the reference drops the frame before any post-align save).
        from nightlight_tpu.pipeline.ops_post import check_align_drop

        f = check_align_drop(f, c)
        if f is None:
            return None
        # Saving transfers pixels to the host anyway; resolve and stream any
        # buffered log lines first so output order stays natural.
        c.flush_log()
        file_name = self.file_pattern
        # %d / %04d expansion by image ID. (The reference tests for the
        # literal substring "%d" (operator.go:402), which misses its own
        # documented `pre%04d.fits` example; match the documented behavior.)
        import re as _re

        if _re.search(r"%0?\d*d", file_name):
            file_name = file_name % f.id
        fn_lower = file_name.lower()

        mode = ExportMode(self.export_mode)
        if mode == ExportMode.MinMax:
            vmin, vmax = f.stats.min, f.stats.max
        elif mode == ExportMode.Zero1:
            vmin, vmax = 0.0, 1.0
        elif mode == ExportMode.Zero255:
            vmin, vmax = 0.0, 255.0
        else:
            vmin, vmax = 0.0, 65535.0

        fits_suffixes = tuple(
            base + gz for base in (".fits", ".fit", ".fts") for gz in ("", ".gz", ".gzip")
        )
        if fn_lower.endswith(fits_suffixes):
            c.logf("%d: Writing %s pixel FITS to %s\n", f.id, f.dimensions_string(), file_name)
            from nightlight_tpu.io.fits import write_file

            write_file(f, file_name)
        elif fn_lower.endswith((".tiff", ".tif")):
            from nightlight_tpu.io.tiff import write_mono_tiff16, write_tiff16

            if len(f.naxisn) == 2:
                c.logf("%d: Writing %s pixel mono 16-bit TIFF to %s with min=%g max=%g...\n",
                       f.id, f.dimensions_string(), file_name, vmin, vmax)
                write_mono_tiff16(f, file_name, vmin, vmax, self.gamma)
            elif len(f.naxisn) == 3 and f.naxisn[2] == 3:
                c.logf("%d: Writing %s pixel color 16-bit TIFF to %s with min=%g max=%g...\n",
                       f.id, f.dimensions_string(), file_name, vmin, vmax)
                write_tiff16(f, file_name, vmin, vmax, self.gamma)
            else:
                raise ValueError(
                    f"{f.id}: unable to write {f.dimensions_string()} pixel image as 16-bit TIFF to {file_name}")
        elif fn_lower.endswith((".jpeg", ".jpg")):
            from nightlight_tpu.io.jpeg import write_jpg, write_mono_jpg

            if len(f.naxisn) == 2:
                c.logf("%d: Writing %s pixel mono JPEG to %s with min=%g max=%g gamma=%g...\n",
                       f.id, f.dimensions_string(), file_name, vmin, vmax, self.gamma)
                write_mono_jpg(f, file_name, vmin, vmax, self.gamma, 95)
            elif len(f.naxisn) == 3 and f.naxisn[2] == 3:
                c.logf("%d: Writing %s pixel color JPEG to %s with min=%g max=%g gamma=%g...\n",
                       f.id, f.dimensions_string(), file_name, vmin, vmax, self.gamma)
                write_jpg(f, file_name, vmin, vmax, self.gamma, 95)
            else:
                raise ValueError(
                    f"{f.id}: unable to write {f.dimensions_string()} pixel image as JPEG to {file_name}")
        else:
            ext = os.path.splitext(file_name)[1]
            raise ValueError(f'unknown suffix "{ext}" for file {file_name}')
        return f


@register
class OpSequence(Operator):
    """Chain of steps; wiring is recursive make_promises (operator.go:465-553)."""

    TYPE = "seq"
    PARAMS = {}

    def __init__(self, steps=None, **kwargs):
        super().__init__(**kwargs)
        self.steps: list[Operator] = list(steps or [])

    def append(self, *steps):
        self.steps.extend(steps)

    def to_dict(self) -> dict:
        return {"type": self.TYPE, "steps": [s.to_dict() for s in self.steps]}

    @classmethod
    def from_dict(cls, d: dict) -> "OpSequence":
        return cls(steps=[op_from_dict(s) for s in d.get("steps", [])])

    def make_promises(self, ins, c):
        for step in self.steps:
            ins = step.make_promises(ins, c)
        return ins
