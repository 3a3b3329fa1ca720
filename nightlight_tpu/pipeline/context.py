"""Per-job execution context.

Rebuild of the reference's ops.Context (reference: internal/ops/operator.go:
37-67): shared per-run state -- log writer, estimator mode, memory budget,
master dark/flat, alignment/histogram references, luminance frame -- guarded
by locks where operators mutate it concurrently.
"""

from __future__ import annotations

import os
import sys
import threading
from dataclasses import dataclass, field
from typing import Any, Optional

from nightlight_tpu.ops.stats import LSEstimatorMode

# Opt-in per-line log timestamps for performance debugging.
_LOG_TIME = os.environ.get("NIGHTLIGHT_LOG_TIME", "") == "1"


def total_memory_mb() -> int:
    try:
        pages = os.sysconf("SC_PHYS_PAGES")
        page_size = os.sysconf("SC_PAGE_SIZE")
        return int(pages * page_size / 1024 / 1024)
    except (ValueError, OSError):
        return 8192


@dataclass
class Context:
    log: Any = sys.stdout
    ls_estimator_mode: LSEstimatorMode = LSEstimatorMode.SCMedianQn
    memory_mb: int = 0
    stack_memory_mb: int = 0
    max_threads: int = 0

    # Optional jax.sharding.Mesh: when set, loaded frames are placed
    # row-sharded across it and XLA's sharding propagation runs every
    # downstream device program (calibrate, detect, match, warp, stack,
    # stretch) sharded, inserting collectives where pixels cross shards.
    mesh: Any = None

    dark_frame: Any = None  # Image
    flat_frame: Any = None  # Image
    align_naxisn: Optional[list] = None
    align_stars: Any = None  # StarList
    align_hfr: float = 0.0
    match_histo: Any = None  # Stats
    ref_frame_error: Optional[Exception] = None
    lum_frame: Any = None  # Image

    stats_total: int = 0
    stats_processed: int = 0
    stats_file: Any = None

    # per-op shared-state locks (the reference uses per-operator mutexes)
    lock: threading.Lock = field(default_factory=threading.Lock)
    # deferred-log buffer (see logf/flush_log)
    _log_lock: threading.Lock = field(default_factory=threading.Lock)
    _log_buffer: list = field(default_factory=list)

    def __post_init__(self):
        if self.memory_mb == 0:
            self.memory_mb = total_memory_mb()
        if self.stack_memory_mb == 0:
            self.stack_memory_mb = self.memory_mb * 7 // 10
        if self.max_threads == 0:
            # Like the reference (operator.go:65). Worker threads issue device
            # calls, so the pool must not exceed what the backend tolerates;
            # host-side decode pipelining is handled separately by the
            # OpLoadMany prefetcher, which never touches the device.
            self.max_threads = os.cpu_count() or 4

    def finalize(self) -> None:
        """Close any pending incremental outputs at end of run.

        The stats HTML trailer is normally written when the processed count
        reaches stats_total, but only stackBatches sets the total
        (stackbatches.go:63); for other commands the reference leaves the
        report unterminated. Flush it here instead.
        """
        self.flush_log()
        if self.stats_file is not None:
            from nightlight_tpu.pipeline.ops_ref import _SESSION_STATS_TRAILER

            self.logf("Writing statistics footer at end of run...\n")
            self.stats_file.write("]")
            self.stats_file.write(_SESSION_STATS_TRAILER)
            self.stats_file.close()
            self.stats_file = None

    def logf(self, fmt: str, *args) -> None:
        """Printf-style logging (Context.Log writes in the reference).

        Arguments may be pending device values (pipeline.deferred.Deferred)
        or objects exposing snapshot_for_log(); such lines are buffered and
        rendered at the next flush_log(), so the dispatch phase never pays a
        per-line device sync. Plain lines that arrive while the buffer is
        non-empty are buffered too, preserving order.
        """
        from nightlight_tpu.deferred import is_pending

        processed = tuple(
            a.snapshot_for_log() if hasattr(a, "snapshot_for_log") else a
            for a in args
        )
        lazy = any(
            is_pending(a) or hasattr(a, "render_deferred") for a in processed
        )
        with self._log_lock:
            if lazy or self._log_buffer:
                self._log_buffer.append((fmt, processed))
                return
        self._write_line(fmt, processed)

    def flush_log(self) -> None:
        """Resolve pending device values (one batched fetch) and write out
        all buffered log lines in order."""
        from nightlight_tpu.deferred import get_pool

        with self._log_lock:
            buffered, self._log_buffer = self._log_buffer, []
        if not buffered:
            return
        get_pool().flush()
        for fmt, args in buffered:
            args = tuple(
                a.render_deferred() if hasattr(a, "render_deferred") else a
                for a in args
            )
            self._write_line(fmt, args)

    def _write_line(self, fmt: str, args: tuple) -> None:
        msg = fmt % args if args else fmt
        if _LOG_TIME:
            import time

            msg = f"[{time.monotonic():10.3f}] {msg}"
        self.log.write(msg)
        if hasattr(self.log, "flush"):
            self.log.flush()


def new_context(log=None, st_memory: int = 0,
                ls_mode: LSEstimatorMode = LSEstimatorMode.SCMedianQn) -> Context:
    """ops.NewContext equivalent (operator.go:58-67)."""
    return Context(log=log or sys.stdout, ls_estimator_mode=ls_mode,
                   stack_memory_mb=st_memory)
