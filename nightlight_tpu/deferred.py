"""Deferred device scalars: batch many tiny D2H fetches into one transfer.

On tunneled TPU setups every host<->device synchronization pays a full round
trip (~30-200ms, with multi-second stalls observed); the per-frame operator
pipeline used to pay several per frame (bad-pixel count, statistics, star
list, alignment residual), which dominated end-to-end wall time
(BASELINE.md). This module provides the execution-model fix:

* operators register small device outputs with the process-wide
  DeferredPool instead of fetching them;
* the returned Deferred behaves like a number -- any host use (float(),
  comparisons, arithmetic, %-formatting) transparently resolves it;
* resolution flushes the WHOLE pool in one concatenated device fetch, so
  the first host access after a dispatch phase pays one round trip for
  every pending value of every frame.

The reference has no equivalent: its goroutines share host memory
(internal/ops/operator.go:73-116). This is the TPU-native replacement for
"cheap per-frame scalar access".
"""

from __future__ import annotations

import os
import threading
from typing import Callable

import numpy as np

_DEBUG = os.environ.get("NIGHTLIGHT_DEBUG_SYNC", "") == "1"


class DeferredPool:
    """Registry of pending device arrays, resolved in one batched transfer."""

    def __init__(self):
        self._lock = threading.RLock()
        self._pending: list[Deferred] = []
        self.flush_count = 0  # observability: tests assert flush budgets

    def defer(self, array, conv: Callable = float) -> "Deferred":
        """Register a device array (any shape) for batched resolution.

        conv converts the fetched np scalar/array to the host value: float
        (default) for 0-d arrays, int for counts, or np.asarray for vectors.

        NIGHTLIGHT_SYNC_FLUSH=1 resolves immediately instead of batching:
        on few-core hosts running the 8-device VIRTUAL mesh, piles of
        queued multi-device programs can starve a collective-rendezvous
        participant past XLA:CPU's termination deadline; serializing keeps
        at most one such program in flight (used by the multichip dryrun).
        """
        d = Deferred(self, array, conv)
        with self._lock:
            self._pending.append(d)
        if os.environ.get("NIGHTLIGHT_SYNC_FLUSH", "") == "1":
            self.flush()
        return d

    def flush(self) -> None:
        """Resolve every pending Deferred with one batched fetch per shape.

        Values are converted by VALUE (astype), never bitcast: int32
        payloads bitcast to f32 become denormals that the TPU flushes to
        zero in transit. f32 holds integers exactly up to 2^24, above any
        count we defer.

        Pending arrays are grouped by shape and stacked with the group count
        padded to a power of two: a variable-arity concatenate would compile
        a NEW tiny program for every distinct combination of pending shapes,
        and each first-seen combination pays a full REMOTE compile on
        tunneled TPU setups (observed: 200+ seconds for one flush). The
        (shape, bucketed-count) stack programs form a small reusable set.
        """
        with self._lock:
            pending = [d for d in self._pending if not d._resolved]
            self._pending.clear()
            if not pending:
                return
            import jax.numpy as jnp

            groups: dict[tuple, list] = {}
            for d in pending:
                groups.setdefault(tuple(d._array.shape), []).append(d)

            self.flush_count += 1
            if _DEBUG:
                import traceback

                print(f"[deferred] flush #{self.flush_count}: "
                      f"{len(pending)} values in {len(groups)} shape groups")
                traceback.print_stack(limit=8)

            for shape, ds in groups.items():
                k = len(ds)
                kb = 1
                while kb < k:
                    kb *= 2
                arrs = [jnp.asarray(d._array).astype(jnp.float32) for d in ds]
                arrs.extend([arrs[0]] * (kb - k))  # pad the count bucket
                fetched = np.asarray(jnp.stack(arrs))  # one transfer per group
                for i, d in enumerate(ds):
                    raw = fetched[i]
                    d._value = d._conv(raw if shape else raw[()])
                    d._resolved = True
                    d._array = None  # release the device reference


_pool = DeferredPool()


def get_pool() -> DeferredPool:
    """The process-wide pool. Jobs are serialized (REST lock / CLI), so one
    pool is correct; flushing another job's stale handles is harmless."""
    return _pool


def defer(array, conv: Callable = float) -> "Deferred":
    return _pool.defer(array, conv)


class Deferred:
    """A pending device value that acts like a number on the host.

    Reading `.value` (or using it in arithmetic/formatting) resolves it,
    flushing the whole pool in one transfer. `.array` exposes the device
    array for further on-device math without any synchronization.
    """

    __slots__ = ("_pool", "_array", "_conv", "_value", "_resolved")

    def __init__(self, pool: DeferredPool, array, conv: Callable):
        self._pool = pool
        self._array = array
        self._conv = conv
        self._value = None
        self._resolved = False

    @property
    def value(self):
        if not self._resolved:
            self._pool.flush()
        return self._value

    @property
    def array(self):
        """The device array (pre-resolution) for on-device chaining."""
        if self._resolved:
            raise ValueError("device array already released by resolution")
        return self._array

    @property
    def resolved(self) -> bool:
        return self._resolved

    def __jax_array__(self):
        """Let jitted functions consume a Deferred directly: unresolved
        values pass through as their device array (no sync); resolved ones
        re-enter as constants."""
        if not self._resolved:
            return self._array
        import jax.numpy as jnp

        return jnp.asarray(self._value)

    # -- number protocol: host uses resolve transparently -------------------
    def __float__(self):
        return float(self.value)

    def __int__(self):
        return int(round(float(self.value)))

    def __index__(self):
        return int(round(float(self.value)))

    def __bool__(self):
        return bool(self.value)

    def __str__(self):
        return str(self.value)

    def __repr__(self):
        if self._resolved:
            return f"Deferred({self._value!r})"
        return "Deferred(<pending>)"

    def __format__(self, spec):
        return format(self.value, spec)

    def _coerce(self, other):
        return other.value if isinstance(other, Deferred) else other

    def __eq__(self, other):
        return self.value == self._coerce(other)

    def __ne__(self, other):
        return self.value != self._coerce(other)

    def __lt__(self, other):
        return self.value < self._coerce(other)

    def __le__(self, other):
        return self.value <= self._coerce(other)

    def __gt__(self, other):
        return self.value > self._coerce(other)

    def __ge__(self, other):
        return self.value >= self._coerce(other)

    def __add__(self, other):
        return self.value + self._coerce(other)

    def __radd__(self, other):
        return self._coerce(other) + self.value

    def __sub__(self, other):
        return self.value - self._coerce(other)

    def __rsub__(self, other):
        return self._coerce(other) - self.value

    def __mul__(self, other):
        return self.value * self._coerce(other)

    def __rmul__(self, other):
        return self._coerce(other) * self.value

    def __truediv__(self, other):
        return self.value / self._coerce(other)

    def __rtruediv__(self, other):
        return self._coerce(other) / self.value

    def __neg__(self):
        return -self.value

    def __abs__(self):
        return abs(self.value)

    def __hash__(self):
        return hash(self.value)


class DeferredRow(Deferred):
    """A view of one row of a pending whole-batch Deferred.

    Batch-phase programs (e.g. the batched aligner) produce ONE device array
    holding every frame's result; deferring the whole array once and handing
    each frame a row view keeps the pool's flush to one transfer instead of
    m tiny per-row device slices (each a distinct compiled program on
    static-index slicing). Resolution resolves the parent (flushing the
    pool) and converts this row."""

    __slots__ = ("_parent", "_row")

    def __init__(self, parent: Deferred, row: int, conv: Callable = float):
        self._parent = parent
        self._row = row
        self._conv = conv
        self._value = None
        self._resolved = False
        self._array = None
        self._pool = parent._pool

    @property
    def value(self):
        if not self._resolved:
            self._value = self._conv(self._parent.value[self._row])
            self._resolved = True
        return self._value

    @property
    def array(self):
        raise ValueError("DeferredRow exposes no device array; use .value")

    def __jax_array__(self):
        import jax.numpy as jnp

        if not self._resolved and not self._parent._resolved:
            return self._parent._array[self._row]
        return jnp.asarray(self.value)


def resolve_maybe(x):
    """Host value of x, resolving if deferred."""
    return x.value if isinstance(x, Deferred) else x


class LazyChoice:
    """Deferred-condition log fragment: renders one of two printf strings
    depending on a device bool, at log-flush time.

    Lets operators with data-dependent log text (e.g. scaleBlack's
    "scaling black..." vs "cannot move...") stay DISPATCH-ONLY: the
    condition and both argument sets ride the deferred pool and the choice
    happens after the one batched fetch, so the op itself never syncs."""

    def __init__(self, cond, fmt_true: str, args_true: tuple,
                 fmt_false: str, args_false: tuple = ()):
        self._cond = cond
        self._true = (fmt_true, args_true)
        self._false = (fmt_false, args_false)

    def render_deferred(self) -> str:
        fmt, args = self._true if bool(resolve_maybe(self._cond)) else self._false
        vals = tuple(resolve_maybe(a) for a in args)
        return fmt % vals if vals else fmt


def is_pending(x) -> bool:
    return isinstance(x, Deferred) and not x._resolved
