"""Asynchronous host-side ingest: decode FITS frames ahead of device demand.

The reference overlaps file I/O with compute through its goroutine promise
pool (reference: internal/ops/operator.go:73-116). On TPU the equivalent is
a bounded prefetch pipeline: worker threads decode + byte-swap FITS payloads
(optionally via the native C decoder) while the device consumes earlier
frames, keeping host->HBM transfers off the critical path.
"""

from __future__ import annotations

import concurrent.futures as cf
import math
import threading
from typing import Iterable, Iterator

import jax
import jax.numpy as jnp


def prefetch_frames(file_names: Iterable[str], depth: int = 4, to_device: bool = True,
                    log=None) -> Iterator:
    """Yield decoded Images for file_names, decoding up to `depth` ahead.

    Decode runs in a thread pool; when `to_device` is set the transfer is
    started immediately (jnp.asarray is async) so device upload of frame
    i+1..i+depth overlaps compute on frame i.
    """
    from nightlight_tpu.io.fits import read_file

    names = list(file_names)

    def load(i_name):
        i, name = i_name
        img = read_file(name, id=i, log=log, to_device=to_device)
        return img

    with cf.ThreadPoolExecutor(max_workers=depth) as pool:
        futures: list[cf.Future] = []
        it = iter(enumerate(names))
        # prime the pipeline
        for _ in range(depth):
            try:
                futures.append(pool.submit(load, next(it)))
            except StopIteration:
                break
        while futures:
            img = futures.pop(0).result()
            try:
                futures.append(pool.submit(load, next(it)))
            except StopIteration:
                pass
            yield img


class BulkUploader:
    """Grouped device uploads for batches of SMALL integer frames.

    Every per-frame ``device_put`` pays a fixed host↔device round trip
    (~34 ms/frame measured at 1MP, BASELINE.md), which dominates ingest once
    frames are small: 500×1MP = ~17 s of pure launch overhead. This loader
    reads raw integer payloads host-side (no byteswap — that runs on
    device), PACKS up to ``group_frames`` consecutive frames into one
    (G, pixels) integer array, uploads it as a single transfer, and decodes
    byteswap + per-frame bscale/bzero on device
    (fits._device_int_decode_batch) — per-frame header and lazy-Stats
    semantics identical to io.fits.read_file's device fast path.

    Group membership follows the consumption order announced via
    ``reorder()`` (OpStackBatches announces each batch's load order,
    ops_stack.py), so an out-of-core run never uploads another batch's
    frames; without an announcement, grouping follows spec order with a
    bounded lookahead window. Frames whose header does not match the
    group signature (different shape/BITPIX, float payloads, TIFF) fall
    back to the per-frame read_file path transparently.

    All device work happens on the CALLING thread (the axon backend rejects
    concurrent device access, CLAUDE.md); no worker threads are used.
    Consumers MAY call ``get`` from several threads (materialize_all runs
    load promises in a pool when max_threads > 1): a single lock serializes
    the order bookkeeping and the device calls, which the backend requires
    anyway.
    """

    GROUP_BYTES = 32 << 20  # the tunnel's measured sweet spot (BASELINE.md)
    MAX_GROUP = 64

    def __init__(self, specs: list[tuple[int, str]], log, frame_bytes: int,
                 window: int = 6):
        self._log = log
        self._ids = {name: id_ for id_, name in specs}
        self._spec_order = [name for _, name in specs]
        self._pending = set(self._spec_order)
        self._ready: dict[str, object] = {}
        self._order = list(self._spec_order)  # active consumption order
        self._cursor = 0
        self._window = window
        self._lock = threading.RLock()
        self._ready_bytes = 0  # decoded f32 bytes held in _ready
        self.group_frames = max(2, min(self.MAX_GROUP,
                                       self.GROUP_BYTES // max(1, frame_bytes)))
        self.n_uploads = 0  # observability: grouped transfers dispatched

    @classmethod
    def try_create(cls, specs, log):
        """A BulkUploader when the first file's header says grouping pays
        (integer payload, ≥2 frames per 32MB group), else None.
        NIGHTLIGHT_NO_BULK=1 forces the per-frame load path."""
        import os

        if os.environ.get("NIGHTLIGHT_NO_BULK"):
            return None
        if len(specs) < 4:
            return None
        from nightlight_tpu.io.fits import _BITPIX_DTYPES, read_file

        name = specs[0][1]
        if name.lower().endswith((".tif", ".tiff")):
            return None
        try:
            hdr = read_file(name, id=specs[0][0], log=log, read_data=False)
        except Exception:  # noqa: BLE001 - the real load will surface it
            return None
        if hdr.bitpix not in (8, 16):
            return None
        pixels = 1
        for n in hdr.naxisn:
            pixels *= n
        frame_bytes = pixels * _BITPIX_DTYPES[hdr.bitpix].itemsize
        if frame_bytes * 2 > cls.GROUP_BYTES:
            return None  # big frames amortize the fixed cost already
        return cls(specs, log, frame_bytes)

    def reorder(self, names: list[str]) -> None:
        """Announce the upcoming consumption order (one out-of-core batch).
        Grouping restarts here: groups never straddle the announcement."""
        with self._lock:
            self._order = [n for n in names if n in self._pending]
            self._cursor = 0

    def get(self, name: str):
        with self._lock:
            if name in self._ready:
                img = self._pop_ready(name)
                self._advance()
                return img
            if name not in self._pending:
                # not managed here (or consumed twice): plain per-frame load
                from nightlight_tpu.io.fits import read_file

                return read_file(name, id=self._ids.get(name, 0), log=self._log,
                                 to_device=True)
            # make sure `name` leads a group even if the consumer skipped
            # ahead of the announced order
            if name not in self._order[self._cursor:]:
                self._order.insert(self._cursor, name)
            else:
                while self._order[self._cursor] != name:
                    skipped = self._order.pop(self._cursor)
                    self._order.append(skipped)  # keep skipped frames reachable
            while name not in self._ready:
                self._upload_next_group()
            img = self._pop_ready(name)
            self._advance()
            return img

    # -- internals ---------------------------------------------------------

    def _pop_ready(self, name: str):
        img = self._ready.pop(name)
        self._ready_bytes -= int(math.prod(img.naxisn)) * 4
        return img

    def _group_limit(self, signature) -> int:
        """Frames per group for THIS signature, bounded by GROUP_BYTES.
        Derived per group (not from the first file of the run): a small
        leading file must not let groups of later large frames grow
        unbounded past the transfer sweet spot."""
        bitpix, naxisn = signature
        frame_bytes = math.prod(naxisn) * (2 if bitpix == 16 else 1)
        return max(1, min(self.MAX_GROUP,
                          self.GROUP_BYTES // max(1, frame_bytes)))

    def _advance(self) -> None:
        """Keep ~`window` groups' worth of DECODED BYTES in flight ahead of
        consumption (a frame-count budget would blow up HBM when frames are
        larger than the first file's: bytes are what the window bounds)."""
        budget = self._window * self.GROUP_BYTES * 2  # decoded f32 ~= 2x u16
        while self._ready_bytes < budget:
            if not any(n in self._pending for n in self._order[self._cursor:]):
                break
            if self._upload_next_group() == 0:
                break

    def _upload_next_group(self) -> int:
        """Read + pack + upload + device-decode ONE group starting at the
        order cursor. Returns the number of frames made ready."""
        import numpy as np

        from nightlight_tpu.io.fits import (_BITPIX_DTYPES,
                                            _device_int_decode_batch,
                                            _index_frame, read_raw)
        from nightlight_tpu.ops.stats import Stats

        # skip names already consumed or readied
        while self._cursor < len(self._order) and \
                self._order[self._cursor] not in self._pending:
            self._cursor += 1
        if self._cursor >= len(self._order):
            # order exhausted but frames remain (consumer outside the
            # announced order): fall back to remaining spec order
            rest = [n for n in self._spec_order if n in self._pending]
            if not rest:
                raise KeyError("BulkUploader: no pending frames")
            self._order.extend(rest)

        members: list[tuple[str, object, bytes]] = []  # (name, img, raw)
        signature = None
        limit = self.group_frames
        made_ready = 0
        while self._cursor < len(self._order) and len(members) < limit:
            nm = self._order[self._cursor]
            if nm not in self._pending:
                self._cursor += 1
                continue
            img, raw = read_raw(nm, id=self._ids.get(nm, 0), log=self._log)
            if raw is None:  # float/TIFF payload: decoded individually
                self._pending.discard(nm)
                self._ready[nm] = img
                self._ready_bytes += int(math.prod(img.naxisn)) * 4
                made_ready += 1
                self._cursor += 1
                continue
            sig = (img.bitpix, tuple(img.naxisn))
            if signature is None:
                signature = sig
                # the group's frame budget follows ITS signature, so a small
                # first file never inflates groups of later large frames
                limit = self._group_limit(sig)
            elif sig != signature:
                # shape/BITPIX run ends here; nm starts the next group (its
                # header+payload re-read there — small frames, rare case)
                break
            members.append((nm, img, raw))
            self._pending.discard(nm)
            self._cursor += 1
        if not members:
            return made_ready

        bitpix, naxisn = signature
        dtype = "<u2" if bitpix == 16 else np.uint8
        shape = tuple(reversed(naxisn))
        g = limit
        views = [np.frombuffer(raw, dtype=dtype) for _, _, raw in members]
        pad = g - len(members)
        if pad:  # fixed (G, pixels) program shape; padding rows never read
            views.extend([np.zeros_like(views[0])] * pad)
        packed = jnp.asarray(np.stack(views))  # ONE grouped transfer
        bscale = jnp.asarray(np.array(
            [im.bscale for _, im, _ in members] + [1.0] * pad, np.float32))
        bzero = jnp.asarray(np.array(
            [im.bzero for _, im, _ in members] + [0.0] * pad, np.float32))
        decoded = _device_int_decode_batch(packed, bitpix, shape, bscale, bzero)
        self.n_uploads += 1
        for j, (nm, im, _) in enumerate(members):
            im.data = _index_frame(decoded, jnp.int32(j))
            im.bzero, im.bscale = 0.0, 1.0
            im.stats = Stats(im.data, im.naxisn[0])
            self._ready[nm] = im
            self._ready_bytes += int(math.prod(im.naxisn)) * 4
            made_ready += 1
        return made_ready


def device_put_sharded_rows(arr, mesh=None):
    """Place a (frames, H, W) array with rows sharded over the mesh (the
    multi-chip ingest path); single-device put otherwise."""
    if mesh is None:
        return jnp.asarray(arr)
    from nightlight_tpu.parallel.mesh import shard_rows

    return jax.device_put(jnp.asarray(arr), shard_rows(mesh))
