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
import time
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


class _PendingGroup:
    """An uploaded-but-undecoded frame group: the packed integer payload is
    device-resident (the transfer is in flight or done), while the byteswap
    + bscale/bzero decode program is dispatched only when a member is first
    consumed. This keeps prefetched frames at RAW size in HBM (u16 = half
    the decoded f32) and lets the out-of-core engine prefetch a whole next
    batch within a modest memory reserve (ops_stack._partition).

    When ``pack`` is set the payload traveled bit-packed (io/pack.py,
    8-14 bits/pixel + sparse exceptions instead of raw u16) and ``packed``
    is None; decode goes through pack.decode_packed_batch instead."""

    __slots__ = ("members", "packed", "bscale", "bzero", "bitpix", "shape",
                 "raw_bytes", "pack")

    def __init__(self, members, packed, bscale, bzero, bitpix, shape,
                 raw_bytes, pack=None):
        self.members = members  # list of (name, Image-without-data)
        self.packed = packed
        self.bscale = bscale
        self.bzero = bzero
        self.bitpix = bitpix
        self.shape = shape
        self.raw_bytes = raw_bytes
        self.pack = pack


class BulkUploader:
    """Grouped, windowed device uploads for batches of integer frames.

    Every per-frame ``device_put`` pays a fixed host↔device round trip
    (~34 ms/frame measured at 1MP, BASELINE.md), which dominates ingest once
    frames are small: 500×1MP = ~17 s of pure launch overhead. This loader
    reads raw integer payloads host-side (no byteswap — that runs on
    device), PACKS up to ``group_frames`` consecutive frames into one
    (G, pixels) integer array, uploads it as a single transfer, and decodes
    byteswap + per-frame bscale/bzero on device
    (fits._device_int_decode_batch) — per-frame header and lazy-Stats
    semantics identical to io.fits.read_file's device fast path.
    Large frames (16MP = 33.6 MB raw) form single-frame groups: the win at
    that size is not transfer amortization but the dispatch-ahead window
    and cross-batch prefetch (uploads stream back-to-back while the device
    computes; measured back-to-back beats sync-each 37 vs 24 MB/s in a bad
    tunnel band, scripts/microbench_h2d.py 2026-08-19).

    The DECODE program is deferred to first consumption (_PendingGroup), so
    frames wait in HBM at raw integer size; ``prefetch_ahead`` lets
    OpStackBatches dispatch the NEXT out-of-core batch's uploads while the
    current batch computes — the survey's host-DRAM↔HBM double-buffered
    streaming (SURVEY §5; reference model stackbatches.go:56-107, where the
    constraint is host RAM instead of the wire).

    Group membership follows the consumption order announced via
    ``reorder()`` (OpStackBatches announces each batch's load order,
    ops_stack.py), so an out-of-core run never uploads another batch's
    frames it was not explicitly asked to prefetch; without an
    announcement, grouping follows spec order with a bounded lookahead
    window. Frames whose header does not match the group signature
    (different shape/BITPIX, float payloads, TIFF) fall back to the
    per-frame read_file path transparently.

    All device work happens on the CALLING thread (the axon backend rejects
    concurrent device access, CLAUDE.md); no worker threads are used.
    Consumers MAY call ``get`` from several threads (materialize_all runs
    load promises in a pool when max_threads > 1): a single lock serializes
    the order bookkeeping and the device calls, which the backend requires
    anyway.
    """

    GROUP_BYTES = 32 << 20  # the tunnel's measured sweet spot (BASELINE.md)
    MAX_GROUP = 64
    WINDOW = 6  # groups of dispatch-ahead during consumption (_advance)

    def __init__(self, specs: list[tuple[int, str]], log, frame_bytes: int,
                 window: int | None = None):
        self._log = log
        self._ids = {name: id_ for id_, name in specs}
        self._spec_order = [name for _, name in specs]
        self._pending = set(self._spec_order)
        self._ready: dict[str, object] = {}
        self._order = list(self._spec_order)  # active consumption order
        self._cursor = 0
        self._window = self.WINDOW if window is None else window
        self._lock = threading.RLock()
        self._ready_bytes = 0  # decoded f32 bytes held in _ready
        self.group_frames = max(2, min(self.MAX_GROUP,
                                       self.GROUP_BYTES // max(1, frame_bytes)))
        self.n_uploads = 0  # observability: grouped transfers dispatched
        self.packed_uploads = 0  # of which bit-packed (io/pack.py)
        self.wire_bytes = 0  # actual H2D payload bytes dispatched
        self.raw_bytes_total = 0  # what the same frames cost un-packed
        self._summarized = False
        # EMA of observed upload-dispatch throughput (MB/s). jnp.asarray
        # backpressures the dispatching thread at the wire rate for
        # multi-MB payloads (BASELINE.md round-4 transport findings), so
        # timing the dispatch approximates the live tunnel band.
        self._h2d_mbps: float | None = None

    @classmethod
    def try_create(cls, specs, log):
        """A BulkUploader when the first file's header says the windowed
        integer-upload path applies (BITPIX 8/16, ≥4 frames), else None.
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

    def prefetch_ahead(self, names: list[str], max_bytes: int) -> int:
        """Dispatch uploads for `names` (a FUTURE batch's load order) until
        ~max_bytes of raw payload is in flight, without advancing the
        current consumption order. Upload-only: the decode program runs when
        a frame is first consumed (_PendingGroup), so the in-HBM cost is the
        raw integer bytes. Returns the number of frames dispatched.

        This is the double-buffered half of the out-of-core engine: batch
        b+1's host reads + H2D stream while batch b's align/goal-seek/stack
        programs execute and sync (ops_stack.OpStackBatches._batch_promises).
        """
        done = 0
        dispatched = 0
        with self._lock:
            pending = [n for n in names if n in self._pending]
            while pending and dispatched < max_bytes:
                before = self._ready_bytes
                made, consumed = self._upload_members(pending)
                if made == 0:
                    break
                done += made
                dispatched += self._ready_bytes - before
                pending = pending[consumed:]
        return done

    # -- internals ---------------------------------------------------------

    def _try_pack(self, members, bitpix: int, shape: tuple, g: int):
        """Bit-packed transport (io/pack.py) when the payload qualifies:
        BITPIX 16, 2-D frames, NIGHTLIGHT_NO_PACK unset, and the packer
        finds a (transform, width) beating raw u16 by >=1/16 of the wire.
        Returns a PackedGroup whose arrays are already dispatched to the
        device, or None for the raw path."""
        import os

        import numpy as np

        if bitpix != 16 or len(shape) != 2 \
                or os.environ.get("NIGHTLIGHT_NO_PACK"):
            return None
        # Band gate (ADVICE r4): host-side packing costs CPU on the 1-core
        # host, so at high wire rates the pack time exceeds the wire
        # seconds it saves. The numpy packer runs ~70-230 MB/s; measured
        # break-even with overlap is above the static estimate (the
        # 500x1MP interleaved A/B won 1.34-1.40x end-to-end in a ~70 MB/s
        # band, BASELINE.md round-5) — default gate 120 MB/s. The NATIVE
        # packer (native/_packio.c, ~570 MB/s measured at 12x16MP) moves
        # break-even to roughly band ~= pack_rate * saving/(1-saving)
        # ~ 550 MB/s at the typical 50% saving — gate 500 MB/s when it is
        # loaded. Unmeasured (first group) packs: bad bands are this
        # tunnel's common case and one wasted pack is <1 s (native: <0.2s).
        # NIGHTLIGHT_PACK=1 forces packing; NIGHTLIGHT_PACK_MAX_MBPS
        # overrides the gate.
        if not os.environ.get("NIGHTLIGHT_PACK") \
                and self._h2d_mbps is not None:
            env_gate = os.environ.get("NIGHTLIGHT_PACK_MAX_MBPS")
            if env_gate is not None:
                max_mbps = float(env_gate)
            else:
                # only probe (and possibly first-compile) the native codec
                # when its presence actually decides the gate
                from nightlight_tpu.native import packio

                max_mbps = 500.0 if packio._load() is not None else 120.0
            if self._h2d_mbps > max_mbps:
                return None
        from nightlight_tpu.io.pack import pack_group

        u = np.empty((g, shape[0] * shape[1]), np.uint16)
        for j, (_, _, raw) in enumerate(members):
            u[j] = np.frombuffer(raw, ">u2")  # assignment byteswaps
        u[len(members):] = 0x8000  # padding rows: offset-binary zero
        u ^= np.uint16(0x8000)  # int16 pattern -> monotone offset binary
        pg = pack_group(u, shape[0], valid=len(members))
        if pg is None:
            return None
        t0 = time.perf_counter()
        pg.words = jnp.asarray(pg.words)  # ONE payload transfer (u16 wire)
        pg.exc = jnp.asarray(pg.exc)
        self._note_upload(pg.wire_bytes, time.perf_counter() - t0)
        return pg

    def _note_upload(self, nbytes: int, dt: float) -> None:
        """Fold one dispatch timing into the wire-rate EMA. Sub-5ms
        dispatches and implied rates beyond what the tunnel can physically
        sustain (~750 MB/s best-band, BASELINE.md) are queue handoffs, not
        wire measurements — the backend buffers smaller payloads before the
        dispatch thread backpressures (a 16MB packed upload measured an
        implied 1.3 GB/s in a ~25 MB/s band) — and are ignored."""
        if dt < 0.005 or nbytes < (1 << 20):
            return
        rate = nbytes / (1 << 20) / dt
        if rate > 800.0:
            return
        self._h2d_mbps = (rate if self._h2d_mbps is None
                          else 0.5 * self._h2d_mbps + 0.5 * rate)

    def _decode_group(self, grp: _PendingGroup) -> None:
        """Dispatch the deferred byteswap/bscale decode for one uploaded
        group and swap its members into decoded Images (same program and
        math as the eager path; only the dispatch time moves)."""
        from nightlight_tpu.io.fits import _device_int_decode_batch, _index_frame
        from nightlight_tpu.ops.stats import Stats

        if grp.pack is not None:
            from nightlight_tpu.io.pack import decode_packed_batch

            decoded = decode_packed_batch(grp.pack, grp.shape, grp.bscale,
                                          grp.bzero)
        else:
            decoded = _device_int_decode_batch(
                grp.packed, grp.bitpix, grp.shape, grp.bscale, grp.bzero)
        self._ready_bytes -= grp.raw_bytes
        for j, (nm, im) in enumerate(grp.members):
            im.data = _index_frame(decoded, jnp.int32(j))
            im.bzero, im.bscale = 0.0, 1.0
            im.stats = Stats(im.data, im.naxisn[0])
            self._ready[nm] = im
            self._ready_bytes += int(math.prod(im.naxisn)) * 4

    def _pop_ready(self, name: str):
        v = self._ready.get(name)
        if isinstance(v, _PendingGroup):
            self._decode_group(v)
        img = self._ready.pop(name)
        self._ready_bytes -= int(math.prod(img.naxisn)) * 4
        if not self._pending and not self._ready and not self._summarized:
            # one observability line when the run's ingest drains: the
            # actual wire payload vs raw u16, and the measured wire rate
            self._summarized = True
            raw_mb = self.raw_bytes_total / (1 << 20)
            wire_mb = self.wire_bytes / (1 << 20)
            saved = 100.0 * (1.0 - wire_mb / raw_mb) if raw_mb else 0.0
            rate = (f", ~{self._h2d_mbps:.0f} MB/s observed"
                    if self._h2d_mbps else "")
            self._log.write(
                f"Ingest: {self.n_uploads} grouped uploads "
                f"({self.packed_uploads} bit-packed), {wire_mb:.1f} MB wire"
                f" of {raw_mb:.1f} MB raw ({saved:.0f}% saved{rate})\n")
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
        """Keep ~`window` groups' worth of IN-HBM BYTES in flight ahead of
        consumption (a frame-count budget would blow up HBM when frames are
        larger than the first file's: bytes are what the window bounds).
        Undecoded groups count at raw integer size, decoded frames at f32."""
        budget = self._window * self.GROUP_BYTES * 2
        while self._ready_bytes < budget:
            if not any(n in self._pending for n in self._order[self._cursor:]):
                break
            if self._upload_next_group() == 0:
                break

    def _upload_next_group(self) -> int:
        """Read + pack + upload ONE group starting at the order cursor
        (decode deferred to consumption). Returns frames made ready."""
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
        made, consumed = self._upload_members(self._order[self._cursor:])
        self._cursor += consumed
        return made

    def _upload_members(self, candidates: list[str]) -> tuple[int, int]:
        """Read + pack + upload one signature-uniform group from the front
        of `candidates` (skipping non-pending names). The decode program is
        NOT dispatched here — members wait as a _PendingGroup at raw size.
        Returns (frames made ready, candidate positions consumed)."""
        import numpy as np

        from nightlight_tpu.io.fits import read_raw

        members: list[tuple[str, object, bytes]] = []  # (name, img, raw)
        signature = None
        limit = self.group_frames
        made_ready = 0
        consumed = 0
        for nm in candidates:
            if len(members) >= limit:
                break
            if nm not in self._pending:
                consumed += 1
                continue
            img, raw = read_raw(nm, id=self._ids.get(nm, 0), log=self._log)
            if raw is None:  # float/TIFF payload: decoded individually
                self._pending.discard(nm)
                self._ready[nm] = img
                self._ready_bytes += int(math.prod(img.naxisn)) * 4
                made_ready += 1
                consumed += 1
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
            consumed += 1
        if not members:
            return made_ready, consumed

        bitpix, naxisn = signature
        dtype = "<u2" if bitpix == 16 else np.uint8
        shape = tuple(reversed(naxisn))
        g = limit
        pad = g - len(members)
        bscale = jnp.asarray(np.array(
            [im.bscale for _, im, _ in members] + [1.0] * pad, np.float32))
        bzero = jnp.asarray(np.array(
            [im.bzero for _, im, _ in members] + [0.0] * pad, np.float32))
        self.n_uploads += 1

        pg = self._try_pack(members, bitpix, shape, g)
        if pg is not None:
            raw_bytes = pg.wire_bytes
            grp = _PendingGroup([(nm, im) for nm, im, _ in members], None,
                                bscale, bzero, bitpix, shape, raw_bytes,
                                pack=pg)
            self.packed_uploads += 1
        else:
            views = [np.frombuffer(raw, dtype=dtype) for _, _, raw in members]
            if pad:  # fixed (G, pixels) program shape; padding never read
                views.extend([np.zeros_like(views[0])] * pad)
            t0 = time.perf_counter()
            packed = jnp.asarray(np.stack(views))  # ONE grouped transfer
            raw_bytes = views[0].nbytes * g
            self._note_upload(raw_bytes, time.perf_counter() - t0)
            grp = _PendingGroup([(nm, im) for nm, im, _ in members], packed,
                                bscale, bzero, bitpix, shape, raw_bytes)
        self.wire_bytes += raw_bytes
        self.raw_bytes_total += views[0].nbytes * g if pg is None \
            else g * int(np.prod(shape)) * (2 if bitpix == 16 else 1)
        for nm, _, _ in members:
            self._ready[nm] = grp
        self._ready_bytes += raw_bytes
        made_ready += len(members)
        return made_ready, consumed


def device_put_sharded_rows(arr, mesh=None):
    """Place a (frames, H, W) array with rows sharded over the mesh (the
    multi-chip ingest path); single-device put otherwise."""
    if mesh is None:
        return jnp.asarray(arr)
    from nightlight_tpu.parallel.mesh import shard_rows

    return jax.device_put(jnp.asarray(arr), shard_rows(mesh))
