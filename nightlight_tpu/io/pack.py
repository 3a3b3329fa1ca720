"""Bit-packed host->device frame transport for the bulk ingest path.

The end-to-end wall of every large job is 85-90% host<->device transfer
(BASELINE.md): a 100x16MP stack moves 3.23 GB of raw BITPIX-16 payload
up a ~11-40 MB/s link. Real sensor data does not use all 16 bits — ADCs
are 12-14 bit, and after row-delta coding the noise floor fits in ~8 —
so the transport can losslessly shrink the wire bytes with a shape-stable
scheme the device can undo in fused elementwise ops:

  1. offset-binary fold: u = int16_value + 32768 (a u16, monotone),
  2. optional row-delta (u16 wraparound) + zigzag transform (smooth sky
     -> small codes; mod-2^16 cumsum on device inverts it exactly),
  3. fixed-width packing to k in {8, 12, 14} bits per pixel,
  4. a sparse exception list (flat index, full u16 code) for the few
     pixels whose code overflows k bits — saturated star cores, hot
     pixels, row heads.

The packer picks the (transform, k) pair with the fewest total wire bytes
per group and falls back to the raw u16 upload when no pair saves >=1/16.
Decode is bit-identical to io.fits._device_int_decode_batch: the unpacked
integer is exact, and the float math is the same (v - 32768) * bscale +
bzero contraction (read.go:205 semantics; the reference streams raw bytes
from local disk, stack.go has no transport layer — this subsystem is
TPU-native, reference: internal/fits/read.go:145-443 for the decode math).

Wire dtypes are deliberate: the whole packed payload ships as ONE flat
u16 word array (byte pairs coded little-endian in the VALUE, no bitcast)
because this backend's first big uint8 upload in a process stalls for
minutes (measured 143-413 s for 16.7 MB u8 vs 1.1 s for the same bytes
as u16 — 2026-08-20), and exceptions ship as one (2, E) int32 array —
int32 data must travel as real integer arrays on this backend
(CLAUDE.md denormal-flush gotcha).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["pack_group", "decode_packed_batch", "PackedGroup"]

# Candidate fixed widths. 8: one low byte. 12: low byte + packed high
# nibble pairs. 14: low byte + high-6-bit quads (4 values -> 3 bytes).
_WIDTHS = (8, 12, 14)
# An exception costs two int32s on the wire (index + code).
_EXC_BYTES = 8
# Only pack when the projected wire bytes save at least 1/16 vs raw u16.
_MIN_SAVING = 1.0 / 16.0


class PackedGroup:
    """One packed (G, pixels) payload: `words` is the whole byte stream
    (low plane then hi plane) as little-endian-coded u16 words; `exc` is
    the (2, E) int32 (flat index, u16 code) exception table. Shapes are
    shape-stable: E buckets to powers of two, G is the group limit."""

    __slots__ = ("kind", "k", "words", "exc", "wire_bytes")

    def __init__(self, kind, k, words, exc):
        self.kind = kind  # "id" | "delta"
        self.k = k
        self.words = words
        self.exc = exc
        self.wire_bytes = words.nbytes + exc.nbytes


def plane_bytes(g: int, p: int, k: int) -> tuple[int, int]:
    """(low plane bytes, hi plane bytes) for a (g, p) group at width k."""
    n_low = g * p
    n_hi = 0 if k == 8 else (g * (p // 2) if k == 12 else g * (3 * p // 4))
    return n_low, n_hi


def _zigzag16(s: np.ndarray) -> np.ndarray:
    """Map int16 deltas to unsigned magnitude-ordered u16 codes. int16
    wraparound makes this exact mod 2^16 — the decode reconstructs with a
    mod-2^16 cumulative sum, so wrapped deltas round-trip losslessly."""
    return (((s << 1) ^ (s >> 15))).view(np.uint16)


def _best_width(exc_by_k: dict, n: int, widths):
    """(k, exception_count, projected bits/pixel) for the best width given
    per-width exception counts, or None when raw u16 wins. Shared by the
    numpy and native scan paths so the width decision is identical."""
    best = None
    for k in widths:
        exc = exc_by_k[k]
        bits = k + exc * _EXC_BYTES * 8.0 / n
        if best is None or bits < best[2]:
            best = (k, exc, bits)
    if best is None or best[2] > 16.0 * (1.0 - _MIN_SAVING):
        return None
    return best


def _overflow_bits(mag: np.ndarray, widths):
    """Numpy candidate scan: per-width exception counts fed to
    _best_width. `mag` is the unsigned code array."""
    counts = {k: int(np.count_nonzero(mag >= (1 << k))) for k in widths}
    return _best_width(counts, mag.size, widths)


def _pack_planes(u: np.ndarray, k: int) -> np.ndarray:
    """Flatten (G, P) codes into the k-bit byte stream: the low-byte plane
    followed by the packed high-bit plane, padded to an even byte count,
    viewed as little-endian u16 words (the wire dtype)."""
    g, p = u.shape
    n_low, n_hi = plane_bytes(g, p, k)
    total = n_low + n_hi
    buf = np.zeros(total + (total & 1), np.uint8)
    low = buf[:n_low].reshape(g, p)
    np.bitwise_and(u, 0xFF, out=low, casting="unsafe")
    if k == 12:
        hi = (u >> 8).astype(np.uint8)
        hi &= 0xF
        buf[n_low:total] = (hi[:, 0::2] | (hi[:, 1::2] << 4)).reshape(-1)
    elif k == 14:
        h = (u >> 8).astype(np.uint8)
        h &= 0x3F
        h = h.reshape(g, p // 4, 4)
        hb = np.empty((g, p // 4, 3), np.uint8)
        hb[..., 0] = h[..., 0] | (h[..., 1] << 6)
        hb[..., 1] = (h[..., 1] >> 2) | (h[..., 2] << 4)
        hb[..., 2] = (h[..., 2] >> 4) | (h[..., 3] << 2)
        buf[n_low:total] = hb.reshape(-1)
    return buf.view("<u2")


def _bucket(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def _bucket_pad(idx: np.ndarray, val: np.ndarray,
                empty_val: int) -> np.ndarray:
    """Shared exception-table tail (numpy and native emit paths): an empty
    list becomes a single (0, code-of-first-element) placeholder, then the
    table pads by edge-repetition to a power-of-two width (duplicate
    scatters write the same value, so padding is idempotent)."""
    if idx.size == 0:
        idx = np.zeros(1, np.int32)
        val = np.array([empty_val], np.int32)
    width = _bucket(idx.size)
    pad = width - idx.size
    if pad:
        idx = np.concatenate([idx, np.repeat(idx[-1:], pad)])
        val = np.concatenate([val, np.repeat(val[-1:], pad)])
    return np.stack([idx, val])


def _exceptions(mag: np.ndarray, k: int) -> np.ndarray:
    """(2, E) int32 (flat index, full code) for codes overflowing k bits."""
    flat_mag = mag.reshape(-1)
    idx = np.flatnonzero(flat_mag >= (1 << k)).astype(np.int32)
    val = flat_mag[idx].astype(np.int32)
    return _bucket_pad(idx, val, int(flat_mag[0]))


def pack_group(u: np.ndarray, height: int,
               valid: int | None = None) -> PackedGroup | None:
    """Pack a (G, pixels) array of offset-binary u16 codes (one group of
    2-D frames, height rows of width pixels//height each).
    Returns None when raw u16 is within 1/16 of the best packed size.

    `u` must already be native-endian offset-binary (int16 payload
    xor 0x8000); 3-D frames and odd widths fall back to raw upstream.
    The first `valid` group rows are real frames; trailing rows are
    shape-padding (they pack along but must not sway the width decision
    — all-zero padding packs trivially and would bias toward packing).
    """
    g, p = u.shape
    if valid is None:
        valid = g
    if height <= 0 or p % height:
        return None
    w = p // height
    widths = tuple(k for k in _WIDTHS
                   if k == 8 or (k == 12 and p % 2 == 0)
                   or (k == 14 and p % 4 == 0))

    # Native fused scan (native/_packio.c): ONE pass over the valid rows
    # yields all six candidate counts; the numpy path needs 6+ full-array
    # passes and measured 70-150 MB/s on the 1-core host vs ~GB/s native
    # (BASELINE.md round-5). The width DECISION is shared (_best_width), so
    # both paths pick identical (transform, k).
    native_counts = None
    if not os.environ.get("NIGHTLIGHT_NO_NATIVE_PACK"):
        from nightlight_tpu.native import packio

        native_counts = packio.scan(u, valid, w)

    zz = None
    n = valid * p
    if native_counts is not None:
        counts_id, counts_dl = native_counts
        cand_id = _best_width(counts_id, n, widths)
        choice = ("id", cand_id) if cand_id is not None else None
        # delta skip rule identical to the numpy path (ADVICE r4): a
        # <=9-bit identity never cedes to delta
        if choice is None or cand_id[2] > 9.0:
            cand_dl = _best_width(counts_dl, n, widths)
            if cand_dl is not None and (choice is None
                                        or cand_dl[2] < choice[1][2]):
                choice = ("delta", cand_dl)
    else:
        # identity candidate: the codes themselves
        cand_id = _overflow_bits(u[:valid], widths)
        choice = ("id", cand_id) if cand_id is not None else None
        # delta candidate: u16-wraparound row-delta, zigzag coded (all-u16
        # host math — ~3x cheaper than int32 at 16MP); row heads carry the
        # absolute value (their zigzag is ~2*u, usually an exception at
        # k=8 — H exceptions/frame is noise next to the byte savings).
        # Skipped when identity already packs near the 8-bit floor: the
        # delta transform is ~half the host pack cost on the 1-core host
        # and cannot beat a <=9-bit identity by enough to pay for itself
        # (ADVICE r4).
        if choice is None or cand_id[2] > 9.0:
            zz = _delta_zigzag(u, height)
            cand_dl = _overflow_bits(zz[:valid], widths)
            if cand_dl is not None and (choice is None
                                        or cand_dl[2] < choice[1][2]):
                choice = ("delta", cand_dl)
    if choice is None:
        return None
    kind, (k, exc_est, _bits) = choice

    if native_counts is not None:
        from nightlight_tpu.native import packio

        # cap covers the scan's valid-row count; padding rows are all-zero
        # codes (offset-binary zero XOR-folds to 0) so they add no
        # exceptions — if a caller padded otherwise, emit returns None and
        # the numpy path below takes over
        emitted = packio.emit(u, w, kind, k, exc_cap=exc_est + 16)
        if emitted is not None:
            buf, idx, val = emitted
            pg = PackedGroup(kind, k, buf.view("<u2"),
                             _exception_table(u, kind, idx, val))
            if pg.wire_bytes > g * p * 2 * (1.0 - _MIN_SAVING):
                return None
            return pg

    if kind == "delta" and zz is None:
        zz = _delta_zigzag(u, height)
    mag = u if kind == "id" else zz
    pg = PackedGroup(kind, k, _pack_planes(mag, k), _exceptions(mag, k))
    # The projection above estimates exception bytes UNPADDED; the real
    # exception table buckets to a power of two (up to ~2x those bytes), so
    # a group near the threshold can come out of construction costing more
    # wire than raw u16 (ADVICE r4). Re-check the ACTUAL wire bytes.
    if pg.wire_bytes > g * p * 2 * (1.0 - _MIN_SAVING):
        return None
    return pg


def _delta_zigzag(u: np.ndarray, height: int) -> np.ndarray:
    """Numpy row-delta + zigzag codes for a (G, pixels) group."""
    g, p = u.shape
    w = p // height
    rows = u.reshape(g, height, w)
    d = np.empty_like(rows)
    d[:, :, 0] = rows[:, :, 0]
    np.subtract(rows[:, :, 1:], rows[:, :, :-1], out=d[:, :, 1:])
    return _zigzag16(d.view(np.int16)).reshape(g, p)


def _exception_table(u: np.ndarray, kind: str, idx: np.ndarray,
                     val: np.ndarray) -> np.ndarray:
    """Bucket/pad a native-emitted exception list to _exceptions' exact
    layout. The empty-table placeholder carries the first element's CODE:
    under delta that is the head's absolute zigzag."""
    v0 = int(u.reshape(-1)[0])
    if kind == "delta":
        s = v0 - 65536 if v0 >= 32768 else v0
        v0 = ((s << 1) ^ (s >> 15)) & 0xFFFF
    return _bucket_pad(idx, val, v0)


# -- device side -----------------------------------------------------------


def _unpack_codes(low, hi, k: int):
    """Inverse of _pack_planes' byte layout: (G, P) int32 codes from the
    int32 byte planes. Pure elementwise shifts/ors — XLA fuses this into
    the decode."""
    g, p = low.shape
    if k == 8:
        return low
    if k == 12:
        he = hi & 0xF
        ho = hi >> 4
        h2 = jnp.stack((he, ho), axis=-1)
        return (low.reshape(g, p // 2, 2) | (h2 << 8)).reshape(g, p)
    b = hi.reshape(g, p // 4, 3)
    h0 = b[..., 0] & 0x3F
    h1 = (b[..., 0] >> 6) | ((b[..., 1] & 0xF) << 2)
    h2 = (b[..., 1] >> 4) | ((b[..., 2] & 0x3) << 4)
    h3 = b[..., 2] >> 2
    h4 = jnp.stack((h0, h1, h2, h3), axis=-1)
    return (low.reshape(g, p // 4, 4) | (h4 << 8)).reshape(g, p)


def decode_packed_batch(pg: PackedGroup, shape: tuple, bscale, bzero):
    """Decoded (G, *shape) float32 batch, bit-identical to
    fits._device_int_decode_batch on the equivalent raw payload."""
    return _decode_packed_jit(pg.words, pg.exc, kind=pg.kind, k=pg.k,
                              shape=shape, bscale=bscale, bzero=bzero)


@partial(jax.jit, static_argnames=("kind", "k", "shape"))
def _decode_packed_jit(words, exc, *, kind, k, shape, bscale, bzero):
    g = bscale.shape[0]
    p = 1
    for n in shape:
        p *= n
    n_low, n_hi = plane_bytes(g, p, k)
    w32 = words.astype(jnp.int32)
    stream = jnp.stack((w32 & 0xFF, w32 >> 8), axis=-1).reshape(-1)
    low = stream[:n_low].reshape(g, p)
    hi = stream[n_low:n_low + n_hi].reshape(g, n_hi // g) if n_hi else None
    codes = _unpack_codes(low, hi, k)
    codes = codes.reshape(-1).at[exc[0]].set(exc[1]).reshape(g, p)
    if kind == "id":
        u = codes
    else:
        d = (codes >> 1) ^ -(codes & 1)  # un-zigzag: int32 in [-2^15, 2^15)
        u = (jnp.cumsum(d.reshape((g,) + shape), axis=-1)
             & 0xFFFF).reshape(g, p)  # mod-2^16 sum inverts wraparound delta
    sf = u.astype(jnp.float32) - 32768.0  # exact: |s| <= 32768 << 2^24
    out = sf * bscale[:, None] + bzero[:, None]
    return out.reshape((g,) + shape)
