"""Chunked asynchronous device->host transfers.

The remote-TPU tunnel moves one large buffer far slower than several
concurrent smaller ones: fetching a 67 MB f32 image as one np.asarray
measured 6.5-220 s (single stream, stall-exposed), while 32 row-chunks
with overlapping copy_to_host_async streams took 2.0-3.7 s on the same
link (2026-08-17 measurements; the tunnel's single-stream band swings 30x
between hours, chunking wins in every band). A stalled chunk also only
delays itself, not the whole payload.

This is the D2H counterpart of the deferred pool (nightlight_tpu.deferred):
the pool batches many SMALL fetches into one transfer; fetch_array splits
one LARGE fetch into parallel streams.
"""

from __future__ import annotations

import numpy as np

# Below this many bytes a single fetch wins (chunk setup costs a few
# dispatches and the tunnel round trip dominates anyway).
_MIN_CHUNK_BYTES = 8 << 20
_TARGET_CHUNKS = 32


def fetch_array(x, dtype=None) -> np.ndarray:
    """Device->host fetch of an array, chunked row-wise with overlapping
    async copies when large. Returns a numpy array (host arrays and small
    device arrays pass straight through np.asarray)."""
    import jax

    if not isinstance(x, jax.Array):
        out = np.asarray(x)
        return out if dtype is None else out.astype(dtype, copy=False)
    nbytes = x.size * x.dtype.itemsize
    if x.ndim == 0 or x.size < 2 or nbytes < _MIN_CHUNK_BYTES:
        out = np.asarray(x)
        return out if dtype is None else out.astype(dtype, copy=False)

    # Chunk over the FLAT element count when the leading dim is too coarse:
    # a (3, 4096, 4096) color image sliced along axis 0 gives only 3
    # streams (the round-4 rgb-config phase probe showed its 192 MB save
    # fetch running at single-stream rates); flattening restores the full
    # stream count. The flatten is a bitcast for a contiguous device array.
    shape = x.shape
    if x.ndim == 1 or shape[0] < _TARGET_CHUNKS:
        x = x.reshape(-1)
    k = min(_TARGET_CHUNKS, x.shape[0])
    bounds = np.linspace(0, x.shape[0], k + 1).astype(int)
    parts = [x[a:b] for a, b in zip(bounds[:-1], bounds[1:]) if b > a]
    for p in parts:
        p.copy_to_host_async()
    out = np.concatenate([np.asarray(p) for p in parts], axis=0).reshape(shape)
    return out if dtype is None else out.astype(dtype, copy=False)
