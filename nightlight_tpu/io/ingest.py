"""Asynchronous host-side ingest: decode FITS frames ahead of device demand.

The reference overlaps file I/O with compute through its goroutine promise
pool (reference: internal/ops/operator.go:73-116). On TPU the equivalent is
a bounded prefetch pipeline: worker threads decode + byte-swap FITS payloads
(optionally via the native C decoder) while the device consumes earlier
frames, keeping host->HBM transfers off the critical path.
"""

from __future__ import annotations

import concurrent.futures as cf
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


def device_put_sharded_rows(arr, mesh=None):
    """Place a (frames, H, W) array with rows sharded over the mesh (the
    multi-chip ingest path); single-device put otherwise."""
    if mesh is None:
        return jnp.asarray(arr)
    from nightlight_tpu.parallel.mesh import shard_rows

    return jax.device_put(jnp.asarray(arr), shard_rows(mesh))
