"""Pallas patch-gather kernel: DMA star-candidate windows out of HBM.

XLA lowers a 2D advanced-indexing gather to element-wise loads on TPU; the
(K, 2r+1, 2r+1) candidate-patch gather that feeds center-of-mass refinement
and HFR measurement (detect/stars.py:_patches, reference semantics
findstars.go:274-396) costs ~230ms per 16MP frame that way -- 93% of the
whole detection program. Patches are contiguous rectangles, which is
exactly what the TPU's DMA engines are for: this kernel issues one small
async copy per candidate from an (8,128)-aligned window and rotates the
residual offset in VMEM (pltpu.roll), 9x faster (35.4 -> 3.9 ms/frame at
K=2048, completion-fetch timing, scripts/microbench_warp_gather.py;
round 2's ~60x used the dispatch-biased clock).

Boundary handling matches _patches' mask contract: windows are clamped to
the image, so out-of-frame elements hold wrapped (arbitrary) values and the
caller's `ok` mask -- which every consumer already applies before reading --
marks them invalid.

Note dynamic pltpu.roll shifts must be NON-NEGATIVE on the compiled path
(negative dynamic shifts silently produce wrong data); the (N - off) % N
form keeps them in range for any off in (-N, N).
"""

from __future__ import annotations

import os as _os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = _os.environ.get("NIGHTLIGHT_PALLAS_INTERPRET", "") == "1"


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def gather_patches_pallas(img: jax.Array, cys: jax.Array, cxs: jax.Array,
                          radius: int):
    """(K, 2r+1, 2r+1) patches around integer centers via per-candidate DMA.

    Same output contract as detect.stars._patches: (patch, ok) where ok
    marks in-frame elements; out-of-frame patch values are unspecified and
    must be masked by the caller (all consumers do).
    """
    h, w = img.shape
    size = 2 * radius + 1
    # the window must hold the patch at ANY sub-tile offset: row offsets
    # reach 7 and column offsets 127 past the aligned start, so each axis
    # carries one full extra tile of margin (rows = round_up(size, 8) alone
    # leaves < 8 spare rows whenever size % 8 > 0 and wraps the bottom
    # patch rows for odd radii)
    rows = _round_up(size, 8) + 8
    lanes = _round_up(size, 128)
    cols = lanes + 128

    # pad to the (8, 128) tile grid (identity for aligned shapes like 4096^2)
    h8, w128 = _round_up(max(h, rows), 8), _round_up(max(w, cols), 128)
    if (h8, w128) != (h, w):
        img = jnp.pad(img, ((0, h8 - h), (0, w128 - w)))

    max_row_block = (h8 - rows) // 8
    max_col_block = (w128 - cols) // 128

    def kernel(sy_ref, sx_ref, img_ref, out_ref, scratch, sem):
        k = pl.program_id(0)
        sy = sy_ref[k]
        sx = sx_ref[k]
        sy_win = pl.multiple_of(jnp.clip(sy // 8, 0, max_row_block) * 8, 8)
        sx_win = pl.multiple_of(jnp.clip(sx // 128, 0, max_col_block) * 128, 128)
        dma = pltpu.make_async_copy(
            img_ref.at[pl.ds(sy_win, rows), pl.ds(sx_win, cols)], scratch, sem)
        dma.start()
        dma.wait()
        v = pltpu.roll(scratch[:], (rows - (sy - sy_win)) % rows, axis=0)
        v = pltpu.roll(v, (cols - (sx - sx_win)) % cols, axis=1)
        out_ref[0] = v[:, :lanes]

    k_n = cys.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(k_n,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, rows, lanes), lambda k, sy, sx: (k, 0, 0)),
        scratch_shapes=[pltpu.VMEM((rows, cols), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((k_n, rows, lanes), jnp.float32),
        grid_spec=grid_spec,
        interpret=INTERPRET,
    )(cys - radius, cxs - radius, img)
    patch = out[:, :size, :size]

    offs = jnp.arange(size)
    yy = cys[:, None, None] + offs[None, :, None] - radius
    xx = cxs[:, None, None] + offs[None, None, :] - radius
    ok = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
    return patch, ok


def pallas_gather_available() -> bool:
    """The compiled kernel needs a real TPU backend (or interpret mode)."""
    if INTERPRET:
        return True
    try:
        import jax.extend.backend as jeb

        return jeb.get_backend().platform == "tpu"
    except Exception:  # noqa: BLE001
        return False
