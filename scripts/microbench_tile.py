"""Tile-size sensitivity of the stacking sort network.

The sort-only eval runs at ~68 GB/s effective input throughput regardless of
row layout (see microbench_layout.py), i.e. ~3.5 TB/s of VMEM row traffic --
likely register-spill bound: at TILE=2048 a row is 8 KB (16 vregs), and the
40-row working set (320 KB) cannot stay in the register file, so every
compare-exchange round-trips VMEM. Smaller tiles shrink the live set.

Run on the real TPU: PYTHONPATH=. python scripts/microbench_tile.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nightlight_tpu.ops.stack_pallas import _sortnet_rows

N = 40
N_PAD = 64
P = 2 * 1024 * 1024
CHAIN = 8


def make_run(tile):
    n_tiles = P // tile

    def kernel(x_ref, o_ref):
        rows = [x_ref[i, :] for i in range(N)]
        rows += [jnp.full((tile,), 3.0e38, jnp.float32) for _ in range(N_PAD - N)]
        rows = _sortnet_rows(rows, N)
        acc = rows[0]
        for r in rows[1:N]:
            acc = acc + jnp.where(r >= 3.0e38, 0.0, r)
        o_ref[0, :] = acc

    @jax.jit
    def run(x):
        def one(x):
            return pl.pallas_call(
                kernel,
                grid=(n_tiles,),
                in_specs=[pl.BlockSpec((N, tile), lambda t: (0, t), memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, tile), lambda t: (0, t), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1, P), jnp.float32),
            )(x)

        acc = jnp.float32(0.0)
        for _ in range(CHAIN):
            o = one(x)
            acc = acc + o[0, 0]
            x = x + acc * 1e-30
        return acc

    return run


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, P), jnp.float32) * 2.0 + 100.0
    for tile in (2048, 1024, 512, 256, 128):
        run = make_run(tile)
        v = float(np.asarray(run(x)))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(np.asarray(run(x)))
            best = min(best, time.perf_counter() - t0)
        per_eval = best / CHAIN
        gbps = N * P * 4 / per_eval / 1e9
        print(f"tile={tile:5d}: {per_eval * 1e3:.2f} ms/eval ({gbps:.1f} GB/s)  value={v:.3f}",
              flush=True)


if __name__ == "__main__":
    main()
