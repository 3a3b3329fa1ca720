"""Layout A/B microbench: (1, 2048) rows vs (8, 256) rows in the stacking
sort network.

Hypothesis: the stack kernels' per-frame rows are 1D (tile,) vectors, which
Mosaic lays out as (1, tile) -- one active sublane out of 8 per vreg -- so
every vector min/max of the Batcher network (and every masked reduction in
the clip loop) runs at 1/8 of VPU throughput. Reshaping each row to
(8, tile//8) should recover most of that.

Timing uses the dependent-chain method (BASELINE.md round-3): several
dependent kernel applications inside one jit, clock stopped at a scalar
fetch that depends on every output.

Run on the real TPU: python scripts/microbench_layout.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nightlight_tpu.ops.stack_pallas import _oddeven_pairs, _sortnet_rows

N = 40
N_PAD = 64
TILE = 2048
P = 2 * 1024 * 1024  # 2M pixels per eval, like the bench chunk
N_TILES = P // TILE
CHAIN = 8


def _sort_sum_rows(rows, n_real):
    rows = _sortnet_rows(rows, n_real)
    acc = rows[0]
    for r in rows[1:n_real]:
        acc = acc + jnp.where(r >= 3.0e38, 0.0, r)
    return acc


def kernel_flat(x_ref, o_ref):
    rows = [x_ref[i, :] for i in range(N)]
    rows += [jnp.full((TILE,), 3.0e38, jnp.float32) for _ in range(N_PAD - N)]
    o_ref[0, :] = _sort_sum_rows(rows, N)


def kernel_8x(x_ref, o_ref):
    rows = [x_ref[i, 0] for i in range(N)]
    rows += [jnp.full((8, TILE // 8), 3.0e38, jnp.float32) for _ in range(N_PAD - N)]
    o_ref[0, 0] = _sort_sum_rows(rows, N)


@jax.jit
def run_flat(x):
    def one(x):
        return pl.pallas_call(
            kernel_flat,
            grid=(N_TILES,),
            in_specs=[pl.BlockSpec((N, TILE), lambda t: (0, t), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, TILE), lambda t: (0, t), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, P), jnp.float32),
        )(x)

    acc = jnp.float32(0.0)
    for _ in range(CHAIN):
        o = one(x)
        acc = acc + o[0, 0]
        x = x + acc * 1e-30  # serialize the chain
    return acc


@jax.jit
def run_8x(x):
    x = x.reshape(N, N_TILES, 8, TILE // 8)

    def one(x):
        return pl.pallas_call(
            kernel_8x,
            grid=(N_TILES,),
            in_specs=[pl.BlockSpec((N, 1, 8, TILE // 8), lambda t: (0, t, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1, 8, TILE // 8), lambda t: (0, t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, N_TILES, 8, TILE // 8), jnp.float32),
        )(x)

    acc = jnp.float32(0.0)
    for _ in range(CHAIN):
        o = one(x)
        acc = acc + o[0, 0, 0, 0]
        x = x + acc * 1e-30
    return acc


def timeit(fn, x, label):
    r = fn(x)
    v = float(np.asarray(r))  # warm-up + compile
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(np.asarray(fn(x)))
        best = min(best, time.perf_counter() - t0)
    per_eval = best / CHAIN
    gbps = N * P * 4 / per_eval / 1e9
    print(f"{label}: {per_eval * 1e3:.2f} ms/eval ({gbps:.1f} GB/s effective)  value={v:.3f}")
    return per_eval, v


def main():
    print("pairs at n=64:", len(_oddeven_pairs(N_PAD)))
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, P), jnp.float32) * 2.0 + 100.0
    t_flat, v_flat = timeit(run_flat, x, "flat  (1,2048) rows")
    t_8x, v_8x = timeit(run_8x, x, "8x256 (8,256)  rows")
    print(f"speedup: {t_flat / t_8x:.2f}x   values match: {abs(v_flat - v_8x) < 1e-2}")


if __name__ == "__main__":
    main()
