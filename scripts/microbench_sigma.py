"""Full sigma-clip kernel eval timing at the bench shape (40, 2M).

Dependent-chain method (BASELINE.md): 8 chained evals inside one jit, the
clock stops at a scalar fetch depending on every output. Compares against
the recorded 11.2 ms/eval baseline for the Batcher-network kernel with
per-predicate range-mask counts (pre-rank_counts).

Run on the real TPU: PYTHONPATH=. python scripts/microbench_sigma.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from nightlight_tpu.ops.stack_pallas import stack_sigma_pallas

N = 40
P = 2 * 1024 * 1024
CHAIN = 8


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, P), jnp.float32) * 2.0 + 100.0

    for winsorize in (False, True):
        @jax.jit
        def run(x, winsorize=winsorize):
            acc = jnp.float32(0.0)
            for _ in range(CHAIN):
                o, clo, chi = stack_sigma_pallas(x, 100.0, 3.0, 3.0,
                                                 winsorize=winsorize)
                acc = acc + o[0] + clo.astype(jnp.float32) * 1e-9 \
                    + chi.astype(jnp.float32) * 1e-9
                x = x + acc * 1e-30
            return acc

        v = float(np.asarray(run(x)))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(np.asarray(run(x)))
            best = min(best, time.perf_counter() - t0)
        per_eval = best / CHAIN
        name = "winsor" if winsorize else "sigma "
        print(f"{name}: {per_eval * 1e3:.2f} ms/eval "
              f"({N * P * 4 / per_eval / 1e9:.1f} GB/s)  value={v:.4g}",
              flush=True)


if __name__ == "__main__":
    main()
