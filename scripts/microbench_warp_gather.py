"""Honest completion-fetch timing for the two round-2 gather replacements.

The round-2 ms-scale readings for the shift-blend warp and the Pallas DMA
patch gather used block_until_ready on the last program, which the round-3
correction showed is dispatch-biased up to 35-70x on this backend
(BASELINE.md). This re-measures both fast paths AND their XLA baselines by
the dependent-chain method: CHAIN dependent evals inside one jit, clock
stopped at a scalar fetch depending on every output.

Run on the real TPU: PYTHONPATH=. python scripts/microbench_warp_gather.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

H = W = 4096  # 16.8MP
K = 2048      # detection candidate capacity
RADIUS = 16


def _time_chain(fn, chain, best_of=5):
    """Best wall for `chain` dependent applications of fn inside one jit;
    returns seconds per eval."""

    @jax.jit
    def run(x):
        acc = jnp.float32(0.0)
        for _ in range(chain):
            out = fn(x + acc * 1e-30)
            acc = acc + jnp.sum(out[..., 0, :1]) * 1e-20
        return acc

    x = jax.random.normal(jax.random.PRNGKey(0), (H, W), jnp.float32) + 100.0
    float(np.asarray(run(x)))  # compile + warm
    best = float("inf")
    for _ in range(best_of):
        t0 = time.perf_counter()
        float(np.asarray(run(x)))
        best = min(best, time.perf_counter() - t0)
    return best / chain


def main():
    from nightlight_tpu.ops.resample import _warp, _warp_shift
    from nightlight_tpu.ops.gather_pallas import gather_patches_pallas
    from nightlight_tpu.detect.stars import _patches

    # near-identity alignment transform (the pipeline's real shape)
    inv = jnp.asarray([1.00002, -1.5e-5, 3.7, 2.1e-5, 0.99997, -5.2], jnp.float32)

    t = _time_chain(lambda im: _warp(im, inv, 0.0, H, W), chain=2, best_of=3)
    print(f"XLA gather warp      : {t*1e3:8.1f} ms / 16MP frame", flush=True)
    warp_xla = t

    t = _time_chain(lambda im: _warp_shift(im, inv, 0.0, jnp.int32(3), jnp.int32(-6),
                                           H, W, 2, 2), chain=8)
    print(f"shift-blend warp     : {t*1e3:8.1f} ms / 16MP frame "
          f"({warp_xla/t:.0f}x)", flush=True)

    rng = np.random.default_rng(0)
    cys = jnp.asarray(rng.integers(RADIUS + 1, H - RADIUS - 1, K), jnp.int32)
    cxs = jnp.asarray(rng.integers(RADIUS + 1, W - RADIUS - 1, K), jnp.int32)

    t = _time_chain(lambda im: _patches(im, cys, cxs, RADIUS)[0], chain=4)
    print(f"XLA patch gather     : {t*1e3:8.1f} ms / frame (K={K}, r={RADIUS})",
          flush=True)
    gather_xla = t

    t = _time_chain(lambda im: gather_patches_pallas(im, cys, cxs, RADIUS)[0],
                    chain=8)
    print(f"Pallas DMA gather    : {t*1e3:8.1f} ms / frame "
          f"({gather_xla/t:.0f}x)", flush=True)


if __name__ == "__main__":
    main()
