"""Mosaic scheduling sweep for the sigma kernel (VERDICT r4 item 5).

BASELINE bounds the remaining sigma-kernel headroom at ~2-3x and places it
in Mosaic's scheduling, not layout/tiling (both swept flat in round 3).
This sweep measures the schedule knobs Pallas exposes — grid dimension
semantics (parallel/arbitrary) and disabled bounds checks — each in its
own subprocess (the jit cache would otherwise pin the first variant's
compilation). Timing is the dependent-chain method at the bench shape
(40, 2M), clock stopped at a scalar fetch depending on every eval.

Run on the real TPU: PYTHONPATH=. python scripts/microbench_sched.py
"""

from __future__ import annotations

import os
import subprocess
import sys

VARIANTS = ("", "parallel", "arbitrary", "nobounds", "parallel+nobounds")

_CHILD = r"""
import os, sys, time
sys.path.insert(0, %(repo)r)
from nightlight_tpu.cli import _enable_compilation_cache
_enable_compilation_cache()  # a re-run of the sweep must not pay the 5-10
                             # min remote compile per variant twice
import jax, jax.numpy as jnp, numpy as np
from nightlight_tpu.ops.stack_pallas import stack_sigma_pallas

N, P, CHAIN = 40, 2 * 1024 * 1024, 8
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (N, P), jnp.float32) * 2.0 + 100.0

@jax.jit
def run(x):
    acc = jnp.float32(0.0)
    for _ in range(CHAIN):
        o, clo, chi = stack_sigma_pallas(x, 100.0, 3.0, 3.0, winsorize=False)
        acc = acc + o[0] + clo.astype(jnp.float32) * 1e-9 \
            + chi.astype(jnp.float32) * 1e-9
        x = x + acc * 1e-30
    return acc

v0 = float(np.asarray(run(x)))  # compile + warm
best = float("inf")
for _ in range(5):
    t0 = time.perf_counter()
    v = float(np.asarray(run(x)))
    best = min(best, (time.perf_counter() - t0) / CHAIN)
    assert v == v0
print(f"RESULT {os.environ.get('NIGHTLIGHT_PALLAS_SCHED','default') or 'default'} "
      f"{best*1e3:.2f} ms/eval value={v0:.6f}")
"""


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    variants = sys.argv[1:] or list(VARIANTS)
    results = {}
    for variant in variants:
        variant = "" if variant == "default" else variant
        if variant not in VARIANTS:
            # _sched_params substring-matches, so a typo would silently
            # benchmark the default schedule under the typo'd name
            raise SystemExit(f"unknown variant {variant!r}; "
                             f"choose from {('default',) + VARIANTS[1:]}")
        env = dict(os.environ)
        if variant:
            env["NIGHTLIGHT_PALLAS_SCHED"] = variant
        else:
            env.pop("NIGHTLIGHT_PALLAS_SCHED", None)
        try:
            out = subprocess.run([sys.executable, "-c",
                                  _CHILD % {"repo": repo}],
                                 env=env, capture_output=True, text=True,
                                 timeout=1200)
        except subprocess.TimeoutExpired:
            # a variant whose remote compile exceeds 20 min is itself a
            # result (the 'arbitrary' grid semantics did this) — record it
            # and keep sweeping the rest
            print(f"RESULT {variant or 'default'} TIMEOUT(>1200s compile)",
                  flush=True)
            results[variant or "default"] = "timeout"
            continue
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("RESULT")]
        print(line[0] if line else f"{variant or 'default'}: FAILED\n{out.stderr[-800:]}",
              flush=True)
        if line:
            results[variant or "default"] = line[0]
    return results


if __name__ == "__main__":
    main()
