"""Same-band interleaved A/B of double-buffered out-of-core ingest.

Runs the north-star-shape CLI stack (48x16MP, >=2 randomized batches)
alternating prefetch-on (A) and NIGHTLIGHT_NO_PREFETCH=1 control (B) passes
in one process, so both sides sample the same tunnel band (the band swings
30x between hours; interleaving is the only honest comparison —
BASELINE.md). The batch permutation is seeded identically per pass and the
stacked outputs are asserted bit-identical across all passes.

Run on the real TPU: PYTHONPATH=. python scripts/ab_prefetch.py [N] [SIZE]
"""

from __future__ import annotations

import contextlib
import os
import random
import sys
import tempfile
import time


def run_pass(args, prefetch: bool) -> float:
    from nightlight_tpu import cli

    if prefetch:
        os.environ.pop("NIGHTLIGHT_NO_PREFETCH", None)
    else:
        os.environ["NIGHTLIGHT_NO_PREFETCH"] = "1"
    random.seed(4242)  # identical batch permutation for every pass
    t0 = time.perf_counter()
    with contextlib.redirect_stdout(sys.stderr):
        rc = cli.main(list(args))
    dt = time.perf_counter() - t0
    if rc != 0:
        raise SystemExit(f"pass failed rc={rc}")
    return dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from nightlight_tpu.cli import _enable_compilation_cache
    from scripts.gen_fixtures import gen

    _enable_compilation_cache()
    tmpdir = tempfile.mkdtemp(prefix="nl_ab_prefetch_")
    print(f"generating {n}x{size}x{size} fixtures in {tmpdir}...", flush=True)
    gen(tmpdir, n, size, dither=6.0)
    os.chdir(tmpdir)
    args = ["-out", "stacked.fits", "-log", "", "-jpg", "", "-exportStats", "",
            "-dark", "dark.fits", "stack", "light*.fits"]

    print("warm-up pass (compile cache)...", flush=True)
    run_pass(args, prefetch=True)
    golden = open("stacked.fits", "rb").read()

    walls_a, walls_b = [], []
    for p in range(pairs):
        # counterbalanced order: the tunnel band drifts within a session, so
        # a fixed A-then-B order would bias whichever side runs second
        order = (True, False) if p % 2 == 0 else (False, True)
        for prefetch in order:
            dt = run_pass(args, prefetch)
            assert open("stacked.fits", "rb").read() == golden, \
                "output changed between prefetch/control passes"
            (walls_a if prefetch else walls_b).append(dt)
            tag = "prefetch" if prefetch else "control "
            print(f"pair {p}: {tag} {dt:7.1f} s", flush=True)

    print(f"\nprefetch passes: {['%.1f' % w for w in walls_a]}")
    print(f"control  passes: {['%.1f' % w for w in walls_b]}")
    print(f"best A/B speedup: {min(walls_b) / min(walls_a):.2f}x "
          f"(mean {sum(walls_b)/len(walls_b)/(sum(walls_a)/len(walls_a)):.2f}x)",
          flush=True)


if __name__ == "__main__":
    main()
