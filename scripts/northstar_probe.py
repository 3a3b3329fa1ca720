"""Best-band north-star attempt (VERDICT r4 item 3).

The 100x16MP end-to-end wall is wire-bound: at the tunnel's bad-band
10-40 MB/s the 3.23 GB H2D floor alone is 85-290 s, while round-3 measured
up to 743 MB/s in good bands — where the floor drops to ~4 s raw (~2 s
bit-packed) and the <10 s target is in reach. This probe waits for such a
band: it measures H2D with a cheap burst every --interval seconds and
fires ONE full north-star run (with per-phase timestamps) when the band
exceeds --mbps, then exits. Appends every probe and the final result to
--log so the session keeps a dated record for BASELINE.md.

Run on the real TPU (needs the chip to itself):
  PYTHONPATH=. python scripts/northstar_probe.py [--mbps 300] [--interval 600]
  [--once]  # measure the band and, if good, run; else exit (no loop)
"""

from __future__ import annotations

import argparse
import contextlib
import datetime
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe_h2d() -> float:
    """Cheap H2D burst: 2x16MB back-to-back, clocked at an all-chunks
    fetch; returns MB/s. Small enough to finish fast in any band."""
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    parts = [rng.integers(0, 65535, size=(8 << 20,), dtype=np.uint16)
             for _ in range(2)]
    t0 = time.perf_counter()
    chunks = [jnp.asarray(p) for p in parts]
    acc = sum(c[0].astype(jnp.float32) for c in chunks)
    float(np.asarray(acc))
    return 32.0 / (time.perf_counter() - t0)


def run_northstar(log_path: str, n: int = 100, size: int = 4096) -> float:
    from nightlight_tpu import cli
    from scripts.gen_fixtures import gen

    tmpdir = tempfile.mkdtemp(prefix="nl_ns_probe_")
    cwd = os.getcwd()
    try:
        gen(tmpdir, n, size, dither=6.0)
        os.chdir(tmpdir)
        os.environ["NIGHTLIGHT_LOG_TIMES"] = "1"  # per-phase timestamps
        args = ["-out", "stacked.fits", "-log", "run.log", "-jpg", "",
                "-exportStats", "", "-dark", "dark.fits",
                "stack", "light*.fits"]
        t0 = time.perf_counter()
        with contextlib.redirect_stdout(sys.stderr):
            rc = cli.main(list(args))
        dt = time.perf_counter() - t0
        if rc != 0:
            raise SystemExit(f"north-star run failed rc={rc}")
        with open(log_path, "a") as f:
            f.write(f"  RUN: {n}x{size}x{size} e2e wall {dt:.1f} s "
                    f"({n / dt:.2f} f/s)\n")
            for line in open("run.log"):
                if any(k in line for k in ("Ingest:", "Using", "Done",
                                           "Stacking", "batches")):
                    f.write("    " + line)
        return dt
    finally:
        os.chdir(cwd)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mbps", type=float, default=300.0)
    ap.add_argument("--interval", type=float, default=600.0)
    ap.add_argument("--once", action="store_true")
    ap.add_argument("--log", default="/tmp/northstar_probe.log")
    ap.add_argument("--max-hours", type=float, default=10.0)
    args = ap.parse_args()

    from nightlight_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()
    t_start = time.time()
    while True:
        mbps = probe_h2d()
        stamp = datetime.datetime.now().isoformat(timespec="seconds")
        with open(args.log, "a") as f:
            f.write(f"{stamp} probe {mbps:.0f} MB/s "
                    f"(threshold {args.mbps:.0f})\n")
        print(f"{stamp} H2D {mbps:.0f} MB/s", flush=True)
        if mbps >= args.mbps:
            wall = run_northstar(args.log)
            print(f"north star in a {mbps:.0f} MB/s band: {wall:.1f} s",
                  flush=True)
            return
        if args.once or (time.time() - t_start) > args.max_hours * 3600:
            print("no qualifying band; exiting", flush=True)
            return
        time.sleep(args.interval)


if __name__ == "__main__":
    main()
