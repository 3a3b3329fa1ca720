"""Same-band interleaved A/B of the bit-packed wire transport (io/pack.py).

Runs the CLI stack at a chosen shape alternating NIGHTLIGHT_PACK=1 (A,
band gate defeated) and NIGHTLIGHT_NO_PACK=1 control (B) passes in one
process so both sides sample the same tunnel band (VERDICT r4 item 2 /
the round-4 A/B methodology). Captures per-pass wall, the ingest wire
summary line ("Ingest: N grouped uploads..."), and asserts the stacked
outputs bit-identical across every pass.

Defaults to the literal north star (100x16MP, >=2 out-of-core batches);
`python scripts/ab_pack.py 500 1024 2` runs the 500x1MP config.

Run on the real TPU: PYTHONPATH=. python scripts/ab_pack.py [N] [SIZE] [PAIRS]
"""

from __future__ import annotations

import contextlib
import io
import os
import random
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_pass(args, packed: bool) -> tuple[float, str]:
    from nightlight_tpu import cli

    if packed:
        os.environ.pop("NIGHTLIGHT_NO_PACK", None)
        os.environ["NIGHTLIGHT_PACK"] = "1"  # defeat the band gate: A/B wants packed
    else:
        os.environ.pop("NIGHTLIGHT_PACK", None)
        os.environ["NIGHTLIGHT_NO_PACK"] = "1"
    random.seed(4242)  # identical batch permutation for every pass
    buf = io.StringIO()

    class Tee:
        def write(self, s):
            buf.write(s)
            sys.stderr.write(s)

        def flush(self):
            sys.stderr.flush()

    t0 = time.perf_counter()
    with contextlib.redirect_stdout(Tee()):
        rc = cli.main(list(args))
    dt = time.perf_counter() - t0
    if rc != 0:
        raise SystemExit(f"pass failed rc={rc}")
    m = re.findall(r"Ingest: .*", buf.getvalue())
    return dt, "; ".join(m)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from nightlight_tpu.cli import _enable_compilation_cache
    from scripts.gen_fixtures import gen

    _enable_compilation_cache()
    tmpdir = tempfile.mkdtemp(prefix="nl_ab_pack_")
    print(f"generating {n}x{size}x{size} fixtures in {tmpdir}...", flush=True)
    gen(tmpdir, n, size, dither=6.0)
    os.chdir(tmpdir)
    args = ["-out", "stacked.fits", "-log", "", "-jpg", "", "-exportStats", "",
            "-dark", "dark.fits", "stack", "light*.fits"]

    print("warm-up pass (compile cache)...", flush=True)
    run_pass(args, packed=True)
    golden = open("stacked.fits", "rb").read()

    walls_a, walls_b = [], []
    wires = {}
    for p in range(pairs):
        # counterbalanced order: the band drifts within a session, so a
        # fixed A-then-B order would bias whichever side runs second
        order = (True, False) if p % 2 == 0 else (False, True)
        for packed in order:
            dt, wire = run_pass(args, packed)
            assert open("stacked.fits", "rb").read() == golden, \
                "output changed between packed/raw passes"
            (walls_a if packed else walls_b).append(dt)
            tag = "packed" if packed else "raw   "
            wires[tag.strip()] = wire
            print(f"pair {p}: {tag} {dt:7.1f} s   [{wire}]", flush=True)

    print(f"\npacked passes: {['%.1f' % w for w in walls_a]}")
    print(f"raw    passes: {['%.1f' % w for w in walls_b]}")
    for tag, wire in wires.items():
        print(f"{tag}: {wire}")
    print(f"best A/B speedup: {min(walls_b) / min(walls_a):.2f}x "
          f"(mean {sum(walls_b)/len(walls_b)/(sum(walls_a)/len(walls_a)):.2f}x)",
          flush=True)


if __name__ == "__main__":
    main()
