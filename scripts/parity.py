"""Behavioral parity harness: black-box REST log-diff against goldens.

Models the reference's integration harness (reference: test/Makefile:1-24,
test/stats.json -> test/stats.expected): start the REST server, POST each
job spec from test/parity/*.json, capture the streamed log body as
<name>.out, and diff it against the committed golden <name>.expected.

Differences from a plain `diff`:
* INTEGER tokens (ids, pixel/star/clip counts, sizes) must match EXACTLY --
  a count regression is a semantics regression;
* float tokens compare within |a-b| <= max(ATOL, RTOL*max(|a|,|b|)) at
  tight bounds (default ATOL=2e-3, RTOL=1e-3, with the absolute band
  further capped at 2 printed quanta of the token so finely-printed
  small values like 0.0111 get a ~1e-4-scale band): the committed
  goldens are CPU-deterministic, so the band only needs to absorb print
  rounding.
  `--tpu` runs widen to the legacy band (kernel-vs-XLA reduction order
  flips trailing digits and the odd clip count);
* lines are compared as a sorted multiset -- promise materialization order
  is scheduler-dependent (the reference's goroutine logs interleave
  nondeterministically too).

Everything non-numeric must match byte-for-byte.

Beyond logs, each job's OUTPUT FILES are digested (<name>.digest: shape,
NaN count, mean/std, sha256 of the pixel data rounded to 1e-3) so a numeric
regression that keeps the log plausible still fails the harness.

Usage:
  python scripts/parity.py            # run + diff against goldens
  python scripts/parity.py --update   # regenerate goldens from this run
  python scripts/parity.py --size 4096 --jobs rgb_full
      # 16MP-scale run (VERDICT r3 item 4): same jobs against separate
      # <name>.s4096.* goldens -- pins scale-DEPENDENT numerics (subsample
      # strides, histogram binning, block grids) that 256px fixtures
      # cannot see; `make parity-big` runs the rgb-path job this way
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys
import threading
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PARITY_DIR = os.path.join(REPO, "test", "parity")
# CPU-deterministic goldens: tight float band, exact integers.
ATOL = 2e-3
RTOL = 1e-3
# --tpu exploratory runs: legacy band, integers still compared as floats.
TPU_ATOL = 0.05
TPU_RTOL = 0.02
_TPU_MODE = False

_NUM_RE = re.compile(r"[-+]?\d+\.?\d*(?:[eE][-+]?\d+)?")


def _make_fixtures(workdir: str, size: int = 256) -> None:
    """Deterministic small star-field fixtures (seeded), plus R/G/B channel
    frames for the rgb job. Star positions scale with `size` so big-fixture
    runs keep the field spread; --size != 256 therefore has its own
    goldens."""
    sys.path.insert(0, REPO)
    import numpy as np

    from nightlight_tpu.image import Image
    from nightlight_tpu.io import fits as nlfits

    rng = np.random.default_rng(20260816)
    h = w = size
    k = size / 256.0
    pos = [(int(x * k), int(y * k)) for (x, y) in
           [(40, 60), (100, 75), (200, 150), (60, 200), (165, 40),
            (220, 220), (130, 230), (75, 130), (190, 90), (30, 30)]]
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    s = 8.0 / 2.3548
    for i in range(4):
        img = rng.normal(100.0, 2.0, size=(h, w)).astype(np.float32)
        for (sx, sy) in pos:
            img += 5500.0 / (2 * np.pi * s * s) * np.exp(
                -(((xx - sx - 2.0 * i) ** 2) + ((yy - sy + 1.5 * i) ** 2)) / (2 * s * s))
        im = Image.from_naxisn([w, h], img)
        im.exposure = 60.0
        nlfits.write_file(im, os.path.join(workdir, f"light{i:02d}.fits"))
    for ch, gain in (("r", 1.0), ("g", 0.7), ("b", 0.5)):
        img = rng.normal(80.0 * gain, 2.0, size=(h, w)).astype(np.float32)
        for (sx, sy) in pos:
            img += gain * 5500.0 / (2 * np.pi * s * s) * np.exp(
                -(((xx - sx) ** 2) + ((yy - sy) ** 2)) / (2 * s * s))
        im = Image.from_naxisn([w, h], img)
        im.exposure = 60.0
        nlfits.write_file(im, os.path.join(workdir, f"chan_{ch}.fits"))


def _post_job(url: str, spec: dict) -> str:
    req = urllib.request.Request(url, data=json.dumps(spec).encode(), method="POST")
    with urllib.request.urlopen(req, timeout=600) as resp:
        return resp.read().decode()


def _print_ulp(tok: str) -> float:
    """One unit in the last PRINTED decimal place of a plain float token
    (0.0 for exponent notation): a true difference below the quantum can
    still flip the last printed digit, so |printed delta| up to one quantum
    is indistinguishable from a within-band change."""
    if "e" in tok.lower() or "." not in tok:
        return 0.0
    return 10.0 ** -(len(tok) - tok.index(".") - 1)


def _tokens_match(a: str, b: str) -> bool:
    """Equal modulo per-class numeric tolerance: integer tokens exact (CPU
    runs), float tokens within the configured band widened by one ULP of
    the printed precision (print quantization: values differing by less
    than the band can straddle a rounding boundary)."""
    na, nb = _NUM_RE.findall(a), _NUM_RE.findall(b)
    if _NUM_RE.sub("#", a) != _NUM_RE.sub("#", b) or len(na) != len(nb):
        return False
    atol, rtol = (TPU_ATOL, TPU_RTOL) if _TPU_MODE else (ATOL, RTOL)
    for xa, xb in zip(na, nb):
        int_a = "." not in xa and "e" not in xa.lower()
        int_b = "." not in xb and "e" not in xb.lower()
        if int_a and int_b and not _TPU_MODE:
            if int(xa) != int(xb):
                return False
            continue
        fa, fb = float(xa), float(xb)
        ulp = min(_print_ulp(xa), _print_ulp(xb))
        # The absolute band need not exceed what the PRINT can express:
        # a token printed as 0.0111 has a 1e-4 quantum, so ATOL=2e-3 would
        # allow an 18% drift. Cap the absolute band at 2 printed quanta
        # (coarser prints keep the configured ATOL; exponent-form tokens
        # have ulp=0 and are left at ATOL).
        atol_tok = min(atol, 2.0 * ulp) if (ulp > 0.0 and not _TPU_MODE) else atol
        if abs(fa - fb) > max(atol_tok, rtol * max(abs(fa), abs(fb))) + ulp:
            return False
    return True


def _digest_outputs(workdir: str, fixtures: set[str]) -> dict:
    """Numeric digest of every output file the job produced: shape, NaN
    count, mean/std (1e-3), and a sha256 of the pixel data rounded to 1e-3.
    Pins today's numerics against regression (committed as <name>.digest)."""
    import numpy as np

    sys.path.insert(0, REPO)
    from nightlight_tpu.io import fits as nlfits

    out: dict = {}
    for fn in sorted(os.listdir(workdir)):
        if fn in fixtures or not fn.lower().endswith((".fits", ".fit", ".fts")):
            continue
        img = nlfits.read_file(os.path.join(workdir, fn), to_device=False)
        d = np.asarray(img.data, np.float64)
        finite = np.isfinite(d)
        vals = d[finite]
        q = np.round(np.nan_to_num(d, nan=-1.0), 3).astype(np.float32)
        out[fn] = {
            "shape": list(d.shape),
            "nan": int(d.size - finite.sum()),
            "mean": round(float(vals.mean()) if vals.size else 0.0, 3),
            "std": round(float(vals.std()) if vals.size else 0.0, 3),
            "sha256_q3": hashlib.sha256(q.tobytes()).hexdigest(),
        }
    return out


def _diff_digests(got: dict, want: dict) -> list[str]:
    problems = []
    for fn in sorted(set(got) | set(want)):
        g, w = got.get(fn), want.get(fn)
        if g is None or w is None:
            problems.append(f"digest: {fn}: {'missing output' if g is None else 'unexpected output'}")
            continue
        for key in ("shape", "nan"):
            if g[key] != w[key]:
                problems.append(f"digest: {fn}: {key} {g[key]} != {w[key]}")
        # --tpu runs widen to the legacy band like the log diff does
        # (kernel-vs-XLA reduction order shifts means at ~1e-2 scale)
        atol, rtol = (0.05, 0.02) if _TPU_MODE else (2e-3, 1e-3)
        for key in ("mean", "std"):
            if abs(g[key] - w[key]) > max(atol, rtol * abs(w[key])):
                problems.append(f"digest: {fn}: {key} {g[key]} != {w[key]}")
        if not _TPU_MODE and g["sha256_q3"] != w["sha256_q3"]:
            problems.append(f"digest: {fn}: pixel hash changed "
                            f"({g['sha256_q3'][:12]} != {w['sha256_q3'][:12]})")
    return problems


def diff_logs(got: str, want: str) -> list[str]:
    """Tolerance diff; returns human-readable mismatch lines (empty = pass)."""
    got_lines = sorted(l for l in got.splitlines() if l.strip())
    want_lines = sorted(l for l in want.splitlines() if l.strip())
    problems: list[str] = []
    remaining = list(want_lines)
    for g in got_lines:
        for i, w in enumerate(remaining):
            if _tokens_match(g, w):
                del remaining[i]
                break
        else:
            problems.append(f"+ {g}")
    problems.extend(f"- {w}" for w in remaining)
    return problems


def main() -> int:
    global _TPU_MODE

    update = "--update" in sys.argv
    _TPU_MODE = "--tpu" in sys.argv
    size = 256
    only_jobs: set[str] | None = None
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--size":
            size = int(argv[i + 1])
        elif a == "--jobs":
            only_jobs = set(argv[i + 1].split(","))
    # non-default sizes pin their own goldens (stats/grids are size-dependent)
    suffix = "" if size == 256 else f".s{size}"
    if "--tpu" not in sys.argv:
        # Deterministic CPU run by default. The environment's sitecustomize
        # imports jax at interpreter startup with the TPU backend, so the
        # JAX_PLATFORMS env var is too late -- use the config API (the same
        # trick as tests/conftest.py).
        import jax

        jax.config.update("jax_platforms", "cpu")

    import tempfile

    workdir = tempfile.mkdtemp(prefix="nl_parity_")
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        _make_fixtures(workdir, size)

        from nightlight_tpu.serve.rest import make_server

        srv = make_server(0, 1024)
        thread = threading.Thread(target=srv.serve_forever, daemon=True)
        thread.start()
        url = f"http://127.0.0.1:{srv.server_address[1]}/api/v1/job"

        jobs = sorted(f for f in os.listdir(PARITY_DIR) if f.endswith(".json"))
        if only_jobs is not None:
            jobs = [f for f in jobs if f[:-5] in only_jobs]
        if not jobs:
            print("no parity jobs found in", PARITY_DIR)
            return 2
        fixtures = set(os.listdir(workdir))
        failures = 0
        for job_file in jobs:
            name = job_file[:-5]
            with open(os.path.join(PARITY_DIR, job_file)) as fh:
                spec = json.load(fh)
            body = _post_job(url, spec)
            out_path = os.path.join(PARITY_DIR, f"{name}{suffix}.out")
            with open(out_path, "w") as fh:
                fh.write(body)
            digest = _digest_outputs(workdir, fixtures)
            # remove this job's outputs so the next job's digest is its own
            for fn in set(os.listdir(workdir)) - fixtures:
                os.unlink(os.path.join(workdir, fn))
            golden_path = os.path.join(PARITY_DIR, f"{name}{suffix}.expected")
            digest_path = os.path.join(PARITY_DIR, f"{name}{suffix}.digest")
            if update:
                with open(golden_path, "w") as fh:
                    fh.write(body)
                with open(digest_path, "w") as fh:
                    json.dump(digest, fh, indent=1, sort_keys=True)
                print(f"parity: {name}: golden updated ({len(body.splitlines())} lines, "
                      f"{len(digest)} output digests)")
                continue
            if not os.path.exists(golden_path):
                print(f"parity: {name}: MISSING GOLDEN {golden_path}")
                failures += 1
                continue
            with open(golden_path) as fh:
                want = fh.read()
            problems = diff_logs(body, want)
            if os.path.exists(digest_path):
                with open(digest_path) as fh:
                    problems += _diff_digests(digest, json.load(fh))
            else:
                problems.append(f"digest: MISSING {digest_path} (run --update)")
            if problems:
                failures += 1
                print(f"parity: {name}: FAIL ({len(problems)} mismatches)")
                for p in problems[:20]:
                    print(f"  {p}")
            else:
                print(f"parity: {name}: ok ({len(body.splitlines())} lines, "
                      f"{len(digest)} output digests)")
        srv.shutdown()
        return 1 if failures else 0
    finally:
        os.chdir(cwd)


if __name__ == "__main__":
    raise SystemExit(main())
