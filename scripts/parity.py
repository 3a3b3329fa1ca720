"""Behavioral parity harness: black-box REST log-diff against goldens.

Models the reference's integration harness (reference: test/Makefile:1-24,
test/stats.json -> test/stats.expected): start the REST server, POST each
job spec from test/parity/*.json, capture the streamed log body as
<name>.out, and diff it against the committed golden <name>.expected.

Differences from a plain `diff`:
* numeric tokens compare within |a-b| <= max(ATOL, RTOL*max(|a|,|b|))
  -- the sampling-based estimators and float reduction order differ
  between backends (CPU mesh vs real TPU), flipping last printed digits;
* lines are compared as a sorted multiset -- promise materialization order
  is scheduler-dependent (the reference's goroutine logs interleave
  nondeterministically too).

Everything non-numeric must match byte-for-byte.

Usage:
  python scripts/parity.py            # run + diff against goldens
  python scripts/parity.py --update   # regenerate goldens from this run
"""

from __future__ import annotations

import json
import os
import re
import sys
import threading
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PARITY_DIR = os.path.join(REPO, "test", "parity")
ATOL = 0.05
RTOL = 0.02

_NUM_RE = re.compile(r"[-+]?\d+\.?\d*(?:[eE][-+]?\d+)?")


def _make_fixtures(workdir: str) -> None:
    """Deterministic small star-field fixtures (seeded), plus R/G/B channel
    frames for the rgb job."""
    sys.path.insert(0, REPO)
    import numpy as np

    from nightlight_tpu.image import Image
    from nightlight_tpu.io import fits as nlfits

    rng = np.random.default_rng(20260816)
    h = w = 256
    pos = [(40, 60), (100, 75), (200, 150), (60, 200), (165, 40),
           (220, 220), (130, 230), (75, 130), (190, 90), (30, 30)]
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


def _tokens_match(a: str, b: str) -> bool:
    """Equal modulo numeric tolerance."""
    na, nb = _NUM_RE.findall(a), _NUM_RE.findall(b)
    if _NUM_RE.sub("#", a) != _NUM_RE.sub("#", b) or len(na) != len(nb):
        return False
    for xa, xb in zip(na, nb):
        fa, fb = float(xa), float(xb)
        if abs(fa - fb) > max(ATOL, RTOL * max(abs(fa), abs(fb))):
            return False
    return True


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
    update = "--update" in sys.argv
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
        _make_fixtures(workdir)

        from nightlight_tpu.serve.rest import make_server

        srv = make_server(0, 1024)
        thread = threading.Thread(target=srv.serve_forever, daemon=True)
        thread.start()
        url = f"http://127.0.0.1:{srv.server_address[1]}/api/v1/job"

        jobs = sorted(f for f in os.listdir(PARITY_DIR) if f.endswith(".json"))
        if not jobs:
            print("no parity jobs found in", PARITY_DIR)
            return 2
        failures = 0
        for job_file in jobs:
            name = job_file[:-5]
            with open(os.path.join(PARITY_DIR, job_file)) as fh:
                spec = json.load(fh)
            body = _post_job(url, spec)
            out_path = os.path.join(PARITY_DIR, f"{name}.out")
            with open(out_path, "w") as fh:
                fh.write(body)
            golden_path = os.path.join(PARITY_DIR, f"{name}.expected")
            if update:
                with open(golden_path, "w") as fh:
                    fh.write(body)
                print(f"parity: {name}: golden updated ({len(body.splitlines())} lines)")
                continue
            if not os.path.exists(golden_path):
                print(f"parity: {name}: MISSING GOLDEN {golden_path}")
                failures += 1
                continue
            with open(golden_path) as fh:
                want = fh.read()
            problems = diff_logs(body, want)
            if problems:
                failures += 1
                print(f"parity: {name}: FAIL ({len(problems)} mismatches)")
                for p in problems[:20]:
                    print(f"  {p}")
            else:
                print(f"parity: {name}: ok ({len(body.splitlines())} lines)")
        srv.shutdown()
        return 1 if failures else 0
    finally:
        os.chdir(cwd)


if __name__ == "__main__":
    raise SystemExit(main())
