"""Benchmark: 16MP frames/sec through the flagship stacking path.

Emits SIX JSON lines (one per BASELINE config family):
1. the device stacking path (calibrate + histogram-match + sigma-clip over
   device-resident frame chunks -- the shape the out-of-core engine uses);
2. a 12x16MP end-to-end CLI `stack` pass (decode, dark-calibrate, bad-pixel,
   star detect, reference selection, histogram match, align + warp,
   goal-seek sigma-clip stack, FITS save), measured warm (second in-process
   pass; remote compile cache is persistent);
3. config #2: the LRGB `rgb` pipeline at 4x16MP (combine + balance + the
   13-op HSL chain + stretch + saves);
4. config #3: one-shot-color RGGB debayer + winsorized stack at 12x16MP;
5. config #4: the narrowband Hubble-palette composite at 3x16MP;
6. the LITERAL NORTH STAR (BASELINE.md), LAST so the driver records it:
   100x16MP through the out-of-core batching engine (>=2 randomized
   batches on a 16 GB chip, double-buffered next-batch upload prefetch).

Every line embeds the H2D/D2H bandwidth measured through the SAME tunnel
adjacent to that phase (h2d_mbps / d2h_mbps): the tunnel band swings 30x
between hours (BASELINE.md), so cross-round comparisons of the raw values
are noise unless normalized by the band. wire_h2d_mb on the e2e lines is
the raw FITS payload the run must move host->device.

vs_baseline is relative to the driver's north-star target of 100x16MP
end-to-end in <10s (= 10 frames/sec); the Go reference publishes no numbers
(BASELINE.md).
"""

from __future__ import annotations

import json
import os
import time

# Per-phase soft time budgets (seconds). The tunnel's bandwidth swings 30x
# between hours (BASELINE.md); in a bad band a single e2e pass can take
# many minutes, and the best-of-N loops below would multiply that. Every
# phase always completes its warm-up plus at least ONE timed pass (so the
# metric is still honest), but further best-of passes are skipped once the
# phase exceeds its budget.
_BUDGET_SCALE = float(os.environ.get("NIGHTLIGHT_BENCH_BUDGET", "1.0"))


def _over_budget(t_start: float, budget_s: float) -> bool:
    return (time.perf_counter() - t_start) > budget_s * _BUDGET_SCALE


def measure_band() -> dict:
    """~10-second H2D/D2H bandwidth probe through the live tunnel.

    H2D: 4x16MB u16 arrays dispatched back-to-back (the pipeline's upload
    pattern; back-to-back beats sync-each ~1.5x, scripts/microbench_h2d.py),
    clocked at a scalar fetch depending on every chunk. D2H: one 32MB f32
    fetch through the chunked save-path helper (utils/transfer.fetch_array).
    Best of 2 passes each. Returns {} off-TPU (CPU test environments)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        if jax.devices()[0].platform != "tpu":
            return {}
    except Exception:  # noqa: BLE001 - no device at all
        return {}
    rng = np.random.default_rng(0)
    parts = [rng.integers(0, 65535, size=(8 << 20,), dtype=np.uint16)
             for _ in range(4)]
    h2d = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        chunks = [jnp.asarray(p) for p in parts]
        acc = chunks[0][0].astype(jnp.float32)
        for c in chunks[1:]:
            acc = acc + c[0].astype(jnp.float32)
        float(np.asarray(acc))
        h2d = max(h2d, 64.0 / (time.perf_counter() - t0))
        del chunks
    from nightlight_tpu.utils.transfer import fetch_array

    x = jnp.full((2048, 4096), 1.5, jnp.float32)
    d2h = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        fetch_array(x)
        d2h = max(d2h, 32.0 / (time.perf_counter() - t0))
    return {"h2d_mbps": round(h2d, 1), "d2h_mbps": round(d2h, 1)}


def _enable_cache() -> None:
    # one policy for cache dir + the TPU-only guard (XLA:CPU AOT cache
    # entries are not portable across hosts)
    from nightlight_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()


def bench_e2e(n_frames: int = 12, size: int = 4096, best_of: int = 5,
              band: dict | None = None) -> None:
    """North-star metric: decode -> calibrate -> detect -> align-warp ->
    goal-seek sigma-clip stack -> save, end to end from FITS files on disk.

    Runs the CLI in-process: one warm-up pass populates the jit caches, then
    the best of `best_of` timed passes is reported (the remote tunnel
    injects multi-second stalls that would poison single measurements)."""
    import shutil
    import tempfile

    from nightlight_tpu import cli
    from scripts.gen_fixtures import gen

    tmpdir = tempfile.mkdtemp(prefix="nl_bench_e2e_")
    cwd = os.getcwd()
    try:
        gen(tmpdir, n_frames, size)
        os.chdir(tmpdir)
        args = ["-out", "stacked.fits", "-log", "", "-jpg", "", "-exportStats", "",
                "-dark", "dark.fits", "stack", "light*.fits"]
        import contextlib
        import sys

        elapsed = float("inf")
        t_phase = time.perf_counter()
        for i in range(best_of + 1):  # pass 0 is the compile warm-up
            t0 = time.perf_counter()
            with contextlib.redirect_stdout(sys.stderr):  # keep stdout = JSON only
                rc = cli.main(list(args))
            dt = time.perf_counter() - t0
            if rc != 0:
                raise SystemExit(f"bench e2e CLI run failed (rc={rc})")
            # pass 0 pays in-process tracing (and compiles on a cold cache),
            # so it is usually slower -- but when the tunnel stalls the later
            # passes instead, taking it into the min can only help
            elapsed = min(elapsed, dt)
            # bad-band guard: keep warm-up + >=1 timed pass, then stop
            if i >= 1 and _over_budget(t_phase, 600.0):
                break
        fps = n_frames / elapsed
        print(json.dumps({
            "metric": "16MP frames/sec end-to-end "
                      "(FITS decode+calibrate+detect+align-warp+goal-seek-stack+save)",
            "value": round(fps, 3),
            "unit": "frames/sec",
            "vs_baseline": round(fps / 10.0, 3),
            "wire_h2d_mb": round((n_frames + 1) * size * size * 2 / (1 << 20), 1),
            **(band or {}),
        }), flush=True)
    finally:
        os.chdir(cwd)
        shutil.rmtree(tmpdir, ignore_errors=True)


def _timed_cli(args, budget_s: float, passes: int = 2) -> float:
    """Warm-up + timed in-process CLI passes (min wall); stops early once
    over budget (bad tunnel bands — every caller still gets >=1 pass)."""
    import contextlib
    import sys

    from nightlight_tpu import cli

    elapsed = float("inf")
    t_phase = time.perf_counter()
    for _ in range(passes):
        t0 = time.perf_counter()
        with contextlib.redirect_stdout(sys.stderr):
            rc = cli.main(list(args))
        if rc != 0:
            raise SystemExit(f"bench CLI run failed (rc={rc}): {args}")
        elapsed = min(elapsed, time.perf_counter() - t0)
        if _over_budget(t_phase, budget_s):
            break
    return elapsed


def _in_tmpdir(fn):
    import shutil
    import tempfile

    tmpdir = tempfile.mkdtemp(prefix="nl_bench_cfg_")
    cwd = os.getcwd()
    try:
        return fn(tmpdir)
    finally:
        os.chdir(cwd)
        shutil.rmtree(tmpdir, ignore_errors=True)


def bench_rgb(size: int = 4096) -> None:
    """BASELINE config #2: the flagship `rgb` command on 4x16MP stacked
    LRGB masters — RGB combine, auto balance, RGB->HSLuv, the 13-op HSL
    chain (incl. auto-stretch), HSLuv->RGB, FITS+JPEG saves (reference
    cmd/nightlight/main.go:358-392)."""
    from scripts.gen_fixtures import gen_channels

    def run(tmpdir):
        gen_channels(tmpdir, size)
        band = measure_band()
        os.chdir(tmpdir)
        wall = _timed_cli(["-out", "rgb.fits", "-log", "", "-jpg", "rgb.jpg",
                           "-exportStats", "", "rgb", "chan_l.fits",
                           "chan_r.fits", "chan_g.fits", "chan_b.fits"], 420.0)
        mp = f"{size * size / 1e6:.1f}MP"
        print(json.dumps({
            "metric": f"LRGB rgb pipeline wall (4x{mp}: combine+balance+"
                      "13-op HSL chain+stretch+saves)",
            "value": round(wall, 2),
            "unit": "sec",
            "vs_baseline": round(10.0 / wall, 3),  # vs a nominal 10 s wall
            "wire_h2d_mb": round(4 * size * size * 2 / (1 << 20), 1),
            **band,
        }), flush=True)

    _in_tmpdir(run)


def bench_bayer(n_frames: int = 12, size: int = 4096) -> None:
    """BASELINE config #3 (arp316 shape): one-shot-color RGGB lights
    through CFA-aware cosmetic correction, single-channel debayer, and a
    winsorized sigma stack (reference internal/ops/pre/debayer.go:26-263,
    stack.go:611-705)."""
    from scripts.gen_fixtures import gen

    def run(tmpdir):
        gen(tmpdir, n_frames, size, dither=6.0, bayer="RGGB")
        band = measure_band()
        os.chdir(tmpdir)
        wall = _timed_cli(["-out", "osc.fits", "-log", "", "-jpg", "",
                           "-exportStats", "", "-dark", "dark.fits",
                           "-debayer", "G", "-cfa", "RGGB", "-stMode", "3",
                           "stack", "light*.fits"], 420.0)
        fps = n_frames / wall
        mp = f"{size * size / 1e6:.1f}MP"
        print(json.dumps({
            "metric": f"{mp} OSC frames/sec (debayer G + winsorized stack, "
                      f"{n_frames}x{mp} RGGB)",
            "value": round(fps, 3),
            "unit": "frames/sec",
            "vs_baseline": round(fps / 10.0, 3),
            "wire_h2d_mb": round((n_frames + 1) * size * size * 2 / (1 << 20), 1),
            **band,
        }), flush=True)

    _in_tmpdir(run)


def bench_narrowband(size: int = 4096) -> None:
    """BASELINE config #4 (NGC7635 shape): Hubble-palette narrowband
    composite — SHO masters through `rgb` with background neutralization,
    SCNR, selective saturation, and hue rotation active."""
    from scripts.gen_fixtures import gen_channels

    def run(tmpdir):
        gen_channels(tmpdir, size, channels=(("s", 0.9), ("h", 1.0), ("o", 0.7)))
        band = measure_band()
        os.chdir(tmpdir)
        wall = _timed_cli(["-out", "nb.fits", "-log", "", "-jpg", "nb.jpg",
                           "-exportStats", "",
                           "-neutSigmaLow", "0.7", "-neutSigmaHigh", "1.0",
                           "-scnr", "0.5", "-chromaBy", "1.2",
                           "-chromaFrom", "295", "-chromaTo", "40",
                           "-rotFrom", "100", "-rotTo", "190", "-rotBy", "-30",
                           "rgb", "chan_s.fits", "chan_h.fits", "chan_o.fits"],
                          420.0)
        mp = f"{size * size / 1e6:.1f}MP"
        print(json.dumps({
            "metric": f"Narrowband Hubble-palette composite wall (3x{mp} SHO "
                      "through rgb + neutralize/SCNR/hue-rotate)",
            "value": round(wall, 2),
            "unit": "sec",
            "vs_baseline": round(10.0 / wall, 3),  # vs a nominal 10 s wall
            "wire_h2d_mb": round(3 * size * size * 2 / (1 << 20), 1),
            **band,
        }), flush=True)

    _in_tmpdir(run)


def bench_northstar(n_frames: int = 100, size: int = 4096) -> None:
    """The LITERAL north star (VERDICT r3 item 2): 100x16MP through
    OpStackBatches at a device-memory budget that forces >=2 batches on a
    16 GB chip, exercising decode, windowed bulk ingest with double-buffered
    next-batch upload prefetch, fused preprocess, align, goal-seek, and the
    incremental combine together at the full target shape (reference model
    stackbatches.go:121-210).

    One warm-up pass (compile cache) + one timed pass; the timed pass is
    skipped when the warm-up already blew the phase budget (bad tunnel
    band). The band measured immediately before the passes is embedded in
    the JSON line."""
    import contextlib
    import shutil
    import sys
    import tempfile

    from nightlight_tpu import cli
    from scripts.gen_fixtures import gen

    tmpdir = tempfile.mkdtemp(prefix="nl_bench_ns_")
    cwd = os.getcwd()
    try:
        # bounded random dither: a linear drift over 100 frames would walk
        # the star field off the frame
        gen(tmpdir, n_frames, size, dither=6.0)
        band = measure_band()
        os.chdir(tmpdir)
        args = ["-out", "stacked.fits", "-log", "", "-jpg", "", "-exportStats", "",
                "-dark", "dark.fits", "stack", "light*.fits"]
        elapsed = float("inf")
        batches_seen = 0
        t_phase = time.perf_counter()
        for i in range(2):  # pass 0 warms the compile caches
            import io

            t0 = time.perf_counter()
            buf = io.StringIO()

            class Tee:
                def write(self, s):
                    buf.write(s)
                    sys.stderr.write(s)

                def flush(self):
                    sys.stderr.flush()

            with contextlib.redirect_stdout(Tee()):
                rc = cli.main(list(args))
            dt = time.perf_counter() - t0
            if rc != 0:
                raise SystemExit(f"bench northstar CLI run failed (rc={rc})")
            # min over BOTH passes: the tunnel swings 30x between hours
            # (BASELINE.md), so a stalled timed pass should not override a
            # clean warm-up pass
            elapsed = min(elapsed, dt)
            import re

            m = re.search(r"Using (\d+) random batches", buf.getvalue())
            batches_seen = int(m.group(1)) if m else 1
            if _over_budget(t_phase, 900.0):
                break
        fps = n_frames / elapsed
        mp = f"{size * size / 1e6:.1f}MP"
        print(json.dumps({
            "metric": f"{mp} frames/sec end-to-end at the north star "
                      f"({n_frames}x{mp}, {batches_seen} out-of-core batches)",
            "value": round(fps, 3),
            "unit": "frames/sec",
            "vs_baseline": round(fps / 10.0, 3),
            "north_star_wall_sec": round(elapsed, 1),
            "wire_h2d_mb": round((n_frames + 1) * size * size * 2 / (1 << 20), 1),
            **band,
        }), flush=True)
    finally:
        os.chdir(cwd)
        shutil.rmtree(tmpdir, ignore_errors=True)


def main() -> None:
    _enable_cache()
    band0 = measure_band()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from functools import partial

    from nightlight_tpu.parallel.mesh import _pipeline_step
    from nightlight_tpu.ops.stack import StackMode

    n_frames = 40
    h, w = 4096, 4096  # 16.8 MP
    chunk_rows = 512
    n_chunks = h // chunk_rows

    key = jax.random.PRNGKey(0)
    # One device-resident chunk template; per-chunk data is derived on device
    # so HBM holds only (frames, chunk, w) at once plus working set.
    base = jax.random.normal(key, (n_frames, chunk_rows, w), jnp.float32) * 2.0 + 100.0
    dark = jnp.zeros((chunk_rows, w), jnp.float32) + 1.0
    flat = jnp.ones((chunk_rows, w), jnp.float32)
    ones = jnp.ones(n_frames, jnp.float32)

    step = jax.jit(partial(_pipeline_step, mode=int(StackMode.Sigma), use_pallas=True))

    def run_chunk(i):
        chunk = base + jnp.float32(i) * 0.001  # unique data per chunk
        out = step(chunk, dark, flat, jnp.float32(1.0), ones, ones, ones,
                   jnp.float32(100.0), jnp.float32(2.0),
                   jnp.float32(2.75), jnp.float32(2.75))
        return out

    import numpy as np

    def run_pass():
        """One full pass; the clock stops at a REAL scalar fetch that
        depends on every chunk's outputs. block_until_ready on the last
        program is NOT a completion barrier on this backend -- it was
        measured returning after 7 ms while earlier chunks still had
        ~200 ms of execution in flight, which inflated rounds 1-2 of this
        metric 35-70x (6,900-12,768 "f/s"); see BASELINE.md round-3."""
        t0 = time.perf_counter()
        outs = [run_chunk(i) for i in range(n_chunks)]
        total = sum(o[1] + o[2] for o in outs)
        float(np.asarray(total))
        return time.perf_counter() - t0

    # Warm-up / compile
    run_pass()

    # Best of several passes: the remote-device tunnel injects occasional
    # ~0.5-1s stalls (BASELINE.md) that would otherwise poison a single
    # measurement by 2-3x.
    elapsed = float("inf")
    t_phase = time.perf_counter()
    for i in range(10):
        elapsed = min(elapsed, run_pass())
        # bad-band guard: always >=1 timed pass, then respect the budget
        if _over_budget(t_phase, 240.0):
            break

    frames_per_sec = n_frames / elapsed
    target = 10.0  # 100 x 16MP in <10s (BASELINE.md)
    print(json.dumps({
        "metric": "16MP frames/sec stacked (calibrate+match+sigma-clip)",
        "value": round(frames_per_sec, 3),
        "unit": "frames/sec",
        "vs_baseline": round(frames_per_sec / target, 3),
        **band0,
    }), flush=True)

    bench_e2e(band=measure_band())
    bench_rgb()
    bench_bayer()
    bench_narrowband()
    bench_northstar()  # LAST: the driver records the final line


if __name__ == "__main__":
    main()
