"""Generate synthetic 16MP BITPIX-16 light frames for end-to-end benchmarks.

Star fields follow the verify-skill plausibility rules (fwhm ~8px, peak
<= ~50x noise sigma so the bad-pixel rejector keeps the stars); frames drift
a few px per frame to exercise alignment. Written as BITPIX 16 with
BZERO/BSCALE like real camera files.

Usage: python scripts/gen_fixtures.py OUTDIR [N_FRAMES] [SIZE]
"""

from __future__ import annotations

import os
import sys

import numpy as np


def gen_channels(outdir: str, size: int = 4096, seed: int = 7,
                 channels: tuple = (("l", 1.0), ("r", 1.0), ("g", 0.8),
                                    ("b", 0.6))) -> list[str]:
    """Stacked-master channel frames for the `rgb`/LRGB pipeline benches
    (BASELINE configs #2/#4): one clean frame per channel of the SAME star
    field at channel-specific gains, written as chan_<name>.fits."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(seed)
    h = w = size
    n_stars = 40
    sx = rng.uniform(64, w - 64, n_stars).astype(np.float32)
    sy = rng.uniform(64, h - 64, n_stars).astype(np.float32)
    flux = rng.uniform(25000.0, 60000.0, n_stars).astype(np.float32)
    s = 8.0 / 2.3548
    patch_r = 24
    yy, xx = np.mgrid[-patch_r:patch_r + 1, -patch_r:patch_r + 1].astype(np.float32)
    names = []
    for name, gain in channels:
        acc = rng.integers(0, 1 << 16, size=(h, w), dtype=np.uint16).astype(np.float32)
        for _ in range(2):
            acc += rng.integers(0, 1 << 16, size=(h, w), dtype=np.uint16)
        img = (acc - 98302.5) * np.float32(4.0 * gain / 32768.0) \
            + np.float32(800.0 * gain)
        for j in range(n_stars):
            icx, icy = int(round(sx[j])), int(round(sy[j]))
            blob = gain * flux[j] / (2 * np.pi * s * s) * np.exp(
                -(((xx + icx - sx[j]) ** 2) + ((yy + icy - sy[j]) ** 2)) / (2 * s * s))
            img[icy - patch_r:icy + patch_r + 1, icx - patch_r:icx + patch_r + 1] += blob
        np.clip(img, 0, 65535, out=img)
        img += 0.5
        raw = img.astype(np.uint16)
        signed = (raw ^ np.uint16(0x8000)).byteswap().view(">i2")
        fn = os.path.join(outdir, f"chan_{name}.fits")
        _write_fits16(fn, signed, w, h)
        names.append(fn)
    return names


def gen(outdir: str, n_frames: int = 24, size: int = 4096, seed: int = 7,
        dither: float | None = None, bayer: str | None = None) -> list[str]:
    """dither: None = the default linear drift of (4, -3) px/frame (matches
    the e2e expectations); a float = random bounded dither in [-dither,
    +dither] px per frame, for long sequences where a linear drift would
    walk the star field out of the frame.

    bayer: a CFA pattern name ("RGGB", ...) mosaics each light with
    per-channel gains R=1.0 G=0.8 B=0.6 (one-shot-color camera files for
    the debayer+winsorized-stack bench, BASELINE config #3); the master
    dark stays mono."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from nightlight_tpu.image import FITS_BLOCK_SIZE

    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(seed)
    h = w = size
    n_stars = 40
    sx = rng.uniform(64, w - 64, n_stars).astype(np.float32)
    sy = rng.uniform(64, h - 64, n_stars).astype(np.float32)
    # Peak amplitude = flux / (2*pi*sigma^2) ~= flux/72 -> 17-40x the noise
    # sigma of 20: bright enough for the starSig=10 threshold, dim enough for
    # the bad-pixel rejector (verify-skill plausibility rules).
    flux = rng.uniform(25000.0, 60000.0, n_stars).astype(np.float32)
    s = 8.0 / 2.3548
    patch_r = 24
    yy, xx = np.mgrid[-patch_r:patch_r + 1, -patch_r:patch_r + 1].astype(np.float32)

    # Master dark: the bias/thermal level the lights sit on top of.
    dark = rng.normal(100.0, 3.0, size=(h, w)).astype(np.float32)
    dark_raw = (np.clip(np.round(dark), 0, 65535).astype(np.int32) - 32768).astype(">i2")
    _write_fits16(os.path.join(outdir, "dark.fits"), dark_raw, w, h)

    def _noise(loc: float, sigma: float) -> np.ndarray:
        """Approximately gaussian sky noise from the sum of 3 uniform u16
        draws (Irwin-Hall n=3): ~5x cheaper than Generator.normal on this
        1-core host, which dominated fixture generation at 100x16MP
        (2.5 s/frame). Symmetric, smooth, tails to +-3.46 sigma -- the
        star/noise plausibility ratios (fwhm~8, peak <=50x sigma) that the
        detector and bad-pixel rejector care about are unchanged."""
        acc = rng.integers(0, 1 << 16, size=(h, w), dtype=np.uint16).astype(np.float32)
        for _ in range(2):
            acc += rng.integers(0, 1 << 16, size=(h, w), dtype=np.uint16)
        # sum of 3 U(0, 65535): mean 3*32767.5, std 65536*sqrt(3/12)
        return (acc - 98302.5) * np.float32(sigma / 32768.0) + np.float32(loc)

    gain_map = None
    if bayer:
        # per-pixel channel gains following the CFA layout (2x2 tile)
        ch_gain = {"R": 1.0, "G": 0.8, "B": 0.6}
        tile = np.array([[ch_gain[bayer.upper()[0]], ch_gain[bayer.upper()[1]]],
                         [ch_gain[bayer.upper()[2]], ch_gain[bayer.upper()[3]]]],
                        np.float32)
        gain_map = np.tile(tile, (h // 2, w // 2))

    names = []
    for i in range(n_frames):
        img = dark + _noise(900.0, 20.0)
        if dither is None:
            dx, dy = 4.0 * i, -3.0 * i
        else:
            dx, dy = (0.0, 0.0) if i == 0 else tuple(rng.uniform(-dither, dither, 2))
        for j in range(n_stars):
            cx, cy = sx[j] + dx, sy[j] + dy
            icx, icy = int(round(cx)), int(round(cy))
            if not (patch_r <= icx < w - patch_r and patch_r <= icy < h - patch_r):
                continue
            blob = flux[j] / (2 * np.pi * s * s) * np.exp(
                -(((xx + icx - cx) ** 2) + ((yy + icy - cy) ** 2)) / (2 * s * s))
            img[icy - patch_r:icy + patch_r + 1, icx - patch_r:icx + patch_r + 1] += blob
        if gain_map is not None:
            # mosaic: the photon signal (above the dark floor) scales by the
            # pixel's CFA channel gain, like a one-shot-color sensor
            img = dark + (img - dark) * gain_map
        # Quantize to BITPIX 16 with BZERO 32768 (unsigned-style camera file).
        # floor(x+0.5) + xor-0x8000 sign fold: ~1/40 the cost of the
        # round+int32-subtract chain, which dominated fixture generation at
        # 100x16MP on this 1-core host (same integers except ties-at-.5,
        # where rint rounds half-to-even; irrelevant for synthetic noise).
        np.clip(img, 0, 65535, out=img)
        img += 0.5
        raw = img.astype(np.uint16)
        signed = (raw ^ np.uint16(0x8000)).byteswap().view(">i2")
        name = os.path.join(outdir, f"light{i:03d}.fits")
        _write_fits16(name, signed, w, h)
        names.append(name)
    return names


def _write_fits16(name: str, signed: np.ndarray, w: int, h: int) -> None:
    lines = [
        f"{'SIMPLE':<8}= {'T':>20} / {'':47}",
        f"{'BITPIX':<8}= {'16':>20} / {'':47}",
        f"{'NAXIS':<8}= {'2':>20} / {'':47}",
        f"{'NAXIS1':<8}= {w:>20} / {'':47}",
        f"{'NAXIS2':<8}= {h:>20} / {'':47}",
        f"{'BZERO':<8}= {'32768':>20} / {'':47}",
        f"{'BSCALE':<8}= {'1':>20} / {'':47}",
        f"{'EXPOSURE':<8}= {'120.':>20} / {'':47}",
        "END" + " " * 77,
    ]
    header = "".join(lines)
    header += " " * (2880 - len(header) % 2880)
    payload = signed.tobytes()
    pad = len(payload) % 2880
    with open(name, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(payload)
        if pad:
            f.write(b"\0" * (2880 - pad))


if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else "bench_frames"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    size = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
    names = gen(outdir, n, size)
    print(f"wrote {len(names)} {size}x{size} frames to {outdir}")
