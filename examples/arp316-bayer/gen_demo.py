"""Generate a synthetic one-shot-color (RGGB Bayer) demo dataset for the
Arp 316 walkthrough.

Full-color star fields with a pair of galaxy-like hazes are mosaiced
through an RGGB color filter array, so the debayer-per-channel stack +
RGB combine workflow in the sibling Makefile runs offline. PSFs follow
the detector's plausibility rules (fwhm ~8 px, peaks <= ~50x the noise
sigma)."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from nightlight_tpu.image import Image  # noqa: E402
from nightlight_tpu.io import fits as nlfits  # noqa: E402

H = W = 512
STARS = [(60, 80), (200, 150), (400, 300), (100, 400), (330, 90),
         (450, 450), (250, 320), (150, 250), (380, 180), (60, 350)]
N_SUBS = 6
# per-channel gains: warm stars, slightly blue-leaning galaxies
STAR_GAIN = {"R": 1.0, "G": 0.9, "B": 0.75}
HAZE_GAIN = {"R": 0.8, "G": 0.9, "B": 1.0}


def _mosaic_rggb(planes: dict) -> np.ndarray:
    """Sample full-color planes through an RGGB CFA."""
    m = np.empty((H, W), np.float32)
    m[0::2, 0::2] = planes["R"][0::2, 0::2]
    m[0::2, 1::2] = planes["G"][0::2, 1::2]
    m[1::2, 0::2] = planes["G"][1::2, 0::2]
    m[1::2, 1::2] = planes["B"][1::2, 1::2]
    return m


def gen(outdir: str) -> None:
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(316)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    s = 8.0 / 2.3548
    haze = (22.0 * np.exp(-(((xx - 230) / 60.0) ** 2 + ((yy - 260) / 40.0) ** 2))
            + 16.0 * np.exp(-(((xx - 330) / 45.0) ** 2 + ((yy - 180) / 55.0) ** 2)))
    for i in range(N_SUBS):
        dx, dy = 3.0 * i, -2.0 * i
        field = np.zeros((H, W), np.float32)
        for (sx, sy) in STARS:
            field += 5500.0 / (2 * np.pi * s * s) * np.exp(
                -(((xx - sx - dx) ** 2) + ((yy - sy - dy) ** 2)) / (2 * s * s))
        planes = {ch: (rng.normal(100.0, 2.0, size=(H, W)).astype(np.float32)
                       + STAR_GAIN[ch] * field + HAZE_GAIN[ch] * haze)
                  for ch in ("R", "G", "B")}
        im = Image.from_naxisn([W, H], _mosaic_rggb(planes))
        im.exposure = 180.0
        nlfits.write_file(im, os.path.join(outdir, f"light_{i:03d}.fits"))
    print(f"wrote {N_SUBS} RGGB subs to {outdir}/")


if __name__ == "__main__":
    gen(sys.argv[1] if len(sys.argv) > 1 else "demo_data")
