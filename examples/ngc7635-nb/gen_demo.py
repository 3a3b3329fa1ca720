"""Generate a synthetic 3-channel SHO demo dataset for the NGC 7635
narrowband walkthrough.

Per-channel shifted star-field subexposures with an emission shell (a
ring-shaped nebula, brightest in Ha as the real Bubble is) so the
folders/stack/Hubble-palette workflow in the sibling Makefile runs
offline. PSFs follow the detector's plausibility rules (fwhm ~8 px,
peaks <= ~50x the noise sigma)."""

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
# emission-line gains: Ha dominates, O3 traces the shell, S2 is faint
CHANNEL_GAIN = {"Ha": 1.0, "O3": 0.6, "S2": 0.35}
SUBS_PER_CHANNEL = 4


def gen(outdir: str) -> None:
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(76)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    s = 8.0 / 2.3548
    # the bubble: a soft ring around (260, 240)
    r = np.sqrt((xx - 260.0) ** 2 + (yy - 240.0) ** 2)
    shell = 30.0 * np.exp(-(((r - 90.0) / 22.0) ** 2))
    for ch, gain in CHANNEL_GAIN.items():
        for i in range(SUBS_PER_CHANNEL):
            dx, dy = 3.0 * i, -2.0 * i
            img = rng.normal(100.0, 2.0, size=(H, W)).astype(np.float32)
            img += gain * shell
            for (sx, sy) in STARS:
                img += 5500.0 / (2 * np.pi * s * s) * np.exp(
                    -(((xx - sx - dx) ** 2) + ((yy - sy - dy) ** 2)) / (2 * s * s))
            im = Image.from_naxisn([W, H], img)
            im.exposure = 300.0
            nlfits.write_file(im, os.path.join(outdir, f"demo_{ch}_{i:03d}.fits"))
    print(f"wrote {len(CHANNEL_GAIN) * SUBS_PER_CHANNEL} subs to {outdir}/")


if __name__ == "__main__":
    gen(sys.argv[1] if len(sys.argv) > 1 else "demo_data")
