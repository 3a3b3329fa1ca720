"""RGB channel combination and automatic color balance
(reference: internal/fits/rgb.go)."""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class RGB:
    """Float RGB triple (rgb.go:28-38)."""

    r: float = 1.0
    g: float = 1.0
    b: float = 1.0

    def __str__(self) -> str:
        return f"RGB({self.r * 100:.2f}%, {self.g * 100:.2f}%, {self.b * 100:.2f}%)"


def common_normalization_factors(mins: list[float], maxs: list[float]):
    """Common [0,1] normalization across channels (rgb.go:65-78)."""
    vmin = min(mins)
    vmax = max(maxs)
    return vmin, 1.0 / (vmax - vmin)


@jax.jit
def combine_channels(channels: jax.Array, vmin: float, mult: float) -> jax.Array:
    """Stack 3 mono planes into a (3,H,W) cube with common normalization
    (rgb.go:43-62). channels: (3, H, W) raw planes."""
    return (channels - vmin) * mult


@partial(jax.jit, static_argnames=("block", "border"))
def find_darkest_block(cube: jax.Array, block: int, border: float) -> jax.Array:
    """Mean color of the darkest block x block region inside the border
    (rgb.go:153-219). Returns an RGB 3-vector."""
    _, h, w = cube.shape
    x_first = (int(w * border) // block) * block
    x_last = ((w - x_first) // block) * block
    y_first = (int(h * border) // block) * block
    y_last = ((h - y_first) // block) * block

    nby = max((y_last - y_first) // block, 1)
    nbx = max((x_last - x_first) // block, 1)
    region = cube[:, y_first : y_first + nby * block, x_first : x_first + nbx * block]
    blocks = region.reshape(3, nby, block, nbx, block).mean(axis=(2, 4))  # (3, nby, nbx)
    lum = blocks.mean(axis=0)
    idx = jnp.argmin(lum)
    return blocks.reshape(3, -1)[:, idx]


def mean_star_intensity(cube: np.ndarray, stars, skip_bright: float, skip_dim: float,
                        clip: tuple[float, float, float]) -> tuple[float, float, float]:
    """Mean color of star disks (0.75*HFR), skipping the brightest/dimmest
    star fractions and clip-avoidant pixels (rgb.go:223-281). Host-side: the
    star count is small and disks are tiny."""
    if stars is None or len(stars) == 0:
        return (0.0, 0.0, 0.0)
    n = len(stars)
    s_start = int(n * skip_bright)
    s_end = n - int(n * skip_dim)
    if s_start >= s_end:
        return (0.0, 0.0, 0.0)

    _, h, w = cube.shape
    total = np.zeros(3, np.float64)
    total_pixels = 0
    for i in range(s_start, s_end):
        s = stars[i]
        sx, sy = int(s.x), int(s.y)
        hfr = s.hfr * 0.75
        hfr_r = int(hfr + 0.5)
        hfr_sq = (hfr + 0.01) ** 2
        y0, y1 = max(0, sy - hfr_r), min(h, sy + hfr_r + 1)
        x0, x1 = max(0, sx - hfr_r), min(w, sx + hfr_r + 1)
        if y0 >= y1 or x0 >= x1:
            continue
        yy, xx = np.mgrid[y0:y1, x0:x1]
        disk = (xx - sx) ** 2 + (yy - sy) ** 2 <= hfr_sq
        r = cube[0, y0:y1, x0:x1]
        g = cube[1, y0:y1, x0:x1]
        b = cube[2, y0:y1, x0:x1]
        ok = disk & (r < clip[0]) & (g < clip[1]) & (b < clip[2])
        total[0] += r[ok].sum()
        total[1] += g[ok].sum()
        total[2] += b[ok].sum()
        total_pixels += int(ok.sum())
    if total_pixels == 0:
        return (0.0, 0.0, 0.0)
    return tuple(float(v) / total_pixels for v in total)


def mean_star_intensity_device(cube, stars, skip_bright: float, skip_dim: float,
                               clip):
    """Device-side mean star color (rgb.go:223-281): per-star patch gathers
    at a shared static radius with per-star disk/window masks, instead of
    fetching the whole cube to the host (201 MB at 3x16MP). `clip` may be
    device scalars. Returns a (3,) device vector, or None when no stars are
    in range (caller falls back to zeros).

    Matches the host path exactly: only pixels inside BOTH the per-star
    integer window [c-hfr_r, c+hfr_r] and the 0.75*HFR disk count, clipped
    pixels excluded, frame-edge pixels masked."""
    import jax.numpy as jnp

    from nightlight_tpu.detect.stars import _patches

    if stars is None or len(stars) == 0:
        return None
    n = len(stars)
    s_start = int(n * skip_bright)
    s_end = n - int(n * skip_dim)
    if s_start >= s_end:
        return None
    xs = np.asarray(stars.x)[s_start:s_end]
    ys = np.asarray(stars.y)[s_start:s_end]
    hfr = np.asarray(stars.hfr)[s_start:s_end] * 0.75
    hfr_r = (hfr + 0.5).astype(np.int32)
    hfr_sq = (hfr + 0.01) ** 2
    rmax = 4
    while rmax < int(hfr_r.max(initial=1)):
        rmax *= 2
    # bucket the star count so the gather compiles once per session
    s = len(xs)
    sb = max(64, 1 << (s - 1).bit_length())
    pad = sb - s

    def pad1(a, fill=0):
        return np.concatenate([a, np.full(pad, fill, a.dtype)]) if pad else a

    cy = jnp.asarray(pad1(ys.astype(np.int32)))
    cx = jnp.asarray(pad1(xs.astype(np.int32)))
    hr = jnp.asarray(pad1(hfr_r))
    hsq = jnp.asarray(pad1(hfr_sq.astype(np.float32)))
    real = jnp.arange(sb) < s

    offs = jnp.arange(2 * rmax + 1) - rmax
    dy = offs[None, :, None]
    dx = offs[None, None, :]
    # int offsets from the star center (host uses integer pixel coords)
    window = (jnp.abs(dy) <= hr[:, None, None]) & (jnp.abs(dx) <= hr[:, None, None])
    disk = (dx.astype(jnp.float32) ** 2 + dy.astype(jnp.float32) ** 2) \
        <= hsq[:, None, None]
    sel = window & disk & real[:, None, None]

    chans = []
    oks = None
    for ch in range(3):
        p, ok = _patches(cube[ch], cy, cx, rmax)
        chans.append(p)
        oks = ok if oks is None else (oks & ok)
    r, g, b = chans
    keep = sel & oks & (r < clip[0]) & (g < clip[1]) & (b < clip[2])
    cnt = jnp.sum(keep)
    sums = jnp.stack([jnp.sum(jnp.where(keep, chn, 0.0)) for chn in chans])
    return jnp.where(cnt > 0, sums / jnp.maximum(cnt, 1), 0.0)


def black_white_correction(cur_shadows, cur_highlights, target_shadows: RGB,
                           target_highlights: RGB):
    """Multiplicative/additive per-channel correction keeping brightness but
    adjusting tint (rgb.go:125-148). Returns (alpha (3,), beta (3,))."""
    cs = np.asarray(cur_shadows, np.float64)
    ch = np.asarray(cur_highlights, np.float64)
    new_shadow = cs.mean()
    ns = np.array([target_shadows.r, target_shadows.g, target_shadows.b]) * new_shadow
    new_highlight = ch.mean()
    nh = np.array([target_highlights.r, target_highlights.g, target_highlights.b]) * new_highlight
    alpha = (nh - ns) / (ch - cs)
    beta = ns - alpha * cs
    return alpha.astype(np.float32), beta.astype(np.float32)
