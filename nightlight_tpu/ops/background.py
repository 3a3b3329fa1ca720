"""Automated background extraction (ABE).

Rebuild of the reference's piecewise-bilinear background model
(reference: internal/ops/pre/background.go): the image is divided into a
grid of ~gridSpacing cells; each cell's background level is a star-masked
trimmed median (median -> MAD -> clip at median + sigma*1.4826*MAD ->
re-median, background.go:464-491); optionally the k brightest cells are
clipped to NaN and repaired by iterative neighbor-median interpolation
(background.go:175-201); the cell grid is smoothed with a renormalizing
3x3 gaussian (background.go:203-239); and the model is rendered/subtracted
with the reference's half-cell-offset piecewise bilinear mapping
(background.go:309-461).

Per-cell statistics run on device via a vmapped fixed-size gather (cells
padded to the max cell size with masks); grid-level fixups run on the host
(the grid is tiny); render/subtract is one fused device pass.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_GAUSS3X3_WEIGHTS = np.array([0.468592, 0.107973, 0.024879], np.float32)  # sigma 0.5


class Background:
    """Fitted background model (background.go:30-45).

    `_fitted_cells` (internal): a host (cells_y, cells_x) float32 array of
    already-fitted raw cell levels, skipping the device fit + sync — used by
    the fused batch executor, which fits every frame's cells with the SAME
    per-frame device program and fetches them in one packed transfer
    (fit_background_batch), so both paths stay bit-identical."""

    def __init__(self, img: jax.Array, grid_spacing: int, sigma: float,
                 back_clip: int, stars, hfr_factor: float,
                 _fitted_cells: np.ndarray | None = None):
        h, w = img.shape
        self.width, self.height = w, h
        self.grid_spacing = int(grid_spacing)
        self.cells_x = int((w + grid_spacing // 2) // grid_spacing)
        self.cells_y = int((h + grid_spacing // 2) // grid_spacing)
        self.spacing_x = w / self.cells_x
        self.spacing_y = h / self.cells_y
        self.outlier_cells = 0

        if _fitted_cells is None:
            star_mask = _star_mask(h, w, stars, hfr_factor)
            cells = _fit_cells(img, star_mask, self.cells_x, self.cells_y,
                               self.spacing_x, self.spacing_y, float(sigma))
            cells = np.asarray(cells, np.float32).reshape(self.cells_y, self.cells_x)
        else:
            cells = np.asarray(_fitted_cells, np.float32).reshape(
                self.cells_y, self.cells_x)

        if back_clip > 0:
            cells, self.outlier_cells = _clip_cells(cells, int(back_clip))
        cells = _gauss3x3(cells)
        self.cells = cells
        self.min = float(np.min(cells))
        self.max = float(np.max(cells))

    def __str__(self) -> str:
        """Log format of background.go:47-51."""
        return (f"Background grid {self.grid_spacing} cells {self.cells_x}x{self.cells_y}"
                f" outliers {self.outlier_cells} range [{self.min:f}...{self.max:f}]")

    def render(self) -> jax.Array:
        """Materialize the background image (background.go:309-383)."""
        return _render(jnp.asarray(self.cells), self.height, self.width,
                       self.spacing_x, self.spacing_y)

    def subtract(self, img: jax.Array) -> jax.Array:
        """img - rendered background, fused (background.go:386-461)."""
        return img - self.render()


def _star_mask(h: int, w: int, stars, hfr_factor: float) -> np.ndarray:
    """Boolean mask of pixels within hfr*factor of a detected star
    (equivalent to the per-cell star exclusion of background.go:494-515)."""
    mask = np.zeros((h, w), bool)
    if stars is None or len(stars) == 0:
        return mask
    for s in stars:
        r = s.hfr * hfr_factor
        ri = int(math.ceil(r))
        if ri <= 0:
            continue
        cx, cy = s.x, s.y
        y0, y1 = max(0, int(cy) - ri), min(h, int(cy) + ri + 1)
        x0, x1 = max(0, int(cx) - ri), min(w, int(cx) + ri + 1)
        if y0 >= y1 or x0 >= x1:
            continue
        yy, xx = np.mgrid[y0:y1, x0:x1]
        mask[y0:y1, x0:x1] |= (xx - cx) ** 2 + (yy - cy) ** 2 <= r * r
    return mask


def _unpack_mask_device(packed, h: int, w: int):
    """(ceil(h*w/8),) uint8 -> (h, w) bool, matching np.packbits' MSB-first
    bit order. The star mask uploads at 1 bit/pixel instead of 1 byte
    (16.8 MB -> 2.1 MB per 16MP frame on a wire-bound tunnel)."""
    shifts = (7 - jnp.arange(8, dtype=jnp.uint8))[None, :]
    bits = (packed[:, None] >> shifts) & jnp.uint8(1)
    return bits.reshape(-1)[: h * w].reshape(h, w).astype(bool)


@partial(jax.jit, static_argnames=("cells_x", "cells_y", "max_ch", "max_cw"))
def _fit_cells_device(img, star_mask_packed, cells_x: int, cells_y: int,
                      y_slice, x_slice, y_starts, x_starts, y_ends, x_ends,
                      sigma: float, max_ch: int, max_cw: int):
    big = jnp.float32(3.4e38)
    star_mask = _unpack_mask_device(star_mask_packed, *img.shape)

    def fit_one(ysl, xsl, ys, xs, ye, xe):
        patch = jax.lax.dynamic_slice(img, (ysl, xsl), (max_ch, max_cw))
        smask = jax.lax.dynamic_slice(star_mask, (ysl, xsl), (max_ch, max_cw))
        yy = ysl + jnp.arange(max_ch)[:, None]
        xx = xsl + jnp.arange(max_cw)[None, :]
        valid = (yy >= ys) & (yy < ye) & (xx >= xs) & (xx < xe) & ~smask

        vals = jnp.where(valid, patch, big).reshape(-1)
        cnt = jnp.sum(valid)
        s = jnp.sort(vals)

        def masked_median(sorted_vals, c):
            c1 = jnp.maximum(c, 1)
            up = sorted_vals[jnp.clip(c1 // 2, 0, sorted_vals.shape[0] - 1)]
            lo = sorted_vals[jnp.clip(jnp.maximum(c1 // 2 - 1, 0), 0, sorted_vals.shape[0] - 1)]
            return jnp.where(c1 % 2 == 1, up, 0.5 * (lo + up))

        med = masked_median(s, cnt)
        absdev = jnp.where(valid.reshape(-1), jnp.abs(vals - med), big)
        mad = masked_median(jnp.sort(absdev), cnt)
        std = mad * 1.4826
        upper = med + sigma * std
        keep = valid.reshape(-1) & (vals < upper)
        cnt2 = jnp.sum(keep)
        vals2 = jnp.where(keep, vals, big)
        return masked_median(jnp.sort(vals2), cnt2)

    return jax.vmap(fit_one)(y_slice, x_slice, y_starts, x_starts, y_ends, x_ends)


def _fit_cells(img, star_mask, cells_x, cells_y, spacing_x, spacing_y, sigma):
    """Dispatch the per-frame cell fit; star_mask is a HOST bool (h, w)
    array, uploaded bit-packed. Returns the (cells,) device array WITHOUT
    syncing (callers fetch — Background immediately, the fused batch
    executor in one packed transfer for all frames)."""
    ys, xs, ye, xe = [], [], [], []
    h, w = img.shape
    max_ch = max_cw = 0
    for cy in range(cells_y):
        y_start = int(cy * spacing_y + 0.5)
        y_end = min(int((cy + 1) * spacing_y + 0.5), h)
        for cx in range(cells_x):
            x_start = int(cx * spacing_x + 0.5)
            x_end = min(int((cx + 1) * spacing_x + 0.5), w)
            ys.append(y_start)
            xs.append(x_start)
            ye.append(y_end)
            xe.append(x_end)
            max_ch = max(max_ch, y_end - y_start)
            max_cw = max(max_cw, x_end - x_start)
    # clamp slice origins so the fixed-size slices stay in bounds; validity
    # masks still use the true cell bounds
    ys_np = np.array(ys, np.int32)
    xs_np = np.array(xs, np.int32)
    ys_c = np.minimum(ys_np, h - max_ch)
    xs_c = np.minimum(xs_np, w - max_cw)
    packed_mask = np.packbits(np.asarray(star_mask, bool).reshape(-1))
    return _fit_cells_device(
        img, jnp.asarray(packed_mask), cells_x, cells_y,
        jnp.asarray(ys_c), jnp.asarray(xs_c),
        jnp.asarray(ys_np), jnp.asarray(xs_np),
        jnp.asarray(np.array(ye, np.int32)), jnp.asarray(np.array(xe, np.int32)),
        float(sigma), max_ch, max_cw,
    )


def _clip_cells(cells: np.ndarray, n: int):
    """NaN out the n brightest cells, then repair by iterative neighbor-median
    interpolation with decreasing neighbor requirements (background.go:175-201).
    """
    flat = cells.reshape(-1)
    k = len(flat) - n
    threshold = np.sort(flat)[max(k, 0)]  # (len-n+1)-th lowest (1-based)
    out = cells.copy()
    ignored = int((flat >= threshold).sum())
    out[out >= threshold] = np.nan

    h, w = out.shape
    for neighbors in range(8, -1, -1):
        changed = 1
        while changed > 0:
            changed = 0
            for y in range(h):
                for x in range(w):
                    if not np.isnan(out[y, x]):
                        continue
                    vals = []
                    for dy in (-1, 0, 1):
                        for dx in (-1, 0, 1):
                            if dy == 0 and dx == 0:
                                continue
                            y2, x2 = y + dy, x + dx
                            if 0 <= y2 < h and 0 <= x2 < w and not np.isnan(out[y2, x2]):
                                vals.append(out[y2, x2])
                    if len(vals) >= neighbors and len(vals) > 0:
                        out[y, x] = float(np.median(vals))
                        changed += 1
    return out, ignored


def _gauss3x3(cells: np.ndarray) -> np.ndarray:
    """3x3 gaussian (sigma 0.5) with boundary renormalization
    (background.go:209-239)."""
    h, w = cells.shape
    out = np.empty_like(cells)
    for y in range(h):
        for x in range(w):
            acc = 0.0
            wsum = 0.0
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    y2, x2 = y + dy, x + dx
                    if 0 <= y2 < h and 0 <= x2 < w:
                        wgt = _GAUSS3X3_WEIGHTS[dx * dx + dy * dy]
                        acc += cells[y2, x2] * wgt
                        wsum += wgt
            out[y, x] = acc / wsum
    return out


def _axis_mapping(length: int, cells: int, spacing: float):
    """Per-pixel (cell_low, fraction) for the reference's piecewise bilinear
    mapping with half-cell offset (background.go:312-344)."""
    # boundaries[s] = first dest pixel belonging to src interval starting at s
    bounds = [int(-0.5 * spacing - 0.5), int(0.5 * spacing + 0.5)]
    s = 0
    while bounds[-1] < length:
        s += 1
        bounds.append(int((s + 0.5) * spacing + 0.5))
    bounds_np = np.array(bounds)
    dest = np.arange(length)
    seg = np.searchsorted(bounds_np, dest, side="right") - 1  # interval index
    src_l = seg - 1  # srcYl = interval-1
    dlo = bounds_np[seg]
    dhi = bounds_np[np.minimum(seg + 1, len(bounds_np) - 1)]
    span = 1.0 / np.maximum(dhi - dlo, 1)
    src = src_l + (dest - dlo) * span
    # clamp for bilinear with linear extrapolation at the edges
    cell_lo = np.clip(src_l, 0, cells - 2)
    frac = (src - cell_lo).astype(np.float32)
    return cell_lo.astype(np.int32), frac


@partial(jax.jit, static_argnames=("height", "width"))
def _render_device(cells: jax.Array, ylo, yfrac, xlo, xfrac, height: int, width: int):
    c00 = cells[ylo[:, None], xlo[None, :]]
    c01 = cells[ylo[:, None], xlo[None, :] + 1]
    c10 = cells[ylo[:, None] + 1, xlo[None, :]]
    c11 = cells[ylo[:, None] + 1, xlo[None, :] + 1]
    fx = xfrac[None, :]
    fy = yfrac[:, None]
    vyl = c00 * (1 - fx) + c01 * fx
    vyh = c10 * (1 - fx) + c11 * fx
    return vyl * (1 - fy) + vyh * fy


def _render(cells: jax.Array, height: int, width: int, spacing_x: float, spacing_y: float):
    cy, cx = cells.shape
    ylo, yfrac = _axis_mapping(height, cy, spacing_y)
    xlo, xfrac = _axis_mapping(width, cx, spacing_x)
    return _render_device(cells, jnp.asarray(ylo), jnp.asarray(yfrac),
                          jnp.asarray(xlo), jnp.asarray(xfrac), height, width)


def fit_background_batch(datas, stars_list, grid_spacing: int, sigma: float,
                         back_clip: int, hfr_factor: float) -> list:
    """Backgrounds for a whole frame batch with ONE device sync.

    Dispatches the SAME per-frame cell-fit program Background.__init__ uses
    (async, launches are free — BASELINE.md), fetches every frame's raw
    cells in one packed transfer, and finishes each frame's host-side grid
    fixups (outlier clip + gauss) through the normal constructor — so the
    fused batch executor's results are bit-identical to the per-frame
    OpBackExtract path, per frame. Returns a list of Background objects.
    """
    fits = []
    for img, stars in zip(datas, stars_list):
        h, w = img.shape
        cells_x = int((w + grid_spacing // 2) // grid_spacing)
        cells_y = int((h + grid_spacing // 2) // grid_spacing)
        mask = _star_mask(h, w, stars, hfr_factor)
        fits.append(_fit_cells(img, mask, cells_x, cells_y,
                               w / cells_x, h / cells_y, float(sigma)).reshape(-1))
    packed = np.asarray(jnp.concatenate(fits))  # the ONE batch sync
    bgs = []
    off = 0
    for img, stars, fit in zip(datas, stars_list, fits):
        n = fit.shape[0]
        bgs.append(Background(img, grid_spacing, sigma, back_clip, stars,
                              hfr_factor, _fitted_cells=packed[off:off + n]))
        off += n
    return bgs
