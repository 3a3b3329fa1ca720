"""Fused pre-stack calibration kernels.

TPU-native rebuild of the reference's per-frame preprocessing math:

* dark subtraction / flat division with degenerate-pixel passthrough
  (reference: internal/ops/pre/badpixels.go:107-123)
* full-image 3x3 median via the 9-element min/max sorting network
  (internal/median/median3x3.go:85-110, replacing the AVX2 kernel
  median3x3_amd64.s) -- pure elementwise min/max on shifted planes, which XLA
  fuses into one VPU pass
* bad-pixel map + sparse median repair (internal/ops/pre/badpixels.go:32-104)
* CFA-aware bayer cosmetic correction (internal/ops/pre/badpixels_bayer.go)
* bilinear debayer for one color channel (internal/ops/pre/debayer.go)

All functions are pure; the operator layer composes them so that
dark+flat+badpixel+debayer compile into a single fused XLA graph per frame.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@jax.jit
def subtract(a: jax.Array, b: jax.Array) -> jax.Array:
    """a - b (badpixels.go:107-111)."""
    return a - b


@jax.jit
def flat_divide(a: jax.Array, flat: jax.Array, flat_max: float) -> jax.Array:
    """a * flat_max / flat, passing through where the flat is degenerate
    (<= 0), as in badpixels.go:114-123."""
    return jnp.where(flat <= 0.0, a, a * flat_max / flat)


def _sort2(a, b):
    return jnp.minimum(a, b), jnp.maximum(a, b)


def median9(v: list[jax.Array]) -> jax.Array:
    """Median of 9 planes via the optimal 30-op sorting network
    (median3x3.go:85-110). Elementwise min/max -> perfect for the VPU."""
    a0, a1, a2, a3, a4, a5, a6, a7, a8 = v
    a0, a1 = _sort2(a0, a1)
    a3, a4 = _sort2(a3, a4)
    a6, a7 = _sort2(a6, a7)
    a1, a2 = _sort2(a1, a2)
    a4, a5 = _sort2(a4, a5)
    a7, a8 = _sort2(a7, a8)
    a0, a1 = _sort2(a0, a1)
    a3, a4 = _sort2(a3, a4)
    a6, a7 = _sort2(a6, a7)
    a3 = jnp.maximum(a0, a3)
    a6 = jnp.maximum(a3, a6)
    a1, a4 = _sort2(a1, a4)
    a4 = jnp.minimum(a4, a7)
    a4 = jnp.maximum(a1, a4)
    a5 = jnp.minimum(a5, a8)
    a2 = jnp.minimum(a2, a5)
    a2, a4 = _sort2(a2, a4)
    a4 = jnp.minimum(a4, a6)
    a4 = jnp.maximum(a2, a4)
    return a4


@jax.jit
def median_filter_3x3(img: jax.Array) -> jax.Array:
    """Full-image 3x3 median; outermost rows/columns pass through unchanged
    (median3x3.go:26-38)."""
    planes = [img[dy : img.shape[0] - 2 + dy, dx : img.shape[1] - 2 + dx]
              for dy in range(3) for dx in range(3)]
    med = median9(planes)
    out = img
    out = out.at[1:-1, 1:-1].set(med)
    return out


@jax.jit
def bad_pixel_stats(img: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Difference from the local 3x3 median and its stddev
    (badpixels.go:32-41). Returns (diff_image, stddev)."""
    med = median_filter_3x3(img)
    diff = img - med
    std = jnp.std(diff)
    return diff, std


@jax.jit
def bad_pixel_repair(img: jax.Array, sigma_low: float, sigma_high: float):
    """Detect and repair bad pixels.

    Pixels deviating from the 3x3 median by more than sigma*stddev of the
    median-difference map (badpixels.go:32-51) are replaced by the median of
    their radius-1.5 neighborhood, which for a 2D grid is exactly the 3x3
    neighborhood including the center (star.CreateMask(w, 1.5) ->
    median.GatherAndMedian, badpixels.go:81-87).

    Returns (repaired, num_bad, diff_stddev).
    """
    med = median_filter_3x3(img)
    diff = img - med
    std = jnp.std(diff)
    bad = jnp.logical_or(diff < -sigma_low * std, diff > sigma_high * std)
    repaired = jnp.where(bad, med, img)
    return repaired, jnp.sum(bad), std


# ---------------------------------------------------------------------------
# Debayer (bilinear, one channel), debayer.go:26-263
# ---------------------------------------------------------------------------

_CFA_OFFSETS = {"RGGB": (0, 0), "GRBG": (1, 0), "GBRG": (0, 1), "BGGR": (1, 1)}
_SQRT2 = 2.0**0.5


def cfa_offsets(cfa: str) -> tuple[int, int]:
    """CFA pattern -> (xOffset, yOffset) into the canonical RGGB tiling
    (debayer.go:26-38)."""
    try:
        return _CFA_OFFSETS[cfa.upper()]
    except KeyError:
        raise ValueError(f"Unknown CFA value {cfa}") from None


def debayer_bilinear(img: jax.Array, channel: str, cfa: str) -> jax.Array:
    """Bilinear debayer of one color channel at full resolution
    (debayer.go:41-60). Output is even-cropped like the reference."""
    xo, yo = cfa_offsets(cfa)
    ch = channel.upper()
    if ch == "R":
        return _debayer_red(img, xo, yo)
    if ch == "G":
        return _debayer_green(img, xo, yo)
    if ch == "B":
        return _debayer_blue(img, xo, yo)
    raise ValueError(f"Unknown debayering value {channel}")


def _adj_crop(img, xo, yo):
    h, w = img.shape
    adj_w = (w - xo) & ~1
    adj_h = (h - yo) & ~1
    return img[yo : yo + adj_h, xo : xo + adj_w], adj_h, adj_w


@partial(jax.jit, static_argnames=("xo", "yo"))
def _debayer_red(img: jax.Array, xo: int, yo: int) -> jax.Array:
    """Red channel (debayer.go:63-124). Neighbor availability follows the
    reference's SOURCE-coordinate tests, which differ from clamping on the
    cropped grid in two ways: (1) on an odd-width/-height image, the last
    output cell's right/down neighbor is the CROPPED-OFF sample — real,
    not clamped; (2) the nested conditionals make the diagonal neighbor
    fall back to r itself (not rRight or rDown) whenever the cell sits on
    the last available row OR column (debayer.go:85-99). Pinned against
    the transliterated loop in tests/test_go_oracles.py."""
    h, w = img.shape
    adj_w = (w - xo) & ~1
    adj_h = (h - yo) & ~1
    ah2, aw2 = adj_h // 2, adj_w // 2
    rall = img[yo::2, xo::2]  # ALL R-phase samples, incl. cropped-off ones
    fh, fw = rall.shape
    rpad = jnp.pad(rall, ((0, 1), (0, 1)), mode="edge")
    r = rall[:ah2, :aw2]
    has_r = (jnp.arange(aw2) + 1 < fw)[None, :]
    has_d = (jnp.arange(ah2) + 1 < fh)[:, None]
    r_right = jnp.where(has_r, rpad[:ah2, 1:aw2 + 1], r)
    r_down = jnp.where(has_d, rpad[1:ah2 + 1, :aw2], r)
    r_rd = jnp.where(has_r & has_d, rpad[1:ah2 + 1, 1:aw2 + 1], r)
    out = jnp.zeros((adj_h, adj_w), img.dtype)
    out = out.at[0::2, 0::2].set(r)
    out = out.at[0::2, 1::2].set(0.5 * (r + r_right))
    out = out.at[1::2, 0::2].set(0.5 * (r + r_down))
    out = out.at[1::2, 1::2].set(0.25 * (r + r_right + r_down + r_rd))
    return out


@partial(jax.jit, static_argnames=("xo", "yo"))
def _debayer_blue(img: jax.Array, xo: int, yo: int) -> jax.Array:
    """Blue channel (debayer.go:201-262): the up-left mirror of red,
    including the nested edge conditionals (bLU falls back to b itself on
    the first available row OR column) and real neighbors outside the
    even-crop for offset CFAs (e.g. BGGR's column 0)."""
    h, w = img.shape
    adj_w = (w - xo) & ~1
    adj_h = (h - yo) & ~1
    ah2, aw2 = adj_h // 2, adj_w // 2
    # ALL B-phase samples of the image; the output's b[0,0] sits at index
    # (i0, j0) inside it (nonzero for offset CFAs, where real up/left
    # neighbors exist outside the crop)
    ball = img[(yo + 1) % 2::2, (xo + 1) % 2::2]
    i0, j0 = (yo + 1) // 2, (xo + 1) // 2
    bpad = jnp.pad(ball, ((1, 0), (1, 0)), mode="edge")  # bpad[i+1,j+1]=ball[i,j]
    b = ball[i0:i0 + ah2, j0:j0 + aw2]
    has_l = (jnp.arange(aw2) + j0 >= 1)[None, :]
    has_u = (jnp.arange(ah2) + i0 >= 1)[:, None]
    b_left = jnp.where(has_l, bpad[1 + i0:1 + i0 + ah2, j0:j0 + aw2], b)
    b_up = jnp.where(has_u, bpad[i0:i0 + ah2, 1 + j0:1 + j0 + aw2], b)
    b_lu = jnp.where(has_l & has_u, bpad[i0:i0 + ah2, j0:j0 + aw2], b)
    out = jnp.zeros((adj_h, adj_w), img.dtype)
    out = out.at[0::2, 0::2].set(0.25 * (b + b_left + b_up + b_lu))
    out = out.at[0::2, 1::2].set(0.5 * (b + b_up))
    out = out.at[1::2, 0::2].set(0.5 * (b + b_left))
    out = out.at[1::2, 1::2].set(b)
    return out


@partial(jax.jit, static_argnames=("xo", "yo"))
def _debayer_green(img: jax.Array, xo: int, yo: int) -> jax.Array:
    """Green channel (debayer.go:128-199): G at the two diagonal positions
    of each 2x2 cell; missing corners interpolated from the 4 nearest
    greens, with the reference's sqrt2-weighted extrapolation ONLY where
    the source-coordinate neighbor truly does not exist — neighbors just
    outside the even-crop (odd sizes, offset CFAs) are real samples."""
    h, w = img.shape
    adj_w = (w - xo) & ~1
    adj_h = (h - yo) & ~1
    ah2, aw2 = adj_h // 2, adj_w // 2
    # g1: samples at (yo + 2i, xo+1 + 2j); g2: at (yo+1 + 2i, xo + 2j).
    # Full-image phase grids so out-of-crop neighbors resolve to real data.
    g1all = img[yo % 2::2, (xo + 1) % 2::2]
    g2all = img[(yo + 1) % 2::2, xo % 2::2]
    j0g1 = (xo + 1) // 2  # column of g1[.,0] inside g1all
    i0g2 = (yo + 1) // 2  # row of g2[0,.] inside g2all
    g1h = g1all.shape[0]
    g2w = g2all.shape[1]
    g1 = g1all[:ah2, j0g1:j0g1 + aw2]
    g2 = g2all[i0g2:i0g2 + ah2, :aw2]

    w_edge = 1.0 / (2.0 + _SQRT2)
    fb_lr = (2.0 * g1 + _SQRT2 * g2) * w_edge  # g1Left/g2Right fallback
    fb_ud = (_SQRT2 * g1 + 2.0 * g2) * w_edge  # g2Up/g1Down fallback

    g1pad = jnp.pad(g1all, ((0, 1), (1, 0)), mode="edge")  # left+bottom
    g2pad = jnp.pad(g2all, ((1, 0), (0, 1)), mode="edge")  # top+right
    has_left = (jnp.arange(aw2) + j0g1 >= 1)[None, :]
    has_up = (jnp.arange(ah2) + i0g2 >= 1)[:, None]
    has_right = (jnp.arange(aw2) + 1 < g2w)[None, :]
    has_down = (jnp.arange(ah2) + 1 < g1h)[:, None]

    g1_left = jnp.where(has_left, g1pad[:ah2, j0g1:j0g1 + aw2], fb_lr)
    g2_up = jnp.where(has_up, g2pad[i0g2:i0g2 + ah2, :aw2], fb_ud)
    g2_right = jnp.where(has_right,
                         g2pad[1 + i0g2:1 + i0g2 + ah2, 1:aw2 + 1], fb_lr)
    g1_down = jnp.where(has_down,
                        g1pad[1:ah2 + 1, 1 + j0g1:1 + j0g1 + aw2], fb_ud)

    out = jnp.zeros((adj_h, adj_w), img.dtype)
    out = out.at[0::2, 0::2].set(0.25 * (g1 + g2 + g1_left + g2_up))
    out = out.at[0::2, 1::2].set(g1)
    out = out.at[1::2, 0::2].set(g2)
    out = out.at[1::2, 1::2].set(0.25 * (g1 + g2 + g2_right + g1_down))
    return out


# ---------------------------------------------------------------------------
# Bayer cosmetic correction (badpixels_bayer.go)
# ---------------------------------------------------------------------------


# 25-comparator sorting network for 9 inputs (verified against all 2^9
# 0-1 vectors in tests/test_prestack.py). Kept as compare-exchanges over
# SEPARATE (H,W) planes: jnp.sort over a stacked (9,H,W) axis materializes
# the stack PLUS a same-shape iota, and the 9-axis pads to 16 sublanes —
# 2x12 GB of HLO temps at 12x16MP (the round-4 bayer-bench OOM). The
# pairwise min/max chain fuses into one loop pass with no stacked temp.
_SORT9_NET = [(0, 1), (3, 4), (6, 7),
              (1, 2), (4, 5), (7, 8),
              (0, 1), (3, 4), (6, 7),
              (0, 3), (3, 6), (0, 3),
              (1, 4), (4, 7), (1, 4),
              (2, 5), (5, 8), (2, 5),
              (1, 3), (5, 7),
              (2, 6), (4, 6), (2, 4),
              (2, 3), (5, 6)]


def _masked_median9(stacks: list[jax.Array], valids: list[jax.Array]) -> jax.Array:
    """Elementwise median of 9 planes counting only `valids` entries.

    Invalid entries are pushed to +inf before the network sort; the median
    index is (count-1)//2 ... matching median.MedianFloat32 ->
    QSelectMedianFloat32 semantics (average of middles for even counts).
    Rank selection is a 9-way where-chain (elementwise, fusible) instead of
    a take_along_axis gather."""
    big = jnp.float32(3.4e38)
    v = [jnp.where(m, s, big) for s, m in zip(stacks, valids)]
    for i, j in _SORT9_NET:
        v[i], v[j] = _sort2(v[i], v[j])
    cnt = valids[0].astype(jnp.int32)
    for m in valids[1:]:
        cnt = cnt + m.astype(jnp.int32)
    up_idx = jnp.clip(cnt // 2, 0, 8)
    lo_idx = jnp.clip(jnp.maximum(cnt // 2 - 1, 0), 0, 8)
    upper = v[0]
    lower = v[0]
    for k in range(1, 9):
        upper = jnp.where(up_idx == k, v[k], upper)
        lower = jnp.where(lo_idx == k, v[k], lower)
    return jnp.where(cnt % 2 == 1, upper, 0.5 * (lower + upper))


def _shifted(img: jax.Array, dy: int, dx: int):
    """img shifted by (dy,dx) with a validity mask for out-of-frame reads."""
    h, w = img.shape
    shifted = jnp.roll(img, (-dy, -dx), axis=(0, 1))
    yy = jnp.arange(h)[:, None] + dy
    xx = jnp.arange(w)[None, :] + dx
    valid = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
    return shifted, valid


_G_OFFSETS = [(-2, 0), (-1, -1), (-1, 1), (0, -2), (0, 0), (0, 2), (1, -1), (1, 1), (2, 0)]
_RB_OFFSETS = [(dy, dx) for dy in (-2, 0, 2) for dx in (-2, 0, 2)]


@partial(jax.jit, static_argnames=("xo", "yo", "green"))
def _bayer_channel_correct(img: jax.Array, xo: int, yo: int, green: bool,
                           sigma_low: float, sigma_high: float):
    """Shared bayer cosmetic-correction core (badpixels_bayer.go:49-61).

    Computes the same-color neighborhood median at every pixel, the
    delta = data - median statistics over the selected channel positions,
    and replaces channel-position outliers with the median.
    """
    h, w = img.shape
    offsets = _G_OFFSETS if green else _RB_OFFSETS
    stacks, valids = [], []
    for dy, dx in offsets:
        s, v = _shifted(img, dy, dx)
        stacks.append(s)
        valids.append(v)
    med = _masked_median9(stacks, valids)

    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    if green:
        # Green positions: within the RGGB tiling anchored at (xo,yo), greens
        # sit where (x-xo+y-yo) is odd (badpixels_bayer.go:151-155).
        chan = ((yy - yo) + (xx - xo)) % 2 == 1
        chan = chan & (yy >= yo) & (xx >= xo)
    else:
        chan = ((yy - yo) % 2 == 0) & ((xx - xo) % 2 == 0) & (yy >= yo) & (xx >= xo)

    delta = img - med
    cnt = jnp.maximum(jnp.sum(chan), 1)
    mean = jnp.sum(jnp.where(chan, delta, 0.0)) / cnt
    var = jnp.sum(jnp.where(chan, (delta - mean) ** 2, 0.0)) / cnt
    std = jnp.sqrt(var)

    outlier = chan & ((delta < -sigma_low * std) | (delta > sigma_high * std))
    out = jnp.where(outlier, med, img)
    return out, jnp.sum(outlier)


def cosmetic_correction_bayer(img: jax.Array, channel: str, cfa: str,
                              sigma_low: float, sigma_high: float):
    """CFA-aware cosmetic correction (badpixels_bayer.go:26-46).

    Returns (corrected_image, num_removed).
    """
    xo, yo = cfa_offsets(cfa)
    ch = channel.upper()
    if ch == "R":
        return _bayer_channel_correct(img, xo + 0, yo + 0, False, sigma_low, sigma_high)
    if ch == "G":
        return _bayer_channel_correct(img, xo, yo, True, sigma_low, sigma_high)
    if ch == "B":
        return _bayer_channel_correct(img, xo + 1, yo + 1, False, sigma_low, sigma_high)
    raise ValueError(f"Unknown debayering value {channel}")
