"""Point operations and curves, as pure jitted functions.

Functional rebuild of the reference's pixel-function engine and curve ops
(reference: internal/fits/pixelops.go:117-744). The reference parallelizes
in-place loops over CPU threads; here each op is a pure array->array function
that XLA fuses into neighboring work on the VPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@jax.jit
def scale_offset(data: jax.Array, scale: float, offset: float) -> jax.Array:
    """x*scale + offset (pixelops.go:123-128)."""
    return data * scale + offset


@jax.jit
def gamma(data: jax.Array, g: float) -> jax.Array:
    """x**(1/g); data must be normalized to [0,1] (pixelops.go:151-157)."""
    return jnp.power(data, 1.0 / g)


@jax.jit
def partial_gamma(data: jax.Array, from_: float, to: float, g: float) -> jax.Array:
    """Gamma boost restricted to values in (from, to) (pixelops.go:179-191)."""
    rescale2 = to - from_
    rescale1 = 1.0 / rescale2
    dd = (data - from_) * rescale1
    boosted = from_ + jnp.power(jnp.maximum(dd, 0.0), 1.0 / g) * rescale2
    inside = jnp.logical_and(data > from_, data < to)
    return jnp.where(inside, boosted, data)


@jax.jit
def midtones(data: jax.Array, mid: float, black: float) -> jax.Array:
    """Midtones transfer function with black clip (pixelops.go:214-229)."""
    clip_low = black * (mid - 1.0) / ((2.0 * mid - 1.0) * black - mid)
    clip_high = 1.0
    scaler = 1.0 / (clip_high - clip_low)
    # The reference maps out-of-range values to the constants 0 / 1 *before*
    # the (v - clipLow)*scaler rescale (pixelops.go:219-226); reproduce that.
    raw = data * (mid - 1.0) / ((2.0 * mid - 1.0) * data - mid)
    v = jnp.where(raw < clip_low, 0.0, jnp.where(raw > clip_high, 1.0, raw))
    return (v - clip_low) * scaler


@jax.jit
def shift_black_to_move(data: jax.Array, before: float, after: float) -> jax.Array:
    """Move black point so `before` maps to `after` (pixelops.go:649-660)."""
    black = (after - before) / (after - 1.0)
    scale = 1.0 / (1.0 - black)
    return jnp.maximum(0.0, (data - black) * scale)


@jax.jit
def normalize(data: jax.Array, vmin: float, vmax: float) -> jax.Array:
    """Normalize [min,max] to [0,1] (pixelops.go:143-147).

    Clamped to the contract range: Go rounds d*scale before adding the
    offset so the min pixel lands exactly on 0, but XLA may fuse
    d*scale-vmin*scale into an FMA whose unrounded product puts the min
    pixel a ulp below zero."""
    scale = 1.0 / (vmax - vmin)
    return jnp.clip(data * scale - vmin * scale, 0.0, 1.0)


@jax.jit
def match_location(data: jax.Array, location: float, ref_location: float) -> jax.Array:
    """Multiply so histogram peak matches reference (pixelops.go:588-597)."""
    return data * (ref_location / location)


@jax.jit
def match_histogram(data: jax.Array, location: float, scale: float,
                    ref_location: float, ref_scale: float) -> jax.Array:
    """Linear map matching location and scale of a reference
    (pixelops.go:601-611)."""
    multiplier = ref_scale / scale
    offset = ref_location - location * multiplier
    return data * multiplier + offset


@jax.jit
def scale_offset_clamp_rgb(data: jax.Array, alpha: jax.Array, beta: jax.Array) -> jax.Array:
    """Per-channel linear transform with [0,1] clamp on a (3,H,W) cube
    (pixelops.go:679-692). alpha/beta are (3,) vectors."""
    return jnp.clip(data * alpha[:, None, None] + beta[:, None, None], 0.0, 1.0)


@partial(jax.jit, static_argnames="num_bins")
def set_black_white(data: jax.Array, black_perc: float, white_perc: float,
                    num_bins: int = 65536):
    """Black/white point clip by histogram percentile (pixelops.go:695-744).

    Returns (new_data, blackX, whiteX, black_frac, white_frac).
    """
    flat = data.reshape(-1)
    n = flat.shape[0]
    vmin = jnp.min(flat)
    vmax = jnp.max(flat)
    scale = (num_bins - 1) / (vmax - vmin)
    idx = jnp.clip(((flat - vmin) * scale).astype(jnp.int32), 0, num_bins - 1)
    hist = jnp.zeros(num_bins, jnp.int32).at[idx].add(1)

    cum_lo = jnp.cumsum(hist)
    # black index: first i where cumulative count (exclusive of bin i) + h_i
    # exceeds the budget (pixelops.go:709-718)
    black_budget = jnp.int32(black_perc * 0.01 * n)
    exceeded_lo = cum_lo > black_budget
    black_index = jnp.argmax(exceeded_lo)
    black_pixels = jnp.where(black_index > 0, cum_lo[jnp.maximum(black_index - 1, 0)], 0)
    black_x = vmin + (black_index.astype(jnp.float32) + 0.5) * (vmax - vmin) / (num_bins - 1)

    white_budget = jnp.int32(white_perc * 0.01 * n)
    cum_hi = jnp.cumsum(hist[::-1])[::-1]  # count of pixels >= bin i
    exceeded_hi = cum_hi > white_budget
    # last i where count from the top exceeds budget
    white_index = num_bins - 1 - jnp.argmax(exceeded_hi[::-1])
    white_pixels = jnp.where(white_index < num_bins - 1, cum_hi[jnp.minimum(white_index + 1, num_bins - 1)], 0)
    white_x = vmin + (white_index.astype(jnp.float32) + 0.5) * (vmax - vmin) / (num_bins - 1)

    out = jnp.clip((data - black_x) / (white_x - black_x), 0.0, 1.0)
    return out, black_x, white_x, black_pixels / n, white_pixels / n


@partial(jax.jit, static_argnames=("gamma", "levels"))
def quantize_for_export(data: jax.Array, vmin, vmax, gamma: float, levels: float) -> jax.Array:
    """Device-side export quantization: v' = clip((v-min)*scale, 0, 1)
    [** (1/gamma)] scaled to uint8/uint16 (writejpg.go:43-133,
    tiff16.go:45-91). Quantizing on device before the device->host copy
    moves 4x (u8) / 2x (u16) fewer bytes over the slow readback path.
    gamma is static so gamma==1.0 skips the pow exactly, like the host
    path."""
    scale = 1.0 / (vmax - vmin)
    d = (data - vmin) * scale
    d = jnp.nan_to_num(d, nan=0.0)
    d = jnp.clip(d, 0.0, 1.0)
    if gamma != 1.0:
        d = d ** (1.0 / gamma)
    out = d * levels
    return out.astype(jnp.uint8 if levels <= 255.0 else jnp.uint16)
