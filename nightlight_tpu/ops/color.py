"""Color-space conversions and chroma/hue operators, as branch-free vector
math on (3, H, W) cubes.

Rebuild of the reference's per-pixel go-colorful calls
(reference: internal/fits/pixelops.go:244-578) as closed-form jnp math:

* linear RGB <-> CIE XYZ (sRGB primaries, D65 white)
* XYZ <-> CIE Luv / LCh(uv) <-> HSLuv, including the HSLuv max-chroma gamut
  function evaluated from the six RGB gamut boundary lines
* XYZ <-> CIE Lab / LCh(ab) ("HCL" in the reference, via go-colorful's Hcl)
* xyY
* the reference's color-preserving clamp for HSLuv->RGB
  (pixelops.go:417-428): if max(r,g,b) > 1, scale all three down
* chroma gamma, selective saturation, hue rotation, background
  neutralization, and SCNR pixel kernels (pixelops.go:441-578)

Conventions follow go-colorful so image data is interchangeable with the
reference: H in degrees [0,360), S/L/C normalized to [0,1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# sRGB D65 matrices and constants (as used by hsluv and go-colorful).
_M_XYZ_TO_RGB = jnp.array(
    [
        [3.2409699419045214, -1.5373831775700935, -0.49861076029300328],
        [-0.96924363628087983, 1.8759675015077207, 0.041555057407175613],
        [0.055630079696993609, -0.20397695888897657, 1.0569715142428786],
    ],
    jnp.float32,
)
_M_RGB_TO_XYZ = jnp.array(
    [
        [0.41239079926595948, 0.35758433938387796, 0.18048078840183429],
        [0.21263900587151036, 0.71516867876775593, 0.072192315360733715],
        [0.019330818715591851, 0.11919477979462599, 0.95053215224966058],
    ],
    jnp.float32,
)
# D65 reference white (reference pixelops.go:414 hSLuvD65)
_WHITE = jnp.array([0.95045592705167, 1.0, 1.089057750759878], jnp.float32)
_KAPPA = 903.2962962
_EPSILON = 0.0088564516
_REF_U = 0.19783000664283681
_REF_V = 0.468319994938791

_DEG = 180.0 / jnp.pi
_RAD = jnp.pi / 180.0


# ---------------------------------------------------------------------------
# XYZ <-> linear RGB
# ---------------------------------------------------------------------------


def _apply3x3(m: jax.Array, v: jax.Array) -> jax.Array:
    """3x3 color matrix as explicit f32 linear combinations. Deliberately NOT
    a matmul: einsum would route through the MXU at reduced (bf16) default
    precision and waste the systolic array on a 3-wide contraction; this form
    stays exact f32 on the VPU and fuses with neighbors."""
    return jnp.stack([
        m[0, 0] * v[0] + m[0, 1] * v[1] + m[0, 2] * v[2],
        m[1, 0] * v[0] + m[1, 1] * v[1] + m[1, 2] * v[2],
        m[2, 0] * v[0] + m[2, 1] * v[1] + m[2, 2] * v[2],
    ])


def linrgb_to_xyz(rgb: jax.Array) -> jax.Array:
    """(3, ...) linear RGB -> XYZ."""
    return _apply3x3(_M_RGB_TO_XYZ, rgb)


def xyz_to_linrgb(xyz: jax.Array) -> jax.Array:
    return _apply3x3(_M_XYZ_TO_RGB, xyz)


def srgb_compand(lin: jax.Array) -> jax.Array:
    """Linear -> sRGB companding (go-colorful delinearize)."""
    return jnp.where(lin <= 0.0031308, 12.92 * lin, 1.055 * jnp.power(jnp.maximum(lin, 0.0), 1 / 2.4) - 0.055)


def srgb_uncompand(s: jax.Array) -> jax.Array:
    return jnp.where(s <= 0.04045, s / 12.92, jnp.power(jnp.maximum((s + 0.055) / 1.055, 0.0), 2.4))


# ---------------------------------------------------------------------------
# Luv / HSLuv
# ---------------------------------------------------------------------------


def _y_to_l(y: jax.Array) -> jax.Array:
    """CIE Y (relative, [0,1]) -> L* in [0,100]."""
    return jnp.where(y <= _EPSILON, y * _KAPPA, 116.0 * jnp.cbrt(jnp.maximum(y, 0.0)) - 16.0)


def _l_to_y(l: jax.Array) -> jax.Array:
    return jnp.where(l <= 8.0, l / _KAPPA, ((l + 16.0) / 116.0) ** 3)


def xyz_to_luv(xyz: jax.Array) -> jax.Array:
    """XYZ -> (L, u, v) with L in [0,100]."""
    x, y, z = xyz[0], xyz[1], xyz[2]
    denom = x + 15.0 * y + 3.0 * z
    safe = jnp.where(denom == 0.0, 1.0, denom)
    up = jnp.where(denom == 0.0, 0.0, 4.0 * x / safe)
    vp = jnp.where(denom == 0.0, 0.0, 9.0 * y / safe)
    l = _y_to_l(y / _WHITE[1])
    u = 13.0 * l * (up - _REF_U)
    v = 13.0 * l * (vp - _REF_V)
    return jnp.stack([l, u, v])


def luv_to_xyz(luv: jax.Array) -> jax.Array:
    l, u, v = luv[0], luv[1], luv[2]
    safe_l = jnp.where(l == 0.0, 1.0, l)
    up = u / (13.0 * safe_l) + _REF_U
    vp = v / (13.0 * safe_l) + _REF_V
    y = _l_to_y(l) * _WHITE[1]
    safe_vp = jnp.where(vp == 0.0, 1.0, vp)
    x = y * 9.0 * up / (4.0 * safe_vp)
    z = y * (12.0 - 3.0 * up - 20.0 * vp) / (4.0 * safe_vp)
    zero = l == 0.0
    return jnp.stack([jnp.where(zero, 0.0, x), jnp.where(zero, 0.0, y), jnp.where(zero, 0.0, z)])


def _max_chroma_for_lh(l: jax.Array, h_deg: jax.Array) -> jax.Array:
    """HSLuv gamut boundary: maximum chroma at (L, H).

    Evaluates the six RGB gamut boundary lines in (u, v) space and takes the
    smallest positive ray length at angle H (the hsluv.org algorithm).
    """
    theta = h_deg * _RAD
    sin_t = jnp.sin(theta)
    cos_t = jnp.cos(theta)

    sub1 = ((l + 16.0) ** 3) / 1560896.0
    sub2 = jnp.where(sub1 > _EPSILON, sub1, l / _KAPPA)

    best = jnp.full(l.shape, jnp.inf, jnp.float32)
    for c in range(3):
        m1 = _M_XYZ_TO_RGB[c, 0]
        m2 = _M_XYZ_TO_RGB[c, 1]
        m3 = _M_XYZ_TO_RGB[c, 2]
        for t in (0.0, 1.0):
            top1 = (284517.0 * m1 - 94839.0 * m3) * sub2
            top2 = ((838422.0 * m3 + 769860.0 * m2 + 731718.0 * m1) * l * sub2
                    - 769860.0 * t * l)
            bottom = (632260.0 * m3 - 126452.0 * m2) * sub2 + 126452.0 * t
            slope = top1 / bottom
            intercept = top2 / bottom
            denom = sin_t - slope * cos_t
            length = intercept / jnp.where(denom == 0.0, 1e-30, denom)
            best = jnp.where((length >= 0.0) & (length < best), length, best)
    return best


def luv_to_hsluv(luv: jax.Array) -> jax.Array:
    """(L,u,v) -> (H deg, S [0,1], L [0,1]) per go-colorful conventions."""
    l, u, v = luv[0], luv[1], luv[2]
    c = jnp.hypot(u, v)
    h = jnp.where(c < 1e-8, 0.0, jnp.arctan2(v, u) * _DEG)
    h = jnp.where(h < 0.0, h + 360.0, h)
    mx = _max_chroma_for_lh(jnp.clip(l, 1e-7, 100.0 - 1e-7), h)
    s = jnp.where((l > 100.0 - 1e-7) | (l < 1e-8), 0.0, c / mx)
    return jnp.stack([h, jnp.clip(s, 0.0, 1.0), l / 100.0])


def hsluv_to_luv(hsl: jax.Array) -> jax.Array:
    h, s, l01 = hsl[0], hsl[1], hsl[2]
    l = l01 * 100.0
    mx = _max_chroma_for_lh(jnp.clip(l, 1e-7, 100.0 - 1e-7), h)
    c = jnp.where((l > 100.0 - 1e-7) | (l < 1e-8), 0.0, mx * s)
    u = jnp.cos(h * _RAD) * c
    v = jnp.sin(h * _RAD) * c
    return jnp.stack([l, u, v])


@jax.jit
def linrgb_to_hsluv(rgb: jax.Array) -> jax.Array:
    """Linear RGB cube -> HSLuv cube (pixelops.go:380-396)."""
    return luv_to_hsluv(xyz_to_luv(linrgb_to_xyz(rgb)))


@jax.jit
def hsluv_to_linrgb(hsl: jax.Array) -> jax.Array:
    """HSLuv cube -> linear RGB with color-preserving clamp
    (pixelops.go:401-428)."""
    rgb = xyz_to_linrgb(luv_to_xyz(hsluv_to_luv(hsl)))
    mx = jnp.max(rgb, axis=0, keepdims=True)
    return jnp.where(mx > 1.0, rgb / mx, rgb)


@jax.jit
def mono_to_hsluv_lum(data: jax.Array) -> jax.Array:
    """Gray value -> HSLuv luminance (pixelops.go:245-256). For gray pixels
    Y == value, so this is the CIE L* curve scaled to [0,1]."""
    return _y_to_l(jnp.clip(data, 0.0, None)) / 100.0


# ---------------------------------------------------------------------------
# Lab / HCL (CIE LCh(ab)) and xyY
# ---------------------------------------------------------------------------


def _lab_f(t: jax.Array) -> jax.Array:
    delta = 6.0 / 29.0
    return jnp.where(t > delta**3, jnp.cbrt(jnp.maximum(t, 0.0)), t / (3.0 * delta * delta) + 4.0 / 29.0)


def _lab_finv(t: jax.Array) -> jax.Array:
    delta = 6.0 / 29.0
    return jnp.where(t > delta, t**3, 3.0 * delta * delta * (t - 4.0 / 29.0))


def xyz_to_lab(xyz: jax.Array) -> jax.Array:
    """XYZ -> Lab with go-colorful scaling (L, a, b all /100-style)."""
    fx = _lab_f(xyz[0] / _WHITE[0])
    fy = _lab_f(xyz[1] / _WHITE[1])
    fz = _lab_f(xyz[2] / _WHITE[2])
    l = 1.16 * fy - 0.16
    a = 5.0 * (fx - fy)
    b = 2.0 * (fy - fz)
    return jnp.stack([l, a, b])


def lab_to_xyz(lab: jax.Array) -> jax.Array:
    l, a, b = lab[0], lab[1], lab[2]
    fy = (l + 0.16) / 1.16
    fx = fy + a / 5.0
    fz = fy - b / 2.0
    return jnp.stack([_lab_finv(fx) * _WHITE[0], _lab_finv(fy) * _WHITE[1], _lab_finv(fz) * _WHITE[2]])


@jax.jit
def linrgb_to_hcl(rgb: jax.Array) -> jax.Array:
    """Linear RGB -> (H deg, C, L) via Lab (pixelops.go:275-290)."""
    lab = xyz_to_lab(linrgb_to_xyz(rgb))
    l, a, b = lab[0], lab[1], lab[2]
    c = jnp.hypot(a, b)
    h = jnp.arctan2(b, a) * _DEG
    h = jnp.where(h < 0.0, h + 360.0, h)
    return jnp.stack([h, c, l])


@jax.jit
def hcl_to_linrgb(hcl: jax.Array) -> jax.Array:
    """(H, C, L) -> linear RGB with sRGB-space clamp like colorful.Clamped()
    (pixelops.go:319-337)."""
    h, c, l = hcl[0], hcl[1], hcl[2]
    a = c * jnp.cos(h * _RAD)
    b = c * jnp.sin(h * _RAD)
    rgb = xyz_to_linrgb(lab_to_xyz(jnp.stack([l, a, b])))
    srgb = jnp.clip(srgb_compand(rgb), 0.0, 1.0)
    return srgb_uncompand(srgb)


@jax.jit
def linrgb_to_xyy(rgb: jax.Array) -> jax.Array:
    """Linear RGB -> xyY (pixelops.go:341-356)."""
    xyz = linrgb_to_xyz(rgb)
    total = xyz[0] + xyz[1] + xyz[2]
    safe = jnp.where(total == 0.0, 1.0, total)
    # go-colorful returns the white point chromaticity for black pixels
    x = jnp.where(total == 0.0, 0.312727, xyz[0] / safe)
    y = jnp.where(total == 0.0, 0.329023, xyz[1] / safe)
    return jnp.stack([x, y, xyz[1]])


@jax.jit
def xyy_to_linrgb(xyy: jax.Array) -> jax.Array:
    """xyY -> linear RGB with sRGB clamp (pixelops.go:360-375)."""
    x, y, Y = xyy[0], xyy[1], xyy[2]
    safe_y = jnp.where(y == 0.0, 1.0, y)
    X = Y / safe_y * x
    Z = Y / safe_y * (1.0 - x - y)
    zero = y == 0.0
    xyz = jnp.stack([jnp.where(zero, 0.0, X), jnp.where(zero, 0.0, Y), jnp.where(zero, 0.0, Z)])
    srgb = jnp.clip(srgb_compand(xyz_to_linrgb(xyz)), 0.0, 1.0)
    return srgb_uncompand(srgb)


@jax.jit
def linrgb_to_ciehsl(rgb: jax.Array) -> jax.Array:
    """Linear RGB -> CIE "HSL": HCL with saturation s = c/sqrt(c^2+l^2)
    (pixelops.go:295-313)."""
    hcl = linrgb_to_hcl(rgb)
    h, c, l = hcl[0], hcl[1], hcl[2]
    s = c / jnp.sqrt(c * c + l * l + 1e-30)
    return jnp.stack([h, s, l])


@jax.jit
def ciehsl_to_linrgb(hsl: jax.Array) -> jax.Array:
    """CIE HSL -> linear RGB: c = l*s/sqrt(1-s^2), then HCL->RGB with sRGB
    clamp (pixelops.go:319-337)."""
    h, s, l = hsl[0], hsl[1], hsl[2]
    c = l * s / jnp.sqrt(jnp.maximum(1.0 - s * s, 1e-30))
    return hcl_to_linrgb(jnp.stack([h, c, l]))


@jax.jit
def mono_to_hcl_lum(data: jax.Array) -> jax.Array:
    """Gray value -> HCL (Lab) luminance (pixelops.go:260-271): for gray
    pixels this is the CIE L* curve in [0,1]."""
    y = jnp.clip(data, 0.0, None)
    return 1.16 * _lab_f(y) - 0.16


@jax.jit
def offset_rgb(cube: jax.Array, offsets: jax.Array) -> jax.Array:
    """Per-channel additive offset (pixelops.go:615-628)."""
    return cube + offsets[:, None, None]


@jax.jit
def scale_rgb(cube: jax.Array, scales: jax.Array) -> jax.Array:
    """Per-channel multiplicative scale, clamped to <=1 (pixelops.go:632-645)."""
    return jnp.minimum(cube * scales[:, None, None], 1.0)


# ---------------------------------------------------------------------------
# Chroma / hue / SCNR kernels on channel cubes
# ---------------------------------------------------------------------------


def _hue_in_range(h: jax.Array, from_: float, to: float) -> jax.Array:
    """Hue range test with wraparound (pixelops.go:504-505)."""
    return jnp.where(from_ <= to, (h > from_) & (h < to), (h > from_) | (h < to))


@jax.jit
def adjust_chroma(cube: jax.Array, gamma: float, threshold: float) -> jax.Array:
    """Gamma on the chroma/saturation channel where lum >= threshold
    (pixelops.go:448-455). cube layout: (H, C/S, L)."""
    h, c, l = cube[0], cube[1], cube[2]
    boosted = jnp.power(jnp.maximum(c, 0.0), 1.0 / gamma)
    c2 = jnp.where(l < threshold, c, boosted)
    return jnp.stack([h, c2, l])


@jax.jit
def neutralize_background(cube: jax.Array, low: float, high: float) -> jax.Array:
    """Zero chroma below `low`, ramp to full above `high` (pixelops.go:472-484).

    Reproduces the reference's quirk of reading both bounds from Low
    (pixelops.go:473 assigns low twice), i.e. a hard cut at `low`.
    """
    h, c, l = cube[0], cube[1], cube[2]
    # Reference bug-compat: `high` is effectively `low`, making the ramp a
    # step function at low.
    lo = low
    hi = low
    scaler = jnp.where(hi > lo, 1.0 / (hi - lo + 1e-30), 0.0)
    factor = jnp.clip((l - lo) * scaler, 0.0, 1.0)
    c2 = jnp.where(l < lo, 0.0, jnp.where(l < hi, c * factor, c))
    return jnp.stack([h, c2, l])


@jax.jit
def adjust_chroma_for_hues(cube: jax.Array, from_: float, to: float, factor: float) -> jax.Array:
    """Scale chroma for hues in [from, to], clamped to [0,1]
    (pixelops.go:501-511)."""
    h, c, l = cube[0], cube[1], cube[2]
    in_range = _hue_in_range(h, from_, to)
    c2 = jnp.where(in_range, jnp.clip(c * factor, 0.0, 1.0), c)
    return jnp.stack([h, c2, l])


@jax.jit
def rotate_colors(cube: jax.Array, from_: float, to: float, offset: float,
                  l_threshold: float) -> jax.Array:
    """Rotate hues in [from, to] by offset where lum >= threshold
    (pixelops.go:530-543)."""
    h, s, l = cube[0], cube[1], cube[2]
    sel = _hue_in_range(h, from_, to) & (l >= l_threshold)
    return jnp.stack([jnp.where(sel, h + offset, h), s, l])


@jax.jit
def scnr(cube: jax.Array, factor: float) -> jax.Array:
    """Subtractive chroma noise reduction on green, average-neutral with
    luminance protection (pixelops.go:555-571). cube is HSLuv."""
    rgb = hsluv_to_linrgb(cube)
    r, g, b = rgb[0], rgb[1], rgb[2]
    corrected = 0.5 * (r + b)
    g2 = jnp.minimum(g, corrected)
    weighted = factor * g2 + (1.0 - factor) * g
    new = linrgb_to_hsluv(jnp.stack([r, weighted, b]))
    # keep the original luminance channel (luminance protection)
    return jnp.stack([new[0], new[1], cube[2]])
