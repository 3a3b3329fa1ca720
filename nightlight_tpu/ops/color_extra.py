"""Auxiliary color components: OkLab/OkHcl and the B-V star color table.

Rebuild of the reference's extra color utilities (reference:
internal/fits/oklab.go, bv.go). Neither is wired into pipeline operators in
the reference either; they are available library surface.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# OkLab matrices (bottosson.github.io/posts/oklab, as used in oklab.go:48-77)
_M1 = jnp.array([
    [0.4122214708, 0.5363325363, 0.0514459929],
    [0.2119034982, 0.6806995451, 0.1073969566],
    [0.0883024619, 0.2817188376, 0.6299787005],
], jnp.float32)
_M2 = jnp.array([
    [0.2104542553, 0.7936177850, -0.0040720468],
    [1.9779984951, -2.4285922050, 0.4505937099],
    [0.0259040371, 0.7827717662, -0.8086757660],
], jnp.float32)
_M2_INV = jnp.array([
    [1.0, 0.3963377774, 0.2158037573],
    [1.0, -0.1055613458, -0.0638541728],
    [1.0, -0.0894841775, -1.2914855480],
], jnp.float32)
_M1_INV = jnp.array([
    [4.0767416621, -3.3077115913, 0.2309699292],
    [-1.2684380046, 2.6097574011, -0.3413193965],
    [-0.0041960863, -0.7034186147, 1.7076147010],
], jnp.float32)

_DEG = 180.0 / np.pi
_RAD = np.pi / 180.0


def _mul3(m, v):
    return jnp.stack([
        m[0, 0] * v[0] + m[0, 1] * v[1] + m[0, 2] * v[2],
        m[1, 0] * v[0] + m[1, 1] * v[1] + m[1, 2] * v[2],
        m[2, 0] * v[0] + m[2, 1] * v[1] + m[2, 2] * v[2],
    ])


@jax.jit
def linrgb_to_oklab(rgb: jax.Array) -> jax.Array:
    """(3, ...) linear sRGB in [0,1] -> OkLab (oklab.go:36-61).
    Inputs are clamped to [0,1] like the reference."""
    lms = _mul3(_M1, jnp.clip(rgb, 0.0, 1.0))
    return _mul3(_M2, jnp.cbrt(lms))


@jax.jit
def oklab_to_linrgb(lab: jax.Array) -> jax.Array:
    """OkLab -> linear sRGB (oklab.go:63-77)."""
    lms3 = _mul3(_M2_INV, lab)
    return _mul3(_M1_INV, lms3 * lms3 * lms3)


@jax.jit
def oklab_to_okhcl(lab: jax.Array) -> jax.Array:
    """OkLab -> (H deg, C, L) (oklab.go:84-88)."""
    l, a, b = lab[0], lab[1], lab[2]
    c = jnp.sqrt(a * a + b * b)
    h = jnp.arctan2(b, a) * _DEG
    return jnp.stack([h, c, l])


@jax.jit
def okhcl_to_oklab(hcl: jax.Array) -> jax.Array:
    """(H deg, C, L) -> OkLab (oklab.go:90-95)."""
    h, c, l = hcl[0] * _RAD, hcl[1], hcl[2]
    return jnp.stack([l, c * jnp.cos(h), c * jnp.sin(h)])


# B-V color index -> RGB lookup (bv.go:20-97); 49 entries for -0.4..2.0 in
# 0.05 steps, from vendian.org/mncharity starcolor data.
_BV_TABLE = np.array([
    [0.60784, 0.69804, 1.00000], [0.61961, 0.70980, 1.00000],
    [0.63922, 0.72549, 1.00000], [0.66667, 0.74902, 1.00000],
    [0.69804, 0.77255, 1.00000], [0.73333, 0.80000, 1.00000],
    [0.76863, 0.82353, 1.00000], [0.80000, 0.84706, 1.00000],
    [0.82745, 0.86667, 1.00000], [0.85490, 0.88627, 1.00000],
    [0.87451, 0.89804, 1.00000], [0.89412, 0.91373, 1.00000],
    [0.91373, 0.92549, 1.00000], [0.93333, 0.93725, 1.00000],
    [0.95294, 0.94902, 1.00000], [0.97255, 0.96471, 1.00000],
    [0.99608, 0.97647, 1.00000], [1.00000, 0.97647, 0.98431],
    [1.00000, 0.96863, 0.96078], [1.00000, 0.96078, 0.93725],
    [1.00000, 0.95294, 0.91765], [1.00000, 0.94510, 0.89804],
    [1.00000, 0.93725, 0.87843], [1.00000, 0.92941, 0.85882],
    [1.00000, 0.92157, 0.83922], [1.00000, 0.91373, 0.82353],
    [1.00000, 0.90980, 0.80784], [1.00000, 0.90196, 0.79216],
    [1.00000, 0.89804, 0.77647], [1.00000, 0.89020, 0.76471],
    [1.00000, 0.88627, 0.74902], [1.00000, 0.87843, 0.73333],
    [1.00000, 0.87451, 0.72157], [1.00000, 0.86667, 0.70588],
    [1.00000, 0.85882, 0.69020], [1.00000, 0.85490, 0.67843],
    [1.00000, 0.84706, 0.66275], [1.00000, 0.83922, 0.64706],
    [1.00000, 0.83529, 0.63137], [1.00000, 0.82353, 0.61176],
    [1.00000, 0.81569, 0.58824], [1.00000, 0.80000, 0.56078],
    [1.00000, 0.78431, 0.52157], [1.00000, 0.75686, 0.47059],
    [1.00000, 0.71765, 0.39608], [1.00000, 0.66275, 0.29412],
    [1.00000, 0.58431, 0.13725], [1.00000, 0.48235, 0.00000],
    [1.00000, 0.32157, 0.00000],
], np.float32)


def bv_to_rgb(bv) -> np.ndarray:
    """Star color index (B-V, -0.4..2.0) -> RGB via table interpolation
    (bv.go:20-47). Accepts scalar or array; returns (..., 3)."""
    bv = np.clip(np.asarray(bv, np.float32), -0.4, 2.0)
    index = (bv + 0.4) * 20.0
    floor = np.minimum(index.astype(np.int32), len(_BV_TABLE) - 1)
    ceil = np.minimum(floor + 1, len(_BV_TABLE) - 1)
    frac = (index - floor)[..., None]
    return _BV_TABLE[floor] * (1 - frac) + _BV_TABLE[ceil] * frac
