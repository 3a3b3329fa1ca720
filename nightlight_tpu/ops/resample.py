"""Geometric projection: bilinear warp into a reference coordinate system.

Rebuild of the reference's Image.Project (reference: internal/fits/project.go:
26-76) as one fused gather on device: invert the transform on the host,
generate the destination grid, sample with bilinear interpolation, and fill
out-of-bounds pixels with a given value (NaN marks missing data for stacking).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from nightlight_tpu.align import transform as tf


@partial(jax.jit, static_argnames=("dest_h", "dest_w"))
def _warp(img: jax.Array, inv: jax.Array, out_of_bounds: float, dest_h: int, dest_w: int) -> jax.Array:
    h, w = img.shape
    col = jnp.arange(dest_w, dtype=jnp.float32)[None, :]
    row = jnp.arange(dest_h, dtype=jnp.float32)[:, None]
    px = inv[0] * col + inv[1] * row + inv[2]
    py = inv[3] * col + inv[4] * row + inv[5]

    xl = jnp.floor(px)
    yl = jnp.floor(py)
    xr = px - xl
    yr = py - yl
    xl_i = xl.astype(jnp.int32)
    yl_i = yl.astype(jnp.int32)

    oob = (xl_i < 0) | (xl_i + 1 >= w) | (yl_i < 0) | (yl_i + 1 >= h)
    xc = jnp.clip(xl_i, 0, w - 2)
    yc = jnp.clip(yl_i, 0, h - 2)

    v00 = img[yc, xc]
    v01 = img[yc, xc + 1]
    v10 = img[yc + 1, xc]
    v11 = img[yc + 1, xc + 1]
    vyl = v00 * (1 - xr) + v01 * xr
    vyh = v10 * (1 - xr) + v11 * xr
    v = vyl * (1 - yr) + vyh * yr
    return jnp.where(oob, jnp.float32(out_of_bounds), v)


def project(img: jax.Array, dest_naxisn, trans: np.ndarray, out_of_bounds: float) -> jax.Array:
    """Project a (H, W) image into dest dimensions under `trans`
    (project.go:26-76). trans maps source -> dest; sampling uses its inverse.
    """
    inv = tf.invert(trans)
    dest_w, dest_h = int(dest_naxisn[0]), int(dest_naxisn[1])
    return _warp(img, jnp.asarray(inv), float(out_of_bounds), dest_h, dest_w)


@partial(jax.jit, static_argnames=("dest_h", "dest_w"))
def _warp_forward(img: jax.Array, trans: jax.Array, out_of_bounds,
                  dest_h: int, dest_w: int) -> jax.Array:
    """Warp under a FORWARD transform that lives on device (e.g. a pending
    alignment result): the closed-form inverse (coord.go:159-201) is
    computed inside the program, so projection chains on the aligner output
    with zero host synchronization."""
    a, b, c, d, e, f = (trans[i] for i in range(6))
    eps = b * d - a * e
    eps2 = a * e - b * d
    inv = jnp.stack([
        -e / eps, b / eps, (c * e - b * f) / eps,
        -d / eps2, a / eps2, (c * d - a * f) / eps2,
    ])
    return _warp(img, inv, jnp.float32(out_of_bounds), dest_h, dest_w)


def project_deferred(img: jax.Array, dest_naxisn, trans, out_of_bounds) -> jax.Array:
    """project() for a device-resident/pending forward transform."""
    dest_w, dest_h = int(dest_naxisn[0]), int(dest_naxisn[1])
    return _warp_forward(img, trans, out_of_bounds, dest_h, dest_w)
