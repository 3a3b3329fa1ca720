"""Gaussian blur and unsharp masking.

Rebuild of the reference's separable gaussian filter and USM
(reference: internal/ops/stretch/usm.go). The kernel is generated on the
host by symbolic integration of the gaussian via erf with a 1% truncation
budget (usm.go:41-82); convolution runs on device as two 1D passes with
symmetric ("reflect including edge") boundary handling (usm.go:25-33).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_definite_integral(mu: float, sigma: float, x: float) -> float:
    """Integral of the gaussian pdf up to x (usm.go:36-38)."""
    return 0.5 * (1.0 + math.erf((x - mu) / (math.sqrt(2.0) * sigma)))


def gaussian_kernel_1d(sigma: float) -> np.ndarray:
    """1D kernel via symbolic integration, 1% truncation budget, mirrored
    right half, normalized (usm.go:41-82)."""
    mu = 0.0
    accept_out = 0.01
    radius = 0
    while True:
        val = gaussian_definite_integral(mu, sigma, -0.5 - radius)
        if val < accept_out:
            radius -= 1
            break
        radius += 1
    width = 2 * radius + 1
    kernel = np.zeros(width, np.float32)

    total = 0.0
    lower = gaussian_definite_integral(mu, sigma, -0.5 - radius)
    for i in range(radius + 1):
        upper = gaussian_definite_integral(mu, sigma, -0.5 - radius + i + 1)
        delta = upper - lower
        kernel[i] = delta
        total += delta
        lower = upper
    for i in range(1, radius + 1):
        kernel[radius + i] = kernel[radius - i]
        total += kernel[radius - i]
    kernel *= 1.0 / total
    return kernel


@partial(jax.jit, static_argnames=())
def _convolve_sym(img: jax.Array, kernel: jax.Array) -> jax.Array:
    """Separable 2D convolution with symmetric boundary (usm.go:85-122)."""
    k = kernel.shape[0] // 2
    # X pass
    padded = jnp.pad(img, ((0, 0), (k, k)), mode="symmetric")
    x = jnp.zeros_like(img)
    for i in range(2 * k + 1):
        x = x + kernel[i] * padded[:, i : i + img.shape[1]]
    # Y pass
    padded = jnp.pad(x, ((k, k), (0, 0)), mode="symmetric")
    out = jnp.zeros_like(img)
    for i in range(2 * k + 1):
        out = out + kernel[i] * padded[i : i + img.shape[0], :]
    return out


def gaussian_blur(img: jax.Array, sigma: float) -> jax.Array:
    """Gaussian blur (usm.go:126-130)."""
    kernel = jnp.asarray(gaussian_kernel_1d(sigma))
    return _convolve_sym(img, kernel)


@jax.jit
def _usm_combine(img, blurred, gain, vmin, vmax, abs_threshold):
    sharp = jnp.clip(img + (img - blurred) * gain, vmin, vmax)
    return jnp.where(img < abs_threshold, img, sharp)


def unsharp_mask(img: jax.Array, sigma: float, gain: float, vmin: float, vmax: float,
                 abs_threshold: float) -> jax.Array:
    """USM: d + (d - blur)*gain above threshold, clipped (usm.go:134-159)."""
    blurred = gaussian_blur(img, sigma)
    return _usm_combine(img, blurred, gain, vmin, vmax, abs_threshold)
