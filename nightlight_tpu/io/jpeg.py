"""JPEG export (reference: internal/fits/writejpg.go).

Pixel handling matches writejpg.go:43-133: v' = clip((v-min)*scale, 0, 1),
NaN -> 0, optional gamma, quantized to uint8, quality 95 by default.
"""

from __future__ import annotations

import numpy as np
from PIL import Image as PILImage

from nightlight_tpu.image import Image


def _scaled_u8(data, vmin: float, vmax: float, gamma: float) -> np.ndarray:
    if not isinstance(data, np.ndarray):
        # device-resident image: quantize on device, read back 4x fewer
        # bytes over the slow device->host path
        from nightlight_tpu.ops.pixelmath import quantize_for_export

        from nightlight_tpu.utils.transfer import fetch_array

        return fetch_array(quantize_for_export(data, vmin, vmax, float(gamma), 255.0))
    scale = 1.0 / (vmax - vmin)
    d = (data - vmin) * scale
    d = np.nan_to_num(d, nan=0.0)
    d = np.clip(d, 0.0, 1.0)
    if gamma != 1.0:
        d = d ** (1.0 / gamma)
    return (d * 255.0).astype(np.uint8)


def write_jpg(img: Image, file_name: str, vmin: float, vmax: float, gamma: float = 1.0,
              quality: int = 95) -> None:
    """Write color 8-bit JPEG (writejpg.go:29-89)."""
    u8 = _scaled_u8(img.data, vmin, vmax, gamma)  # (3, H, W)
    pil = PILImage.fromarray(np.transpose(u8, (1, 2, 0)), mode="RGB")
    pil.save(file_name, format="JPEG", quality=quality)


def write_mono_jpg(img: Image, file_name: str, vmin: float, vmax: float, gamma: float = 1.0,
                   quality: int = 95) -> None:
    """Write mono 8-bit JPEG (writejpg.go:92-133)."""
    u8 = _scaled_u8(img.data, vmin, vmax, gamma)
    pil = PILImage.fromarray(u8, mode="L")
    pil.save(file_name, format="JPEG", quality=quality)
