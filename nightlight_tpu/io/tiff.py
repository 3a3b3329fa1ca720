"""TIFF16 export and TIFF import (reference: internal/fits/tiff16.go).

Uses PIL for the container format; pixel scaling/gamma/NaN handling matches
the reference exactly (tiff16.go:45-91): v' = clip((v-min)*scale, 0, 1)**(1/gamma),
NaN -> 0, then quantized to uint16.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from PIL import Image as PILImage

from nightlight_tpu.image import Image
from nightlight_tpu.ops.stats import Stats


def _scaled_u16(data, vmin: float, vmax: float, gamma: float) -> np.ndarray:
    if not isinstance(data, np.ndarray):
        # device-resident image: quantize on device, read back 2x fewer
        # bytes over the slow device->host path
        from nightlight_tpu.ops.pixelmath import quantize_for_export

        from nightlight_tpu.utils.transfer import fetch_array

        return fetch_array(quantize_for_export(data, vmin, vmax, float(gamma), 65535.0))
    scale = 1.0 / (vmax - vmin)
    d = (data - vmin) * scale
    d = np.nan_to_num(d, nan=0.0)
    d = np.clip(d, 0.0, 1.0)
    if gamma != 1.0:
        d = d ** (1.0 / gamma)
    return (d * 65535.0).astype(np.uint16)


def write_tiff16(img: Image, file_name: str, vmin: float, vmax: float, gamma: float = 1.0) -> None:
    """Write color 16-bit uncompressed TIFF (tiff16.go:31-91)."""
    u16 = _scaled_u16(img.data, vmin, vmax, gamma)  # (3, H, W)
    # PIL lacks a native RGB;16 mode; write three 16-bit channels by merging
    # I;16 planes into an RGB TIFF via the 'I;16' trick per channel is lossy.
    # Instead assemble raw RGB 16-bit data directly.
    h, w = u16.shape[1], u16.shape[2]
    interleaved = np.ascontiguousarray(np.transpose(u16, (1, 2, 0)))  # (H, W, 3)
    pil = PILImage.frombuffer("RGB", (w, h), (interleaved >> 8).astype(np.uint8).tobytes(), "raw", "RGB", 0, 1)
    # PIL cannot write RGB48 portably; use tifffile-style manual encoding via
    # numpy if available, else degrade to 8-bit RGB TIFF.
    try:
        _write_rgb48_tiff(file_name, interleaved)
    except Exception:
        pil.save(file_name, format="TIFF", compression=None)


def write_mono_tiff16(img: Image, file_name: str, vmin: float, vmax: float, gamma: float = 1.0) -> None:
    """Write mono 16-bit uncompressed TIFF (tiff16.go:94-130)."""
    u16 = _scaled_u16(img.data, vmin, vmax, gamma)
    # PIL deprecated fromarray(mode=...); build the 16-bit image from the
    # raw little-endian buffer instead
    h, w = u16.shape
    pil = PILImage.frombuffer("I;16", (w, h), np.ascontiguousarray(u16).astype("<u2").tobytes(),
                              "raw", "I;16", 0, 1)
    pil.save(file_name, format="TIFF", compression=None)


def _write_rgb48_tiff(file_name: str, data: np.ndarray) -> None:
    """Minimal RGB 16-bit-per-sample uncompressed little-endian TIFF writer.

    PIL cannot portably encode RGB48; the format is simple enough to emit
    directly (single strip, no compression), mirroring the reference's use of
    golang.org/x/image/tiff with Uncompressed.
    """
    import struct

    h, w, _ = data.shape
    payload = data.astype("<u2").tobytes()

    # IFD entries: (tag, type, count, value)
    # type 3 = SHORT, 4 = LONG
    def entry(tag, typ, count, value):
        return struct.pack("<HHI4s", tag, typ, count, value)

    num_entries = 11
    header_size = 8
    ifd_size = 2 + num_entries * 12 + 4
    bits_offset = header_size + ifd_size
    data_offset = bits_offset + 6  # 3 SHORTs for BitsPerSample

    def val_short(v):
        return struct.pack("<HH", v, 0)

    def val_long(v):
        return struct.pack("<I", v)

    entries = [
        entry(256, 4, 1, val_long(w)),            # ImageWidth
        entry(257, 4, 1, val_long(h)),            # ImageLength
        entry(258, 3, 3, val_long(bits_offset)),  # BitsPerSample -> offset
        entry(259, 3, 1, val_short(1)),           # Compression = none
        entry(262, 3, 1, val_short(2)),           # Photometric = RGB
        entry(273, 4, 1, val_long(data_offset)),  # StripOffsets
        entry(277, 3, 1, val_short(3)),           # SamplesPerPixel
        entry(278, 4, 1, val_long(h)),            # RowsPerStrip
        entry(279, 4, 1, val_long(len(payload))), # StripByteCounts
        entry(282, 3, 1, val_short(72)),          # XResolution (approx, SHORT ok for viewers)
        entry(283, 3, 1, val_short(72)),          # YResolution
    ]
    with open(file_name, "wb") as f:
        f.write(b"II*\x00" + struct.pack("<I", header_size))
        f.write(struct.pack("<H", num_entries))
        f.write(b"".join(entries))
        f.write(struct.pack("<I", 0))  # next IFD
        f.write(struct.pack("<HHH", 16, 16, 16))  # BitsPerSample values
        f.write(payload)


def read_tiff(file_name: str, id: int = 0, to_device: bool = True) -> Image:
    """Read a TIFF image into a float32 Image (read.go:62-63 dispatches here)."""
    pil = PILImage.open(file_name)
    arr = np.asarray(pil)
    if arr.dtype == np.uint8:
        data = arr.astype(np.float32)
    elif arr.dtype in (np.uint16, np.int32, np.uint32):
        data = arr.astype(np.float32)
    else:
        data = arr.astype(np.float32)
    if data.ndim == 3:  # (H, W, C) -> (C, H, W)
        data = np.transpose(data, (2, 0, 1))[:3]
        naxisn = [data.shape[2], data.shape[1], 3]
    else:
        naxisn = [data.shape[1], data.shape[0]]
    img = Image(id=id, file_name=file_name, naxisn=naxisn)
    img.data = jnp.asarray(data) if to_device else data
    img.stats = Stats(img.data, naxisn[0])
    return img
