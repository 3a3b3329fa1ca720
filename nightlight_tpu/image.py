"""In-memory image model.

TPU-native analog of the reference's fits.Image struct
(reference: internal/fits/fits.go:30-54). The pixel payload lives as a
device-resident float32 jax.Array shaped (H, W) for mono images or (3, H, W)
for color cubes; `naxisn` keeps the FITS axis convention (fastest-varying
first: [width, height] or [width, height, 3]) for header round-tripping and
log compatibility.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Optional

import jax.numpy as jnp
import numpy as np

from nightlight_tpu.ops.stats import Stats


@dataclass
class Header:
    """Parsed FITS header content (fits.go:119-129)."""

    bools: dict = field(default_factory=dict)
    ints: dict = field(default_factory=dict)
    floats: dict = field(default_factory=dict)
    strings: dict = field(default_factory=dict)
    dates: dict = field(default_factory=dict)
    comments: list = field(default_factory=list)
    history: list = field(default_factory=list)
    end: bool = False
    length: int = 0


FITS_BLOCK_SIZE = 2880
HEADER_LINE_SIZE = 80


@dataclass
class Image:
    """A FITS image with device-resident pixel data.

    By convention (fits.go:31), light frames count upward from 0; the dark
    frame is ID -1, the flat is -2, an external reference frame is -3.
    """

    id: int = 0
    file_name: str = ""
    header: Header = field(default_factory=Header)
    bitpix: int = -32
    bzero: float = 0.0
    bscale: float = 1.0
    naxisn: list[int] = field(default_factory=list)  # FITS order: [w, h(, c)]
    data: Any = None  # jax.Array, (H, W) or (C, H, W) float32
    exposure: float = 0.0
    stats: Optional[Stats] = None
    median_diff_stats: Optional[Stats] = None
    stars: Any = None  # detect.stars.StarList or None
    hfr: float = 0.0
    trans: Any = None  # align.transform 6-vector or None (possibly pending)
    residual: Any = 0.0  # float or pending Deferred
    # Pending alignment drop decision (see pipeline.ops_post.check_align_drop)
    align_threshold: Any = None

    # -- constructors --------------------------------------------------------
    @classmethod
    def from_naxisn(cls, naxisn: list[int], data=None, ls_mode=None) -> "Image":
        """Create an image of the given FITS dimensions (fits.go:65-91)."""
        naxisn = list(int(x) for x in naxisn)
        if data is None:
            shape = tuple(reversed(naxisn))
            data = jnp.zeros(shape, jnp.float32)
        img = cls(naxisn=naxisn, data=data)
        img.stats = Stats(data, naxisn[0], ls_mode)
        return img

    @classmethod
    def like(cls, other: "Image", data=None) -> "Image":
        """New image with the metadata of `other` (fits.go:95-115)."""
        if data is None:
            data = jnp.zeros(other.data.shape, jnp.float32)
        img = cls(
            id=other.id,
            file_name=other.file_name,
            header=other.header,
            bitpix=other.bitpix,
            bzero=other.bzero,
            bscale=other.bscale,
            naxisn=list(other.naxisn),
            data=data,
            exposure=other.exposure,
            stars=other.stars,
            hfr=other.hfr,
        )
        img.stats = Stats(data, other.naxisn[0], other.stats.mode if other.stats else None)
        return img

    # -- geometry -------------------------------------------------------------
    @property
    def width(self) -> int:
        return self.naxisn[0]

    @property
    def height(self) -> int:
        return self.naxisn[1]

    @property
    def pixels(self) -> int:
        return int(np.prod(self.naxisn)) if self.naxisn else 0

    @property
    def channels(self) -> int:
        return self.naxisn[2] if len(self.naxisn) >= 3 else 1

    def dimensions_string(self) -> str:
        """E.g. "6000x4000" or "6000x4000x3" (fits.go:149-159)."""
        return "x".join(str(n) for n in self.naxisn)

    # -- pixel data helpers ----------------------------------------------------
    def set_data(self, data, naxisn=None) -> None:
        """Replace pixel data (and optionally dimensions), resetting stats."""
        self.data = data
        if naxisn is not None:
            self.naxisn = list(int(x) for x in naxisn)
        if self.stats is None:
            self.stats = Stats(data, self.naxisn[0])
        else:
            mode = self.stats.mode
            self.stats = Stats(data, self.naxisn[0], mode)

    def to_numpy(self) -> np.ndarray:
        return np.asarray(self.data, dtype=np.float32)


def bin_nxn(img: Image, n: int) -> Image:
    """NxN average-pooling downsample (fits.go:163-195)."""
    n = int(n)
    h, w = img.data.shape[-2], img.data.shape[-1]
    bh, bw = h // n, w // n
    d = img.data[..., : bh * n, : bw * n]
    if d.ndim == 2:
        binned = d.reshape(bh, n, bw, n).mean(axis=(1, 3))
        naxisn = [bw, bh]
    else:
        c = d.shape[0]
        binned = d.reshape(c, bh, n, bw, n).mean(axis=(2, 4))
        naxisn = [bw, bh, c]
    out = Image.from_naxisn(naxisn, binned, ls_mode=img.stats.mode if img.stats else None)
    out.id, out.file_name, out.exposure = img.id, img.file_name, img.exposure
    return out


def image_from_stars(img: Image, hfr_multiple: float = 2.0) -> Image:
    """Render detected stars as filled circles for debug output
    (fits.go:199-222). Host-side; only used for -stars debug saves."""
    res = Image.like(img)
    data = np.array(img.to_numpy())
    w = img.width
    if img.stars is not None and len(img.stars) > 0:
        for s in img.stars:
            radius = float(s.hfr) * hfr_multiple
            color = float(s.mass) / (radius * radius * math.pi)
            r_int = int(math.ceil(radius))
            ys = np.arange(-r_int, r_int + 1)
            xs = np.arange(-r_int, r_int + 1)
            yy, xx = np.meshgrid(ys, xs, indexing="ij")
            mask = (yy * yy + xx * xx) <= radius * radius + 1e-6
            cy, cx = int(s.y), int(s.x)
            for dy, dx in zip(yy[mask], xx[mask]):
                y, x = cy + dy, cx + dx
                if 0 <= y < img.height and 0 <= x < w:
                    data[..., y, x] = color
    res.set_data(jnp.asarray(data))
    return res
