"""Preprocessing operators: calibrate, badPixel, debayer, deband, scaleOffset,
bin, starDetect, backExtract (reference: internal/ops/pre/)."""

from __future__ import annotations


import jax.numpy as jnp
import numpy as np

from nightlight_tpu.image import Image, bin_nxn, image_from_stars
from nightlight_tpu.ops import pixelmath as pm
from nightlight_tpu.ops import prestack as ps
from nightlight_tpu.pipeline.context import Context
from nightlight_tpu.pipeline.operators import (
    OpLoad,
    UnaryOperator,
    materialize_all,
    register,
)


@register
class OpCalibrate(UnaryOperator):
    """Dark subtraction and flat division with lazy master-frame loading
    (pre/preprocess.go:29-143)."""

    TYPE = "calibrate"
    PARAMS = {"dark": ("dark", ""), "flat": ("flat", "")}

    def is_noop(self) -> bool:
        return not self.dark and not self.flat

    def _init_masters(self, c: Context) -> None:
        """Load dark/flat once under the context lock (preprocess.go:102-143).
        By convention the dark is ID -1 and the flat -2."""
        with c.lock:
            if not ((self.dark and c.dark_frame is None) or (self.flat and c.flat_frame is None)):
                return
            promises = []
            names = []
            for i, name in enumerate([self.dark, self.flat]):
                if name:
                    promises.extend(OpLoad(id=-(i + 1), file_name=name).make_promises([], c))
                    names.append(name)
            images, err = materialize_all(promises, c.max_threads, False)
            if err is not None:
                raise err
            if self.dark:
                c.dark_frame = images[0]
                if self.flat:
                    c.flat_frame = images[1]
            elif self.flat:
                c.flat_frame = images[0]
            if (c.dark_frame is not None and c.flat_frame is not None
                    and c.dark_frame.naxisn != c.flat_frame.naxisn):
                raise ValueError(
                    f"dark dimensions {c.dark_frame.naxisn} differ from flat dimensions {c.flat_frame.naxisn}")

    def apply(self, f: Image, c: Context) -> Image:
        self._init_masters(c)

        for master, what in ((c.dark_frame, "dark"), (c.flat_frame, "flat")):
            if master is not None and f.naxisn != master.naxisn:
                if f.pixels != master.pixels:
                    raise ValueError(
                        f"{f.id}: Light dimensions {f.naxisn} differ from {what} dimensions {master.naxisn}")
                c.logf("%d: Warning: light dimensions %s differ from %s dimensions %s "
                       "but same product, ignoring for Seestar", f.id, f.naxisn, what, master.naxisn)

        if c.dark_frame is not None:
            f.set_data(ps.subtract(f.data, c.dark_frame.data.reshape(f.data.shape)))
        if c.flat_frame is not None:
            f.set_data(ps.flat_divide(f.data, c.flat_frame.data.reshape(f.data.shape),
                                      c.flat_frame.stats.max))
        return f


@register
class OpBadPixel(UnaryOperator):
    """Bad-pixel detection and cosmetic repair (pre/preprocess.go:145-201).
    Dispatches to the CFA-aware path when a debayer channel is configured."""

    TYPE = "badPixel"
    PARAMS = {
        "sigma_low": ("sigmaLow", 3.0),
        "sigma_high": ("sigmaHigh", 5.0),
    }

    def __init__(self, debayer=None, **kwargs):
        # Like the reference, the Debayer link is wiring-only and not part of
        # the JSON schema (preprocess.go:149 json:"-").
        super().__init__(**kwargs)
        self.debayer = debayer

    def is_noop(self) -> bool:
        return self.sigma_low == 0 or self.sigma_high == 0

    def apply(self, f: Image, c: Context) -> Image:
        if self.sigma_low == 0 or self.sigma_high == 0:
            return f
        from nightlight_tpu.deferred import defer

        debayer = self.debayer
        if debayer is None or not getattr(debayer, "channel", ""):
            import jax.numpy as jnp

            repaired, n_bad, diff_std = ps.bad_pixel_repair(f.data, self.sigma_low, self.sigma_high)
            from nightlight_tpu.ops.stats import Stats

            # dispatch-only: count, percentage, and stddev resolve in the
            # pool's next batched transfer (typically at the ref-selection
            # barrier), so this op costs zero device round trips
            f.median_diff_stats = Stats.from_stddev(defer(diff_std))
            f.set_data(repaired)
            c.logf("%d: Removed %d bad pixels (%.2f%%) with sigma low=%.2f high=%.2f\n",
                   f.id, defer(n_bad, conv=int),
                   defer(n_bad.astype(jnp.float32) * (100.0 / f.pixels)),
                   self.sigma_low, self.sigma_high)
        else:
            import jax.numpy as jnp

            corrected, n_removed = ps.cosmetic_correction_bayer(
                f.data, debayer.channel, debayer.color_filter_array, self.sigma_low, self.sigma_high)
            f.set_data(corrected)
            c.logf("%d: Removed %d bad bayer pixels (%.2f%%) with sigma low=%.2f high=%.2f\n",
                   f.id, defer(n_removed, conv=int),
                   defer(jnp.asarray(n_removed, jnp.float32) * (100.0 / f.pixels)),
                   self.sigma_low, self.sigma_high)
        return f


@register
class OpDebayer(UnaryOperator):
    """Bilinear single-channel debayer (pre/preprocess.go:203-249)."""

    TYPE = "debayer"
    PARAMS = {"channel": ("channel", ""), "color_filter_array": ("colorFilterArray", "RGGB")}

    def is_noop(self) -> bool:
        return not self.channel or not self.color_filter_array

    def apply(self, f: Image, c: Context) -> Image:
        if not self.channel or not self.color_filter_array:
            return f
        out = ps.debayer_bilinear(f.data, self.channel, self.color_filter_array)
        f.set_data(out, naxisn=[out.shape[1], out.shape[0]])
        c.logf("%d: Debayered channel %s from cfa %s, new size %dx%d\n",
               f.id, self.channel, self.color_filter_array, f.naxisn[0], f.naxisn[1])
        return f


@register
class OpDebandHoriz(UnaryOperator):
    """Horizontal banding removal (pre/banding.go:28-132)."""

    TYPE = "debandHoriz"
    PARAMS = {"percentile": ("percentile", 50.0), "window": ("window", 128),
              "sigma": ("sigma", 3.0)}

    def is_noop(self) -> bool:
        return self.percentile <= 0 or self.percentile >= 100 or self.window <= 0

    def apply(self, f: Image, c: Context) -> Image:
        if self.percentile <= 0 or self.percentile >= 100 or self.window <= 0:
            return f
        from nightlight_tpu.ops.deband import deband

        # dispatch-only: location/scale stay device scalars and the factor
        # extrema render at the next log flush
        loc, scale = (f.stats.device_location_scale() if self.sigma != 0
                      else (0.0, 0.0))
        out, lo, hi, threshold = deband(f.data, self.percentile, self.window,
                                        self.sigma, loc, scale, True)
        f.set_data(out)
        c.logf("%d: De-banded horizontally with %.3fth percentile, window %d, sigma %.2f, "
               "threshold %.2f, factors in [%.3f, %.3f]\n",
               f.id, self.percentile, self.window, self.sigma, threshold, lo, hi)
        return f


@register
class OpDebandVert(UnaryOperator):
    """Vertical banding removal (pre/banding.go:164-269)."""

    TYPE = "debandVert"
    PARAMS = {"percentile": ("percentile", 50.0), "window": ("window", 128),
              "sigma": ("sigma", 3.0)}

    def is_noop(self) -> bool:
        # window<=0 no-ops like OpDebandHoriz (banding.go:62). The
        # reference's VERTICAL op lacks that guard and panics on an empty
        # window (banding.go:199,256-259 — a latent upstream bug its horiz
        # twin fixed); deliberate divergence: no-op instead of crashing.
        return (self.percentile <= 0 or self.percentile >= 100
                or self.window <= 0)

    def apply(self, f: Image, c: Context) -> Image:
        if self.is_noop():
            return f
        from nightlight_tpu.ops.deband import deband

        loc, scale = (f.stats.device_location_scale() if self.sigma != 0
                      else (0.0, 0.0))
        out, lo, hi, threshold = deband(f.data, self.percentile, self.window,
                                        self.sigma, loc, scale, False)
        f.set_data(out)
        c.logf("%d: De-banded vertically with %.3fth percentile, window %d and sigma %.2f, "
               "threshold %.2f, factors in [%.3f, %.3f]\n",
               f.id, self.percentile, self.window, self.sigma, threshold, lo, hi)
        return f


@register
class OpScaleOffset(UnaryOperator):
    """Pixel math x*scale + offset (pre/preprocess.go:251-291)."""

    TYPE = "scaleOffset"
    PARAMS = {"scale": ("scale", 1.0), "offset": ("offset", 0.0)}

    def is_noop(self) -> bool:
        return self.scale == 1 and self.offset == 0

    def apply(self, f: Image, c: Context) -> Image:
        if self.scale == 1 and self.offset == 0:
            return f
        c.logf("%d: Applying pixel math x = x * %.3f + %.3f%%\n", f.id, self.scale, self.offset * 100)
        f.data = pm.scale_offset(f.data, self.scale, self.offset)
        f.stats.replace_data(f.data)
        f.stats.update_cached_with(self.scale, self.offset)
        return f


@register
class OpBin(UnaryOperator):
    """NxN average-pooling binning (pre/preprocess.go:293-331)."""

    TYPE = "bin"
    PARAMS = {"bin_size": ("binSize", 1)}

    def is_noop(self) -> bool:
        return self.bin_size <= 1

    def apply(self, f: Image, c: Context) -> Image:
        if self.bin_size <= 1:
            return f
        f = bin_nxn(f, self.bin_size)
        c.logf("%d: After %dx%d binning, new image size %dx%d\n",
               f.id, self.bin_size, self.bin_size, f.naxisn[0], f.naxisn[1])
        return f


@register
class OpStarDetect(UnaryOperator):
    """Star detection with optional debug rendering (pre/preprocess.go:401-465)."""

    TYPE = "starDetect"
    PARAMS = {
        "radius": ("radius", 16),
        "sigma": ("sigma", 10.0),
        "bad_pixel_sigma": ("badPixelSigma", 0.0),
        "in_out_ratio": ("inOutRatio", 10.0),
        "save": ("save", None),  # OpSave or None
    }

    def is_noop(self) -> bool:
        return self.radius == 0 or self.sigma == 0

    def apply(self, f: Image, c: Context) -> Image:
        if self.radius == 0 or self.sigma == 0:
            return f
        if f.stats is None:
            raise ValueError("missing stats")
        from nightlight_tpu.detect.stars import find_stars

        median_diff_std = None
        if f.median_diff_stats is not None:
            median_diff_std = f.median_diff_stats.stddev
        data2d = f.data if f.data.ndim == 2 else f.data[0]
        # Dispatch-only: thresholds chain on the device location/scale and
        # the star list stays on device until the next barrier resolves
        # everything pending in one transfer.
        loc_dev, scale_dev = f.stats.device_location_scale()
        f.stars, f.hfr = find_stars(
            data2d, loc_dev, scale_dev, self.sigma,
            self.bad_pixel_sigma, self.in_out_ratio, int(self.radius),
            median_diff_std, deferred=True,
            # mesh-sharded frames can't feed the DMA gather kernel
            use_pallas_gather=False if c.mesh is not None else None)
        c.logf("%d: Stars %d HFR %.2f %s\n", f.id, f.stars.count_lazy, f.hfr, f.stats)

        save = self.save
        if save is not None and getattr(save, "file_pattern", ""):
            stars_img = image_from_stars(f, 2.0)
            save.apply(stars_img, c)
        return f


@register
class OpBackExtract(UnaryOperator):
    """Automated background extraction (pre/preprocess.go:333-399)."""

    TYPE = "backExtract"
    PARAMS = {
        "grid_size": ("gridSize", 0),
        "hfr_factor": ("hfrFactor", 4.0),
        "sigma": ("sigma", 1.5),
        "clip": ("clip", 0),
        "save": ("save", None),  # OpSave or None
    }

    def is_noop(self) -> bool:
        return self.grid_size <= 0

    def apply(self, f: Image, c: Context) -> Image:
        if self.grid_size <= 0:
            return f
        from nightlight_tpu.ops.background import Background

        bg = Background(f.data, self.grid_size, self.sigma, self.clip, f.stars, self.hfr_factor)
        c.logf("%d: %s\n", f.id, bg)

        save = self.save
        if save is not None and getattr(save, "file_pattern", ""):
            bg_img = Image.from_naxisn(list(f.naxisn), bg.render())
            bg_img.id = f.id
            save.apply(bg_img, c)
            f.set_data(ps.subtract(f.data, bg_img.data))
        else:
            f.set_data(bg.subtract(f.data))
        return f
