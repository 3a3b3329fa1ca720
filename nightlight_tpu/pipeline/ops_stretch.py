"""Mono stretch operators: normalize, iterative auto-stretch, midtones, gamma,
post-peak gamma, black scaling, gaussian blur, unsharp mask
(reference: internal/ops/stretch/stretch.go)."""

from __future__ import annotations

import numpy as np

from nightlight_tpu.image import Image
from nightlight_tpu.ops import pixelmath as pm
from nightlight_tpu.pipeline.context import Context
from nightlight_tpu.pipeline.operators import UnaryOperator, register



def _dlazy(x, mul: float = 1.0):
    """x*mul as a log-safe value: a pending Deferred for device scalars
    (renders at the next log flush), else a plain float."""
    import jax

    if isinstance(x, jax.Array):
        from nightlight_tpu.deferred import defer

        return defer(x * mul)
    return float(x) * mul


def ideal_stretch_gamma(loc: float, scale: float, target_loc: float, target_scale: float) -> float:
    """Search gamma in [1, 5] step 0.01 for the value whose post-stretch scale
    best matches the target (stretch.go:118-140). Vectorized on the host."""
    gammas = np.arange(1.0, 5.0 + 1e-9, 0.01)
    exponent = 1.0 / gammas
    new_loc_lower = np.power(max(loc - scale, 0.0), exponent)
    new_loc = np.power(loc, exponent)
    new_loc_upper = np.power(loc + scale, exponent)
    black = (target_loc - new_loc) / (target_loc - 1.0)
    s = 1.0 / (1.0 - black)
    lower = np.maximum(0.0, (new_loc_lower - black) * s)
    upper = np.maximum(0.0, (new_loc_upper - black) * s)
    new_scale = (upper - lower) / 2.0
    delta = np.abs(target_scale - new_scale)
    # baseline: gamma 1 with delta |target-scale| (stretch.go:118-119)
    best = int(np.argmin(delta))
    if delta[best] < abs(target_scale - scale):
        return float(gammas[best])
    return 1.0


class _LazyStretchReplay:
    """Deferred render of the auto-stretch iteration log: the history array,
    iteration count, and convergence flag stay on device until the next log
    flush, so the stretch op itself never synchronizes."""

    def __init__(self, frame_id, target_loc, hist_d, n_iter_d, converged_d):
        self._id = frame_id
        self._target_loc = target_loc
        self._hist = hist_d
        self._n = n_iter_d
        self._conv = converged_d

    def render_deferred(self) -> str:
        import numpy as np

        from nightlight_tpu.deferred import resolve_maybe
        from nightlight_tpu.ops import autostretch as ast

        hist = np.asarray(resolve_maybe(self._hist))
        n_iter = int(resolve_maybe(self._n))
        lines = []
        for i in range(n_iter):
            loc, scale, action, param = (hist[i, ast.H_LOC], hist[i, ast.H_SCALE],
                                         hist[i, ast.H_ACTION], hist[i, ast.H_PARAM])
            line = "%d: Linear location %.2f%% and scale %.2f%%, " % (
                self._id, loc * 100, scale * 100)
            if action == ast.ACT_GAMMA:
                line += "applying gamma %.3g\n" % param
            elif action == ast.ACT_BLACK:
                line += "scaling black to move location to %.2f%%...\n" % (
                    self._target_loc * 100)
            else:
                line += "done\n"
            lines.append(line)
        if not bool(resolve_maybe(self._conv)):
            lines.append("%d: Warning: did not converge after %d iterations\n"
                         % (self._id, 50))
        return "".join(lines)


def stretch_iterative(f: Image, c: Context, target_loc: float, target_scale: float,
                      data, set_data) -> None:
    """Shared iterative auto-stretch (stretch.go:103-159), whole-image or
    single-channel via the `data`/`set_data` pair.

    The entire search loop runs ON DEVICE (ops/autostretch.py) -- up to 50
    estimate/decide/transform rounds in one program -- and the op is
    DISPATCH-ONLY: the per-round history resolves with the next batched log
    flush, where the reference's per-iteration lines are replayed verbatim
    (_LazyStretchReplay). A chain of stretch operators therefore runs as
    back-to-back device programs with zero intermediate round trips.
    """
    import numpy as np

    from nightlight_tpu.deferred import defer
    from nightlight_tpu.ops import autostretch as ast

    out, hist, n_iter, converged = ast.auto_stretch(data, target_loc, target_scale)
    c.logf("%s", _LazyStretchReplay(
        f.id, target_loc, defer(hist, conv=np.asarray),
        defer(n_iter, conv=int), defer(converged, conv=bool)))
    set_data(out)


@register
class OpNormalizeRange(UnaryOperator):
    """Normalize to [0,1] (stretch.go:30-67)."""

    TYPE = "normRange"
    PARAMS = {}

    def apply(self, f: Image, c: Context) -> Image:
        if f.stats is None:
            raise ValueError("missing stats")
        # dispatch-only: min/max stay device scalars, the uniform-intensity
        # branch resolves at log-flush time (deferred.LazyChoice), and the
        # transform selects on device
        import jax.numpy as jnp

        from nightlight_tpu.deferred import LazyChoice, defer

        vmin, vmax = f.stats.device_min_max()
        vmin = jnp.float32(vmin)
        vmax = jnp.float32(vmax)
        uniform = (vmax - vmin) < 1e-8
        c.logf("%s\n", LazyChoice(
            defer(uniform, conv=bool),
            f"{f.id}: Warning: Image is of uniform intensity %.4g, skipping normalization",
            (defer(vmin),),
            f"{f.id}: Normalizing from [%.4g,%.4g] to [0,1]",
            (defer(vmin), defer(vmax))))
        vmax_safe = jnp.where(uniform, vmin + 1.0, vmax)
        f.data = jnp.where(uniform, f.data, pm.normalize(f.data, vmin, vmax_safe))
        f.stats.set_data(f.data)
        return f


@register
class OpStretchIterative(UnaryOperator):
    """Iterative gamma/black-shift auto-stretch (stretch.go:70-159)."""

    TYPE = "stretch"
    PARAMS = {"location": ("location", 0.1), "scale": ("scale", 0.004)}

    def apply(self, f: Image, c: Context) -> Image:
        if self.location == 0 and self.scale == 0:
            return f
        c.logf("%d: Auto-stretching loc to %.2f%% and scale to %.2f%% ...\n",
               f.id, self.location * 100, self.scale * 100)

        def set_data(d):
            f.data = d
            f.stats.set_data(d)

        stretch_iterative(f, c, self.location, self.scale, f.data, set_data)
        return f


@register
class OpMidtones(UnaryOperator):
    """Midtones transfer keyed off location/scale (stretch.go:163-206)."""

    TYPE = "midtones"
    PARAMS = {"mid": ("mid", 0.0), "black": ("black", 1.0)}

    def apply(self, f: Image, c: Context) -> Image:
        if self.mid == 0:
            return f
        c.logf("%d: Applying midtone correction with midtone=%.2f%% x scale and "
               "black=location - %.2f%% x scale\n", f.id, self.mid, self.black)
        # dispatch-only: location/scale stay on device (stats accessors
        # would resolve the deferred pool), log values render at flush
        import jax.numpy as jnp

        loc, scale = f.stats.device_location_scale()
        loc = jnp.float32(loc)
        scale = jnp.float32(scale)
        abs_mid = self.mid * scale
        abs_black = loc - self.black * scale
        c.logf("%d: loc %.2f%% scale %.2f%% absMid %.2f%% absBlack %.2f%%\n",
               f.id, _dlazy(loc, 100), _dlazy(scale, 100),
               _dlazy(abs_mid, 100), _dlazy(abs_black, 100))
        f.data = pm.midtones(f.data, abs_mid, abs_black)
        f.stats.set_data(f.data)
        return f


@register
class OpGamma(UnaryOperator):
    """Plain gamma (stretch.go:210-244)."""

    TYPE = "gamma"
    PARAMS = {"gamma": ("gamma", 1.0)}

    def apply(self, f: Image, c: Context) -> Image:
        if self.gamma == 1.0:
            return f
        c.logf("%d: Applying gamma %.3g\n", f.id, self.gamma)
        f.data = pm.gamma(f.data, self.gamma)
        f.stats.set_data(f.data)
        return f


@register
class OpGammaPP(UnaryOperator):
    """Post-peak partial gamma (stretch.go:247-289)."""

    TYPE = "gammaPP"
    PARAMS = {"gamma": ("gamma", 1.0), "sigma": ("sigma", 1.0)}

    def apply(self, f: Image, c: Context) -> Image:
        if self.gamma == 1.0:
            return f
        import jax.numpy as jnp

        loc, scale = f.stats.device_location_scale()
        from_ = jnp.float32(loc) + self.sigma * jnp.float32(scale)
        to = 1.0
        c.logf("%d: Based on sigma=%.4g, boosting [%.2f%%, %.2f%%] with gamma %.4g...\n",
               f.id, self.sigma, _dlazy(from_, 100), to * 100, self.gamma)
        f.data = pm.partial_gamma(f.data, from_, to, self.gamma)
        f.stats.set_data(f.data)
        return f


@register
class OpScaleBlack(UnaryOperator):
    """Move the black point so the peak lands at a target (stretch.go:293-335)."""

    TYPE = "scaleBlack"
    PARAMS = {"location": ("location", 0.0)}

    def apply(self, f: Image, c: Context) -> Image:
        if self.location == 0:
            return f
        import jax.numpy as jnp

        from nightlight_tpu.deferred import LazyChoice, defer

        loc, scale = f.stats.device_location_scale()
        loc = jnp.float32(loc)
        c.logf("%d: Location %.2f%% and scale %.2f%%: ", f.id,
               _dlazy(loc, 100), _dlazy(scale, 100))
        movable = loc > self.location
        c.logf("%s", LazyChoice(
            defer(movable, conv=bool),
            "scaling black to move location to %.2f%%...\n", (self.location * 100.0,),
            "cannot move to location %.2f%% by scaling black\n", (self.location * 100.0,)))
        f.data = jnp.where(movable,
                           pm.shift_black_to_move(f.data, loc, self.location),
                           f.data)
        f.stats.set_data(f.data)
        return f


@register
class OpGaussianBlur(UnaryOperator):
    """Gaussian blur (stretch.go:339-376)."""

    TYPE = "gaussianBlur"
    PARAMS = {"sigma": ("sigma", 2.0)}

    def apply(self, f: Image, c: Context) -> Image:
        if self.sigma == 0:
            return f
        from nightlight_tpu.ops.gauss import gaussian_blur, gaussian_kernel_1d

        kernel = gaussian_kernel_1d(self.sigma)
        c.logf("%d: Gaussian blur kernel sigma %.2f size %d: %s\n",
               f.id, self.sigma, len(kernel), list(np.round(kernel, 6)))
        f.set_data(gaussian_blur(f.data, self.sigma))
        return f


@register
class OpUnsharpMask(UnaryOperator):
    """Unsharp mask above a noise threshold (stretch.go:380-424)."""

    TYPE = "unsharpMask"
    PARAMS = {"sigma": ("sigma", 1.5), "gain": ("gain", 0.0), "threshold": ("threshold", 1.0)}

    def apply(self, f: Image, c: Context) -> Image:
        if self.sigma == 0 or self.gain == 0:
            return f
        from nightlight_tpu.ops.gauss import gaussian_kernel_1d, unsharp_mask

        import jax.numpy as jnp

        loc, scale = f.stats.device_location_scale()
        abs_thresh = jnp.float32(loc) + jnp.float32(scale) * self.threshold
        c.logf("%d: Unsharp masking with sigma %.3g gain %.3g thresh %.3g absThresh %.3g\n",
               f.id, self.sigma, self.gain, self.threshold, _dlazy(abs_thresh))
        kernel = gaussian_kernel_1d(self.sigma)
        c.logf("%d: Unsharp masking kernel sigma %.2f size %d: %s\n",
               f.id, self.sigma, len(kernel), list(np.round(kernel, 6)))
        vmin, vmax = f.stats.device_min_max()
        f.set_data(unsharp_mask(f.data, self.sigma, self.gain,
                                vmin, vmax, abs_thresh))
        return f
