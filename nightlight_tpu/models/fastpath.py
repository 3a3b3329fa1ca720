"""Fused frame-batch preprocessing: the TPU-first execution model.

The operator pipeline dispatches per frame (load -> badPixel -> stats ->
starDetect as separate device calls); on tunneled TPU setups each dispatch
and scalar sync pays a host round trip that dwarfs the math. This module
runs the same preprocessing for a WHOLE frame batch as one jitted program
over the (N, H, W) axis -- bad-pixel repair, histogram statistics, star
detection, and histogram matching -- returning all per-frame results in a
single device sync.

Semantically equivalent to the per-frame operators (same kernels underneath,
just vmapped/stacked); cross-checked by tests/test_fastpath.py.

Measured on v5e-1 (24x16MP): 3.6s/frame fused vs ~2s/frame for the
per-frame operator path -- under vmap the data-dependent while_loops
(overlap filter, sigma-clip) run worst-case iterations for the whole batch,
outweighing the dispatch savings on this setup. Kept as the building block
for dispatch-bound hosts; the operator pipeline remains the default.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from nightlight_tpu.detect.stars import MAX_CANDIDATES, StarList, _find_stars_device
from nightlight_tpu.ops.prestack import bad_pixel_repair
from nightlight_tpu.ops.stats import min_mean_max, sigma_clipped_median_qn


@partial(jax.jit, static_argnames=("radius", "max_candidates"))
def _preprocess_batch_device(frames, bp_sigma_low, bp_sigma_high,
                             star_sig, star_bp_sig, star_in_out,
                             radius: int, max_candidates: int):
    """One device program for the whole batch. frames: (N, H, W)."""

    def per_frame(img):
        repaired, n_bad, diff_std = bad_pixel_repair(img, bp_sigma_low, bp_sigma_high)
        flat = repaired.reshape(-1)
        mn, me, mx = min_mean_max(flat)
        loc, scale = sigma_clipped_median_qn(
            flat, 2.0, 2.0, (mx - mn) / 65535.0, jax.random.PRNGKey(0))
        x, y, value, mass, hfr, num, avg_hfr = _find_stars_device(
            repaired, loc, scale, star_sig, star_bp_sig, star_in_out,
            radius, diff_std, max_candidates)
        scalars = jnp.stack([n_bad.astype(jnp.float32), diff_std, mn, me, mx,
                             loc, scale, num.astype(jnp.float32), avg_hfr])
        stars = jnp.stack([x, y, value, mass, hfr])
        return repaired, scalars, stars

    return jax.vmap(per_frame)(frames)


def preprocess_batch(frames, bp_sigma_low: float = 3.0, bp_sigma_high: float = 5.0,
                     star_sig: float = 15.0, star_bp_sig: float = 5.0,
                     star_in_out: float = 1.4, radius: int = 16,
                     max_candidates: int = MAX_CANDIDATES):
    """Preprocess an (N, H, W) frame batch in one dispatch + one sync.

    Returns (repaired (N,H,W) device array, list of per-frame dicts with
    n_bad/min/mean/max/location/scale, list of StarList, list of avg HFR).
    """
    repaired, scalars, stars = _preprocess_batch_device(
        jnp.asarray(frames), jnp.float32(bp_sigma_low), jnp.float32(bp_sigma_high),
        jnp.float32(star_sig), jnp.float32(star_bp_sig), jnp.float32(star_in_out),
        int(radius), int(max_candidates))
    scalars_np = np.asarray(scalars)   # (N, 9) -- one transfer
    stars_np = np.asarray(stars)       # (N, 5, K) -- one transfer

    metas = []
    star_lists = []
    hfrs = []
    for i in range(scalars_np.shape[0]):
        n_bad, diff_std, mn, me, mx, loc, scale, num, avg_hfr = scalars_np[i]
        metas.append({
            "n_bad": int(n_bad), "median_diff_std": float(diff_std),
            "min": float(mn), "mean": float(me), "max": float(mx),
            "location": float(loc), "scale": float(scale),
        })
        n = int(num)
        star_lists.append(StarList(
            x=stars_np[i, 0, :n], y=stars_np[i, 1, :n], value=stars_np[i, 2, :n],
            mass=stars_np[i, 3, :n], hfr=stars_np[i, 4, :n], count=n))
        hfrs.append(float(avg_hfr))
    return repaired, metas, star_lists, hfrs


@jax.jit
def match_histograms_batch(frames, locs, scales, ref_loc, ref_scale):
    """Per-frame linear histogram match for the whole batch in one program
    (pixelops.go:601-611 over the frame axis)."""
    mult = (ref_scale / scales)[:, None, None]
    off = (ref_loc - locs * (ref_scale / scales))[:, None, None]
    return frames * mult + off
