"""Goal-seek sigma bounds: find clip sigmas that hit target clip percentages.

The reference ships this feature fully commented out (reference:
internal/ops/stack/stackfindsigma.go -- dead code behind the documented
-stSigLow/-stSigHigh = -1 flags). It is revived here because the Pallas
stacking kernel makes repeated stacking passes cheap: a dual binary search
over (sigma_low, sigma_high) converges in ~15 stack evaluations, each of
which is memory-bound milliseconds on TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from nightlight_tpu.ops import stack as stk


@partial(jax.jit, static_argnames=("mode", "max_iter", "target_l", "target_h"))
def _search_device(frames, weights, ref_frame_loc, target_l: int, target_h: int,
                   mode: int, max_iter: int):
    """The full dual binary search as ONE device program: each round is a
    complete stack evaluation (the Pallas kernel on TPU) plus the bracket
    update; the per-round history [sig_lo, sig_hi, clip_lo, clip_hi] comes
    back in a single fetch. Semantics of binarySearchAndStack
    (stackfindsigma.go:49-100): brackets [1, 11], midpoint start, converge
    when round(100*perc) hits round(100*target) on both sides."""
    total = frames.size
    p = frames[0].size

    def body(state):
        lo_l, lo_r, hi_l, hi_r, out, hist, clips, i, _running = state
        lo_m = 0.5 * (lo_l + lo_r)
        hi_m = 0.5 * (hi_l + hi_r)
        out, cl, ch = stk.stack(frames, stk.StackMode(mode), weights=weights,
                                sigma_low=lo_m, sigma_high=hi_m,
                                ref_frame_loc=ref_frame_loc)
        perc_l = cl.astype(jnp.float32) * 100.0 / total
        perc_h = ch.astype(jnp.float32) * 100.0 / total
        delta_l = jnp.floor(100.0 * perc_l + 0.5).astype(jnp.int32) - target_l
        delta_h = jnp.floor(100.0 * perc_h + 0.5).astype(jnp.int32) - target_h
        hist = hist.at[i].set(jnp.stack([lo_m, hi_m]))
        clips = clips.at[i].set(jnp.stack([cl.astype(jnp.int32), ch.astype(jnp.int32)]))
        converged = (delta_l == 0) & (delta_h == 0)
        # more clipping than target -> raise sigma (clip less); vice versa
        lo_l = jnp.where(delta_l > 0, lo_m, lo_l)
        lo_r = jnp.where(delta_l < 0, lo_m, lo_r)
        hi_l = jnp.where(delta_h > 0, hi_m, hi_l)
        hi_r = jnp.where(delta_h < 0, hi_m, hi_r)
        running = jnp.logical_not(converged) & (i < max_iter)
        return lo_l, lo_r, hi_l, hi_r, out.reshape(-1)[:p], hist, clips, i + 1, running

    def cond(state):
        return state[-1]

    hist0 = jnp.full((max_iter + 1, 2), jnp.nan, jnp.float32)
    clips0 = jnp.zeros((max_iter + 1, 2), jnp.int32)
    out0 = jnp.zeros((p,), jnp.float32)
    state = (jnp.float32(1.0), jnp.float32(11.0), jnp.float32(1.0), jnp.float32(11.0),
             out0, hist0, clips0, 0, jnp.bool_(True))
    _, _, _, _, out, hist, clips, n_iter, _ = jax.lax.while_loop(cond, body, state)
    return out.reshape(frames.shape[1:]), hist, clips, n_iter


def find_sigmas_and_stack(frames, mode: stk.StackMode, weights=None,
                          ref_frame_loc: float = 0.0,
                          clip_perc_low: float = 0.5, clip_perc_high: float = 0.5,
                          max_iter: int = 20, log=None):
    """Binary-search sigma_low/sigma_high until the realized clip percentages
    match the targets (to 0.01%), then return that stack.

    Returns (stacked, clip_lo, clip_hi, sigma_low, sigma_high).
    Matches the intended semantics of binarySearchAndStack
    (stackfindsigma.go:49-100); modes without sigmas fall through to a plain
    stack.
    """
    if mode == stk.StackMode.Auto:
        mode = stk.auto_select_mode(frames.shape[0])
    if mode not in (stk.StackMode.Sigma, stk.StackMode.WinsorSigma, stk.StackMode.LinearFit):
        out, cl, ch = stk.stack(frames, mode, weights=weights, ref_frame_loc=ref_frame_loc)
        return out, cl, ch, 0.0, 0.0

    import numpy as np

    total = frames.size
    out, hist, clips, n_iter = _search_device(
        frames, weights, jnp.float32(ref_frame_loc),
        int(100 * clip_perc_low), int(100 * clip_perc_high),
        int(mode), max_iter)
    # two device fetches for the whole search: the float sigma history and
    # the int32 clip counts (NOT bitcast through float32 -- counts < 2^23
    # land on denormals, which the TPU flushes to zero in transit)
    hist = np.asarray(hist)
    clip_hist = np.asarray(clips)
    n_iter = int(n_iter)

    for i in range(n_iter):
        lo_mid, hi_mid = float(hist[i, 0]), float(hist[i, 1])
        if log:
            log.write(f"Step {i}: stSigLow {lo_mid:.2f} stSigHigh {hi_mid:.2f}\n")
    cl, ch = int(clip_hist[n_iter - 1, 0]), int(clip_hist[n_iter - 1, 1])
    lo_mid, hi_mid = float(hist[n_iter - 1, 0]), float(hist[n_iter - 1, 1])
    delta_l = int(100.0 * cl * 100.0 / total + 0.5) - int(100 * clip_perc_low)
    delta_h = int(100.0 * ch * 100.0 / total + 0.5) - int(100 * clip_perc_high)
    if log:
        if delta_l == 0 and delta_h == 0:
            log.write(f"Reached {clip_perc_low:.2f}% and {clip_perc_high:.2f}% clipping. "
                      f"Settings are -stSigLow {lo_mid:.3f} -stSigHigh {hi_mid:.3f}\n")
        else:
            log.write(f"Warning: Binary search did not converge, proceeding with "
                      f"last approximation {lo_mid:.2f} and {hi_mid:.2f}\n")
    return out, cl, ch, lo_mid, hi_mid
