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

# Pixel stride for the search-phase subsample and the minimum GLOBAL sample
# count (frames x pixels, whole image -- the host gates on it, so sharded
# and unsharded runs of the same data make the same decision) before it
# engages. At 0.5% clip targets and >= (1<<22)/17 x n_frames samples the
# percentage estimate's standard error is well under the 0.01% rounding
# grid of the convergence test. The stride is 17, NOT a power of two: image
# widths are typically multiples of 16, and an aligned stride would sample
# whole columns -- biased under the column banding ops/deband exists for.
_SEARCH_STRIDE = 17
_SEARCH_SUBSAMPLE_MIN = 1 << 22


def _search_subsample(frames, total):
    """(subsampled frames, subsample total) for the search rounds. The
    caller decides WHETHER to subsample (global-size gate in
    find_sigmas_and_stack); this only refuses degenerate slices."""
    p = frames[0].size
    if p < 4 * _SEARCH_STRIDE:
        return frames, total
    flat = frames.reshape(frames.shape[0], -1)
    sub = flat[:, ::_SEARCH_STRIDE]
    return sub, total * (sub.size / flat.size)


def _finalize_search(frames, weights, ref_frame_loc, mode, hist, clips, n_iter,
                     axis_name, use_pallas):
    """One full-resolution stack at the accepted sigmas: produces the output
    image and the EXACT clip counts, which replace the final history entry
    (the host-side convergence check and the 'Clipped low/high' log line
    read that entry against the full total).

    When the search itself ran at full resolution this re-evaluates the
    final round's stack once more -- accepted: it keeps the search loops
    free of a carried (p,)-sized output either way, and the paths that
    search full-res are small images (an extra eval is sub-ms) or the rare
    off-target retry."""
    sig = hist[jnp.maximum(n_iter - 1, 0)]
    out, cl, ch = stk.stack(frames, stk.StackMode(mode), weights=weights,
                            sigma_low=sig[0], sigma_high=sig[1],
                            ref_frame_loc=ref_frame_loc,
                            use_pallas=use_pallas)
    if axis_name is not None:
        cl = jax.lax.psum(cl, axis_name)
        ch = jax.lax.psum(ch, axis_name)
    clips = clips.at[jnp.maximum(n_iter - 1, 0)].set(
        jnp.stack([cl.astype(jnp.int32), ch.astype(jnp.int32)]))
    return out, hist, clips, n_iter


@partial(jax.jit, static_argnames=("mode", "max_iter", "target_l", "target_h",
                                   "axis_name", "use_pallas", "subsample"))
def _search_device(frames, weights, ref_frame_loc, target_l: int, target_h: int,
                   mode: int, max_iter: int, axis_name: str | None = None,
                   use_pallas: bool | None = None, total=None,
                   subsample: bool = True):
    """The full dual binary search as ONE device program: each round is a
    complete stack evaluation (the Pallas kernel on TPU) plus the bracket
    update; the per-round history [sig_lo, sig_hi, clip_lo, clip_hi] comes
    back in a single fetch. Semantics of binarySearchAndStack
    (stackfindsigma.go:49-100): brackets [1, 11], midpoint start, converge
    when round(100*perc) hits round(100*target) on both sides.

    With axis_name set, the function runs as a shard_map body over a
    row-sharded frame block: per-shard clip counts psum over the mesh, so
    every shard makes IDENTICAL bracket decisions and the while_loops stay
    in lockstep. `total` is then the GLOBAL sample count (frames.size is
    the local block here).

    Search rounds only need clip PERCENTAGES, so at 16MP-class sizes they
    evaluate a 1/16 strided pixel subsample (0.5% of 12.6M samples has a
    ~0.002% standard error against the 0.01% decision grid); ONE full
    stack at the accepted sigmas then produces the output and the exact
    clip counts stored in the final history entry. Small inputs search at
    full resolution, where the estimate equals the count exactly."""
    if total is None:
        total = frames.size
    sub, sub_total = (_search_subsample(frames, total) if subsample
                      else (frames, total))

    def body(state):
        lo_l, lo_r, hi_l, hi_r, hist, clips, i, _running = state
        lo_m = 0.5 * (lo_l + lo_r)
        hi_m = 0.5 * (hi_l + hi_r)
        _, cl, ch = stk.stack(sub, stk.StackMode(mode), weights=weights,
                              sigma_low=lo_m, sigma_high=hi_m,
                              ref_frame_loc=ref_frame_loc,
                              use_pallas=use_pallas)
        if axis_name is not None:
            cl = jax.lax.psum(cl, axis_name)
            ch = jax.lax.psum(ch, axis_name)
        perc_l = cl.astype(jnp.float32) * 100.0 / sub_total
        perc_h = ch.astype(jnp.float32) * 100.0 / sub_total
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
        return lo_l, lo_r, hi_l, hi_r, hist, clips, i + 1, running

    def cond(state):
        return state[-1]

    hist0 = jnp.full((max_iter + 1, 2), jnp.nan, jnp.float32)
    clips0 = jnp.zeros((max_iter + 1, 2), jnp.int32)
    state = (jnp.float32(1.0), jnp.float32(11.0), jnp.float32(1.0), jnp.float32(11.0),
             hist0, clips0, 0, jnp.bool_(True))
    _, _, _, _, hist, clips, n_iter, _ = jax.lax.while_loop(cond, body, state)
    return _finalize_search(frames, weights, ref_frame_loc, mode, hist, clips,
                            n_iter, axis_name, use_pallas)


@partial(jax.jit, static_argnames=("mode", "max_iter", "target_l", "target_h",
                                   "axis_name", "use_pallas", "subsample"))
def _newton_search_device(frames, weights, ref_frame_loc, target_l: int, target_h: int,
                          mode: int, max_iter: int, axis_name: str | None = None,
                          use_pallas: bool | None = None, total=None,
                          subsample: bool = True):
    """Newton goal-seek for linear-fit stacking, as ONE device program.

    The dual binary search assumes each sigma bound only moves its own clip
    count; linear fit re-fits the line after every clip, so changing one
    bound shifts the other side's counts and the brackets never settle. The
    reference's (dead-code) newtonMethodAndStack estimates d(clip%)/d(sigma)
    with an epsilon probe per side and jointly updates both
    (stackfindsigma.go:101-169; its high side compares against the LOW
    target -- a dead-code slip we correct by using the high target).
    Three stack evaluations per round, all Pallas kernels on TPU.
    Sharded-run semantics of axis_name/total -- and the search-phase pixel
    subsample with an exact full-resolution finalization -- as in
    _search_device.
    """
    if total is None:
        total = frames.size
    eps = jnp.float32(0.005)
    sub, sub_total = (_search_subsample(frames, total) if subsample
                      else (frames, total))

    def clips_at(sig_lo, sig_hi):
        out, cl, ch = stk.stack(sub, stk.StackMode(mode), weights=weights,
                                sigma_low=sig_lo, sigma_high=sig_hi,
                                ref_frame_loc=ref_frame_loc,
                                use_pallas=use_pallas)
        if axis_name is not None:
            cl = jax.lax.psum(cl, axis_name)
            ch = jax.lax.psum(ch, axis_name)
        return out, cl.astype(jnp.float32), ch.astype(jnp.float32)

    def body(state):
        sl, sh, hist, clips, i, _running = state
        _, cl, ch = clips_at(sl, sh)
        perc_l = cl * 100.0 / sub_total
        perc_h = ch * 100.0 / sub_total
        delta_l = perc_l - target_l / 100.0
        delta_h = perc_h - target_h / 100.0
        d_li = jnp.floor(100.0 * delta_l + 0.5).astype(jnp.int32)
        d_hi = jnp.floor(100.0 * delta_h + 0.5).astype(jnp.int32)
        hist = hist.at[i].set(jnp.stack([sl, sh]))
        clips = clips.at[i].set(jnp.stack([cl.astype(jnp.int32), ch.astype(jnp.int32)]))
        converged = (d_li == 0) & (d_hi == 0)
        # epsilon probes (evaluated unconditionally; XLA runs the loop body
        # as one fused program either way, and the kernels are milliseconds)
        _, cl2, _ = clips_at(sl + eps, sh)
        _, _, ch3 = clips_at(sl, sh + eps)
        d_l_diff = (cl2 - cl) * 100.0 / sub_total / eps
        d_h_diff = (ch3 - ch) * 100.0 / sub_total / eps
        stuck = (d_l_diff == 0.0) | (d_h_diff == 0.0)
        new_sl = jnp.clip(sl - delta_l / jnp.where(d_l_diff == 0.0, 1.0, d_l_diff), 0.1, 20.0)
        new_sh = jnp.clip(sh - delta_h / jnp.where(d_h_diff == 0.0, 1.0, d_h_diff), 0.1, 20.0)
        running = jnp.logical_not(converged | stuck) & (i < max_iter)
        return (jnp.where(running, new_sl, sl), jnp.where(running, new_sh, sh),
                hist, clips, i + 1, running)

    hist0 = jnp.full((max_iter + 1, 2), jnp.nan, jnp.float32)
    clips0 = jnp.zeros((max_iter + 1, 2), jnp.int32)
    state = (jnp.float32(6.0), jnp.float32(6.0), hist0, clips0, 0, jnp.bool_(True))
    _, _, hist, clips, n_iter, _ = jax.lax.while_loop(
        lambda s: s[-1], body, state)
    return _finalize_search(frames, weights, ref_frame_loc, mode, hist, clips,
                            n_iter, axis_name, use_pallas)


def _sharded_search(search, frames, weights, ref_frame_loc, target_l, target_h,
                    mode, max_iter, mesh, axis, use_pallas, subsample=True):
    """Run a goal-seek search row-sharded over the mesh: each shard executes
    the search on its local block (Pallas kernels where enabled) with the
    clip counts psum'd, so the bracket/Newton decisions -- and thus the
    iteration counts -- are identical on every shard. hist/clips/n_iter are
    replicated outputs; the stacked result stays row-sharded."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    total = jnp.float32(frames.size)

    def local(fl, w):
        return search(fl, w, ref_frame_loc, target_l, target_h, mode, max_iter,
                      axis_name=axis, use_pallas=use_pallas, total=total,
                      subsample=subsample)

    out_specs = (P(axis, *([None] * (frames.ndim - 2))), P(), P(), P())
    frame_spec = P(None, axis, *([None] * (frames.ndim - 2)))
    if weights is None:
        return shard_map(lambda fl: local(fl, None), mesh=mesh,
                         in_specs=(frame_spec,), out_specs=out_specs,
                         check_vma=False)(frames)
    return shard_map(local, mesh=mesh,
                     in_specs=(frame_spec, P()), out_specs=out_specs,
                     check_vma=False)(frames, weights)


def find_sigmas_and_stack(frames, mode: stk.StackMode, weights=None,
                          ref_frame_loc: float = 0.0,
                          clip_perc_low: float = 0.5, clip_perc_high: float = 0.5,
                          max_iter: int = 20, log=None, mesh=None, axis: str = "pix",
                          use_pallas: bool | None = None):
    """Goal-seek sigma_low/sigma_high until the realized clip percentages
    match the targets (to 0.01%), then return that stack.

    Returns (stacked, clip_lo, clip_hi, sigma_low, sigma_high).
    Sigma/winsorized modes use the dual binary search of
    binarySearchAndStack (stackfindsigma.go:49-100); linear fit uses the
    Newton joint update (newtonMethodAndStack, stackfindsigma.go:101-169)
    because its per-clip re-fit couples the two bounds and breaks the
    brackets. Modes without sigmas fall through to a plain stack.

    With `mesh` set the whole search runs row-sharded (shard_map with
    psum'd clip counts -- see _sharded_search); this keeps the Pallas
    kernels usable under SPMD.
    """
    if mode == stk.StackMode.Auto:
        mode = stk.auto_select_mode(frames.shape[0])
    shardable = (mesh is not None and frames.ndim >= 3
                 and frames.shape[1] % int(mesh.devices.size) == 0)
    if mode not in (stk.StackMode.Sigma, stk.StackMode.WinsorSigma, stk.StackMode.LinearFit):
        out, cl, ch = stk.stack(frames, mode, weights=weights, ref_frame_loc=ref_frame_loc,
                                mesh=mesh if shardable else None, axis=axis,
                                use_pallas=use_pallas)
        return out, cl, ch, 0.0, 0.0

    import numpy as np

    total = frames.size

    def run(search, subsample=True):
        # gate on the GLOBAL pixel count here (not on the per-shard block
        # inside shard_map) so sharded and unsharded runs of the same data
        # subsample identically and the off-target retry guard below sees
        # the decision that was actually made
        subsample = subsample and frames[0].size >= _SEARCH_SUBSAMPLE_MIN
        if shardable:
            return _sharded_search(
                search, frames, weights, jnp.float32(ref_frame_loc),
                int(100 * clip_perc_low), int(100 * clip_perc_high),
                int(mode), max_iter, mesh, axis, use_pallas,
                subsample=subsample)
        return search(
            frames, weights, jnp.float32(ref_frame_loc),
            int(100 * clip_perc_low), int(100 * clip_perc_high),
            int(mode), max_iter, use_pallas=use_pallas, subsample=subsample)

    def final_deltas(clips, n_iter):
        clips_host = np.asarray(clips)
        n_it = int(n_iter)
        cl0, ch0 = int(clips_host[n_it - 1, 0]), int(clips_host[n_it - 1, 1])
        d_l = int(100.0 * cl0 * 100.0 / total + 0.5) - int(100 * clip_perc_low)
        d_h = int(100.0 * ch0 * 100.0 / total + 0.5) - int(100 * clip_perc_high)
        return d_l, d_h

    search = (_newton_search_device if mode == stk.StackMode.LinearFit
              else _search_device)
    out, hist, clips, n_iter = run(search)
    if mode == stk.StackMode.LinearFit:
        # Newton aborts wherever the epsilon probe moves zero samples (flat
        # derivative -- e.g. no clipping at all at the 6.0 start point, the
        # reference's give-up rule). The dual binary search still makes
        # progress there by walking the bracket, so fall back when Newton
        # exits off-target. (Improvement over the reference's dead code,
        # which just returns the last approximation.)
        d_l, d_h = final_deltas(clips, n_iter)
        if d_l != 0 or d_h != 0:
            if log:
                log.write("Newton method off target, retrying with binary search\n")
            search = _search_device
            out, hist, clips, n_iter = run(search)

    # The subsampled search converges on estimated percentages; the exact
    # full-resolution counts (finalization pass) can land one 0.01% grid
    # step off when the estimate sat near a rounding boundary. Repeat the
    # search at full resolution in that case -- the common case stays 16x
    # cheaper, the rare miss pays one extra search.
    if frames[0].size >= _SEARCH_SUBSAMPLE_MIN:
        d_l, d_h = final_deltas(clips, n_iter)
        if d_l != 0 or d_h != 0:
            if log:
                log.write("Subsampled goal-seek off target, "
                          "repeating at full resolution\n")
            out, hist, clips, n_iter = run(search, subsample=False)
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
            method = ("Newton method" if mode == stk.StackMode.LinearFit
                      else "Binary search")
            log.write(f"Warning: {method} did not converge, proceeding with "
                      f"last approximation {lo_mid:.2f} and {hi_mid:.2f}\n")
    return out, cl, ch, lo_mid, hi_mid
