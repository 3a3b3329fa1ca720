"""Goal-seek sigma bounds: find clip sigmas that hit target clip percentages.

The reference ships this feature fully commented out (reference:
internal/ops/stack/stackfindsigma.go -- dead code behind the documented
-stSigLow/-stSigHigh = -1 flags). It is revived here because the Pallas
stacking kernel makes repeated stacking passes cheap: a dual binary search
over (sigma_low, sigma_high) converges in ~15 stack evaluations, each of
which is memory-bound milliseconds on TPU.
"""

from __future__ import annotations

from nightlight_tpu.ops import stack as stk


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

    total = frames.size

    def realized(sig_lo, sig_hi):
        out, cl, ch = stk.stack(frames, mode, weights=weights,
                                sigma_low=sig_lo, sigma_high=sig_hi,
                                ref_frame_loc=ref_frame_loc)
        perc_l = float(cl) * 100.0 / total
        perc_h = float(ch) * 100.0 / total
        return out, cl, ch, perc_l, perc_h

    lo_left, lo_right = 1.0, 11.0
    hi_left, hi_right = 1.0, 11.0
    lo_mid = 0.5 * (lo_left + lo_right)
    hi_mid = 0.5 * (hi_left + hi_right)

    for i in range(max_iter + 1):
        if log:
            log.write(f"Step {i}: stSigLow {lo_mid:.2f} stSigHigh {hi_mid:.2f}\n")
        out, cl, ch, perc_l, perc_h = realized(lo_mid, hi_mid)
        delta_l = int(100 * perc_l + 0.5) - int(100 * clip_perc_low)
        delta_h = int(100 * perc_h + 0.5) - int(100 * clip_perc_high)
        if (delta_l == 0 and delta_h == 0) or i >= max_iter:
            if log:
                if delta_l == 0 and delta_h == 0:
                    log.write(f"Reached {clip_perc_low:.2f}% and {clip_perc_high:.2f}% clipping. "
                              f"Settings are -stSigLow {lo_mid:.3f} -stSigHigh {hi_mid:.3f}\n")
                else:
                    log.write(f"Warning: Binary search did not converge, proceeding with "
                              f"last approximation {lo_mid:.2f} and {hi_mid:.2f}\n")
            return out, cl, ch, lo_mid, hi_mid
        # more clipping than target -> raise sigma (clip less); and vice versa
        if delta_l > 0:
            lo_left = lo_mid
        elif delta_l < 0:
            lo_right = lo_mid
        lo_mid = 0.5 * (lo_left + lo_right)
        if delta_h > 0:
            hi_left = hi_mid
        elif delta_h < 0:
            hi_right = hi_mid
        hi_mid = 0.5 * (hi_left + hi_right)
    raise AssertionError("unreachable")
