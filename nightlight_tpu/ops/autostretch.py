"""Iterative auto-stretch as ONE device program.

The reference's auto-stretch (reference: internal/ops/stretch/stretch.go:
103-159) is a host loop: estimate location/scale, pick a gamma or a
black-point shift, apply, repeat (<=50 rounds). Run naively against a
remote accelerator that is up to 50 device fetches -- each a round trip
and a stall-exposure opportunity (BASELINE.md). Here the WHOLE search runs
on device inside one lax.while_loop: per round the sampled sigma-clipped
median/Qn estimator, the closed-form gamma search, the branch decision, and
the full-image transform. A (max_iter, 7) history of per-round
[loc, scale, min, mean, max, action, param] comes back in a single fetch so
the caller can emit the reference's per-iteration log lines verbatim.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from nightlight_tpu.ops.stats import sigma_clipped_median_qn

# history row layout
H_LOC, H_SCALE, H_MIN, H_MEAN, H_MAX, H_ACTION, H_PARAM = range(7)
# action codes
ACT_GAMMA, ACT_BLACK, ACT_DONE_GAMMA, ACT_DONE = 0.0, 1.0, 2.0, 3.0


def _ideal_gamma(loc, scale, target_loc, target_scale):
    """Gamma search in [1, 5] step 0.01 minimizing the post-stretch scale
    error (stretch.go:118-140), as vector math on device.

    Faithful Go quirk: when loc < scale, `math.Pow(loc-scale, 1/gamma)` is
    NaN for every candidate, and Go's `math.Max(0, NaN)` KEEPS the NaN
    (stretch.go:124,131), so every candidate delta is NaN, no candidate
    ever beats the baseline, and the search returns gamma 1 — i.e. the
    stretch declares itself done on images whose scale exceeds their
    location. jnp.power/jnp.maximum propagate NaN the same way, so the
    delta[best] < baseline comparison below is False exactly as in Go."""
    gammas = jnp.arange(1.0, 5.0 + 1e-9, 0.01, jnp.float32)
    exponent = 1.0 / gammas
    new_loc_lower = jnp.power(loc - scale, exponent)
    new_loc = jnp.power(loc, exponent)
    new_loc_upper = jnp.power(loc + scale, exponent)
    black = (target_loc - new_loc) / (target_loc - 1.0)
    s = 1.0 / (1.0 - black)
    lower = jnp.maximum(0.0, (new_loc_lower - black) * s)
    upper = jnp.maximum(0.0, (new_loc_upper - black) * s)
    delta = jnp.abs(target_scale - (upper - lower) / 2.0)
    best = jnp.argmin(delta)
    return jnp.where(delta[best] < jnp.abs(target_scale - scale),
                     gammas[best], 1.0)


def stretch_decision(loc, scale, target_loc, target_scale):
    """One round of the reference's stretch branch logic
    (stretch.go:117-155): returns (action, param) where action is one of
    the ACT_* codes and param is the gamma (ACT_GAMMA) or the location the
    black shift moves to target (ACT_BLACK). Pure function of the four
    scalars — unit-tested against a Go-faithful oracle in
    tests/test_go_oracles.py."""
    gamma = _ideal_gamma(loc, scale, target_loc, target_scale)
    cond1 = (loc <= target_loc * 1.01) & (scale < target_scale)
    cond2 = jnp.logical_not(cond1) & (loc > target_loc * 0.99) \
        & (scale < target_scale)
    action = jnp.where(cond1 & (gamma > 1.01), ACT_GAMMA,
                       jnp.where(cond1, ACT_DONE_GAMMA,
                                 jnp.where(cond2, ACT_BLACK, ACT_DONE)))
    param = jnp.where(action == ACT_GAMMA, gamma,
                      jnp.where(action == ACT_BLACK, loc, 0.0))
    return action, param


@partial(jax.jit, static_argnames=("max_iter",))
def auto_stretch(data: jax.Array, target_loc, target_scale, max_iter: int = 50):
    """Run the full iterative stretch on device.

    Returns (stretched, history, n_iter, converged):
      history: (max_iter, 7) float32, rows past n_iter are NaN
      converged: False means the loop performed max_iter transforms and
        still wanted to continue (the reference's 50-iteration warning).
    """
    target_loc = jnp.float32(target_loc)
    target_scale = jnp.float32(target_scale)

    def body(state):
        d, hist, i, _running = state
        flat = d.reshape(-1)
        mn = jnp.min(flat)
        mx = jnp.max(flat)
        me = jnp.mean(flat)
        loc, scale = sigma_clipped_median_qn(
            flat, 2.0, 2.0, (mx - mn) / 65535.0, jax.random.PRNGKey(0))
        action, param = stretch_decision(loc, scale, target_loc, target_scale)
        gamma = param  # ACT_GAMMA rounds carry the gamma in param
        hist = hist.at[i].set(jnp.stack([loc, scale, mn, me, mx, action, param]))

        # black point such that `loc` maps to target_loc (pixelops.go:649-660)
        black = (target_loc - loc) / (target_loc - 1.0)
        bscale = 1.0 / (1.0 - black)

        def apply_gamma(x):
            return jnp.power(x, 1.0 / gamma)

        def apply_black(x):
            return jnp.maximum(0.0, (x - black) * bscale)

        new_d = jax.lax.cond(
            action == ACT_GAMMA, apply_gamma,
            lambda x: jax.lax.cond(action == ACT_BLACK, apply_black,
                                   lambda y: y, x),
            d)
        still = (action == ACT_GAMMA) | (action == ACT_BLACK)
        return new_d, hist, i + 1, still

    def cond(state):
        _, _, i, running = state
        return jnp.logical_and(running, i < max_iter)

    hist0 = jnp.full((max_iter, 7), jnp.nan, jnp.float32)
    out, hist, n_iter, running = jax.lax.while_loop(
        cond, body, (data, hist0, 0, jnp.bool_(True)))
    return out, hist, n_iter, jnp.logical_not(running)
