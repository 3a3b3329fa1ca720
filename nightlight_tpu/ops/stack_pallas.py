"""Pallas TPU kernel for sigma-clip / winsorized stacking.

The XLA path (ops/stack.py) re-materializes the (frames x pixels) block in
HBM on every clip iteration. This kernel keeps one (frames x TILE) block
resident in VMEM for the whole per-pixel iteration:

* grid over pixel tiles; each step DMAs its (N_pad, TILE) block once
* the frame axis is sorted with an UNROLLED Batcher ODD-EVEN MERGE
  NETWORK of vector min/max on (TILE,)-lane rows -- the VPU analog of the
  reference's per-pixel quickselect (stack.go:404), with NaNs pushed to
  the end
* the clip loop runs as a lax.while_loop whose body is pure row-wise
  masked reductions (sum/median-select/count) over the VMEM block --
  no HBM traffic until the final tile store
* per-pixel state (range bounds, running mask, result) lives in vector
  registers; clip totals accumulate per tile and are summed by the caller

Semantics are identical to ops.stack.stack_sigma / stack_winsor_sigma
(which mirror stack.go:372-436, 611-705); tests cross-validate the two
paths bit-for-acceptable-float-difference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38
TILE = 2048  # lanes per grid step; multiple of 128

# Interpreter mode for CPU-only environments (tests); the compiled Mosaic
# path requires real TPU hardware.
import os as _os

INTERPRET = _os.environ.get("NIGHTLIGHT_PALLAS_INTERPRET", "") == "1"


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _tile_for(n_pad: int) -> int:
    """Lanes per grid step, scaled down for large frame counts: the kernel
    keeps ~6 live (n_pad, tile) f32 copies (masked rows, sorted rows,
    weights/ranks, prefix sums) in VMEM, and the scoped budget is 16MB --
    a 256-frame batch at the full 2048-lane tile needs ~20MB and fails to
    compile ("Ran out of memory in memory space vmem")."""
    budget = 10 * (1 << 20)
    t = budget // (n_pad * 4 * 8)  # 8 covers the weighted variants' extra rows
    return min(TILE, max(128, t // 128 * 128))


def _oddeven_pairs(n: int) -> list:
    """Batcher odd-even mergesort compare-exchange schedule for n a power
    of two, every exchange ascending (min to the lower index). ~19% fewer
    exchanges than the bitonic network (543 vs 672 at n=64, 63 vs 80 at
    n=16), which is pure VPU savings since each exchange is a vector
    min+max. Classic recursion (Batcher 1968)."""
    pairs: list = []

    def merge(lo: int, m: int, r: int) -> None:
        step = r * 2
        if step < m:
            merge(lo, m, step)
            merge(lo + r, m, step)
            pairs.extend((i, i + r) for i in range(lo + r, lo + m - r, step))
        else:
            pairs.append((lo, lo + r))

    def sort(lo: int, m: int) -> None:
        if m > 1:
            half = m // 2
            sort(lo, half)
            sort(lo + half, half)
            merge(lo, m, 1)

    sort(0, n)
    return pairs


def _sortnet_rows(rows: list, n_real: int | None = None):
    """Sort a list of (TILE,)-shaped rows ascending with a static Batcher
    odd-even merge network (_oddeven_pairs). Returns the sorted list.

    `n_real` marks the leading rows that carry data; trailing rows are the
    all-+BIG padding to the pow2 network size. Compare-exchanges touching a
    known-padded row have a statically determined outcome (min -> the real
    row unchanged -- its own +BIG lanes compare equal -- max -> the padding
    row), so they become trace-time list moves instead of vector ops: the
    network cost tracks n_real, not the pow2 padding."""
    n = len(rows)
    is_pad = [i >= (n if n_real is None else n_real) for i in range(n)]
    for i, l in _oddeven_pairs(n):
        if is_pad[i] and is_pad[l]:
            continue
        if is_pad[i] or is_pad[l]:
            real = rows[l] if is_pad[i] else rows[i]
            pad = rows[i] if is_pad[i] else rows[l]
            rows[i], rows[l] = real, pad
            is_pad[i], is_pad[l] = False, True
            continue
        a, b = rows[i], rows[l]
        rows[i], rows[l] = jnp.minimum(a, b), jnp.maximum(a, b)
    return rows


def _sortnet_rows_kv(keys: list, vals: list, n_real: int | None = None):
    """Key-value sort on the same odd-even merge network: vals follow the
    key comparisons (used to keep per-frame weights aligned with their
    sorted samples). Same static padding-row pruning as _sortnet_rows.

    Tie handling: a +BIG key lane can belong to a real row (a masked-out
    sample). Its attached value is never read downstream -- every consumer
    selects by rank strictly inside the valid range -- so the pruned moves
    (which keep the real row's values with its keys) and the vector path
    (where(swap, ...) can keep the padding row's value at an equal-key
    lane) are interchangeable."""
    n = len(keys)
    is_pad = [i >= (n if n_real is None else n_real) for i in range(n)]
    for i, l in _oddeven_pairs(n):
        if is_pad[i] and is_pad[l]:
            continue
        if is_pad[i] or is_pad[l]:
            ri = l if is_pad[i] else i
            pi = i if is_pad[i] else l
            keys[i], keys[l] = keys[ri], keys[pi]
            vals[i], vals[l] = vals[ri], vals[pi]
            is_pad[i], is_pad[l] = False, True
            continue
        swap = keys[i] > keys[l]
        ki = jnp.where(swap, keys[l], keys[i])
        kl = jnp.where(swap, keys[i], keys[l])
        vi = jnp.where(swap, vals[l], vals[i])
        vl = jnp.where(swap, vals[i], vals[l])
        keys[i], keys[l] = ki, kl
        vals[i], vals[l] = vi, vl
    return keys, vals


def _make_kernel(n_pad: int, n_frames: int, winsorize: bool, weighted: bool, tile: int):
    def kernel(*refs):
        if weighted:
            frames_ref, w_ref, params_ref, out_ref, clip_ref = refs
        else:
            frames_ref, params_ref, out_ref, clip_ref = refs
        sigma_low = params_ref[0]
        sigma_high = params_ref[1]
        ref_loc = params_ref[2]

        # Load rows; invalid (NaN) and padding rows sort to the end as +BIG.
        rows = []
        valid_rows = []
        for i in range(n_pad):
            if i < n_frames:
                r = frames_ref[i, :]
                ok = r == r  # not NaN
                rows.append(jnp.where(ok, r, _BIG))
                valid_rows.append(ok)
            else:
                rows.append(jnp.full((tile,), _BIG, jnp.float32))
        cnt0 = valid_rows[0].astype(jnp.int32)
        for vr in valid_rows[1:]:
            cnt0 = cnt0 + vr.astype(jnp.int32)
        cnt0 = cnt0[None, :]  # (1, tile): Mosaic loop carries must be 2D

        if weighted:
            wrows = []
            for i in range(n_pad):
                if i < n_frames:
                    wrows.append(jnp.where(valid_rows[i], w_ref[i, 0] * jnp.ones((tile,), jnp.float32), 0.0))
                else:
                    wrows.append(jnp.zeros((tile,), jnp.float32))
            srows_l, swrows_l = _sortnet_rows_kv(rows, wrows, n_frames)
            # after an ascending sort, positions >= n_frames can only hold
            # +BIG (at most n_frames finite values exist per lane), so the
            # clip loop's masked reductions run over n_frames rows, not the
            # pow2-padded n_pad
            svals = jnp.stack(srows_l[:n_frames])   # (n_frames, tile)
            sweights = jnp.stack(swrows_l[:n_frames])
        else:
            svals = jnp.stack(_sortnet_rows(rows, n_frames)[:n_frames])
            sweights = None

        row_idx = jax.lax.broadcasted_iota(jnp.int32, (n_frames, tile), 0)

        # Center by the per-pixel median (robust to outliers) so the float32
        # sums of squares in the clip loop don't cancel catastrophically.
        c1 = jnp.maximum(cnt0, 1)
        med_up = jnp.sum(jnp.where(row_idx == c1 // 2,
                                   jnp.where(svals >= _BIG, 0.0, svals), 0.0),
                         axis=0, keepdims=True)
        med_lo_i = jnp.maximum(c1 // 2 - 1, 0)
        med_lo = jnp.sum(jnp.where(row_idx == med_lo_i,
                                   jnp.where(svals >= _BIG, 0.0, svals), 0.0),
                         axis=0, keepdims=True)
        center = jnp.where(c1 % 2 == 1, med_up, 0.5 * (med_lo + med_up))
        center = jnp.where(cnt0 > 0, center, 0.0)
        svals = jnp.where(svals < _BIG, svals - center, svals)

        zero_rows = jnp.where(svals >= _BIG, 0.0, svals)  # padded entries -> 0

        def range_mask(lo, hi):
            return (row_idx >= lo) & (row_idx < hi)

        def sum_range(lo, hi):
            return jnp.sum(jnp.where(range_mask(lo, hi), zero_rows, 0.0), axis=0, keepdims=True)

        def sumsq_range(lo, hi):
            return jnp.sum(jnp.where(range_mask(lo, hi), zero_rows * zero_rows, 0.0),
                           axis=0, keepdims=True)

        def select_at(idx):
            """svals[idx[lane], lane] via masked sum (no per-lane gather)."""
            return jnp.sum(jnp.where(row_idx == idx, zero_rows, 0.0), axis=0, keepdims=True)

        def median_range(lo, cnt):
            c1 = jnp.maximum(cnt, 1)
            upper = select_at(lo + c1 // 2)
            lower = select_at(lo + jnp.maximum(c1 // 2 - 1, 0))
            return jnp.where(c1 % 2 == 1, upper, 0.5 * (lower + upper))

        def rank_counts(lo, hi, low_b, high_b):
            """(#active < low_b, #active > high_b) for the SORTED active
            range [lo, hi): each predicate set is a prefix of the sorted
            rows, so two global rank sums + clips replace the per-row
            range-mask-and-predicate reductions (identical integer counts,
            ~3x fewer vector ops). Rows at/past cnt0 hold +BIG, which no
            bound reaches, and hi <= cnt0 keeps them outside the range."""
            r_lo = jnp.sum((svals < low_b).astype(jnp.int32),
                           axis=0, keepdims=True)
            r_hi = jnp.sum((svals <= high_b).astype(jnp.int32),
                           axis=0, keepdims=True)
            below = jnp.clip(r_lo, lo, hi) - lo
            above = hi - jnp.clip(r_hi, lo, hi)
            return below, above

        def winsor_std(lo, hi, median, std0, running):
            """Winsorized stddev fixed point, per-pixel-faithful.

            The plain iteration std <- f(std) converges linearly and SIMD
            lanes run until ALL converge; converged lanes freeze at the
            application where their stopping test first passes (exactly
            the reference's per-pixel loop, stack.go:646-672) and four
            applications run per while trip to cut control overhead. The
            stopping rule -- relative change of one application <= 5e-4,
            or no samples clamped -- is the reference's.

            The active-range mask hoists out of the fixed-point loop
            (lo/hi are invariant across applications). A full rank-
            arithmetic application (interior masked sums + bound x
            tail-count, VERDICT r3 item 5) was MEASURED SLOWER despite
            fewer row passes (71.8 vs 62.2 ms at (40, 2M) -- boolean mask
            algebra costs Mosaic more than clip-and-reduce), so the
            clamped-copy form stays; see BASELINE.md round-4.

            The reference clamps ONE copy progressively (stack.go:655-660):
            when the 1.134-adjusted std grows, the bounds widen and
            previously-clamped samples keep the old bound value. Clip
            composition equals one clip at the running (max lower, min
            upper) bounds, carried per lane through the loop; a sample is
            "changed" only against a bound that tightened this application
            (pinned by tests/test_go_oracles.py via the XLA-path identity
            in tests/test_stack_pallas.py)."""
            c = jnp.maximum(hi - lo, 1).astype(jnp.float32)
            m = range_mask(lo, hi)             # invariant across applications

            def f(std, lo_r, hi_r):
                wlo = median - 1.5 * std
                whi = median + 1.5 * std
                nlo = jnp.maximum(lo_r, wlo)   # progressive-clamp bounds
                nhi = jnp.minimum(hi_r, whi)
                clamped = jnp.clip(zero_rows, nlo, nhi)
                wsum = jnp.sum(jnp.where(m, clamped, 0.0), axis=0, keepdims=True)
                wsq = jnp.sum(jnp.where(m, clamped * clamped, 0.0),
                              axis=0, keepdims=True)
                ch_lo, ch_hi = rank_counts(lo, hi, nlo, nhi)
                changed = (jnp.where(wlo > lo_r, ch_lo, 0)
                           + jnp.where(whi < hi_r, ch_hi, 0))
                mean = wsum / c
                var = wsq / c - mean * mean
                return (1.134 * jnp.sqrt(jnp.maximum(var, 0.0)), changed,
                        nlo, nhi)

            def wbody(state):
                std, lo_r, hi_r, done_i, it = state
                done = done_i > 0
                # 4 plain applications per control trip: the iterate
                # sequence per lane is EXACTLY the reference's (a lane
                # updates through the application where its convergence
                # test first passes, then freezes), only the while_loop
                # trip count shrinks 4x. Steffensen/Aitken acceleration is
                # NOT safe here -- the clamp-count step structure gives the
                # map multiple fixed points and extrapolation basin-hops
                # (caught by test_stack.py::TestWinsorized::test_vs_golden).
                for _ in range(4):
                    s1, ch, nlo, nhi = f(std, lo_r, hi_r)
                    fac = jnp.abs(s1 - std) / jnp.maximum(std, 1e-30)
                    new_done = done | (ch == 0) | (fac <= 0.0005)
                    std = jnp.where(done, std, s1)
                    lo_r = jnp.where(done, lo_r, nlo)
                    hi_r = jnp.where(done, hi_r, nhi)
                    done = new_done
                return std, lo_r, hi_r, done.astype(jnp.int32), it + 1

            def wcond(state):
                _, _, _, done_i, it = state
                return jnp.logical_and(jnp.logical_not(jnp.all(done_i > 0)), it < 8)

            # lanes that already STOPPED clipping (running=False) have no
            # consumer for this round's std: seed them converged so they
            # never prolong the all-lane while loop (late rounds typically
            # have few running lanes -- this is most of the winsor cost)
            done0 = jnp.logical_not(running).astype(jnp.int32)
            binf = jnp.full_like(std0, _BIG)
            std, _, _, _, _ = jax.lax.while_loop(
                wcond, wbody, (std0, -binf, binf, done0, 0))
            return std

        def body(state):
            lo, hi, running_i, result, clo, chi, it = state
            running = running_i > 0
            cnt = hi - lo
            cf = jnp.maximum(cnt, 1).astype(jnp.float32)
            median = median_range(lo, cnt)
            mean = sum_range(lo, hi) / cf
            var = sumsq_range(lo, hi) / cf - mean * mean
            std = jnp.sqrt(jnp.maximum(var, 0.0))
            if winsorize:
                # Seed with the plain std of the CURRENT range, as the
                # reference does (stack.go:646-672). Warm-starting from the
                # previous round's converged value was tried and REVERTED:
                # if that window clamps nothing, ch==0 exits immediately
                # with an unwinsorized std -- the map has multiple fixed
                # points and the start decides which one is reached.
                std = winsor_std(lo, hi, median, std, running)
            low_b = median - sigma_low * std
            high_b = median + sigma_high * std

            below_r, above_r = rank_counts(lo, hi, low_b, high_b)
            below = jnp.where(running, below_r, 0)
            above = jnp.where(running, above_r, 0)
            new_lo = lo + below
            new_hi = hi - above
            new_cnt = new_hi - new_lo

            stop = running & ((below + above == 0) | (new_cnt <= 1))
            if weighted:
                m = range_mask(new_lo, new_hi)
                wsum = jnp.sum(jnp.where(m, sweights, 0.0), axis=0, keepdims=True)
                wvsum = jnp.sum(jnp.where(m, sweights * zero_rows, 0.0), axis=0, keepdims=True)
                # pre-removal fallback for the (rounding-only) empty-set case
                m_pre = range_mask(lo, hi)
                wsum_pre = jnp.sum(jnp.where(m_pre, sweights, 0.0), axis=0, keepdims=True)
                wvsum_pre = jnp.sum(jnp.where(m_pre, sweights * zero_rows, 0.0), axis=0, keepdims=True)
                final_val = jnp.where(
                    new_cnt > 0,
                    wvsum / jnp.maximum(wsum, 1e-30),
                    wvsum_pre / jnp.maximum(wsum_pre, 1e-30))
            else:
                final_val = mean
            result = jnp.where(stop, final_val, result)
            clo = clo + below
            chi = chi + above
            return (new_lo, new_hi, (running & ~stop).astype(jnp.int32), result,
                    clo, chi, it + 1)

        def cond(state):
            _, _, running_i, _, _, _, it = state
            return jnp.logical_and(jnp.any(running_i > 0), it < n_frames + 1)

        lo0 = jnp.zeros((1, tile), jnp.int32)
        hi0 = cnt0
        running0 = (cnt0 > 0).astype(jnp.int32)
        result0 = jnp.zeros((1, tile), jnp.float32)
        zeros_i = jnp.zeros((1, tile), jnp.int32)
        state = (lo0, hi0, running0, result0, zeros_i, zeros_i, 0)
        _, _, _, result, clo, chi, _ = jax.lax.while_loop(cond, body, state)

        out_ref[0, :] = jnp.where(cnt0 > 0, result + center, ref_loc)[0, :]
        # per-lane clip counts in VMEM (an SMEM per-tile scalar output
        # overflows Mosaic's 1MB SMEM window at large tile counts)
        clip_ref[0, :] = clo[0, :]
        clip_ref[1, :] = chi[0, :]

    return kernel


@partial(jax.jit, static_argnames=("winsorize",))
def _stack_clip_pallas(frames2d: jax.Array, params: jax.Array, weights,
                       winsorize: bool):
    n, p = frames2d.shape
    n_pad = max(_next_pow2(n), 8)
    tile = _tile_for(n_pad)
    if n_pad > n:
        frames2d = jnp.pad(frames2d, ((0, n_pad - n), (0, 0)), constant_values=jnp.nan)
    n_tiles = p // tile

    weighted = weights is not None
    in_specs = [
        pl.BlockSpec((n_pad, tile), lambda t: (0, t), memory_space=pltpu.VMEM),
    ]
    inputs = [frames2d]
    if weighted:
        in_specs.append(pl.BlockSpec((n_pad, 1), lambda t: (0, 0), memory_space=pltpu.VMEM))
        w2d = jnp.pad(weights.reshape(n, 1), ((0, n_pad - n), (0, 0)))
        inputs.append(w2d)
    in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    inputs.append(params)

    out, clips = pl.pallas_call(
        _make_kernel(n_pad, n, winsorize, weighted, tile),
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, tile), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tile), lambda t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, p), jnp.float32),
            jax.ShapeDtypeStruct((2, p), jnp.int32),
        ],
        compiler_params=_sched_params(),
        interpret=INTERPRET,
    )(*inputs)
    return out[0], jnp.sum(clips[0]), jnp.sum(clips[1])


def _sched_params():
    """Mosaic scheduling experiment hook (VERDICT r4 item 5), read at trace
    time: NIGHTLIGHT_PALLAS_SCHED in {parallel, arbitrary, nobounds,
    parallel+nobounds}. Unset = Mosaic defaults (the shipped configuration;
    scripts/microbench_sched.py measures the variants per process)."""
    import os

    sched = os.environ.get("NIGHTLIGHT_PALLAS_SCHED")
    if not sched:
        return None
    kw = {}
    if "parallel" in sched:
        kw["dimension_semantics"] = (pltpu.GridDimensionSemantics.PARALLEL,)
    elif "arbitrary" in sched:
        kw["dimension_semantics"] = (pltpu.GridDimensionSemantics.ARBITRARY,)
    if "nobounds" in sched:
        kw["disable_bounds_checks"] = True
    return pltpu.CompilerParams(**kw) if kw else None


def _make_single_pass_kernel(n_pad: int, n_frames: int, mad: bool, tile: int):
    """Median (stack.go:274-303) and single-pass MAD-sigma clipped mean
    (stack.go:536-605) kernels: no clip iteration, so the body is one or two
    sorting networks plus masked selections -- semantics of
    ops.stack.stack_median / stack_mad_sigma."""

    def kernel(frames_ref, params_ref, out_ref, clip_ref):
        sigma_low = params_ref[0]
        sigma_high = params_ref[1]
        ref_loc = params_ref[2]

        rows = []
        valid_rows = []
        for i in range(n_pad):
            if i < n_frames:
                r = frames_ref[i, :]
                ok = r == r
                rows.append(jnp.where(ok, r, _BIG))
                valid_rows.append(ok)
            else:
                rows.append(jnp.full((tile,), _BIG, jnp.float32))
        cnt0 = valid_rows[0].astype(jnp.int32)
        for vr in valid_rows[1:]:
            cnt0 = cnt0 + vr.astype(jnp.int32)
        cnt0 = cnt0[None, :]

        # sorted positions >= n_frames can only hold +BIG: truncate so all
        # downstream masked reductions span n_frames rows, not n_pad
        svals = jnp.stack(_sortnet_rows(rows, n_frames)[:n_frames])
        row_idx = jax.lax.broadcasted_iota(jnp.int32, (n_frames, tile), 0)
        in_cnt = row_idx < cnt0

        def median_of(sorted_vals):
            vals0 = jnp.where(sorted_vals >= _BIG, 0.0, sorted_vals)
            c1 = jnp.maximum(cnt0, 1)
            up = jnp.sum(jnp.where(row_idx == c1 // 2, vals0, 0.0),
                         axis=0, keepdims=True)
            lo_i = jnp.maximum(c1 // 2 - 1, 0)
            lo = jnp.sum(jnp.where(row_idx == lo_i, vals0, 0.0),
                         axis=0, keepdims=True)
            return jnp.where(c1 % 2 == 1, up, 0.5 * (lo + up))

        median = median_of(svals)

        if not mad:
            out_ref[0, :] = jnp.where(cnt0 > 0, median, ref_loc)[0, :]
            clip_ref[0, :] = jnp.zeros((tile,), jnp.int32)
            clip_ref[1, :] = jnp.zeros((tile,), jnp.int32)
            return

        dev_rows = [jnp.where(in_cnt[i, :], jnp.abs(svals[i, :] - median[0, :]), _BIG)
                    for i in range(n_frames)]
        dev_rows += [jnp.full((tile,), _BIG, jnp.float32)
                     for _ in range(n_pad - n_frames)]  # free under pruning
        sdev = jnp.stack(_sortnet_rows(dev_rows, n_frames)[:n_frames])
        std = median_of(sdev) * 1.4826

        lo_b = median - sigma_low * std
        hi_b = median + sigma_high * std
        keep = in_cnt & (svals >= lo_b) & (svals <= hi_b)
        kept = jnp.sum(keep.astype(jnp.float32), axis=0, keepdims=True)
        vals0 = jnp.where(svals >= _BIG, 0.0, svals)
        mean = jnp.sum(jnp.where(keep, vals0, 0.0), axis=0, keepdims=True)
        mean = mean / jnp.maximum(kept, 1.0)

        out_ref[0, :] = jnp.where(cnt0 > 0, mean, ref_loc)[0, :]
        clip_ref[0, :] = jnp.sum((in_cnt & (svals < lo_b)).astype(jnp.int32),
                                 axis=0)
        clip_ref[1, :] = jnp.sum(
            (in_cnt & (svals > hi_b) & (svals < _BIG)).astype(jnp.int32), axis=0)

    return kernel


@partial(jax.jit, static_argnames=("mad",))
def _stack_single_pass_pallas(frames2d: jax.Array, params: jax.Array, mad: bool):
    n, p = frames2d.shape
    n_pad = max(_next_pow2(n), 8)
    tile = _tile_for(n_pad)
    if n_pad > n:
        frames2d = jnp.pad(frames2d, ((0, n_pad - n), (0, 0)), constant_values=jnp.nan)
    n_tiles = p // tile
    out, clips = pl.pallas_call(
        _make_single_pass_kernel(n_pad, n, mad, tile),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((n_pad, tile), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tile), lambda t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, p), jnp.float32),
            jax.ShapeDtypeStruct((2, p), jnp.int32),
        ],
        interpret=INTERPRET,
    )(frames2d, params)
    return out[0], jnp.sum(clips[0]), jnp.sum(clips[1])


def stack_single_pass_pallas(frames: jax.Array, ref_frame_loc: float,
                             sigma_low: float = 0.0, sigma_high: float = 0.0,
                             mad: bool = False):
    """Median (mad=False) or MAD-sigma clipped mean (mad=True) stack via the
    single-pass Pallas kernel. Returns (stacked, clip_lo, clip_hi)."""
    shape = frames.shape[1:]
    flat = frames.reshape(frames.shape[0], -1)
    p = flat.shape[1]
    tile = _tile_for(max(_next_pow2(frames.shape[0]), 8))
    p_pad = ((p + tile - 1) // tile) * tile
    if p_pad > p:
        flat = jnp.pad(flat, ((0, 0), (0, p_pad - p)), constant_values=jnp.nan)
    params = jnp.asarray([sigma_low, sigma_high, ref_frame_loc], jnp.float32)
    out, clo, chi = _stack_single_pass_pallas(flat, params, mad)
    return out[:p].reshape(shape), clo, chi


def _make_linfit_kernel(n_pad: int, n_frames: int, tile: int):
    """Linear-fit clipping kernel (semantics of ops.stack.stack_linear_fit,
    mirroring stack.go:832-918). Unlike sigma clipping, rejections can occur
    anywhere in the sorted order, so the active set is a per-row mask rather
    than a contiguous range; ranks are recomputed each round as an exclusive
    prefix sum of the mask (dropping elements from a sorted list keeps it
    sorted, so the reference's per-round re-sort is a no-op here)."""

    def kernel(frames_ref, params_ref, out_ref, clip_ref):
        sigma_low = params_ref[0]
        sigma_high = params_ref[1]
        ref_loc = params_ref[2]

        rows = []
        valid_rows = []
        for i in range(n_pad):
            if i < n_frames:
                r = frames_ref[i, :]
                ok = r == r
                rows.append(jnp.where(ok, r, _BIG))
                valid_rows.append(ok)
            else:
                rows.append(jnp.full((tile,), _BIG, jnp.float32))
        cnt0 = valid_rows[0].astype(jnp.int32)
        for vr in valid_rows[1:]:
            cnt0 = cnt0 + vr.astype(jnp.int32)
        cnt0 = cnt0[None, :]

        # sorted positions >= n_frames can only hold +BIG: truncate so the
        # whole rank/regression loop runs over n_frames rows, not n_pad
        svals = jnp.stack(_sortnet_rows(rows, n_frames)[:n_frames])
        row_idx = jax.lax.broadcasted_iota(jnp.int32, (n_frames, tile), 0)
        ys = jnp.where(svals >= _BIG, 0.0, svals)     # padded entries -> 0
        active0 = (row_idx < cnt0).astype(jnp.float32)

        def body(state):
            active, running_i, result, clo, chi, it = state
            running = running_i > 0
            cnt = jnp.sum(active, axis=0, keepdims=True)   # float
            c = jnp.maximum(cnt, 1.0)

            # exclusive prefix sum of the mask = rank among active values
            # (Hillis-Steele scan: log2(n_frames) shifted adds along the
            # sublane axis instead of an n_frames-long sequential chain)
            xs = jnp.concatenate(
                [jnp.zeros((1, tile), jnp.float32), active[:-1]], axis=0)
            d = 1
            while d < n_frames:
                xs = xs + jnp.concatenate(
                    [jnp.zeros((d, tile), jnp.float32), xs[:-d]], axis=0)
                d *= 2

            xmean = jnp.sum(active * xs, axis=0, keepdims=True) / c
            ymean = jnp.sum(active * ys, axis=0, keepdims=True) / c
            dx = xs - xmean
            dy = ys - ymean
            xvar = jnp.sum(active * dx * dx, axis=0, keepdims=True) / c
            yvar = jnp.sum(active * dy * dy, axis=0, keepdims=True) / c
            xstd = jnp.sqrt(xvar)
            ystd = jnp.sqrt(yvar)
            corr = jnp.sum(active * dx * dy, axis=0, keepdims=True)
            corr = corr / (xstd * ystd * (c + 1.0) + 1e-30)
            slope = corr * ystd / (xstd + 1e-30)
            intercept = ymean - slope * xmean

            resid = ys - (xs * slope + intercept)
            sigma = jnp.sum(active * jnp.abs(resid), axis=0, keepdims=True) / c

            amask = active > 0.0
            rej_lo = amask & ((-resid) > sigma_low * sigma)
            rej_hi = amask & (resid > sigma_high * sigma)
            rej = rej_lo | rej_hi
            n_rej = jnp.sum(rej.astype(jnp.float32), axis=0, keepdims=True)
            n_rej = jnp.where(running, n_rej, 0.0)

            stop = running & ((n_rej == 0.0) | (cnt < 3.0))
            result = jnp.where(stop, ymean, result)
            clo = clo + jnp.where(running,
                                  jnp.sum(rej_lo.astype(jnp.float32), axis=0, keepdims=True), 0.0)
            chi = chi + jnp.where(running,
                                  jnp.sum(rej_hi.astype(jnp.float32), axis=0, keepdims=True), 0.0)
            # only still-running, non-stopping lanes drop their rejects
            # (the reference breaks before reslicing, stack.go:906-909)
            drop = running & ~stop
            new_active = jnp.where(drop, active * (1.0 - rej.astype(jnp.float32)), active)
            return (new_active, (running & ~stop).astype(jnp.int32), result,
                    clo, chi, it + 1)

        def cond(state):
            _, running_i, _, _, _, it = state
            return jnp.logical_and(jnp.any(running_i > 0), it < n_frames + 1)

        result0 = jnp.full((1, tile), 1.0, jnp.float32) * ref_loc
        zeros_f = jnp.zeros((1, tile), jnp.float32)
        state = (active0, (cnt0 > 0).astype(jnp.int32), result0, zeros_f, zeros_f, 0)
        _, _, result, clo, chi, _ = jax.lax.while_loop(cond, body, state)

        out_ref[0, :] = result[0, :]
        clip_ref[0, :] = clo[0, :].astype(jnp.int32)
        clip_ref[1, :] = chi[0, :].astype(jnp.int32)

    return kernel


@jax.jit
def _stack_linfit_pallas(frames2d: jax.Array, params: jax.Array):
    n, p = frames2d.shape
    n_pad = max(_next_pow2(n), 8)
    tile = _tile_for(n_pad)
    if n_pad > n:
        frames2d = jnp.pad(frames2d, ((0, n_pad - n), (0, 0)), constant_values=jnp.nan)
    n_tiles = p // tile

    out, clips = pl.pallas_call(
        _make_linfit_kernel(n_pad, n, tile),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((n_pad, tile), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tile), lambda t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, p), jnp.float32),
            jax.ShapeDtypeStruct((2, p), jnp.int32),
        ],
        interpret=INTERPRET,
    )(frames2d, params)
    return out[0], jnp.sum(clips[0]), jnp.sum(clips[1])


def stack_linfit_pallas(frames: jax.Array, ref_frame_loc: float,
                        sigma_low: float, sigma_high: float):
    """Linear-fit stack via the Pallas kernel. frames: (N, ...) with NaN as
    missing. Returns (stacked, clip_lo, clip_hi)."""
    shape = frames.shape[1:]
    flat = frames.reshape(frames.shape[0], -1)
    p = flat.shape[1]
    tile = _tile_for(max(_next_pow2(frames.shape[0]), 8))
    p_pad = ((p + tile - 1) // tile) * tile
    if p_pad > p:
        flat = jnp.pad(flat, ((0, 0), (0, p_pad - p)), constant_values=jnp.nan)
    params = jnp.asarray([sigma_low, sigma_high, ref_frame_loc], jnp.float32)
    out, clo, chi = _stack_linfit_pallas(flat, params)
    return out[:p].reshape(shape), clo, chi


def stack_sigma_pallas(frames: jax.Array, ref_frame_loc: float,
                       sigma_low: float, sigma_high: float,
                       weights=None, winsorize: bool = False):
    """Sigma-clip (or winsorized) stack via the Pallas kernel.

    frames: (N, ...) with NaN as missing. Returns (stacked, clip_lo, clip_hi).
    Pixels are padded to the tile size with NaN and cropped after.
    """
    shape = frames.shape[1:]
    flat = frames.reshape(frames.shape[0], -1)
    p = flat.shape[1]
    tile = _tile_for(max(_next_pow2(frames.shape[0]), 8))
    p_pad = ((p + tile - 1) // tile) * tile
    if p_pad > p:
        flat = jnp.pad(flat, ((0, 0), (0, p_pad - p)), constant_values=jnp.nan)
    params = jnp.asarray(
        [sigma_low, sigma_high, ref_frame_loc], jnp.float32)
    out, clo, chi = _stack_clip_pallas(flat, params, weights, winsorize)
    return out[:p].reshape(shape), clo, chi
