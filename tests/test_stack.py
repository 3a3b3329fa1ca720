"""Stacking engine parity tests.

Each vectorized device mode is checked against a direct per-pixel golden model
of the reference algorithm's semantics (internal/ops/stack/stack.go), on small
random inputs including NaNs."""

import warnings

import numpy as np
import jax.numpy as jnp
import pytest

from nightlight_tpu.ops import stack as stk


# ---------------------------------------------------------------------------
# Golden per-pixel models (semantics of stack.go, independently implemented)
# ---------------------------------------------------------------------------


def median_ref(vals):
    s = np.sort(vals)
    n = len(s)
    if n % 2 == 1:
        return s[n // 2]
    return 0.5 * (s[n // 2 - 1] + s[n // 2])


def golden_sigma(vals, sigma_low, sigma_high, ref_loc):
    vals = [v for v in vals if np.isfinite(v)]
    if not vals:
        return ref_loc, 0, 0
    cur = list(vals)
    clip_lo = clip_hi = 0
    while True:
        med = median_ref(np.array(cur))
        mean = float(np.mean(cur))
        std = float(np.sqrt(np.mean((np.array(cur) - mean) ** 2)))
        lo_b, hi_b = med - sigma_low * std, med + sigma_high * std
        kept = [v for v in cur if lo_b <= v <= hi_b]
        c_lo = sum(1 for v in cur if v < lo_b)
        c_hi = sum(1 for v in cur if v > hi_b)
        clip_lo += c_lo
        clip_hi += c_hi
        if (c_lo + c_hi) == 0 or len(kept) <= 1:
            return mean, clip_lo, clip_hi
        cur = kept


def golden_winsor(vals, sigma_low, sigma_high, ref_loc):
    vals = [v for v in vals if np.isfinite(v)]
    if not vals:
        return ref_loc, 0, 0
    cur = list(vals)
    clip_lo = clip_hi = 0
    while True:
        med = median_ref(np.array(cur))
        mean = float(np.mean(cur))
        std = float(np.sqrt(np.mean((np.array(cur) - mean) ** 2)))
        # winsorized stddev inner loop (stack.go:646-672)
        while True:
            lo_b, hi_b = med - 1.5 * std, med + 1.5 * std
            wins = np.clip(cur, lo_b, hi_b)
            changed = int(np.sum((np.array(cur) < lo_b) | (np.array(cur) > hi_b)))
            old = std
            std = 1.134 * float(np.sqrt(np.mean((wins - np.mean(wins)) ** 2)))
            if changed == 0 or abs(std - old) / old <= 0.0005:
                break
        lo_b, hi_b = med - sigma_low * std, med + sigma_high * std
        kept = [v for v in cur if lo_b <= v <= hi_b]
        c_lo = sum(1 for v in cur if v < lo_b)
        c_hi = sum(1 for v in cur if v > hi_b)
        clip_lo += c_lo
        clip_hi += c_hi
        if (c_lo + c_hi) == 0 or len(kept) <= 1:
            return mean, clip_lo, clip_hi
        cur = kept


def golden_mad(vals, sigma_low, sigma_high, ref_loc):
    vals = np.array([v for v in vals if np.isfinite(v)])
    if len(vals) == 0:
        return ref_loc
    med = median_ref(vals)
    mad = median_ref(np.abs(vals - med))
    std = mad * 1.4826
    kept = vals[(vals >= med - sigma_low * std) & (vals <= med + sigma_high * std)]
    return float(np.mean(kept)) if len(kept) else float("nan")


def golden_linfit(vals, sigma_low, sigma_high, ref_loc):
    vals = [v for v in vals if np.isfinite(v)]
    if not vals:
        return ref_loc
    cur = np.array(sorted(vals), np.float64)
    while True:
        n = len(cur)
        xs = np.arange(n, dtype=np.float64)
        xm, ym = xs.mean(), cur.mean()
        xstd = np.sqrt(np.mean((xs - xm) ** 2))
        ystd = np.sqrt(np.mean((cur - ym) ** 2))
        corr = np.sum((xs - xm) * (cur - ym)) / (xstd * ystd * (n + 1) + 1e-30)
        slope = corr * ystd / (xstd + 1e-30)
        intercept = ym - slope * xm
        lin = xs * slope + intercept
        resid = cur - lin
        sigma = np.mean(np.abs(resid))
        rej = (-resid > sigma_low * sigma) | (resid > sigma_high * sigma)
        if rej.sum() == 0 or n < 3:
            return float(ym)
        cur = np.sort(cur[~rej])


# ---------------------------------------------------------------------------


def rand_frames(rng, n=10, p=50, nan_frac=0.1, outlier_frac=0.05):
    frames = rng.normal(1000.0, 10.0, size=(n, p)).astype(np.float32)
    nan_mask = rng.uniform(size=(n, p)) < nan_frac
    frames[nan_mask] = np.nan
    out_mask = rng.uniform(size=(n, p)) < outlier_frac
    frames[out_mask & ~nan_mask] += rng.uniform(100, 3000, size=(n, p)).astype(np.float32)[out_mask & ~nan_mask]
    # ensure at least one fully-NaN pixel to test the RefFrameLoc fallback
    frames[:, 0] = np.nan
    return frames


class TestSimpleModes:
    def test_mean(self, rng):
        f = rand_frames(rng)
        out, _, _ = stk.stack(jnp.asarray(f), stk.StackMode.Mean, ref_frame_loc=42.0)
        with np.errstate(all="ignore"), warnings.catch_warnings():
            # all-NaN columns warn inside nanmean; their values are replaced
            warnings.simplefilter("ignore", RuntimeWarning)
            expected = np.where(np.all(np.isnan(f), 0), 42.0,
                                np.nanmean(np.where(np.isnan(f), np.nan, f), 0))
        np.testing.assert_allclose(np.asarray(out), expected.astype(np.float32), rtol=1e-5)

    def test_median(self, rng):
        f = rand_frames(rng)
        out, _, _ = stk.stack(jnp.asarray(f), stk.StackMode.Median, ref_frame_loc=42.0)
        out = np.asarray(out)
        for i in range(f.shape[1]):
            vals = f[:, i][np.isfinite(f[:, i])]
            exp = 42.0 if len(vals) == 0 else median_ref(vals)
            assert out[i] == pytest.approx(exp, rel=1e-5), f"pixel {i}"

    def test_weighted_mean(self, rng):
        f = rand_frames(rng)
        w = rng.uniform(0.5, 2.0, size=f.shape[0]).astype(np.float32)
        out, _, _ = stk.stack(jnp.asarray(f), stk.StackMode.Mean, weights=jnp.asarray(w), ref_frame_loc=0.0)
        out = np.asarray(out)
        for i in range(f.shape[1]):
            m = np.isfinite(f[:, i])
            exp = 0.0 if not m.any() else float(np.sum(f[m, i] * w[m]) / np.sum(w[m]))
            assert out[i] == pytest.approx(exp, rel=1e-5)


class TestSigmaClip:
    def test_vs_golden(self, rng):
        f = rand_frames(rng, n=12, p=40)
        out, cl, ch = stk.stack(jnp.asarray(f), stk.StackMode.Sigma,
                                sigma_low=2.0, sigma_high=2.0, ref_frame_loc=7.0)
        out = np.asarray(out)
        tot_lo = tot_hi = 0
        for i in range(f.shape[1]):
            exp, glo, ghi = golden_sigma(f[:, i].astype(np.float64), 2.0, 2.0, 7.0)
            tot_lo += glo
            tot_hi += ghi
            assert out[i] == pytest.approx(exp, rel=2e-4), f"pixel {i}"
        assert int(cl) == tot_lo
        assert int(ch) == tot_hi

    def test_removes_cosmic_ray(self, rng):
        n, p = 20, 100
        f = rng.normal(500.0, 5.0, size=(n, p)).astype(np.float32)
        f[3, :] += 5000.0  # cosmic ray across one frame
        out, cl, ch = stk.stack(jnp.asarray(f), stk.StackMode.Sigma,
                                sigma_low=2.75, sigma_high=2.75)
        assert np.all(np.abs(np.asarray(out) - 500.0) < 10.0)
        assert int(ch) >= p  # the ray frame must be clipped everywhere

    def test_weighted_vs_golden(self, rng):
        f = rand_frames(rng, n=10, p=30)
        w = rng.uniform(0.5, 2.0, size=f.shape[0]).astype(np.float32)
        out, _, _ = stk.stack(jnp.asarray(f), stk.StackMode.Sigma, weights=jnp.asarray(w),
                              sigma_low=2.0, sigma_high=2.0, ref_frame_loc=7.0)
        out = np.asarray(out)
        # golden: clip like unweighted, then weighted mean over final set
        for i in range(f.shape[1]):
            vals = [v for v in f[:, i] if np.isfinite(v)]
            if not vals:
                assert out[i] == pytest.approx(7.0)
                continue
            idx = [j for j in range(f.shape[0]) if np.isfinite(f[j, i])]
            cur = list(zip(idx, [float(f[j, i]) for j in idx]))
            while True:
                arr = np.array([v for _, v in cur])
                med = median_ref(arr)
                std = float(np.sqrt(np.mean((arr - arr.mean()) ** 2)))
                lo_b, hi_b = med - 2.0 * std, med + 2.0 * std
                kept = [(j, v) for j, v in cur if lo_b <= v <= hi_b]
                n_rej = len(cur) - len(kept)
                if n_rej == 0 or len(kept) <= 1:
                    ws = np.array([w[j] for j, _ in kept])
                    vs = np.array([v for _, v in kept])
                    exp = float(np.sum(ws * vs) / np.sum(ws))
                    break
                cur = kept
            assert out[i] == pytest.approx(exp, rel=2e-4), f"pixel {i}"


class TestWinsorized:
    def test_vs_golden(self, rng):
        f = rand_frames(rng, n=16, p=30)
        out, _, _ = stk.stack(jnp.asarray(f), stk.StackMode.WinsorSigma,
                              sigma_low=2.5, sigma_high=2.5, ref_frame_loc=7.0)
        out = np.asarray(out)
        for i in range(f.shape[1]):
            exp, _, _ = golden_winsor(f[:, i].astype(np.float64), 2.5, 2.5, 7.0)
            assert out[i] == pytest.approx(exp, rel=3e-4), f"pixel {i}"


class TestMADSigma:
    def test_vs_golden(self, rng):
        f = rand_frames(rng, n=14, p=40)
        out, _, _ = stk.stack(jnp.asarray(f), stk.StackMode.MADSigma,
                              sigma_low=2.0, sigma_high=2.0, ref_frame_loc=7.0)
        out = np.asarray(out)
        for i in range(f.shape[1]):
            exp = golden_mad(f[:, i].astype(np.float64), 2.0, 2.0, 7.0)
            assert out[i] == pytest.approx(exp, rel=2e-4), f"pixel {i}"


class TestLinearFit:
    def test_vs_golden(self, rng):
        f = rand_frames(rng, n=30, p=25, nan_frac=0.05, outlier_frac=0.03)
        out, _, _ = stk.stack(jnp.asarray(f), stk.StackMode.LinearFit,
                              sigma_low=2.5, sigma_high=2.5, ref_frame_loc=7.0)
        out = np.asarray(out)
        for i in range(f.shape[1]):
            exp = golden_linfit(f[:, i].astype(np.float64), 2.5, 2.5, 7.0)
            assert out[i] == pytest.approx(exp, rel=5e-4), f"pixel {i}"


class TestAutoMode:
    @pytest.mark.parametrize("n,expected", [
        (4, stk.StackMode.Mean), (6, stk.StackMode.Sigma),
        (15, stk.StackMode.WinsorSigma), (25, stk.StackMode.LinearFit),
    ])
    def test_selection(self, n, expected):
        assert stk.auto_select_mode(n) == expected


class TestIncremental:
    def test_stack_of_stacks_equals_mean(self, rng):
        a = rng.normal(10, 1, size=(50,)).astype(np.float32)
        b = rng.normal(12, 1, size=(50,)).astype(np.float32)
        acc = stk.stack_incremental(None, jnp.asarray(a), 3.0)
        acc = stk.stack_incremental(acc, jnp.asarray(b), 5.0)
        out = stk.stack_incremental_finalize(acc, 8.0)
        np.testing.assert_allclose(np.asarray(out), (3 * a + 5 * b) / 8.0, rtol=1e-6)


class TestChunkedFallback:
    """The XLA fallback runs sort-based modes through lax.map pixel chunks
    (stack._map_pixel_chunks) so its (N, P)-sized sort/prefix temporaries
    stay bounded -- unchunked at 12x16MP they OOM-kill the TPU worker.
    Per-pixel semantics must be unchanged: a tiny forced chunk size (one
    that does not divide P, exercising the NaN pixel padding) must
    reproduce the unchunked results exactly, including clip counts."""

    @pytest.mark.parametrize("mode,weighted", [
        (stk.StackMode.Median, False),
        (stk.StackMode.Sigma, False), (stk.StackMode.Sigma, True),
        (stk.StackMode.WinsorSigma, False), (stk.StackMode.WinsorSigma, True),
        (stk.StackMode.MADSigma, False),
        (stk.StackMode.LinearFit, False),
    ])
    def test_matches_unchunked(self, rng, monkeypatch, mode, weighted):
        f = rand_frames(rng, n=9, p=53)
        w = jnp.asarray(rng.uniform(0.5, 2.0, size=9).astype(np.float32)) if weighted else None
        kw = dict(weights=w, sigma_low=2.0, sigma_high=2.2, ref_frame_loc=7.0,
                  use_pallas=False)
        monkeypatch.delenv("NIGHTLIGHT_XLA_STACK_CHUNK", raising=False)
        base, bl, bh = stk.stack(jnp.asarray(f), mode, **kw)
        monkeypatch.setenv("NIGHTLIGHT_XLA_STACK_CHUNK", "7")
        out, cl, ch = stk.stack(jnp.asarray(f), mode, **kw)
        np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                                   rtol=1e-6, atol=1e-4)
        assert int(cl) == int(bl) and int(ch) == int(bh)

    def test_chunk_scales_down_with_frame_count(self):
        assert stk._xla_chunk_for(12) == 1 << 20
        assert stk._xla_chunk_for(512) < 1 << 18
        assert stk._xla_chunk_for(512) % 1024 == 0
