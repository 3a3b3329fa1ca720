"""Ground-truth proxies for Go-binary parity (VERDICT r4 item 6).

No Go toolchain exists in this image, so the decisive reference algorithms
are transliterated here into slow pure-NumPy oracles — scalar loops with
the reference's exact control flow, branch structure, and constants — and
the production TPU paths are asserted against them on shared fixtures.
Each oracle cites the Go lines it mirrors; a behavior difference between
this repo and the reference shows up as a failure here, which is the
strongest parity evidence available without running the reference binary.

Oracles:
- winsorized sigma-clip stack      (reference internal/ops/stack/stack.go:611-705)
- plain sigma-clip stack           (reference internal/ops/stack/stack.go:372-436)
- sigma-clipped median + Qn        (reference internal/stats/stats.go:477-499)
- bilinear debayer incl. edge quirks (reference internal/ops/pre/debayer.go:26-263)
- iterative auto-stretch decision  (reference internal/ops/stretch/stretch.go:103-159)
- reference-frame selection        (reference internal/ops/ref/refframe.go:212-258)
- auto color balance blocks        (reference internal/fits/rgb.go:92-281)
- WEIGHTED stack clip loops + weights (reference stack.go:231-270, 442-531, 710-800)
- histogram peak loc/scale + noise (reference stats.go:640-688, noise.go:32-55)
- point-op pixel functions         (reference pixelops.go:143-260, 560-660)
- IKSS iterative k-sigma estimator (reference stats.go:501-566)
"""

import numpy as np
import pytest

# ---------------------------------------------------------------------------
# Shared Go-semantics helpers
# ---------------------------------------------------------------------------


def go_median(a):
    """QSelectMedianFloat32 (qsort.go:68-82): odd n -> middle element; even
    n -> average of the two middle elements."""
    s = np.sort(a)
    k = len(s) >> 1
    if len(s) & 1:
        return s[k]
    return 0.5 * (s[k - 1] + s[k])


def go_mean_stddev(a):
    """stats.MeanStdDev (stats.go:246-262): population variance (n divisor).
    float32 in, float32 out — the reference computes in float32."""
    m = a.mean(dtype=np.float32)
    return m, np.sqrt(((a - m) ** 2).mean(dtype=np.float32))


def go_first_quartile(a):
    """QSelectFirstQuartileFloat32 (qsort.go:61-63): the ((n>>2)+1)-th
    smallest element (1-indexed)."""
    k = (len(a) >> 2) + 1
    return np.partition(a, k - 1)[k - 1]


# ---------------------------------------------------------------------------
# Oracle 1+2: the per-pixel stacking clip loops (stack.go:372-436, 611-705)
# ---------------------------------------------------------------------------


def go_stack_clip_oracle(frames, ref_frame_loc, sigma_low, sigma_high,
                         winsorize):
    """Per-pixel transliteration of StackSigma / StackWinsorSigma: gather
    non-NaN values, loop {median, mean, std(, winsorize std), remove
    out-of-bounds}, terminate when a round removes nothing or <=1 value
    remains, writing the mean computed BEFORE that round's removal."""
    n, p = frames.shape
    res = np.empty(p, np.float32)
    clip_lo = clip_hi = 0
    sigma_low = np.float32(sigma_low)
    sigma_high = np.float32(sigma_high)
    for i in range(p):
        g = frames[:, i]
        g = g[~np.isnan(g)]
        if g.size == 0:
            res[i] = ref_frame_loc  # stack.go:627-637
            continue
        g = g.astype(np.float32)  # the reference computes in float32
        while True:
            median = go_median(g)
            mean, std = go_mean_stddev(g)
            if winsorize:
                # stack.go:646-672: clamp a COPY progressively at
                # median +/- 1.5*std, recompute std*1.134, repeat until no
                # change or relative std change <= 0.0005; median invariant
                w = g.copy()
                while True:
                    lo_b, hi_b = median - 1.5 * std, median + 1.5 * std
                    changed = int(np.sum((w < lo_b) | (w > hi_b)))
                    w = np.clip(w, lo_b, hi_b)
                    old = std
                    _, std = go_mean_stddev(w)
                    std *= np.float32(1.134)
                    if changed == 0 or abs(std - old) / old <= 0.0005:
                        break
            lo_b = median - sigma_low * std
            hi_b = median + sigma_high * std
            nl = int(np.sum(g < lo_b))
            nh = int(np.sum(g > hi_b))
            clip_lo += nl
            clip_hi += nh
            keep = g[(g >= lo_b) & (g <= hi_b)]
            # stack.go:425-429 / 699-703: res[i] = the mean from BEFORE
            # this round's removal
            if nl + nh == 0 or keep.size <= 1:
                res[i] = mean
                break
            g = keep
    return res, clip_lo, clip_hi


@pytest.fixture
def clip_frames():
    """10 frames x 96 px: Gaussian sky + hot/cold outliers + NaN drops +
    one all-NaN pixel + one constant pixel (std=0 winsor edge case).

    Seed pinned: any two float implementations of the clip loop (including
    the Go binary vs this oracle) can flip a sample that lands within
    float-eps of a computed clip bound; this seed has no such razor-edge
    sample, so counts and means must match EXACTLY. If a kernel change
    flips this test by one count, check for a semantic change first."""
    rng = np.random.default_rng(0)
    n, p = 10, 96
    f = rng.normal(1000.0, 10.0, size=(n, p)).astype(np.float32)
    f[rng.uniform(size=(n, p)) < 0.06] += 300.0  # hot
    f[rng.uniform(size=(n, p)) < 0.04] -= 250.0  # cold
    f[rng.uniform(size=(n, p)) < 0.08] = np.nan  # dropped samples
    f[:, 17] = np.nan                            # fully-dropped pixel
    f[:, 33] = 500.0                             # constant pixel
    return f


class TestStackClipOracles:
    REF_LOC = 1234.5

    def _check(self, frames, mode_fn, winsorize, sig=(2.0, 2.0)):
        import jax.numpy as jnp

        out, cl, ch = mode_fn(jnp.asarray(frames), jnp.float32(self.REF_LOC),
                              jnp.float32(sig[0]), jnp.float32(sig[1]))
        ref, rcl, rch = go_stack_clip_oracle(
            frames, self.REF_LOC, sig[0], sig[1], winsorize)
        assert int(cl) == rcl and int(ch) == rch
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-2)

    def test_sigma_clip_matches_go_loop(self, clip_frames):
        from nightlight_tpu.ops.stack import stack_sigma

        self._check(clip_frames, stack_sigma, winsorize=False)

    def test_sigma_clip_asymmetric_bounds(self, clip_frames):
        from nightlight_tpu.ops.stack import stack_sigma

        self._check(clip_frames, stack_sigma, winsorize=False, sig=(1.5, 3.0))

    def test_winsorized_clip_matches_go_loop(self, clip_frames):
        from nightlight_tpu.ops.stack import stack_winsor_sigma

        self._check(clip_frames, stack_winsor_sigma, winsorize=True)

    def test_winsorized_asymmetric_bounds(self, clip_frames):
        from nightlight_tpu.ops.stack import stack_winsor_sigma

        self._check(clip_frames, stack_winsor_sigma, winsorize=True,
                    sig=(1.2, 2.6))

    def test_all_nan_pixel_gets_ref_frame_loc(self, clip_frames):
        import jax.numpy as jnp

        from nightlight_tpu.ops.stack import stack_sigma

        out, _, _ = stack_sigma(jnp.asarray(clip_frames),
                                jnp.float32(self.REF_LOC),
                                jnp.float32(2.0), jnp.float32(2.0))
        assert float(out[17]) == self.REF_LOC


# ---------------------------------------------------------------------------
# Oracle 3: sigma-clipped median + Qn estimator (stats.go:477-499)
# ---------------------------------------------------------------------------


def go_sigma_clipped_median_qn_oracle(data, sigma_low, sigma_high,
                                      epsilon=1e-4, quirk=True):
    """FastApproxSigmaClippedMedianAndQn with the sampling replaced by
    exact median / exact all-pairs Qn (the deterministic limit of the
    reference's randomized estimators). Keeps every structural property:
    BOTH clip bounds use sigma_low (stats.go:483-484 — the quirk; pass
    quirk=False to see what the non-quirk variant would return), the
    bounded Qn is scaled by 1.134, exit on |dLoc|+|dScale| <= epsilon or
    i >= 10 RETURNING THE PREVIOUS location (stats.go:491-494), and the
    final scale is an UNBOUNDED Qn of the full data (stats.go:492)."""

    def qn(x):
        d = np.abs(x[:, None] - x[None, :])
        d = d[np.triu_indices(len(x), k=1)]
        return go_first_quartile(d) * 2.21914

    loc = go_median(data)
    scale = qn(data)
    i = 0
    while True:
        lo = loc - sigma_low * scale
        hi = loc + (sigma_low if quirk else sigma_high) * scale
        sub = data[(data >= lo) & (data <= hi)]
        new_loc = go_median(sub)
        new_scale = qn(sub) * 1.134
        if abs(new_loc - loc) + abs(new_scale - scale) <= epsilon or i >= 10:
            return loc, qn(data)
        loc, scale = new_loc, new_scale
        i += 1


class TestSigmaClippedMedianQnOracle:
    def test_matches_exact_oracle_and_keeps_the_quirk(self, rng):
        import jax
        import jax.numpy as jnp

        from nightlight_tpu.ops.stats import sigma_clipped_median_qn

        # 35% contamination at +6 sigma: with the quirk (high bound at
        # loc + sigma_LOW*scale) the contamination is clipped and the
        # location lands near the true center; a non-quirk implementation
        # (sigma_high=8 for the high bound) keeps it inside the clip window
        # and sits visibly higher (~1.5 apart on this fixture). The
        # returned scale is the unbounded full-data Qn either way
        # (stats.go:492), so location is the discriminator.
        rng = np.random.default_rng(42)
        base = rng.normal(100.0, 2.0, size=2600)
        contam = rng.normal(112.0, 2.0, size=1400)
        data = np.concatenate([base, contam]).astype(np.float32)
        rng.shuffle(data)

        loc, scale = sigma_clipped_median_qn(
            jnp.asarray(data), sigma_low=2.0, sigma_high=8.0,
            key=jax.random.PRNGKey(11), num_samples=16384)
        loc, scale = float(loc), float(scale)

        oloc, oscale = go_sigma_clipped_median_qn_oracle(
            np.float64(data), 2.0, 8.0, quirk=True)
        nloc, _ = go_sigma_clipped_median_qn_oracle(
            np.float64(data), 2.0, 8.0, quirk=False)

        # the quirk matters on this fixture: the two oracles disagree
        assert abs(nloc - oloc) > 0.5
        # ours tracks the quirk oracle (sampling noise ~O(1/sqrt(16k)))
        assert loc == pytest.approx(oloc, abs=0.3)
        assert abs(loc - oloc) < abs(loc - nloc)
        # final scale = unbounded Qn of the contaminated data
        assert scale == pytest.approx(oscale, rel=0.15)

    def test_clean_gaussian_recovers_sigma(self, rng):
        import jax
        import jax.numpy as jnp

        from nightlight_tpu.ops.stats import sigma_clipped_median_qn

        data = rng.normal(500.0, 7.0, size=4000).astype(np.float32)
        loc, scale = sigma_clipped_median_qn(
            jnp.asarray(data), sigma_low=2.0, sigma_high=2.0,
            key=jax.random.PRNGKey(3), num_samples=16384)
        oloc, oscale = go_sigma_clipped_median_qn_oracle(np.float64(data),
                                                         2.0, 2.0)
        assert float(loc) == pytest.approx(oloc, abs=0.35)
        assert float(scale) == pytest.approx(oscale, rel=0.1)
        assert float(scale) == pytest.approx(7.0, rel=0.12)


# ---------------------------------------------------------------------------
# Oracle 4: bilinear debayer with the reference's edge quirks
# (debayer.go:26-263)
# ---------------------------------------------------------------------------

_SQRT2 = np.float32(np.sqrt(2.0))
_CFA_OFF = {"RGGB": (0, 0), "GRBG": (1, 0), "GBRG": (0, 1), "BGGR": (1, 1)}


def go_debayer_oracle(data, channel, cfa):
    """Scalar transliteration of DebayerBilinearRGGBTo{Red,Green,Blue}
    including the NESTED edge conditionals: e.g. red's diagonal neighbor
    rRD falls back to r (not rRight/rDown) whenever the pixel sits on the
    bottom row OR right column (debayer.go:85-99), and blue mirrors that
    at the top/left (debayer.go:223-237)."""
    xo, yo = _CFA_OFF[cfa.upper()]
    h, w = data.shape
    aw = (w - xo) & ~1
    ah = (h - yo) & ~1
    out = np.zeros((ah, aw), np.float32)
    d = data

    for row in range(0, ah, 2):
        for col in range(0, aw, 2):
            sr, sc = row + yo, col + xo
            if channel == "R":
                r = d[sr, sc]
                r_right, r_down, r_rd = r, r, r
                if sc < w - 2:
                    r_right = d[sr, sc + 2]
                    if sr < h - 2:
                        r_down = d[sr + 2, sc]
                        r_rd = d[sr + 2, sc + 2]
                elif sr < h - 2:
                    r_down = d[sr + 2, sc]
                out[row, col] = r
                out[row, col + 1] = 0.5 * (r + r_right)
                out[row + 1, col] = 0.5 * (r + r_down)
                out[row + 1, col + 1] = 0.25 * (r + r_right + r_down + r_rd)
            elif channel == "G":
                g1 = d[sr, sc + 1]
                g2 = d[sr + 1, sc]
                wgt = np.float32(1.0 / (2.0 + _SQRT2))
                g1_left = (2.0 * g1 + _SQRT2 * g2) * wgt
                g2_up = (_SQRT2 * g1 + 2.0 * g2) * wgt
                if sc > 0:
                    g1_left = d[sr, sc - 1]
                if sr > 0:
                    g2_up = d[sr - 1, sc]
                g2_right = (2.0 * g1 + _SQRT2 * g2) * wgt
                g1_down = (_SQRT2 * g1 + 2.0 * g2) * wgt
                if sc < w - 2:
                    g2_right = d[sr + 1, sc + 2]
                if sr < h - 2:
                    g1_down = d[sr + 2, sc + 1]
                out[row, col] = 0.25 * (g1 + g2 + g1_left + g2_up)
                out[row, col + 1] = g1
                out[row + 1, col] = g2
                out[row + 1, col + 1] = 0.25 * (g1 + g2 + g2_right + g1_down)
            else:  # B
                b = d[sr + 1, sc + 1]
                b_left, b_up, b_lu = b, b, b
                if sc > 0:
                    b_left = d[sr + 1, sc - 1]
                    if sr > 0:
                        b_up = d[sr - 1, sc + 1]
                        b_lu = d[sr - 1, sc - 1]
                elif sr > 0:
                    b_up = d[sr - 1, sc + 1]
                out[row, col] = 0.25 * (b + b_left + b_up + b_lu)
                out[row, col + 1] = 0.5 * (b + b_up)
                out[row + 1, col] = 0.5 * (b + b_left)
                out[row + 1, col + 1] = b
    return out


class TestDebayerOracle:
    @pytest.mark.parametrize("cfa", ["RGGB", "GRBG", "GBRG", "BGGR"])
    @pytest.mark.parametrize("channel", ["R", "G", "B"])
    def test_matches_go_including_edges(self, cfa, channel, rng):
        from nightlight_tpu.ops.prestack import debayer_bilinear

        # distinct values everywhere so any wrong neighbor pick is visible
        data = rng.uniform(0.0, 1000.0, size=(12, 14)).astype(np.float32)
        got = np.asarray(debayer_bilinear(data, channel, cfa))
        ref = go_debayer_oracle(data, channel, cfa)
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-4)

    @pytest.mark.parametrize("shape", [(9, 11), (10, 11), (9, 12), (6, 6)])
    def test_odd_sizes_crop_like_reference(self, shape, rng):
        from nightlight_tpu.ops.prestack import debayer_bilinear

        data = rng.uniform(0.0, 1000.0, size=shape).astype(np.float32)
        for cfa in ("RGGB", "BGGR"):
            for ch in ("R", "G", "B"):
                got = np.asarray(debayer_bilinear(data, ch, cfa))
                ref = go_debayer_oracle(data, ch, cfa)
                assert got.shape == ref.shape
                np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-4)


# ---------------------------------------------------------------------------
# Oracle 5: the iterative auto-stretch decision (stretch.go:103-159)
# ---------------------------------------------------------------------------


def go_stretch_decision_oracle(loc, scale, tloc, tscale):
    """Scalar transliteration of one OpStretchIterative round
    (stretch.go:117-155): the 401-step gamma grid search accumulated in
    float32 exactly as Go's `gamma += 0.01`, float64 math.Pow on float32
    operands, and — decisively — Go's NaN semantics: when loc < scale,
    math.Pow(loc-scale, 1/gamma) is NaN and math.Max(0, NaN) KEEPS the NaN
    (np.maximum matches; Python's max() would not), so every candidate
    delta is NaN, nothing beats the baseline, and the search yields gamma 1
    = "done". Returns (action, param) with ops.autostretch's ACT_* codes."""
    from nightlight_tpu.ops.autostretch import (
        ACT_BLACK, ACT_DONE, ACT_DONE_GAMMA, ACT_GAMMA)

    loc, scale, tloc, tscale = (np.float32(v)
                                for v in (loc, scale, tloc, tscale))
    if loc <= tloc * np.float32(1.01) and scale < tscale:
        ideal_gamma = np.float32(1.0)
        ideal_delta = np.float32(abs(np.float64(tscale) - np.float64(scale)))
        gamma = np.float32(1.0)
        while gamma <= np.float32(5.0):
            e = 1.0 / np.float64(gamma)
            with np.errstate(invalid="ignore"):
                nl_lower = np.float32(
                    np.power(np.float64(loc) - np.float64(scale), e))
                nl = np.float32(np.power(np.float64(loc), e))
                nl_upper = np.float32(
                    np.power(np.float64(loc) + np.float64(scale), e))
            black = (tloc - nl) / (tloc - np.float32(1.0))
            s = np.float32(1.0) / (np.float32(1.0) - black)
            lower = np.float32(np.maximum(np.float64(0.0),
                                          np.float64((nl_lower - black) * s)))
            upper = np.float32(np.maximum(np.float64(0.0),
                                          np.float64((nl_upper - black) * s)))
            new_scale = np.float32(upper - lower) / np.float32(2.0)
            delta = np.float32(abs(np.float64(tscale) - np.float64(new_scale)))
            if delta < ideal_delta:  # NaN delta never wins (stretch.go:136)
                ideal_gamma, ideal_delta = gamma, delta
            gamma = np.float32(gamma + np.float32(0.01))
        if ideal_gamma <= np.float32(1.01):
            return ACT_DONE_GAMMA, 0.0
        return ACT_GAMMA, float(ideal_gamma)
    elif loc > tloc * np.float32(0.99) and scale < tscale:
        return ACT_BLACK, float(loc)
    return ACT_DONE, 0.0


class TestStretchDecisionOracle:
    TLOC, TSCALE = 0.1, 0.004  # OpStretchIterative defaults (stretch.go:79)

    def _both(self, loc, scale):
        import jax.numpy as jnp

        from nightlight_tpu.ops.autostretch import stretch_decision

        a, p = stretch_decision(jnp.float32(loc), jnp.float32(scale),
                                jnp.float32(self.TLOC),
                                jnp.float32(self.TSCALE))
        oa, op_ = go_stretch_decision_oracle(loc, scale, self.TLOC,
                                             self.TSCALE)
        return (float(a), float(p)), (oa, op_)

    def test_gamma_round_matches_go_grid_search(self):
        (a, p), (oa, op_) = self._both(0.05, 0.0015)
        from nightlight_tpu.ops.autostretch import ACT_GAMMA

        assert a == oa == ACT_GAMMA
        # the oracle accumulates its grid in f32 (Go) while production uses
        # arange: the selected gammas may sit one 0.01 step apart at ties
        assert abs(p - op_) <= 0.0101

    def test_black_shift_round(self):
        (a, p), (oa, op_) = self._both(0.2, 0.001)
        from nightlight_tpu.ops.autostretch import ACT_BLACK

        assert a == oa == ACT_BLACK
        assert p == pytest.approx(op_, rel=1e-6)

    def test_done_when_scale_reached(self):
        (a, _), (oa, _) = self._both(0.05, 0.005)
        from nightlight_tpu.ops.autostretch import ACT_DONE

        assert a == oa == ACT_DONE

    def test_nan_quirk_loc_below_scale_declares_done(self):
        # loc < scale poisons every Go candidate with NaN -> gamma 1 ->
        # done. A clamped pow (max(loc-scale, 0)) would instead pick a
        # real gamma and keep stretching — the divergence this oracle
        # exists to catch.
        (a, _), (oa, _) = self._both(0.001, 0.003)
        from nightlight_tpu.ops.autostretch import ACT_DONE_GAMMA

        assert a == oa == ACT_DONE_GAMMA

    def test_randomized_sweep_actions_always_match(self, rng):
        for _ in range(60):
            loc = float(rng.uniform(0.0005, 0.3))
            scale = float(rng.uniform(0.0002, 0.008))
            (a, p), (oa, op_) = self._both(loc, scale)
            assert a == oa, (loc, scale)
            from nightlight_tpu.ops.autostretch import ACT_GAMMA

            if a == ACT_GAMMA:
                assert abs(p - op_) <= 0.0101, (loc, scale)


# ---------------------------------------------------------------------------
# Oracle 6: reference-frame selection (refframe.go:212-258)
# ---------------------------------------------------------------------------


def go_select_median_loc_oracle(locations):
    """selectReferenceMedianLoc (refframe.go:229-258): drop NaNs
    (removeNaNs, stable), QSelect median (even n -> average of middle two),
    then the first frame whose squared distance to the median strictly
    beats the best so far — NaN distances never win. Returns
    (index, median)."""
    clean = [v for v in locations if not np.isnan(v)]
    if not clean:
        return None, None
    median = go_median(np.array(clean, np.float32))
    best, best_d = None, np.float32(np.finfo(np.float32).max)
    for i, v in enumerate(locations):
        d = np.float32(v - median) ** 2
        if d < best_d:
            best, best_d = i, d
    return best, float(median)


class TestSelectRefOracle:
    def _frames(self, locations):
        from types import SimpleNamespace

        return [SimpleNamespace(id=i, stats=SimpleNamespace(location=v))
                for i, v in enumerate(locations)]

    @pytest.mark.parametrize("locs", [
        [0.11, 0.09, 0.10, 0.30, 0.05],
        [0.2, 0.1],                       # even n: median is the average
        [1.0],
        [0.5, float("nan"), 0.1, 0.11],   # NaN frame must not poison
        [float("nan"), float("nan"), 7.0],
    ])
    def test_median_loc_matches_go(self, locs):
        from nightlight_tpu.pipeline.ops_ref import _select_median_loc

        frame, median = _select_median_loc(self._frames(locs))
        oidx, omedian = go_select_median_loc_oracle(locs)
        assert frame.id == oidx
        assert median == pytest.approx(omedian, rel=1e-6)

    def test_all_nan_raises_like_go_errors(self):
        from nightlight_tpu.pipeline.ops_ref import _select_median_loc

        with pytest.raises(ValueError):
            _select_median_loc(self._frames([float("nan")] * 3))

    def test_stars_over_hfr_matches_go(self):
        # score = len(stars)/HFR, zeroed when no stars or HFR==0
        # (refframe.go:212-227); first maximum wins, a zero-score frame
        # still beats the -1 sentinel
        from types import SimpleNamespace

        from nightlight_tpu.pipeline.ops_ref import _select_stars_over_hfr

        def fr(i, n, hfr):
            return SimpleNamespace(id=i, stars=list(range(n)), hfr=hfr)

        frames = [fr(0, 0, 3.0), fr(1, 40, 4.0), fr(2, 50, 4.0),
                  fr(3, 50, 0.0)]
        ref, score = _select_stars_over_hfr(frames)
        assert ref.id == 2 and score == pytest.approx(12.5)
        ref, score = _select_stars_over_hfr([fr(0, 0, 3.0)])
        assert ref.id == 0 and score == 0.0


# ---------------------------------------------------------------------------
# Oracle 7: automatic color balance building blocks (fits/rgb.go:92-281)
# ---------------------------------------------------------------------------


def go_find_darkest_block_oracle(cube, block, border):
    """findDarkestBlock (rgb.go:153-219): block grid from
    (int(dim*border)/block)*block to ((dim-first)/block)*block, per-block
    channel means, luminance = plain (r+g+b)/3, strict < keeps the FIRST
    minimal block in row-major scan order."""
    _, h, w = cube.shape
    x_first = (int(np.float32(w) * np.float32(border)) // block) * block
    x_last = ((w - x_first) // block) * block
    y_first = (int(np.float32(h) * np.float32(border)) // block) * block
    y_last = ((h - y_first) // block) * block
    inv = np.float32(1.0) / np.float32(block * block)
    best, lmin = None, np.float32(np.finfo(np.float32).max)
    for yb in range(y_first, y_last, block):
        for xb in range(x_first, x_last, block):
            means = []
            for c in range(3):
                blk = cube[c, yb:yb + block, xb:xb + block]
                rows = blk.sum(axis=1, dtype=np.float32)
                means.append(np.float32(rows.sum(dtype=np.float32) * inv))
            lum = np.float32((means[0] + means[1] + means[2])
                             / np.float32(3.0))
            if lum < lmin:
                best, lmin = means, lum
    return np.array(best, np.float32)


def go_mean_star_intensity_oracle(cube, stars, skip_bright, skip_dim, clip):
    """meanStarIntensity (rgb.go:223-281): skip the brightest/dimmest star
    fractions (stars sorted brightest-first), walk the integer window
    [c-hfrR, c+hfrR] with hfrR = int(0.75*HFR + 0.5), keep pixels inside
    the (0.75*HFR + 0.01)^2 disk whose r,g,b ALL sit below the clip color,
    and average. Faithful quirk: zero passing pixels means norm = 1/0 =
    +Inf and RGB{0*Inf} = NaN (rgb.go:279-280)."""
    n = len(stars)
    if n == 0:
        return (0.0, 0.0, 0.0)
    s_start = int(np.float32(n) * np.float32(skip_bright))
    s_end = n - int(np.float32(n) * np.float32(skip_dim))
    if s_start >= s_end:
        return (0.0, 0.0, 0.0)
    _, h, w = cube.shape
    tot = np.zeros(3, np.float32)
    tot_px = 0
    for sx, sy, hfr in stars[s_start:s_end]:
        hfr = np.float32(hfr) * np.float32(0.75)
        hfr_r = int(hfr + np.float32(0.5))
        hfr_sq = np.float32(hfr + np.float32(0.01)) ** 2
        for off_y in range(-hfr_r, hfr_r + 1):
            y = sy + off_y
            if 0 <= y < h:
                for off_x in range(-hfr_r, hfr_r + 1):
                    x = sx + off_x
                    if 0 <= x < w:
                        if np.float32(off_x ** 2 + off_y ** 2) <= hfr_sq:
                            r, g, b = cube[0, y, x], cube[1, y, x], cube[2, y, x]
                            if r < clip[0] and g < clip[1] and b < clip[2]:
                                tot += (r, g, b)
                                tot_px += 1
    with np.errstate(invalid="ignore", divide="ignore"):
        norm = np.float32(1.0) / np.float32(tot_px)  # Inf when tot_px == 0
        return tuple(np.float32(t * norm) for t in tot)


def go_black_white_correction_oracle(cur_sh, cur_hi, tgt_sh, tgt_hi):
    """setBlackWhitePoints factor math (rgb.go:125-148): average current
    shadow/highlight as the new neutral levels, scale by the target tints,
    then alpha = (newHi-newSh)/(curHi-curSh), beta = newSh - alpha*curSh,
    all in float32."""
    cs = np.asarray(cur_sh, np.float32)
    ch = np.asarray(cur_hi, np.float32)
    new_shadow = np.float32((cs[0] + cs[1] + cs[2]) / np.float32(3.0))
    ns = np.asarray(tgt_sh, np.float32) * new_shadow
    new_highlight = np.float32((ch[0] + ch[1] + ch[2]) / np.float32(3.0))
    nh = np.asarray(tgt_hi, np.float32) * new_highlight
    alpha = (nh - ns) / (ch - cs)
    beta = ns - alpha * cs
    return alpha, beta


class TestColorBalanceOracles:
    def test_darkest_block_matches_go(self, rng):
        import jax.numpy as jnp

        from nightlight_tpu.ops.rgb import find_darkest_block

        cube = rng.uniform(0.0, 1.0, size=(3, 48, 64)).astype(np.float32)
        cube[:, 32:40, 16:24] *= 0.05  # an unambiguous darkest block
        for block, border in ((8, 0.1), (16, 0.1), (8, 0.0), (8, 0.25)):
            got = np.asarray(find_darkest_block(jnp.asarray(cube), block,
                                                border))
            ref = go_find_darkest_block_oracle(cube, block, border)
            np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    def test_mean_star_intensity_matches_go(self, rng):
        from nightlight_tpu.detect.stars import StarList
        from nightlight_tpu.ops.rgb import mean_star_intensity

        h, w = 40, 56
        cube = rng.uniform(0.0, 1000.0, size=(3, h, w)).astype(np.float32)
        n = 9
        xs = rng.integers(2, w - 3, n)
        ys = rng.integers(2, h - 3, n)
        xs[0], ys[0] = 0, 0          # corner star: window clipped
        hfrs = rng.uniform(1.0, 4.0, n).astype(np.float32)
        stars = StarList(
            x=xs.astype(np.float32), y=ys.astype(np.float32),
            value=np.ones(n, np.float32),
            mass=np.linspace(900, 100, n).astype(np.float32),
            hfr=hfrs, count=n)
        clip = (900.0, 920.0, 940.0)
        triples = list(zip(xs.tolist(), ys.tolist(), hfrs.tolist()))
        for skip_b, skip_d in ((0.0, 0.0), (0.2, 0.1)):
            got = mean_star_intensity(cube, stars, skip_b, skip_d, clip)
            ref = go_mean_star_intensity_oracle(cube, triples, skip_b,
                                                skip_d, clip)
            np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-4)

    def test_all_pixels_clipped_deviates_from_go_nan(self, rng):
        # Go's norm = 1/0 makes RGB{NaN,NaN,NaN} when every star pixel is
        # clipped (rgb.go:279-280), which then NaN-poisons the whole image
        # through setBlackWhitePoints. This repo deliberately returns
        # (0,0,0) instead — same fixed-during-port policy as the
        # stackbatches frame-loss bug (PARITY.md).
        from nightlight_tpu.detect.stars import StarList
        from nightlight_tpu.ops.rgb import mean_star_intensity

        cube = np.full((3, 16, 16), 500.0, np.float32)
        stars = StarList(x=np.array([8.0], np.float32),
                         y=np.array([8.0], np.float32),
                         value=np.ones(1, np.float32),
                         mass=np.array([100.0], np.float32),
                         hfr=np.array([2.0], np.float32), count=1)
        clip = (1.0, 1.0, 1.0)  # everything is "clipped"
        ref = go_mean_star_intensity_oracle(cube, [(8, 8, 2.0)], 0.0, 0.0,
                                            clip)
        assert all(np.isnan(v) for v in ref)  # the reference quirk
        got = mean_star_intensity(cube, stars, 0.0, 0.0, clip)
        assert got == (0.0, 0.0, 0.0)  # our documented deviation

    def test_black_white_correction_matches_go(self, rng):
        from nightlight_tpu.ops.rgb import RGB, black_white_correction

        cs = rng.uniform(0.01, 0.1, 3).astype(np.float32)
        ch = rng.uniform(0.5, 0.9, 3).astype(np.float32)
        alpha, beta = black_white_correction(
            tuple(cs), tuple(ch), RGB(1.0, 1.0, 1.0), RGB(1.0, 1.0, 1.0))
        oalpha, obeta = go_black_white_correction_oracle(
            cs, ch, (1.0, 1.0, 1.0), (1.0, 1.0, 1.0))
        np.testing.assert_allclose(alpha, oalpha, rtol=1e-6)
        np.testing.assert_allclose(beta, obeta, rtol=1e-6, atol=1e-7)


# ---------------------------------------------------------------------------
# Oracle 8: the WEIGHTED stacking clip loops (stack.go:442-531, 710-800)
# ---------------------------------------------------------------------------


def go_stack_clip_weighted_oracle(frames, weights, ref_frame_loc, sigma_low,
                                  sigma_high, winsorize):
    """StackSigmaWeighted / StackWinsorSigmaWeighted: the clip loop is the
    UNWEIGHTED one (median + unweighted std decide the bounds), but the
    result differs from the unweighted variants in WHEN the mean is taken:
    the weighted mean sum(w*g)/sum(w) runs over the survivors AFTER the
    terminating round's removal (stack.go:514-522), where the unweighted
    loop writes the mean from BEFORE it (stack.go:425-429)."""
    n, p = frames.shape
    res = np.empty(p, np.float32)
    clip_lo = clip_hi = 0
    sigma_low = np.float32(sigma_low)
    sigma_high = np.float32(sigma_high)
    weights = np.asarray(weights, np.float32)
    for i in range(p):
        g = frames[:, i]
        keep_mask = ~np.isnan(g)
        g = g[keep_mask].astype(np.float32)
        w = weights[keep_mask]
        if g.size == 0:
            res[i] = ref_frame_loc
            continue
        while True:
            median = go_median(g)
            _, std = go_mean_stddev(g)
            if winsorize:
                wz = g.copy()
                while True:
                    lo_b, hi_b = median - 1.5 * std, median + 1.5 * std
                    changed = int(np.sum((wz < lo_b) | (wz > hi_b)))
                    wz = np.clip(wz, lo_b, hi_b)
                    old = std
                    _, std = go_mean_stddev(wz)
                    std *= np.float32(1.134)
                    if changed == 0 or abs(std - old) / old <= 0.0005:
                        break
            lo_b = median - sigma_low * std
            hi_b = median + sigma_high * std
            survivors = (g >= lo_b) & (g <= hi_b)
            nl = int(np.sum(g < lo_b))
            nh = int(np.sum(g > hi_b))
            clip_lo += nl
            clip_hi += nh
            if nl + nh == 0 or np.sum(survivors) <= 1:
                gs, ws = g[survivors], w[survivors]
                with np.errstate(invalid="ignore"):
                    res[i] = np.float32(np.sum(gs * ws, dtype=np.float32)
                                        / np.sum(ws, dtype=np.float32))
                break
            g, w = g[survivors], w[survivors]
    return res, clip_lo, clip_hi


class TestWeightedStackClipOracles:
    REF_LOC = 1234.5

    def _check(self, frames, mode_fn, winsorize, sig=(2.0, 2.0)):
        import jax.numpy as jnp

        n = frames.shape[0]
        rngw = np.random.default_rng(7)
        weights = rngw.uniform(0.2, 1.0, n).astype(np.float32)
        out, cl, ch = mode_fn(jnp.asarray(frames), jnp.asarray(weights),
                              jnp.float32(self.REF_LOC),
                              jnp.float32(sig[0]), jnp.float32(sig[1]))
        ref, rcl, rch = go_stack_clip_weighted_oracle(
            frames, weights, self.REF_LOC, sig[0], sig[1], winsorize)
        assert int(cl) == rcl and int(ch) == rch
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-2)

    def test_sigma_weighted_matches_go_loop(self, clip_frames):
        from nightlight_tpu.ops.stack import stack_sigma_weighted

        self._check(clip_frames, stack_sigma_weighted, winsorize=False)

    def test_sigma_weighted_asymmetric(self, clip_frames):
        from nightlight_tpu.ops.stack import stack_sigma_weighted

        self._check(clip_frames, stack_sigma_weighted, winsorize=False,
                    sig=(1.5, 3.0))

    def test_winsor_weighted_matches_go_loop(self, clip_frames):
        from nightlight_tpu.ops.stack import stack_winsor_sigma_weighted

        self._check(clip_frames, stack_winsor_sigma_weighted, winsorize=True)

    def test_get_weights_inverse_noise_formula(self):
        # w = 1/(1 + 4*(n-min)/(max-min)) (stack.go:241-253); the all-equal
        # range is a documented deviation: Go divides 0/0 into NaN weights,
        # this repo returns 1.0 for every frame
        from types import SimpleNamespace

        from nightlight_tpu.ops.stack import StackWeighting, get_weights

        def fr(noise):
            return SimpleNamespace(id=0, exposure=1.0, hfr=1.0,
                                   stats=SimpleNamespace(noise=noise))

        w = np.asarray(get_weights([fr(2.0), fr(4.0), fr(3.0)],
                                   StackWeighting.InverseNoise))
        np.testing.assert_allclose(
            w, [1.0, 1.0 / 5.0, 1.0 / 3.0], rtol=1e-6)
        w = np.asarray(get_weights([fr(2.0), fr(2.0)],
                                   StackWeighting.InverseNoise))
        np.testing.assert_allclose(w, [1.0, 1.0])


# ---------------------------------------------------------------------------
# Oracle 9: histogram peak loc/scale + Immerkaer noise (stats.go:640-688,
# noise.go:32-55)
# ---------------------------------------------------------------------------


def go_histogram_scale_loc_oracle(data, vmin, vmax, num_bins):
    """HistogramScaleLoc (stats.go:640-688): bins by round-half-up mapping,
    INNER peak (edge bins excluded, first max wins), then rings of
    adjacent bins accumulate around the peak until 68.27% of the samples
    are covered; the ring walk is clamped to min(peak, last-peak) and the
    scale is the half-width of the covered interval in value units. The
    pre-loop scale (half a bin) survives when the peak bin alone covers
    one sigma."""
    vmin = np.float32(vmin)
    vmax = np.float32(vmax)
    if vmin == vmax:
        return float(vmin), 0.0
    bins = np.zeros(num_bins, np.int64)
    v2b = np.float32(num_bins - 1) / (vmax - vmin)
    for d in np.asarray(data, np.float32).reshape(-1):
        bins[int((d - vmin) * v2b + np.float32(0.5))] += 1
    peak_bin, peak_count = 0, 0
    for b in range(1, num_bins - 1):
        if bins[b] > peak_count:
            peak_bin, peak_count = b, bins[b]
    loc = vmin + np.float32(peak_bin) / v2b
    thr = int(np.float32(data.size) * np.float32(0.6827))
    limit = min(peak_bin, num_bins - 1 - peak_bin)
    cum = peak_count
    scale = np.float32(0.5) / v2b
    if cum < thr:
        for i in range(1, limit + 1):
            cum += bins[peak_bin - i] + bins[peak_bin + i]
            scale = np.float32(0.5) * np.float32(2 * i + 1) / v2b
            if cum >= thr:
                break
    return float(loc), float(scale)


def go_estimate_noise_oracle(img):
    """estimateNoisePureGo (noise.go:32-55): 3x3 Laplacian-difference
    responses summed as |conv| over the interior, scaled by
    sqrt(pi/2) / (6 (w-2)(h-2))."""
    img = np.asarray(img, np.float32)
    h, w = img.shape
    wts = np.array([[1, -2, 1], [-2, 4, -2], [1, -2, 1]], np.float32)
    total = np.float32(0)
    for y in range(1, h - 1):
        row = np.float32(0)
        for x in range(1, w - 1):
            conv = np.float32((img[y - 1:y + 2, x - 1:x + 2] * wts).sum())
            row += abs(conv)
        total += row
    return float(total * np.float32(np.sqrt(0.5 * np.pi))
                 / (6 * np.float32(w - 2) * np.float32(h - 2)))


class TestHistogramNoiseOracles:
    def test_histogram_scale_loc_matches_go(self, rng):
        import jax.numpy as jnp

        from nightlight_tpu.ops.stats import histogram_scale_loc

        data = rng.normal(0.3, 0.02, size=4096).astype(np.float32)
        data = np.clip(data, 0.0, 1.0)
        for bins in (64, 256):
            loc, scale = histogram_scale_loc(
                jnp.asarray(data), jnp.float32(data.min()),
                jnp.float32(data.max()), num_bins=bins)
            oloc, oscale = go_histogram_scale_loc_oracle(
                data, data.min(), data.max(), bins)
            assert float(loc) == pytest.approx(oloc, abs=1e-6)
            assert float(scale) == pytest.approx(oscale, abs=1e-6)

    def test_histogram_peak_near_edge_limits_ring_walk(self, rng):
        # peak in bin 1: intervalLimit = 1, the one-sigma ring walk stops
        # at the clamp and the scale reports the covered interval only
        import jax.numpy as jnp

        from nightlight_tpu.ops.stats import histogram_scale_loc

        data = np.concatenate([
            np.full(500, 0.01, np.float32),           # peak near vmin
            rng.uniform(0.0, 1.0, 1500).astype(np.float32),
        ])
        loc, scale = histogram_scale_loc(
            jnp.asarray(data), jnp.float32(0.0), jnp.float32(1.0),
            num_bins=64)
        oloc, oscale = go_histogram_scale_loc_oracle(data, 0.0, 1.0, 64)
        assert float(loc) == pytest.approx(oloc, abs=1e-6)
        assert float(scale) == pytest.approx(oscale, abs=1e-6)

    def test_single_bin_mass_keeps_half_bin_scale(self):
        # the peak bin alone exceeds one sigma -> the pre-loop half-bin
        # scale survives (stats.go:675 initial value)
        import jax.numpy as jnp

        from nightlight_tpu.ops.stats import histogram_scale_loc

        data = np.full(1000, 0.5, np.float32)
        data[0], data[-1] = 0.0, 1.0  # give the range width
        loc, scale = histogram_scale_loc(
            jnp.asarray(data), jnp.float32(0.0), jnp.float32(1.0),
            num_bins=64)
        oloc, oscale = go_histogram_scale_loc_oracle(data, 0.0, 1.0, 64)
        assert float(loc) == pytest.approx(oloc, abs=1e-6)
        assert float(scale) == pytest.approx(oscale, abs=1e-6)

    def test_estimate_noise_matches_go(self, rng):
        import jax.numpy as jnp

        from nightlight_tpu.ops.stats import estimate_noise

        img = rng.normal(100.0, 3.0, size=(24, 32)).astype(np.float32)
        got = float(estimate_noise(jnp.asarray(img)))
        ref = go_estimate_noise_oracle(img)
        assert got == pytest.approx(ref, rel=1e-4)
        # a clean gradient image has ~zero Laplacian response
        grad = np.outer(np.arange(24, dtype=np.float32),
                        np.ones(32, np.float32))
        assert float(estimate_noise(jnp.asarray(grad))) == pytest.approx(
            go_estimate_noise_oracle(grad), abs=1e-6)


# ---------------------------------------------------------------------------
# Oracle 10: point-op pixel functions (pixelops.go:143-260, 560-660)
# ---------------------------------------------------------------------------


def go_midtones_oracle(data, mid, black):
    """pfMidtones (pixelops.go:214-229): the raw rational transfer value is
    clamped to CONSTANTS 0/1 BEFORE the (v-clipLow)*scaler rescale — so
    out-of-range pixels land at -clipLow*scaler and scaler, not 0 and 1."""
    mid = np.float32(mid)
    black = np.float32(black)
    d = np.asarray(data, np.float32)
    clip_low = black * (mid - 1) / ((2 * mid - 1) * black - mid)
    scaler = np.float32(1.0) / (np.float32(1.0) - clip_low)
    v = d * (mid - 1) / ((2 * mid - 1) * d - mid)
    v = np.where(v < clip_low, np.float32(0), np.where(v > 1, np.float32(1), v))
    return (v - clip_low) * scaler


def go_partial_gamma_oracle(data, from_, to, g):
    """pfPartialGamma (pixelops.go:179-191): values strictly inside
    (from, to) are gamma-boosted on the rescaled interval; everything else
    passes through untouched."""
    d = np.asarray(data, np.float32)
    out = d.copy()
    inside = (d > np.float32(from_)) & (d < np.float32(to))
    dd = (d[inside] - np.float32(from_)) / np.float32(to - from_)
    out[inside] = np.float32(from_) + np.float32(to - from_) * \
        np.power(np.float64(dd), 1.0 / np.float64(g)).astype(np.float32)
    return out


def go_shift_black_oracle(data, before, after):
    """ShiftBlackToMove (pixelops.go:649-660)."""
    before = np.float32(before)
    after = np.float32(after)
    black = (after - before) / (after - np.float32(1.0))
    scale = np.float32(1.0) / (np.float32(1.0) - black)
    return np.maximum(np.float32(0.0),
                      (np.asarray(data, np.float32) - black) * scale)


class TestPointOpOracles:
    def test_midtones_matches_go_incl_preclip_quirk(self, rng):
        import jax.numpy as jnp

        from nightlight_tpu.ops.pixelmath import midtones

        d = rng.uniform(0.0, 1.0, 2048).astype(np.float32)
        d[:8] = [0.0, 1.0, 0.001, 0.999, 0.25, 0.5, 0.75, 0.1]
        for mid, black in ((0.25, 0.05), (0.4, 0.0), (0.15, 0.12)):
            got = np.asarray(midtones(jnp.asarray(d), mid, black))
            ref = go_midtones_oracle(d, mid, black)
            np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)

    def test_partial_gamma_matches_go(self, rng):
        import jax.numpy as jnp

        from nightlight_tpu.ops.pixelmath import partial_gamma

        d = rng.uniform(0.0, 1.0, 2048).astype(np.float32)
        from_, to, g = 0.3, 1.0, 2.2
        d[:4] = [from_, to, 0.3000001, 0.9999999]  # boundary passthrough
        got = np.asarray(partial_gamma(jnp.asarray(d), from_, to, g))
        ref = go_partial_gamma_oracle(d, from_, to, g)
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)
        # exactly-at-boundary values pass through (strict inequalities)
        assert got[0] == d[0] and got[1] == d[1]

    def test_shift_black_matches_go(self, rng):
        import jax.numpy as jnp

        from nightlight_tpu.ops.pixelmath import shift_black_to_move

        d = rng.uniform(0.0, 1.0, 1024).astype(np.float32)
        got = np.asarray(shift_black_to_move(jnp.asarray(d), 0.2, 0.1))
        ref = go_shift_black_oracle(d, 0.2, 0.1)
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Oracle 11: IKSS iterative k-sigma estimator (stats.go:501-566)
# ---------------------------------------------------------------------------


def go_ikss_oracle(data, epsilon=1e-6, max_iter=200):
    """IKSS (stats.go:535-566) with bwmv (stats.go:501-532): sort once,
    then iterate {window median = xs[(i+j)>>1] (no even-averaging),
    biweight midvariance about it, converge when s < eps (scale 0) or
    s0-s < s*eps (scale 0.991*s), else shrink the window to m +/- 4s}.
    The window median always survives the shrink, so the empty-window
    return (0,0) is unreachable for n >= 1.

    Faithful hazard (max_iter guards it): when the window is CONSTANT,
    mad = 0 makes every y NaN/Inf, all weights drop, s = sqrt(n*0/0) =
    NaN, every convergence comparison is false, and the NaN shrink bounds
    move nothing — the reference LOOPS FOREVER (stats.go:544-564 has no
    iteration cap). Production ikss guards the zero denominators and
    returns scale 0 instead."""
    xs = np.sort(np.asarray(data, np.float32).reshape(-1))
    i, j = 0, len(xs)
    s0 = np.float32(1.0)
    for _ in range(max_iter):
        m = xs[(i + j) >> 1]
        w = xs[i:j]
        mad = go_median(np.abs(w - m))
        with np.errstate(invalid="ignore", divide="ignore"):
            ys = (w - m) / np.float32(9.0 * mad)  # NaN/Inf when mad == 0
        a = (ys > -1) & (ys < 1)
        one_m_y2 = np.float32(1.0) - ys * ys
        num = np.sum(a * (w - m) ** 2 * one_m_y2 ** 4, dtype=np.float32)
        den = np.sum(a * one_m_y2 * (np.float32(1.0) - 5 * ys * ys),
                     dtype=np.float32)
        s = np.float32(np.sqrt(np.float32(len(w)) * num / (den * den)))
        if s < epsilon:
            return float(m), 0.0
        if s0 - s < s * np.float32(epsilon):
            return float(m), float(np.float32(0.991) * s)
        s0 = s
        xlow, xhigh = m - 4 * s, m + 4 * s
        while xs[i] < xlow:
            i += 1
        while xs[j - 1] > xhigh:
            j -= 1
    return None, None  # did not converge within max_iter (the Go hang)


class TestIkssOracle:
    @pytest.mark.parametrize("n", [2000, 2001])
    def test_clean_gaussian_matches_go(self, n, rng):
        import jax.numpy as jnp

        from nightlight_tpu.ops.stats import ikss

        data = rng.normal(100.0, 5.0, size=n).astype(np.float32)
        loc, scale = ikss(jnp.asarray(data))
        oloc, oscale = go_ikss_oracle(data)
        assert float(loc) == pytest.approx(oloc, abs=1e-3)
        assert float(scale) == pytest.approx(oscale, rel=1e-3)

    def test_contaminated_matches_go(self, rng):
        import jax.numpy as jnp

        from nightlight_tpu.ops.stats import ikss

        data = rng.normal(100.0, 5.0, size=3000).astype(np.float32)
        data[:200] += 400.0  # bright contamination the window shrink rejects
        loc, scale = ikss(jnp.asarray(data))
        oloc, oscale = go_ikss_oracle(data)
        assert float(loc) == pytest.approx(oloc, abs=2e-3)
        assert float(scale) == pytest.approx(oscale, rel=2e-3)
        assert abs(oscale - 5.0) < 1.0  # robust to the contamination

    def test_constant_data_is_a_go_hang_we_guard(self):
        # the reference infinite-loops on a constant window (NaN from
        # mad=0 defeats every exit, see the oracle docstring); production
        # guards the zero denominators and returns (value, scale 0)
        import jax.numpy as jnp

        from nightlight_tpu.ops.stats import ikss

        data = np.full(512, 7.25, np.float32)
        oloc, oscale = go_ikss_oracle(data, max_iter=50)
        assert oloc is None  # the faithful loop never converges
        loc, scale = ikss(jnp.asarray(data))
        assert float(loc) == 7.25 and float(scale) == 0.0
