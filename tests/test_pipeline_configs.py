"""End-to-end coverage of the BASELINE.json benchmark configs that the basic
e2e tests don't reach: one-shot-color (Bayer) stacking and narrowband
Hubble-palette post-processing."""

import numpy as np
import jax.numpy as jnp
import pytest

from nightlight_tpu.image import Image
from nightlight_tpu.io import fits as nlfits
from tests.test_pipeline_e2e import STAR_POS, run_cli
from tests.test_stars import synth_field


def mosaic_from_rgb(r, g, b):
    """Interleave channel planes into an RGGB mosaic."""
    h, w = r.shape
    cfa = np.empty((h, w), np.float32)
    cfa[0::2, 0::2] = r[0::2, 0::2]
    cfa[0::2, 1::2] = g[0::2, 1::2]
    cfa[1::2, 0::2] = g[1::2, 0::2]
    cfa[1::2, 1::2] = b[1::2, 1::2]
    return cfa


class TestJSONAlignDrop:
    """JSON/REST jobs apply the residual-threshold drop AT the align op
    (postprocess.go:177-180): a downstream consumer that never calls
    check_align_drop (e.g. a custom chain) must not see the bad frame."""

    def test_unalignable_frame_dropped_before_downstream_ops(self, tmp_path, rng):
        import io
        import os

        from nightlight_tpu.pipeline import materialize_all, op_from_dict
        from nightlight_tpu.pipeline.context import new_context
        from tests.test_pipeline_e2e import write_frames

        write_frames(tmp_path, rng, n_frames=3)
        # frame with an unrelated star field: alignment residual explodes
        bad = synth_field(rng, h=256, w=256,
                          stars=[(31.0, 222.0), (130.0, 40.0), (201.0, 93.0),
                                 (66.0, 141.0), (243.0, 210.0), (140.0, 190.0),
                                 (88.0, 77.0), (180.0, 240.0), (40.0, 160.0),
                                 (222.0, 30.0)],
                          bg=100.0, noise=2.0, flux=8000.0, fwhm=8.0)
        im = Image.from_naxisn([256, 256], jnp.asarray(bad))
        im.exposure = 60.0
        nlfits.write_file(im, str(tmp_path / "light99.fits"))

        job = {"type": "seq", "steps": [
            {"type": "loadMany", "filePatterns": ["light*.fits"]},
            {"type": "starDetect", "radius": 16, "sigma": 10.0,
             "badPixelSigma": 5.0, "inOutRatio": 1.4},
            {"type": "selectRef", "target": 0, "mode": "0"},
            # genuine frames align at residual ~0.008; an unrelated field
            # chance-fits at best ~0.6, so 0.1 cleanly separates them
            {"type": "align", "k": 20, "threshold": 0.1, "oobMode": 2},
            {"type": "stack", "mode": 1},
            {"type": "save", "filePattern": "dropped.fits"},
        ]}
        log = io.StringIO()
        c = new_context(log=log)
        op = op_from_dict(job)
        cwd = os.getcwd()
        os.chdir(tmp_path)
        try:
            promises = op.make_promises([], c)
            _, err = materialize_all(promises, c.max_threads, True)
            if err is not None:
                raise err
            c.finalize()
        finally:
            os.chdir(cwd)
        out = log.getvalue()
        assert "skipping frame" in out
        assert "Stacking 3 frames" in out  # 4 loaded, 1 dropped at align


class TestOSCDebayerStack:
    """BASELINE config #3: debayer one-shot-color + align + stack."""

    def test_debayer_stack_red_channel(self, tmp_path, rng):
        for i in range(4):
            stars = [(x + 2.0 * i, y - 1.5 * i) for (x, y) in STAR_POS]
            lum = synth_field(rng, h=128, w=128, stars=stars, bg=100.0, noise=2.0,
                              flux=8000.0, fwhm=8.0)
            # red-dominant stars: R = lum, G/B = attenuated
            cfa = mosaic_from_rgb(lum, 0.6 * lum, 0.4 * lum)
            img = Image.from_naxisn([128, 128], cfa)
            img.exposure = 30.0
            nlfits.write_file(img, str(tmp_path / f"osc{i:02d}.fits"))

        rc = run_cli(["-out", "osc_stack.fits", "-log", "", "-jpg", "", "-exportStats", "",
                      "-debayer", "R", "-cfa", "RGGB", "-stMode", "1",
                      "stack", "osc*.fits"], tmp_path)
        assert rc == 0
        out = nlfits.read_file(str(tmp_path / "osc_stack.fits"), to_device=False)
        assert out.naxisn == [128, 128]  # full resolution after debayer
        d = out.to_numpy()
        # background must sit at the red channel level, stars present
        assert np.median(d) == pytest.approx(100.0, abs=3.0)
        assert d.max() > 140.0


    def test_fused_osc_matches_per_frame_path(self, tmp_path, rng, monkeypatch, capsys):
        """The fused whole-batch executor now covers debayer + pixel math +
        binning chains (VERDICT r2 item 3): its log lines and stacked output
        must be identical to the per-frame operator path."""
        for i in range(4):
            stars = [(x + 2.0 * i, y - 1.5 * i) for (x, y) in STAR_POS]
            lum = synth_field(rng, h=128, w=128, stars=stars, bg=100.0, noise=2.0,
                              flux=8000.0, fwhm=8.0)
            cfa = mosaic_from_rgb(lum, 0.6 * lum, 0.4 * lum)
            img = Image.from_naxisn([128, 128], cfa)
            img.exposure = 30.0
            nlfits.write_file(img, str(tmp_path / f"osc{i:02d}.fits"))

        args = ["-log", "", "-jpg", "", "-exportStats", "",
                "-debayer", "R", "-cfa", "RGGB", "-stMode", "1",
                "stack", "osc*.fits"]
        rc = run_cli(["-out", "fused.fits"] + args, tmp_path)
        assert rc == 0
        log_fused = capsys.readouterr().out
        assert "Removed" in log_fused and "bad bayer pixels" in log_fused
        assert "Debayered channel R from cfa RGGB, new size 128x128" in log_fused

        monkeypatch.setenv("NIGHTLIGHT_NO_FUSED", "1")
        rc = run_cli(["-out", "perframe.fits"] + args, tmp_path)
        assert rc == 0
        log_pf = capsys.readouterr().out

        def lines(s):
            # drop wall-clock and path-dependent lines
            return sorted(l for l in s.splitlines()
                          if l.startswith(tuple(f"{i}:" for i in range(4)))
                          and "Loaded" not in l and "statistics" not in l
                          and "Writing" not in l)

        import re

        num = re.compile(r"-?\d+\.?\d*")
        for lf, lp in zip(lines(log_fused), lines(log_pf), strict=True):
            # same text shape; numeric tokens equal to float tolerance (the
            # vmapped mean differs from the per-frame mean in the last
            # printed digit by summation order)
            assert num.sub("#", lf) == num.sub("#", lp), (lf, lp)
            for a, b in zip(num.findall(lf), num.findall(lp), strict=True):
                assert float(a) == pytest.approx(float(b), rel=1e-4, abs=1e-3), (lf, lp)
        a = nlfits.read_file(str(tmp_path / "fused.fits"), to_device=False).to_numpy()
        b = nlfits.read_file(str(tmp_path / "perframe.fits"), to_device=False).to_numpy()
        np.testing.assert_array_equal(np.isnan(a), np.isnan(b))
        m = ~np.isnan(a)
        np.testing.assert_allclose(a[m], b[m], rtol=0, atol=1e-3)


class TestFusedDeband:
    """Mono deband chain, fused-batch vs per-frame equivalence. Its own
    class: this is NOT an OSC/debayer config and must not be counted (or
    pruned) as one."""

    def test_fused_deband_matches_per_frame_path(self, tmp_path, rng, monkeypatch, capsys):
        """Deband stages inside the fused batch program vs the per-frame
        operators: identical logs (float tolerance) and stacked output."""
        from tests.test_pipeline_e2e import run_cli, write_frames

        write_frames(tmp_path, rng, n_frames=3)
        args = ["-log", "", "-jpg", "", "-exportStats", "",
                "-debandH", "50", "-debandV", "60", "-debandHWindow", "32",
                "-stMode", "1", "stack", "light*.fits"]
        rc = run_cli(["-out", "fused.fits"] + args, tmp_path)
        assert rc == 0
        log_fused = capsys.readouterr().out
        assert "De-banded horizontally" in log_fused
        assert "De-banded vertically" in log_fused

        monkeypatch.setenv("NIGHTLIGHT_NO_FUSED", "1")
        rc = run_cli(["-out", "perframe.fits"] + args, tmp_path)
        assert rc == 0
        log_pf = capsys.readouterr().out

        import re

        def lines(s):
            return sorted(l for l in s.splitlines() if "De-banded" in l)

        num = re.compile(r"-?\d+\.?\d*")
        for lf, lp in zip(lines(log_fused), lines(log_pf), strict=True):
            assert num.sub("#", lf) == num.sub("#", lp), (lf, lp)
            # 3-decimal prints: a 1e-5 float-order difference can flip the
            # last printed digit, so the band must exceed one print step
            for a, b in zip(num.findall(lf), num.findall(lp), strict=True):
                assert float(a) == pytest.approx(float(b), rel=1e-4, abs=2e-3), (lf, lp)
        a = nlfits.read_file(str(tmp_path / "fused.fits"), to_device=False).to_numpy()
        b = nlfits.read_file(str(tmp_path / "perframe.fits"), to_device=False).to_numpy()
        np.testing.assert_array_equal(np.isnan(a), np.isnan(b))
        m = ~np.isnan(a)
        # XLA float contraction differs between the fused and per-frame
        # program shapes (~1e-5 relative); that nudges star centroids, the
        # alignment transform shifts by ~1e-3 px, and steep star edges
        # amplify it to a few counts. Background must agree tightly; star
        # edges within the gradient-amplified band.
        diff = np.abs(a[m] - b[m])
        assert np.median(diff) < 1e-2     # ~1e-4 relative on the background
        assert np.quantile(diff, 0.99) < 0.5
        assert diff.max() < 20.0


class TestNarrowbandHubble:
    """BASELINE config #4: S2/Ha/O3 composite with hue rotation + SCNR."""

    def test_hubble_palette_flags(self, tmp_path, rng):
        for ch, gain in (("s2", 0.5), ("ha", 1.0), ("o3", 0.7)):
            img = synth_field(rng, h=96, w=96, stars=STAR_POS[:5], bg=100.0 * gain,
                              noise=1.0, flux=9000.0 * gain, fwhm=8.0)
            im = Image.from_naxisn([96, 96], img)
            im.exposure = 60.0
            nlfits.write_file(im, str(tmp_path / f"nb_{ch}.fits"))

        rc = run_cli(["-out", "hubble.fits", "-log", "", "-jpg", "hubble.jpg",
                      "-exportStats", "",
                      "-rotFrom", "100", "-rotTo", "190", "-rotBy", "-30",
                      "-scnr", "0.5", "-chromaGamma", "1.2",
                      "-neutSigmaLow", "0.5", "-neutSigmaHigh", "1.0",
                      "rgb", "nb_s2.fits", "nb_ha.fits", "nb_o3.fits"], tmp_path)
        assert rc == 0
        out = nlfits.read_file(str(tmp_path / "hubble.fits"), to_device=False)
        assert out.naxisn == [96, 96, 3]
        d = out.to_numpy()
        assert np.isfinite(d).all()
        assert (tmp_path / "hubble.jpg").exists()
        # SCNR + rotation must reduce green dominance relative to a plain combine
        green_excess = d[1] - 0.5 * (d[0] + d[2])
        assert float(np.median(green_excess)) < 0.05


class TestLRGBCommand:
    """The `lrgb` command must actually dispatch (the reference lists it in
    usage and resolves its defaults but never runs it, main.go:301-414;
    round-5 wires it to the rgb DAG, which handles 4 inputs as L+RGB)."""

    def test_lrgb_runs_the_rgb_dag_with_luminance(self, tmp_path, rng):
        for ch, gain in (("l", 1.0), ("r", 0.8), ("g", 0.6), ("b", 0.9)):
            img = synth_field(rng, h=96, w=96, stars=STAR_POS[:5], bg=100.0 * gain,
                              noise=1.0, flux=9000.0 * gain, fwhm=8.0)
            im = Image.from_naxisn([96, 96], img)
            im.exposure = 60.0
            nlfits.write_file(im, str(tmp_path / f"ch_{ch}.fits"))
        rc = run_cli(["-out", "lrgb.fits", "-log", "", "-jpg", "",
                      "-exportStats", "", "lrgb", "ch_l.fits", "ch_r.fits",
                      "ch_g.fits", "ch_b.fits"], tmp_path)
        assert rc == 0
        out = nlfits.read_file(str(tmp_path / "lrgb.fits"), to_device=False)
        assert out.naxisn == [96, 96, 3]
        assert np.isfinite(out.to_numpy()).all()
