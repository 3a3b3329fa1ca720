"""End-to-end pipeline tests: synthetic FITS frames through the full CLI
command DAGs (the reference's test/Makefile black-box model, SURVEY.md
section 4), plus JSON job round-trips."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from nightlight_tpu.image import Image
from nightlight_tpu.io import fits as nlfits
from tests.test_stars import synth_field


STAR_POS = [(40.0, 50.0), (120.0, 80.0), (200.0, 200.0), (60.0, 180.0),
            (150.0, 30.0), (230.0, 120.0), (90.0, 230.0), (30.0, 120.0),
            (180.0, 170.0), (210.0, 60.0)]


def write_frames(tmp_path, rng, n_frames=4, shift_per_frame=(3.0, -2.0), h=256, w=256,
                 prefix="light", bg=100.0, hot_frame=None):
    """Write n shifted synthetic star-field FITS files; returns file names.

    Uses a well-sampled PSF (fwhm 8): with the stack command's default
    starBpSig=5, undersampled star cores are indistinguishable from hot
    pixels (for the reference detector too, findstars.go:134-169).
    """
    names = []
    for i in range(n_frames):
        dx, dy = shift_per_frame[0] * i, shift_per_frame[1] * i
        stars = [(x + dx, y + dy) for (x, y) in STAR_POS]
        img = synth_field(rng, h=h, w=w, stars=stars, bg=bg, noise=2.0, flux=8000.0, fwhm=8.0)
        if hot_frame == i:
            img += 500.0  # simulated bright outlier frame
        im = Image.from_naxisn([w, h], jnp.asarray(img))
        im.exposure = 60.0
        fn = str(tmp_path / f"{prefix}{i:02d}.fits")
        nlfits.write_file(im, fn)
        names.append(fn)
    return names


def run_cli(args, tmp_path):
    from nightlight_tpu import cli

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        rc = cli.main(args)
    finally:
        os.chdir(cwd)
    return rc


class TestStatsCommand:
    def test_stats_runs_and_logs(self, tmp_path, rng, capsys):
        write_frames(tmp_path, rng, n_frames=2)
        rc = run_cli(["-out", "", "-log", "", "-exportStats", "stats.html",
                      "stats", "light*.fits"], tmp_path)
        out = capsys.readouterr().out
        assert rc == 0
        assert "Found 2 files." in out
        assert "0: Stars" in out and "1: Stars" in out
        assert (tmp_path / "stats.html").exists()
        html = (tmp_path / "stats.html").read_text()
        # The embedded data block is the compat contract: a JS array literal of
        # a header row followed by one numeric row per frame.
        import json as _json
        data = html.split("const SESSION_STATS =\n", 1)[1].split(";\n", 1)[0]
        rows = _json.loads(data.replace("'", '"'))
        assert rows[0] == ["ID", "Min", "Mean", "Max", "Location", "Scale", "Stars", "HFR"]
        assert len(rows) == 3 and all(len(r) == 8 for r in rows[1:])
        # The page must be self-contained (offline) and all-original JS.
        assert "gstatic" not in html and "google.charts" not in html
        for lifted in ("sortByFirstElement", "calcColumnMedians",
                       "normalizeYAxisValues", "toggleNormalize"):
            assert lifted not in html


class TestStackCommand:
    def test_stack_end_to_end(self, tmp_path, rng, capsys):
        write_frames(tmp_path, rng, n_frames=4)
        rc = run_cli(["-out", "stacked.fits", "-log", "", "-jpg", "%auto",
                      "-exportStats", "",
                      "stack", "light*.fits"], tmp_path)
        out = capsys.readouterr().out
        assert rc == 0, out
        assert (tmp_path / "stacked.fits").exists()
        assert (tmp_path / "stacked.jpg").exists()

        stacked = nlfits.read_file(str(tmp_path / "stacked.fits"), to_device=False)
        assert stacked.naxisn == [256, 256]
        # exposure is summed over frames (stack.go:220-225)
        assert stacked.exposure == pytest.approx(240.0)
        # stars must be present at the REFERENCE frame positions after alignment
        data = stacked.to_numpy()
        # background level preserved
        assert abs(np.median(data) - 100.0) < 5.0
        assert "Stacking 4 frames with stacking mode 1" in out  # 4 frames -> Mean

    def test_stack_aligns_shifted_frames(self, tmp_path, rng):
        write_frames(tmp_path, rng, n_frames=4, shift_per_frame=(4.0, 3.0))
        rc = run_cli(["-out", "stacked.fits", "-log", "", "-jpg", "", "-exportStats", "",
                      "stack", "light*.fits"], tmp_path)
        assert rc == 0
        data = nlfits.read_file(str(tmp_path / "stacked.fits"), to_device=False).to_numpy()
        # If alignment worked, each reference star position has a sharp peak.
        # Reference frame is chosen by max stars/HFR; with identical fields it
        # is one of the shifted variants, so check peak sharpness instead:
        # the global max should be ~4x the single-frame star peak (mean stack
        # of aligned peaks) rather than washed out.
        peak = data.max() - np.median(data)
        single = synth_field(np.random.default_rng(0), stars=[(50, 50)], bg=0, noise=0,
                             flux=8000.0, fwhm=8.0)
        assert peak > 0.8 * single.max()

    def test_stack_sigma_clips_outlier_frames(self, tmp_path, rng, capsys):
        write_frames(tmp_path, rng, n_frames=8, shift_per_frame=(0.0, 0.0))
        rc = run_cli(["-out", "stacked.fits", "-log", "", "-jpg", "", "-exportStats", "",
                      "stack", "light*.fits"], tmp_path)
        out = capsys.readouterr().out
        assert rc == 0
        assert "Stacking 8 frames with stacking mode 2" in out  # sigma mode
        assert "Clipped low" in out


class TestStretchCommand:
    def test_stretch_single_image(self, tmp_path, rng, capsys):
        write_frames(tmp_path, rng, n_frames=1)
        rc = run_cli(["-out", "stretched.fits", "-log", "", "-jpg", "", "-exportStats", "",
                      "stretch", "light00.fits"], tmp_path)
        out = capsys.readouterr().out
        assert rc == 0, out
        st = nlfits.read_file(str(tmp_path / "stretched.fits"), to_device=False)
        d = st.to_numpy()
        assert 0.0 <= d.min() and d.max() <= 1.0
        # histogram peak moved toward the 10% target
        assert np.median(d) > 0.02


class TestRGBCommand:
    def test_rgb_combine(self, tmp_path, rng, capsys):
        # three color channels of the same field with different intensities
        for ch, gain in (("r", 1.0), ("g", 0.8), ("b", 0.6)):
            img = synth_field(rng, h=128, w=128, stars=STAR_POS[:6], bg=100.0 * gain,
                              noise=1.0, flux=8000.0 * gain)
            im = Image.from_naxisn([128, 128], jnp.asarray(img))
            im.exposure = 60.0
            nlfits.write_file(im, str(tmp_path / f"chan_{ch}.fits"))
        rc = run_cli(["-out", "rgb.fits", "-log", "", "-jpg", "rgb.jpg", "-exportStats", "",
                      "rgb", "chan_r.fits", "chan_g.fits", "chan_b.fits"], tmp_path)
        out = capsys.readouterr().out
        assert rc == 0, out
        rgb = nlfits.read_file(str(tmp_path / "rgb.fits"), to_device=False)
        assert rgb.naxisn == [128, 128, 3]
        assert (tmp_path / "rgb.jpg").exists()


class TestRunCommand:
    def test_json_job_roundtrip(self, tmp_path, rng, capsys):
        write_frames(tmp_path, rng, n_frames=2)
        job = {
            "type": "seq",
            "steps": [
                {"type": "loadMany", "filePatterns": ["light*.fits"]},
                {"type": "starDetect", "radius": 16, "sigma": 15.0,
                 "badPixelSigma": 0.0, "inOutRatio": 1.4},
                {"type": "stack", "mode": 1},
                {"type": "save", "filePattern": "job_out.fits"},
            ],
        }
        (tmp_path / "job.json").write_text(json.dumps(job))
        rc = run_cli(["-log", "", "-out", "", "-job", "job.json", "run"], tmp_path)
        out = capsys.readouterr().out
        assert rc == 0, out
        assert (tmp_path / "job_out.fits").exists()

    def test_unknown_op_type_fails(self, tmp_path, capsys):
        (tmp_path / "job.json").write_text(json.dumps({"type": "noSuchOp"}))
        rc = run_cli(["-log", "", "-out", "", "-job", "job.json", "run"], tmp_path)
        assert rc == -1
        assert "unknown operator type" in capsys.readouterr().out


class TestJobSerialization:
    def test_all_registered_ops_roundtrip(self):
        """Every registered operator must JSON round-trip through the factory
        (the reference panics on decode mismatches; we assert equality)."""
        from nightlight_tpu.pipeline.operators import _operator_factories, op_from_dict

        skip_defaults = {"seq", "stackBatches"}  # structural ops tested separately
        for t, cls in _operator_factories.items():
            if t in skip_defaults:
                continue
            op = cls()
            d = op.to_dict()
            assert d["type"] == t
            op2 = op_from_dict(d)
            assert op2.to_dict() == d, t

    def test_sequence_roundtrip(self):
        from nightlight_tpu.pipeline import OpLoadMany, OpSequence, op_from_dict
        from nightlight_tpu.pipeline.ops_stack import OpStack, OpStackBatches

        seq = OpSequence(steps=[
            OpLoadMany(file_patterns=["*.fits"]),
            OpStackBatches(per_batch=OpSequence(steps=[OpStack(mode=2)])),
        ])
        d = seq.to_dict()
        seq2 = op_from_dict(d)
        assert seq2.to_dict() == d


class TestStatsExportLifecycle:
    def test_stats_html_terminated_without_batches(self, tmp_path, rng, capsys):
        """The stats command never sets stats_total (only stackBatches does,
        stackbatches.go:63); the run-end finalize must still terminate the
        HTML report."""
        write_frames(tmp_path, rng, n_frames=2)
        rc = run_cli(["-out", "", "-log", "", "-exportStats", "s.html",
                      "stats", "light*.fits"], tmp_path)
        assert rc == 0
        html = (tmp_path / "s.html").read_text()
        assert html.rstrip().endswith("</html>")


class TestLRGBCommand:
    def test_rgb_with_four_inputs_applies_luminance(self, tmp_path, rng, capsys):
        """LRGB is the rgb command with 4 inputs; the 4th is the luminance
        frame (rgb.go:74-75) applied onto the HSLuv L channel by
        hslApplyLum (hsl.go:30-71) and its exposure added."""
        for ch, gain in (("r", 1.0), ("g", 0.8), ("b", 0.6), ("l", 1.2)):
            img = synth_field(rng, h=128, w=128, stars=STAR_POS[:6], bg=100.0 * gain,
                              noise=1.0, flux=8000.0 * gain)
            im = Image.from_naxisn([128, 128], jnp.asarray(img))
            im.exposure = 60.0
            nlfits.write_file(im, str(tmp_path / f"chan_{ch}.fits"))
        rc = run_cli(["-out", "lrgb.fits", "-log", "", "-jpg", "", "-exportStats", "",
                      "rgb", "chan_r.fits", "chan_g.fits", "chan_b.fits",
                      "chan_l.fits"], tmp_path)
        out = capsys.readouterr().out
        assert rc == 0, out
        assert "Applying luminance image to luminance channel" in out
        lrgb = nlfits.read_file(str(tmp_path / "lrgb.fits"), to_device=False)
        assert lrgb.naxisn == [128, 128, 3]
        # exposure: 3 color channels summed by combine + luminance added
        assert lrgb.exposure == pytest.approx(240.0)

    def test_rgb_with_five_inputs_fails(self, tmp_path, rng, capsys):
        for i in range(5):
            img = synth_field(rng, h=64, w=64, stars=STAR_POS[:4], bg=100.0, noise=1.0)
            im = Image.from_naxisn([64, 64], jnp.asarray(img))
            nlfits.write_file(im, str(tmp_path / f"c{i}.fits"))
        rc = run_cli(["-out", "x.fits", "-log", "", "-jpg", "", "-exportStats", "",
                      "rgb", "c0.fits", "c1.fits", "c2.fits", "c3.fits", "c4.fits"],
                     tmp_path)
        out = capsys.readouterr().out
        assert rc == -1
        assert "inputs" in out or "channels" in out


class TestReferenceSelectionModes:
    def test_numeric_align_ref(self, tmp_path, rng, capsys):
        """-alignRef <n> pins the reference to frame n (refframe.go:168-177)."""
        write_frames(tmp_path, rng, n_frames=3)
        rc = run_cli(["-out", "s.fits", "-log", "", "-jpg", "", "-exportStats", "",
                      "-alignRef", "0", "stack", "light*.fits"], tmp_path)
        out = capsys.readouterr().out
        assert rc == 0, out
        assert "Using image 0 with score 0 as alignment reference." in out

    def test_external_file_align_ref(self, tmp_path, rng, capsys):
        """-alignRef <file> loads + star-detects an external reference
        without materializing the inputs (refframe.go:118-151)."""
        write_frames(tmp_path, rng, n_frames=3)
        # external reference: same field, unshifted
        write_frames(tmp_path, rng, n_frames=1, prefix="ref")
        rc = run_cli(["-out", "s.fits", "-log", "", "-jpg", "", "-exportStats", "",
                      "-alignRef", "ref00.fits", "stack", "light*.fits"], tmp_path)
        out = capsys.readouterr().out
        assert rc == 0, out
        assert "using loaded image -3 as alignment reference" in out
        # every input frame gets aligned against the external field
        assert out.count("Transform") >= 2

    def test_invalid_numeric_ref_fails(self, tmp_path, rng, capsys):
        write_frames(tmp_path, rng, n_frames=2)
        rc = run_cli(["-out", "s.fits", "-log", "", "-jpg", "", "-exportStats", "",
                      "-alignRef", "9", "stack", "light*.fits"], tmp_path)
        out = capsys.readouterr().out
        assert rc == -1
        assert "invalid reference file ID 9" in out


class TestCalibrationAndIntermediateSaves:
    def test_dark_flat_and_save_patterns(self, tmp_path, rng, capsys):
        """-dark/-flat calibration plus every intermediate save pattern
        (-pre/-stars/-post, main.go:62-66) produces the expected files."""
        write_frames(tmp_path, rng, n_frames=3, bg=150.0)
        # master dark: flat 50 ADU offset; master flat: unity
        dark = Image.from_naxisn([256, 256], jnp.full((256, 256), 50.0, jnp.float32))
        dark.exposure = 60.0
        nlfits.write_file(dark, str(tmp_path / "dark.fits"))
        flat = Image.from_naxisn([256, 256], jnp.ones((256, 256), jnp.float32))
        nlfits.write_file(flat, str(tmp_path / "flat.fits"))

        rc = run_cli(["-out", "cal.fits", "-log", "", "-jpg", "", "-exportStats", "",
                      "-dark", "dark.fits", "-flat", "flat.fits",
                      "-pre", "pre%04d.fits", "-stars", "stars%04d.fits",
                      "-post", "post%04d.fits",
                      "stack", "light*.fits"], tmp_path)
        out = capsys.readouterr().out
        assert rc == 0, out
        for i in range(3):
            assert (tmp_path / f"pre{i:04d}.fits").exists()
            assert (tmp_path / f"stars{i:04d}.fits").exists()
        # post frames exist for the aligned (non-reference) frames at least
        assert any((tmp_path / f"post{i:04d}.fits").exists() for i in range(3))

        # dark subtraction: background drops from 150 to ~100
        pre = nlfits.read_file(str(tmp_path / "pre0000.fits"), to_device=False).to_numpy()
        assert abs(np.median(pre) - 100.0) < 5.0
        final = nlfits.read_file(str(tmp_path / "cal.fits"), to_device=False).to_numpy()
        assert abs(np.median(final) - 100.0) < 5.0

    def test_dark_dimension_mismatch_fails(self, tmp_path, rng, capsys):
        write_frames(tmp_path, rng, n_frames=2)
        dark = Image.from_naxisn([128, 128], jnp.full((128, 128), 50.0, jnp.float32))
        nlfits.write_file(dark, str(tmp_path / "dark.fits"))
        rc = run_cli(["-out", "cal.fits", "-log", "", "-jpg", "", "-exportStats", "",
                      "-dark", "dark.fits", "stack", "light*.fits"], tmp_path)
        out = capsys.readouterr().out
        assert rc == -1
        assert "dimensions" in out.lower() or "size" in out.lower(), out


class TestOutOfCorePrefetch:
    def test_prefetch_ab_identical(self, tmp_path, rng, capsys, monkeypatch):
        """Double-buffered out-of-core ingest: a multi-batch stack with
        next-batch upload prefetch is bit-identical to the sequential
        control (NIGHTLIGHT_NO_PREFETCH=1). The randomized batch permutation
        is seeded so both runs partition identically."""
        import random

        from nightlight_tpu.io.ingest import BulkUploader
        from scripts.gen_fixtures import gen

        gen(str(tmp_path), 10, 256)
        os.remove(tmp_path / "dark.fits")  # lights only for this test
        # scale the uploader's dispatch-ahead window down to test size so a
        # later batch still has pending frames when prefetch fires (at real
        # sizes the 6x32MB window is far smaller than a 16MP batch)
        monkeypatch.setattr(BulkUploader, "GROUP_BYTES", 256 * 256 * 2)
        monkeypatch.setattr(BulkUploader, "WINDOW", 1)
        # 256x256 f32 = 256 KiB/frame; 2 MiB budget -> 2 batches of 5
        args = ["-out", "s.fits", "-log", "", "-jpg", "", "-exportStats", "",
                "-stMemory", "2", "stack", "light*.fits"]
        random.seed(123)
        rc = run_cli(list(args), tmp_path)
        out_a = capsys.readouterr().out
        assert rc == 0, out_a
        assert "random batches" in out_a
        assert "Prefetched" in out_a
        a = (tmp_path / "s.fits").read_bytes()
        monkeypatch.setenv("NIGHTLIGHT_NO_PREFETCH", "1")
        random.seed(123)
        rc = run_cli(list(args), tmp_path)
        out_b = capsys.readouterr().out
        assert rc == 0, out_b
        assert "Prefetched" not in out_b
        assert a == (tmp_path / "s.fits").read_bytes()


class TestCLIWiring:
    def test_deband_binning_tiff(self, tmp_path, rng, capsys):
        """-debandH/-debandV, -binning, and -tiff flags through the stack DAG.
        Stars need fwhm ~2x normal so they stay well-sampled after the 2x2
        bin (detection runs post-bin, preprocess DAG order)."""
        for i in range(3):
            stars = [(2 * x + 3.0 * i, 2 * y - 2.0 * i) for (x, y) in STAR_POS]
            img = synth_field(rng, h=512, w=512, stars=stars, bg=100.0, noise=2.0,
                              flux=30000.0, fwhm=16.0)
            im = Image.from_naxisn([512, 512], jnp.asarray(img))
            im.exposure = 60.0
            nlfits.write_file(im, str(tmp_path / f"light{i:02d}.fits"))
        rc = run_cli(["-out", "s.fits", "-log", "", "-jpg", "", "-exportStats", "",
                      "-tiff", "s.tif",
                      "-debandH", "50", "-debandV", "50", "-binning", "2",
                      "stack", "light*.fits"], tmp_path)
        out = capsys.readouterr().out
        assert rc == 0, out
        s = nlfits.read_file(str(tmp_path / "s.fits"), to_device=False)
        assert s.naxisn == [256, 256]  # 2x2 binned
        assert (tmp_path / "s.tif").exists()
        from PIL import Image as PILImage
        assert PILImage.open(str(tmp_path / "s.tif")).size == (256, 256)

    def test_stretch_blur_and_usm(self, tmp_path, rng, capsys):
        write_frames(tmp_path, rng, n_frames=1)
        rc = run_cli(["-out", "st.fits", "-log", "", "-jpg", "", "-exportStats", "",
                      "-blurSigma", "1.5", "-usmGain", "0.5", "-usmSigma", "1.0",
                      "-usmThresh", "0.5",
                      "stretch", "light00.fits"], tmp_path)
        out = capsys.readouterr().out
        assert rc == 0, out
        assert (tmp_path / "st.fits").exists()

    def test_min_stars_filter_drops_frames(self, tmp_path, rng, capsys):
        """-minStars drops star-poor frames (filter.go:48-51); a frame of
        pure noise has no stars and must be filtered out."""
        write_frames(tmp_path, rng, n_frames=3)
        blank = Image.from_naxisn(
            [256, 256],
            jnp.asarray(rng.normal(100.0, 2.0, (256, 256)).astype(np.float32)))
        blank.exposure = 60.0
        nlfits.write_file(blank, str(tmp_path / "light99.fits"))
        rc = run_cli(["-out", "s.fits", "-log", "", "-jpg", "", "-exportStats", "",
                      "-minStars", "5", "stack", "light*.fits"], tmp_path)
        out = capsys.readouterr().out
        assert rc == 0, out
        assert "below threshold 5, skipping frame" in out
        assert "Stacking 3 frames" in out  # 4 loaded, 1 dropped


class TestRGBFlagWiring:
    def test_rgb_with_color_adjustments(self, tmp_path, rng, capsys):
        """Non-default -scnr/-chroma*/-rot*/-neutSigma* values flow through
        the rgb preset's HSL chain (main.go:358-393)."""
        for ch, gain in (("r", 1.0), ("g", 0.8), ("b", 0.6)):
            img = synth_field(rng, h=128, w=128, stars=STAR_POS[:6], bg=100.0 * gain,
                              noise=1.0, flux=8000.0 * gain)
            im = Image.from_naxisn([128, 128], jnp.asarray(img))
            im.exposure = 60.0
            nlfits.write_file(im, str(tmp_path / f"chan_{ch}.fits"))
        rc = run_cli(["-out", "rgb.fits", "-log", "", "-jpg", "", "-exportStats", "",
                      "-scnr", "0.5", "-chromaGamma", "1.5", "-chromaBy", "1.2",
                      "-rotBy", "20", "-neutSigmaLow", "0.5", "-neutSigmaHigh", "1.0",
                      "-lumScale", "0.9", "-scaleBlack", "2.0",
                      "rgb", "chan_r.fits", "chan_g.fits", "chan_b.fits"], tmp_path)
        out = capsys.readouterr().out
        assert rc == 0, out
        rgb = nlfits.read_file(str(tmp_path / "rgb.fits"), to_device=False)
        assert rgb.naxisn == [128, 128, 3]
        d = rgb.to_numpy()
        assert np.isfinite(d).all()
        assert 0.0 <= d.min() and d.max() <= 1.0
