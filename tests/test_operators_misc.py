"""Operator framework behavior details: save pattern expansion, export
ranges, sequences, glob ordering, path sandbox (reference: operator.go)."""

import io
import json

import numpy as np
import jax.numpy as jnp
import pytest

from nightlight_tpu.image import Image
from nightlight_tpu.io import fits as nlfits
from nightlight_tpu.pipeline.context import new_context
from nightlight_tpu.pipeline.operators import (
    ExportMode,
    OpLoadMany,
    OpSave,
    OpSequence,
    is_path_allowed,
    materialize_all,
)


def make_image(rng, w=16, h=16, id=0, lo=0.0, hi=100.0):
    d = rng.uniform(lo, hi, size=(h, w)).astype(np.float32)
    img = Image.from_naxisn([w, h], d)
    img.id = id
    return img


class TestOpSave:
    def test_percent_d_expansion(self, tmp_path, rng, monkeypatch):
        monkeypatch.chdir(tmp_path)
        c = new_context(log=io.StringIO())
        op = OpSave(file_pattern="pre%04d.fits")
        op.apply(make_image(rng, id=7), c)
        assert (tmp_path / "pre0007.fits").exists()

    def test_empty_pattern_passthrough(self, rng):
        c = new_context(log=io.StringIO())
        img = make_image(rng)
        assert OpSave(file_pattern="").apply(img, c) is img

    def test_export_mode_scaling(self, tmp_path, rng, monkeypatch):
        """0-65535 export maps value 65535 to full white (operator.go:411-424)."""
        from PIL import Image as PILImage

        monkeypatch.chdir(tmp_path)
        c = new_context(log=io.StringIO())
        d = np.zeros((8, 8), np.float32)
        d[4, 4] = 65535.0
        img = Image.from_naxisn([8, 8], d)
        OpSave(file_pattern="x.jpg", export_mode=int(ExportMode.Zero65535)).apply(img, c)
        arr = np.asarray(PILImage.open(tmp_path / "x.jpg"))
        assert arr[4, 4] > 200
        assert arr[0, 0] < 40

    def test_unknown_suffix_raises(self, tmp_path, rng, monkeypatch):
        monkeypatch.chdir(tmp_path)
        c = new_context(log=io.StringIO())
        with pytest.raises(ValueError, match="unknown suffix"):
            OpSave(file_pattern="out.xyz").apply(make_image(rng), c)

    def test_gz_fits_roundtrip(self, tmp_path, rng, monkeypatch):
        monkeypatch.chdir(tmp_path)
        c = new_context(log=io.StringIO())
        img = make_image(rng)
        OpSave(file_pattern="z.fits.gz").apply(img, c)
        back = nlfits.read_file(str(tmp_path / "z.fits.gz"), to_device=False)
        np.testing.assert_array_equal(back.to_numpy(), img.to_numpy())


class TestLoadMany:
    def test_glob_sorted_ids(self, tmp_path, rng, monkeypatch):
        monkeypatch.chdir(tmp_path)
        c = new_context(log=io.StringIO())
        for name in ("b.fits", "a.fits", "c.fits"):
            nlfits.write_file(make_image(rng), name)
        promises = OpLoadMany(file_patterns=["*.fits"]).make_promises([], c)
        outs, err = materialize_all(promises, 1, False)
        assert err is None
        assert [(o.id, o.file_name) for o in outs] == [
            (0, "a.fits"), (1, "b.fits"), (2, "c.fits")]

    def test_path_sandbox(self):
        assert not is_path_allowed("/etc/passwd")
        assert not is_path_allowed("../up.fits")
        assert is_path_allowed("sub/dir/x.fits")


class TestOpSequence:
    def test_nested_sequences_flatten_execution(self, tmp_path, rng, monkeypatch):
        monkeypatch.chdir(tmp_path)
        c = new_context(log=io.StringIO())
        nlfits.write_file(make_image(rng), "in.fits")
        seq = OpSequence(steps=[
            OpLoadMany(file_patterns=["in.fits"]),
            OpSequence(steps=[OpSave(file_pattern="mid.fits")]),
            OpSave(file_pattern="out.fits"),
        ])
        promises = seq.make_promises([], c)
        _, err = materialize_all(promises, 1, True)
        assert err is None
        assert (tmp_path / "mid.fits").exists()
        assert (tmp_path / "out.fits").exists()

    def test_empty_sequence_passthrough(self):
        c = new_context(log=io.StringIO())
        sentinel = [lambda: None]
        assert OpSequence().make_promises(sentinel, c) is sentinel

    def test_json_matches_reference_shape(self):
        d = OpSequence(steps=[OpSave(file_pattern="x.fits")]).to_dict()
        s = json.dumps(d)
        assert '"type": "seq"' in s and '"steps"' in s


class TestTimestampWriter:
    """NIGHTLIGHT_LOG_TIMES phase attribution (utils/logging.py)."""

    def test_prefixes_each_line_once(self):
        import io

        from nightlight_tpu.utils.logging import TimestampWriter

        sink = io.StringIO()
        ticks = iter([0.0, 1.5, 12.345])
        w = TimestampWriter(sink, clock=lambda: next(ticks))
        w.write("first\nsec")
        w.write("ond\n")
        out = sink.getvalue().splitlines()
        assert out[0] == "[+    1.50s] first"
        assert out[1] == "[+   12.35s] second"

    def test_blank_lines_unstamped(self):
        import io

        from nightlight_tpu.utils.logging import TimestampWriter

        sink = io.StringIO()
        w = TimestampWriter(sink, clock=lambda: 0.0)
        w.write("\n\nx\n")
        assert sink.getvalue() == "\n\n[+    0.00s] x\n"


class TestCliDocs:
    def test_every_flag_has_help_and_is_documented(self):
        """docs/CLI.md is generated from the live parser (scripts/gen_docs.py);
        a flag added without help text or without regenerating the doc fails
        here rather than drifting silently."""
        import os

        from nightlight_tpu.cli import build_parser

        parser = build_parser()
        doc = open(os.path.join(os.path.dirname(__file__), "..", "docs", "CLI.md")).read()
        for act in parser._actions:
            if not act.option_strings or act.option_strings[0] in ("-h", "--help"):
                continue
            name = act.option_strings[0]
            assert act.help, f"flag {name} has no help text"
            assert f"| `{name}` |" in doc, f"flag {name} missing from docs/CLI.md"

    def test_every_command_is_dispatched_and_documented(self):
        """cli.COMMANDS is the single source of truth for the command set
        (gen_docs renders it; the usage synopsis joins it). Every key must
        appear in main()'s dispatch source AND in docs/CLI.md, so a command
        added to one place but not the others fails here (ADVICE r4)."""
        import inspect
        import os

        from nightlight_tpu import cli

        src = inspect.getsource(cli.main)
        doc = open(os.path.join(os.path.dirname(__file__), "..", "docs", "CLI.md")).read()
        for name in cli.COMMANDS:
            assert f'"{name}"' in src, f"command {name} not dispatched in cli.main"
            assert f"| `{name}` |" in doc, f"command {name} missing from docs/CLI.md"
        # and the usage synopsis carries the full set (incl. lrgb)
        usage = cli.build_parser().format_usage()
        for name in cli.COMMANDS:
            assert name in usage
