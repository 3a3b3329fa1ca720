"""Concurrency safety of context-shared operator state (the aux "race
detection" concern of SURVEY.md section 5: the reference guards Context
fields with per-operator mutexes; these tests hammer the same paths from a
thread pool)."""

import threading

import numpy as np
import jax.numpy as jnp
import pytest

from nightlight_tpu.image import Image
from nightlight_tpu.io import fits as nlfits
from nightlight_tpu.pipeline.context import new_context
from nightlight_tpu.pipeline.operators import materialize_all
from nightlight_tpu.pipeline.ops_pre import OpCalibrate, OpStarDetect
from nightlight_tpu.pipeline.ops_ref import OpSelectReference, SelRefTarget


def write_img(path, rng, w=64, h=64, loc=100.0):
    img = Image.from_naxisn([w, h], rng.normal(loc, 2, size=(h, w)).astype(np.float32))
    nlfits.write_file(img, str(path))


class TestSharedState:
    def test_calibrate_lazy_master_load_once(self, tmp_path, rng, monkeypatch):
        """Many frames racing through OpCalibrate must load the dark exactly
        once (pre/preprocess.go:102-143 semantics)."""
        monkeypatch.chdir(tmp_path)
        write_img("dark.fits", rng, loc=5.0)
        import io

        c = new_context(log=io.StringIO())
        op = OpCalibrate(dark="dark.fits", flat="")

        loads = []
        orig = nlfits.read_file

        def counting_read(*a, **kw):
            if a and "dark" in str(a[0]):
                loads.append(1)
            return orig(*a, **kw)

        monkeypatch.setattr(nlfits, "read_file", counting_read)

        def promise(i):
            def p():
                img = Image.from_naxisn([64, 64],
                                        rng.normal(100, 2, size=(64, 64)).astype(np.float32))
                img.id = i
                return op.apply(img, c)
            return p

        outs, err = materialize_all([promise(i) for i in range(16)], 8, False)
        assert err is None
        assert len(outs) == 16
        assert len(loads) == 1  # dark loaded exactly once under the lock

    def test_select_reference_single_selection(self, tmp_path, rng, monkeypatch):
        """Racing selectRef promises must agree on one reference
        (refframe.go:94-112 first-promise-wins)."""
        monkeypatch.chdir(tmp_path)
        import io

        c = new_context(log=io.StringIO())
        sd = OpStarDetect(radius=8, sigma=10.0, bad_pixel_sigma=0.0, in_out_ratio=1.4)
        op = OpSelectReference(target=int(SelRefTarget.Histo), mode="%location", star_detect=sd)

        def make_in(i):
            def p():
                img = Image.from_naxisn(
                    [64, 64], rng.normal(100 + i, 2, size=(64, 64)).astype(np.float32))
                img.id = i
                return img
            return p

        promises = op.make_promises([make_in(i) for i in range(8)], c)
        outs, err = materialize_all(promises, 8, False)
        assert err is None
        assert len(outs) == 8
        assert c.match_histo is not None
        # median of locations 100..107 -> reference location ~103.5
        assert c.match_histo.location == pytest.approx(103.5, abs=1.5)

    def test_materialize_error_dedup(self):
        import io

        def fail():
            raise ValueError("boom")

        outs, err = materialize_all([fail, fail, fail], 4, False)
        assert outs == []
        assert str(err) == "boom"  # identical errors deduplicated
