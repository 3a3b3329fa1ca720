"""Async ingest prefetcher tests."""

import numpy as np
import pytest

from nightlight_tpu.image import Image
from nightlight_tpu.io import fits as nlfits
from nightlight_tpu.io.ingest import prefetch_frames


class TestPrefetch:
    def test_yields_in_order_with_ids(self, tmp_path, rng):
        names = []
        for i in range(7):
            img = Image.from_naxisn([32, 32],
                                    rng.normal(i * 10.0, 1, size=(32, 32)).astype(np.float32))
            fn = str(tmp_path / f"f{i}.fits")
            nlfits.write_file(img, fn)
            names.append(fn)
        out = list(prefetch_frames(names, depth=3, to_device=False))
        assert [o.id for o in out] == list(range(7))
        for i, o in enumerate(out):
            assert o.stats.mean == pytest.approx(i * 10.0, abs=0.5)

    def test_empty(self):
        assert list(prefetch_frames([], depth=2)) == []

    def test_error_propagates(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            list(prefetch_frames([str(tmp_path / "missing.fits")], to_device=False))
