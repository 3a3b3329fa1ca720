"""Real-chip A/B of the bit-packed wire transport (ADVICE r4).

tests/test_pack.py proves packed-vs-raw bit equality on the CPU mesh; this
lane re-proves it ON THE CHIP, where the claim actually matters: the decode
relies on XLA contracting (u - 32768) * bscale + bzero identically in the
packed program and the raw program (io/fits._device_int_decode_batch), and
the project's own notes record contraction differing BETWEEN PROGRAM SHAPES
at ~1e-5 on TPU (CLAUDE.md). Detection/alignment downstream are sensitive
enough that the parity digests carry per-field tolerances, so the transport
must hold exact equality."""

import io
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _write_frames(tmp_path, rng, n=6, h=128, w=256):
    from tests.test_ingest import _write_int16

    names = []
    for i in range(n):
        # 12-bit-ish sky + gradient + a few saturated spikes: exercises the
        # delta transform, width selection, and the exception table
        arr = rng.normal(800.0, 25.0, size=(h, w))
        arr += np.linspace(0, 300, w)[None, :]
        arr = arr.clip(0, 60000)
        arr.reshape(-1)[rng.choice(h * w, 17, replace=False)] = 65000
        p = tmp_path / f"pk{i:02d}.fits"
        _write_int16(p, arr.astype(np.uint16))
        names.append(str(p))
    return names


class TestPackedTransportOnChip:
    def test_packed_equals_raw_bit_for_bit(self, tmp_path, rng, tpu_cache,
                                           monkeypatch):
        import jax

        assert jax.devices()[0].platform == "tpu"
        from nightlight_tpu.io.ingest import BulkUploader

        names = _write_frames(tmp_path, rng)
        specs = list(enumerate(names))
        frame_bytes = 128 * 256 * 2

        monkeypatch.setenv("NIGHTLIGHT_PACK", "1")  # defeat the band gate
        up_packed = BulkUploader(specs, io.StringIO(), frame_bytes=frame_bytes)
        packed = [np.asarray(up_packed.get(n).data) for n in names]
        assert up_packed.packed_uploads >= 1  # the packed path actually ran

        monkeypatch.delenv("NIGHTLIGHT_PACK")
        monkeypatch.setenv("NIGHTLIGHT_NO_PACK", "1")
        up_raw = BulkUploader(specs, io.StringIO(), frame_bytes=frame_bytes)
        raw = [np.asarray(up_raw.get(n).data) for n in names]
        assert up_raw.packed_uploads == 0

        for a, b in zip(packed, raw):
            np.testing.assert_array_equal(a, b)
