"""Bit-packed H2D transport (io/pack.py): losslessness, width selection,
fallbacks, and end-to-end equality through the BulkUploader against the
per-frame reader (the raw-path reference)."""

import io

import jax.numpy as jnp
import numpy as np
import pytest

from nightlight_tpu.io import fits as nlfits
from nightlight_tpu.io.ingest import BulkUploader
from nightlight_tpu.io.pack import decode_packed_batch, pack_group
from tests.test_ingest import _write_int16


def _to_device(pg):
    pg.words = jnp.asarray(pg.words)
    pg.exc = jnp.asarray(pg.exc)
    return pg


def _raw_reference(u, shape, bscale, bzero):
    """The unpacked decode of the same offset-binary codes: what
    _device_int_decode_batch produces from the equivalent wire payload."""
    s = u.astype(np.int32) - 32768
    return (s.astype(np.float32) * np.asarray(bscale)[:, None]
            + np.asarray(bzero)[:, None]).reshape((u.shape[0],) + shape)


class TestPackGroup:
    H, W, G = 48, 64, 3

    def _roundtrip(self, u, expect_kind=None, expect_k=None):
        shape = (self.H, self.W)
        bscale = jnp.asarray(np.array([1.0, 0.5, 2.0], np.float32))
        bzero = jnp.asarray(np.array([0.0, 100.0, -3.5], np.float32))
        pg = pack_group(u.copy(), self.H)
        assert pg is not None
        if expect_kind:
            assert pg.kind == expect_kind
        if expect_k:
            assert pg.k == expect_k
        assert pg.wire_bytes < u.nbytes  # it must actually save wire
        out = decode_packed_batch(_to_device(pg), shape, bscale, bzero)
        ref = _raw_reference(u, shape, bscale, bzero)
        np.testing.assert_array_equal(np.asarray(out), ref)
        return pg

    def test_smooth_sky_picks_delta8(self, rng):
        u = rng.normal(1000, 20, (self.G, self.H * self.W)) \
            .clip(0, 65535).astype(np.uint16)
        pg = self._roundtrip(u, expect_kind="delta", expect_k=8)
        # ~half the wire: 8 bits/px + row-head exceptions (the exception
        # block amortizes at real frame sizes; tiny rows inflate it here)
        assert pg.wire_bytes < 0.7 * u.nbytes

    def test_low_range_identity(self, rng):
        u = rng.integers(0, 200, (self.G, self.H * self.W)).astype(np.uint16)
        self._roundtrip(u, expect_k=8)

    def test_12bit_camera(self, rng):
        u = rng.integers(0, 4096, (self.G, self.H * self.W)).astype(np.uint16)
        pg = self._roundtrip(u)
        assert pg.k in (8, 12)

    def test_14bit_with_saturated_outliers(self, rng):
        u = rng.integers(0, 16000, (self.G, self.H * self.W)).astype(np.uint16)
        hot = rng.integers(0, u.size, 40)
        u.reshape(-1)[hot] = 65535
        self._roundtrip(u)

    def test_full_range_falls_back(self, rng):
        u = rng.integers(0, 65536, (self.G, self.H * self.W)).astype(np.uint16)
        assert pack_group(u, self.H) is None

    def test_constant_frame(self):
        u = np.full((2, self.H * self.W), 4242, np.uint16)
        shape = (self.H, self.W)
        ones = jnp.ones(2, jnp.float32)
        zeros = jnp.zeros(2, jnp.float32)
        pg = pack_group(u.copy(), self.H)
        assert pg is not None
        out = decode_packed_batch(_to_device(pg), shape, ones, zeros)
        np.testing.assert_array_equal(np.asarray(out),
                                      _raw_reference(u, shape, ones, zeros))

    def test_exception_bucket_is_power_of_two(self, rng):
        u = rng.integers(0, 4000, (1, self.H * self.W)).astype(np.uint16)
        u[0, :37] = 65535  # force identity-path exceptions
        pg = pack_group(u.copy(), self.H)
        assert pg is not None
        n = pg.exc.shape[1]
        assert n & (n - 1) == 0
        out = decode_packed_batch(
            _to_device(pg), (self.H, self.W), jnp.ones(1), jnp.zeros(1))
        np.testing.assert_array_equal(
            np.asarray(out), _raw_reference(u, (self.H, self.W),
                                            jnp.ones(1), jnp.zeros(1)))

    def test_wraparound_deltas_roundtrip(self, rng):
        """Deltas beyond int16 wrap mod 2^16; the mod-2^16 cumsum decode
        must still reconstruct exactly (hot columns in smooth sky)."""
        u = rng.normal(1000, 15, (self.G, self.H * self.W)) \
            .clip(0, 65535).astype(np.uint16)
        cols = u.reshape(self.G, self.H, self.W)
        cols[:, :, 20] = 60000  # +~59000 / -~59000 jumps: wrapped deltas
        pg = self._roundtrip(u)
        assert pg.kind == "delta"  # smooth bulk still prefers delta

    def test_bad_height_falls_back(self, rng):
        u = rng.integers(0, 200, (1, 100)).astype(np.uint16)
        assert pack_group(u, 7) is None  # 100 % 7 != 0


class TestBulkUploaderPacking:
    def _gen(self, tmp_path, rng, n=6, h=24, w=32, lo=800, hi=1200):
        names = []
        for i in range(n):
            arr = rng.integers(lo, hi, size=(h, w)).astype(np.uint16)
            p = tmp_path / f"pk{i:03d}.fits"
            _write_int16(p, arr)
            names.append(str(p))
        return names

    def test_packed_path_matches_per_frame_read(self, tmp_path, rng):
        names = self._gen(tmp_path, rng)
        up = BulkUploader(list(enumerate(names)), io.StringIO(),
                          frame_bytes=24 * 32 * 2)
        for i, name in enumerate(names):
            got = up.get(name)
            ref = nlfits.read_file(name, id=i, log=io.StringIO())
            np.testing.assert_array_equal(np.asarray(got.data),
                                          np.asarray(ref.data))
            assert got.stats.mean == pytest.approx(ref.stats.mean, rel=1e-6)
        assert up.packed_uploads == up.n_uploads == 1
        # beat the raw path's (padded G, pixels) u16 payload
        assert up.wire_bytes < up.group_frames * 24 * 32 * 2

    def test_no_pack_env_reverts(self, tmp_path, rng, monkeypatch):
        names = self._gen(tmp_path, rng)
        monkeypatch.setenv("NIGHTLIGHT_NO_PACK", "1")
        up = BulkUploader(list(enumerate(names)), io.StringIO(),
                          frame_bytes=24 * 32 * 2)
        for name in names:
            got = up.get(name)
            ref = nlfits.read_file(name, log=io.StringIO())
            np.testing.assert_array_equal(np.asarray(got.data),
                                          np.asarray(ref.data))
        assert up.packed_uploads == 0
        assert up.wire_bytes == up.group_frames * 24 * 32 * 2

    def test_full_range_stays_raw(self, tmp_path, rng):
        names = self._gen(tmp_path, rng, lo=0, hi=65535)
        up = BulkUploader(list(enumerate(names)), io.StringIO(),
                          frame_bytes=24 * 32 * 2)
        for name in names:
            got = up.get(name)
            ref = nlfits.read_file(name, log=io.StringIO())
            np.testing.assert_array_equal(np.asarray(got.data),
                                          np.asarray(ref.data))
        assert up.packed_uploads == 0

    def test_prefetch_ahead_packs_lazily(self, tmp_path, rng):
        """The double-buffered prefetch path ships packed payloads too and
        decodes on first consumption, bit-identical."""
        names = self._gen(tmp_path, rng, n=8)
        up = BulkUploader(list(enumerate(names)), io.StringIO(),
                          frame_bytes=24 * 32 * 2)
        up.GROUP_BYTES = 4 * 24 * 32 * 2
        up.reorder(names[:4])
        n = up.prefetch_ahead(names[4:], 1 << 30)
        assert n == 4
        for name in names:
            got = up.get(name)
            ref = nlfits.read_file(name, log=io.StringIO())
            np.testing.assert_array_equal(np.asarray(got.data),
                                          np.asarray(ref.data))
        assert up.packed_uploads == up.n_uploads


class TestPackGuards:
    """Round-5 guards (ADVICE r4): the packer must verify ACTUAL wire bytes
    after exception-bucket padding, skip the delta transform when identity
    already packs near the floor, and respect the ingest band gate."""

    def test_actual_wire_bytes_rechecked_after_bucket_padding(self):
        # Crafted so the PROJECTED bits/pixel clears the 1/16 threshold but
        # the power-of-two exception bucket pushes the real payload to
        # exactly raw size: 8192 px of 8-bit codes + 513 spike exceptions
        # (bucketed to 1024 x 8 bytes) = 8192 + 8192 = 16384 wire bytes vs
        # 16384 raw -- zero saving, must return None.
        rng = np.random.default_rng(3)
        u = rng.integers(0, 250, (1, 8192)).astype(np.uint16)
        idx = rng.choice(8192, size=513, replace=False)
        u[0, idx] = 60000
        assert pack_group(u, 64) is None

    def test_delta_skipped_when_identity_near_floor(self, monkeypatch):
        # identity packs at k=8 (bits ~8 <= 9): the delta transform (the
        # expensive half of the host pack cost) must not run at all.
        # Asserts NUMPY-path internals (the native path fuses zigzag into
        # C where it costs ~nothing and is skip-ruled identically —
        # decision parity is pinned by test_native_matches_numpy).
        monkeypatch.setenv("NIGHTLIGHT_NO_NATIVE_PACK", "1")
        import nightlight_tpu.io.pack as pack_mod

        calls = []
        orig = pack_mod._zigzag16
        monkeypatch.setattr(pack_mod, "_zigzag16",
                            lambda s: calls.append(1) or orig(s))
        rng = np.random.default_rng(4)
        u = rng.integers(0, 200, (2, 4096)).astype(np.uint16)
        pg = pack_group(u, 64)
        assert pg is not None and pg.kind == "id" and pg.k == 8
        assert not calls
        # ...but a 12-bit identity still explores the delta candidate
        u2 = (rng.normal(1500, 15, (2, 4096))).clip(0, 4000).astype(np.uint16)
        pg2 = pack_group(u2, 64)
        assert pg2 is not None and calls

    def test_band_gate_skips_packing_when_wire_is_fast(self, tmp_path, rng,
                                                       monkeypatch):
        names = TestBulkUploaderPacking._gen(TestBulkUploaderPacking(),
                                             tmp_path, rng)
        up = BulkUploader(list(enumerate(names)), io.StringIO(),
                          frame_bytes=24 * 32 * 2)
        # measured band above the gate (120 MB/s numpy / 500 MB/s native)
        up._h2d_mbps = 900.0
        for name in names:
            got = up.get(name)
            ref = nlfits.read_file(name, log=io.StringIO())
            np.testing.assert_array_equal(np.asarray(got.data),
                                          np.asarray(ref.data))
        assert up.packed_uploads == 0
        # NIGHTLIGHT_PACK=1 overrides the gate
        monkeypatch.setenv("NIGHTLIGHT_PACK", "1")
        up2 = BulkUploader(list(enumerate(names)), io.StringIO(),
                           frame_bytes=24 * 32 * 2)
        up2._h2d_mbps = 500.0
        up2.get(names[0])
        assert up2.packed_uploads == 1

    def test_note_upload_ignores_queue_handoffs(self):
        up = BulkUploader([(0, "x.fits")], io.StringIO(), frame_bytes=2048)
        up._note_upload(32 << 20, 0.001)  # sub-5ms: not a wire measurement
        assert up._h2d_mbps is None
        up._note_upload(16 << 20, 0.012)  # implied 1.3 GB/s: buffered, not wire
        assert up._h2d_mbps is None
        up._note_upload(32 << 20, 1.0)
        assert up._h2d_mbps == 32.0
        up._note_upload(32 << 20, 0.5)  # EMA folds in the new reading
        assert up._h2d_mbps == 48.0


class TestNativePackPath:
    """The C fast path (native/_packio.c) must be byte-identical to the
    numpy packer — same (transform, width) decision, same plane bytes,
    same exception table — across kinds, widths, odd shapes, and padded
    groups."""

    def _pair(self, u, height, valid=None, monkeypatch=None):
        from nightlight_tpu.native import packio

        if packio._load() is None:
            pytest.skip("native pack codec unavailable")
        pg_n = pack_group(u.copy(), height, valid=valid)
        monkeypatch.setenv("NIGHTLIGHT_NO_NATIVE_PACK", "1")
        pg_p = pack_group(u.copy(), height, valid=valid)
        monkeypatch.delenv("NIGHTLIGHT_NO_NATIVE_PACK")
        return pg_n, pg_p

    @pytest.mark.parametrize("shape,twelve_bit", [
        ((3, 64, 96), True),    # delta k=8
        ((2, 33, 40), True),    # odd height
        ((4, 16, 16), False),   # high-offset data
        ((1, 8, 12), True),     # small: identity k=12
    ])
    def test_native_matches_numpy(self, shape, twelve_bit, monkeypatch, rng):
        g, h, w = shape
        base = (rng.normal(800.0 if twelve_bit else 40000.0, 6.0,
                           size=(g, h, w))
                + np.linspace(0, 300, w)[None, None, :])
        u = np.clip(base, 0, 65535).astype(np.uint16)
        u[rng.uniform(size=(g, h, w)) < 1e-3] = 65000
        u = u.reshape(g, h * w)
        pg_n, pg_p = self._pair(u, h, monkeypatch=monkeypatch)
        assert (pg_n is None) == (pg_p is None)
        if pg_n is not None:
            assert pg_n.kind == pg_p.kind and pg_n.k == pg_p.k
            np.testing.assert_array_equal(np.asarray(pg_n.words),
                                          np.asarray(pg_p.words))
            np.testing.assert_array_equal(np.asarray(pg_n.exc),
                                          np.asarray(pg_p.exc))

    def test_native_matches_numpy_padded_group(self, monkeypatch, rng):
        g, h, w = 4, 32, 48
        u = (rng.normal(800.0, 6.0, size=(g, h, w))
             .clip(0, 65535).astype(np.uint16)).reshape(g, h * w)
        u[2:] = 0  # zero padding rows, as BulkUploader._try_pack produces
        pg_n, pg_p = self._pair(u, h, valid=2, monkeypatch=monkeypatch)
        assert (pg_n is None) == (pg_p is None)
        if pg_n is not None:
            assert pg_n.kind == pg_p.kind and pg_n.k == pg_p.k
            np.testing.assert_array_equal(np.asarray(pg_n.words),
                                          np.asarray(pg_p.words))
            np.testing.assert_array_equal(np.asarray(pg_n.exc),
                                          np.asarray(pg_p.exc))

    def test_incompressible_none_on_both_paths(self, monkeypatch, rng):
        u = rng.integers(0, 65536, (2, 64 * 64), dtype=np.uint16)
        pg_n, pg_p = self._pair(u, 64, monkeypatch=monkeypatch)
        assert pg_n is None and pg_p is None
