"""Async ingest prefetcher + bulk grouped-upload loader tests."""

import io
import os
import sys

import numpy as np
import pytest

from nightlight_tpu.image import Image
from nightlight_tpu.io import fits as nlfits
from nightlight_tpu.io.ingest import BulkUploader, prefetch_frames


def _write_int16(path, arr_u16, bzero=32768.0):
    """Small BITPIX-16 FITS file (the camera-style unsigned encoding)."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from scripts.gen_fixtures import _write_fits16

    signed = (arr_u16.astype(np.int32) - int(bzero)).astype(">i2")
    _write_fits16(str(path), signed, arr_u16.shape[1], arr_u16.shape[0])


def _gen_small_set(tmp_path, rng, n=10, h=24, w=32):
    names = []
    for i in range(n):
        arr = rng.integers(100, 60000, size=(h, w)).astype(np.uint16)
        p = tmp_path / f"bulk{i:03d}.fits"
        _write_int16(p, arr)
        names.append(str(p))
    return names


class TestBulkUploader:
    def _specs(self, names):
        return list(enumerate(names))

    def test_matches_per_frame_read(self, tmp_path, rng):
        names = _gen_small_set(tmp_path, rng)
        up = BulkUploader(self._specs(names), io.StringIO(), frame_bytes=24 * 32 * 2)
        for i, name in enumerate(names):
            got = up.get(name)
            ref = nlfits.read_file(name, id=i, log=io.StringIO(), to_device=True)
            np.testing.assert_array_equal(np.asarray(got.data), np.asarray(ref.data))
            assert got.naxisn == ref.naxisn
            assert got.bzero == 0.0 and got.bscale == 1.0
            assert got.exposure == ref.exposure
            assert got.stats.mean == pytest.approx(ref.stats.mean, rel=1e-6)

    def test_groups_reduce_uploads(self, tmp_path, rng):
        names = _gen_small_set(tmp_path, rng, n=9)
        up = BulkUploader(self._specs(names), io.StringIO(), frame_bytes=24 * 32 * 2)
        assert up.group_frames == BulkUploader.MAX_GROUP  # tiny frames
        for name in names:
            up.get(name)
        assert up.n_uploads == 1  # one grouped transfer for all 9

    def test_reorder_batches_group_within_batch(self, tmp_path, rng):
        names = _gen_small_set(tmp_path, rng, n=12)
        up = BulkUploader(self._specs(names), io.StringIO(), frame_bytes=24 * 32 * 2)
        batch1 = [names[i] for i in (1, 4, 7, 10)]
        batch2 = [n for n in names if n not in batch1]
        up.reorder(batch1)
        for n in batch1:
            up.get(n)
        assert up.n_uploads == 1
        # batch 1's grouped upload must not have consumed batch 2's frames
        assert all(n in up._pending for n in batch2)
        up.reorder(batch2)
        for n in batch2:
            got = up.get(n)
            ref = nlfits.read_file(n, log=io.StringIO())
            np.testing.assert_array_equal(np.asarray(got.data), np.asarray(ref.data))
        assert up.n_uploads == 2

    def test_out_of_order_and_repeat_consumption(self, tmp_path, rng):
        names = _gen_small_set(tmp_path, rng, n=6)
        up = BulkUploader(self._specs(names), io.StringIO(), frame_bytes=24 * 32 * 2)
        for name in reversed(names):
            got = up.get(name)
            ref = nlfits.read_file(name, log=io.StringIO())
            np.testing.assert_array_equal(np.asarray(got.data), np.asarray(ref.data))
        # a second get of a consumed frame falls back to a plain read
        again = up.get(names[0])
        ref = nlfits.read_file(names[0], log=io.StringIO())
        np.testing.assert_array_equal(np.asarray(again.data), np.asarray(ref.data))

    def test_mixed_signatures_fall_back(self, tmp_path, rng):
        names = _gen_small_set(tmp_path, rng, n=4)
        # a different-shaped int16 frame splits the group run
        odd = tmp_path / "odd_shape.fits"
        _write_int16(odd, rng.integers(0, 65535, size=(16, 16)).astype(np.uint16))
        # a float32 frame is not device-decodable: per-frame fallback
        fimg = Image.from_naxisn([32, 24], rng.normal(500.0, 10.0,
                                                      size=(24, 32)).astype(np.float32))
        fpath = tmp_path / "float32.fits"
        nlfits.write_file(fimg, str(fpath))
        all_names = names[:2] + [str(odd), str(fpath)] + names[2:]
        up = BulkUploader(self._specs(all_names), io.StringIO(),
                          frame_bytes=24 * 32 * 2)
        for name in all_names:
            got = up.get(name)
            ref = nlfits.read_file(name, log=io.StringIO())
            np.testing.assert_array_equal(np.asarray(got.data), np.asarray(ref.data))

    def test_concurrent_consumption(self, tmp_path, rng):
        """materialize_all runs load promises in a thread pool on multi-core
        hosts, so get() must tolerate concurrent callers: the internal lock
        serializes order bookkeeping and device calls."""
        import threading

        names = _gen_small_set(tmp_path, rng, n=16)
        up = BulkUploader(self._specs(names), io.StringIO(),
                          frame_bytes=24 * 32 * 2)
        results: dict[str, object] = {}
        errors: list[Exception] = []

        def worker(sub):
            try:
                for n in sub:
                    results[n] = up.get(n)
            except Exception as e:  # noqa: BLE001 - surfaced in assertion
                errors.append(e)

        perm = list(rng.permutation(len(names)))
        subs = [[names[i] for i in perm[j::4]] for j in range(4)]
        threads = [threading.Thread(target=worker, args=(s,)) for s in subs]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors
        for i, name in enumerate(names):
            ref = nlfits.read_file(name, id=i, log=io.StringIO())
            np.testing.assert_array_equal(np.asarray(results[name].data),
                                          np.asarray(ref.data))

    def test_group_limit_follows_signature(self, tmp_path, rng):
        """A tiny leading file must not inflate groups of later large
        frames: the per-group frame budget is derived from the group's OWN
        signature, keeping every packed transfer under GROUP_BYTES."""
        tiny = tmp_path / "a_tiny.fits"
        _write_int16(tiny, rng.integers(0, 65535, size=(8, 8)).astype(np.uint16))
        larges = []
        for i in range(6):
            p = tmp_path / f"b_large{i}.fits"
            _write_int16(p, rng.integers(0, 65535, size=(64, 64)).astype(np.uint16))
            larges.append(str(p))
        names = [str(tiny)] + larges
        up = BulkUploader(self._specs(names), io.StringIO(), frame_bytes=8 * 8 * 2)
        up.GROUP_BYTES = 16384  # large sig (8192 B/frame) -> 2 frames/group
        assert up._group_limit((16, (64, 64))) == 2
        for name in names:
            got = up.get(name)
            ref = nlfits.read_file(name, log=io.StringIO())
            np.testing.assert_array_equal(np.asarray(got.data), np.asarray(ref.data))
        # 1 single-frame group for the tiny lead + 3 groups of 2 large
        assert up.n_uploads == 4

    def test_prefetch_ahead_respects_budget_and_order(self, tmp_path, rng):
        """prefetch_ahead dispatches only ~max_bytes of a future batch's raw
        payload; prefetched frames decode on first consumption and match the
        per-frame reader bit for bit (double-buffered out-of-core ingest)."""
        names = _gen_small_set(tmp_path, rng, n=12)
        frame_bytes = 24 * 32 * 2
        up = BulkUploader(self._specs(names), io.StringIO(), frame_bytes=frame_bytes)
        up.GROUP_BYTES = 2 * frame_bytes  # small groups so the byte budget bites
        batch1, batch2 = names[:6], names[6:]
        up.reorder(batch1)
        # prefetch ~2 groups (4 frames) of batch 2 while batch 1 is "computing"
        n = up.prefetch_ahead(batch2, 4 * frame_bytes)
        assert n == 4
        assert all(nm not in up._pending for nm in batch2[:4])
        assert all(nm in up._pending for nm in batch2[4:])
        # batch-1 consumption is unaffected and batch-2 frames decode lazily
        for nm in batch1 + batch2:
            got = up.get(nm)
            ref = nlfits.read_file(nm, log=io.StringIO())
            np.testing.assert_array_equal(np.asarray(got.data), np.asarray(ref.data))
            assert got.stats.mean == pytest.approx(ref.stats.mean, rel=1e-6)

    def test_prefetch_ahead_zero_budget_is_noop(self, tmp_path, rng):
        names = _gen_small_set(tmp_path, rng, n=6)
        up = BulkUploader(self._specs(names), io.StringIO(), frame_bytes=24 * 32 * 2)
        assert up.prefetch_ahead(names[3:], 0) == 0
        assert all(nm in up._pending for nm in names)

    def test_deferred_decode_single_get_decodes_whole_group(self, tmp_path, rng):
        """Uploading is decode-free (_PendingGroup); the first get() of any
        member dispatches one decode for the whole group."""
        names = _gen_small_set(tmp_path, rng, n=4)
        up = BulkUploader(self._specs(names), io.StringIO(), frame_bytes=24 * 32 * 2)
        up.prefetch_ahead(names, 1 << 30)
        from nightlight_tpu.io.ingest import _PendingGroup

        assert isinstance(up._ready[names[0]], _PendingGroup)
        got = up.get(names[2])  # middle member first
        ref = nlfits.read_file(names[2], log=io.StringIO())
        np.testing.assert_array_equal(np.asarray(got.data), np.asarray(ref.data))
        # the other members are now decoded Images, not group handles
        assert not isinstance(up._ready[names[0]], _PendingGroup)

    def test_large_frames_group_of_one(self, tmp_path, rng):
        """Frames above GROUP_BYTES/2 (16MP-class) now flow through the
        uploader as single-frame groups instead of bypassing it (the
        dispatch-ahead window + cross-batch prefetch are the win there)."""
        names = _gen_small_set(tmp_path, rng, n=4, h=24, w=32)
        frame_bytes = BulkUploader.GROUP_BYTES  # pretend frames are huge
        up = BulkUploader.try_create(self._specs(names), io.StringIO())
        assert up is not None
        assert up._group_limit((16, (32, 24))) >= 1
        big = BulkUploader(self._specs(names), io.StringIO(), frame_bytes=frame_bytes)
        assert big.group_frames == 2  # floor: grouping never goes below 2
        for nm in names:
            got = big.get(nm)
            ref = nlfits.read_file(nm, log=io.StringIO())
            np.testing.assert_array_equal(np.asarray(got.data), np.asarray(ref.data))

    def test_try_create_gates(self, tmp_path, rng):
        names = _gen_small_set(tmp_path, rng, n=4)
        assert BulkUploader.try_create(self._specs(names), io.StringIO()) is not None
        # too few frames
        assert BulkUploader.try_create(self._specs(names[:2]), io.StringIO()) is None
        # float payload
        fimg = Image.from_naxisn([8, 8], rng.normal(0, 1, size=(8, 8)).astype(np.float32))
        fpath = str(tmp_path / "f32lead.fits")
        nlfits.write_file(fimg, fpath)
        assert BulkUploader.try_create(
            self._specs([fpath] + names), io.StringIO()) is None

    def test_via_loadmany(self, tmp_path, rng):
        """OpLoadMany picks the bulk loader for small integer frames and the
        loaded images match per-frame reads."""
        from nightlight_tpu.pipeline.context import Context
        from nightlight_tpu.pipeline.operators import OpLoadMany, materialize_all

        names = _gen_small_set(tmp_path, rng, n=6)
        cwd = os.getcwd()
        os.chdir(tmp_path)
        try:
            c = Context(log=io.StringIO())
            ps = OpLoadMany(file_patterns=["bulk*.fits"]).make_promises([], c)
            assert len(ps) == 6
            assert isinstance(getattr(ps[0], "op", None).__dict__.get("_prefetcher"),
                              BulkUploader)
            images, err = materialize_all(ps, 1, False)
            assert err is None
            for img, name in zip(images, names):
                ref = nlfits.read_file(name, log=io.StringIO())
                np.testing.assert_array_equal(np.asarray(img.data),
                                              np.asarray(ref.data))
        finally:
            os.chdir(cwd)


class TestDecodePrefetcherOrdering:
    def test_permuted_consumption_does_not_deadlock(self, tmp_path, rng):
        """Consuming in an order unrelated to spec order must not deadlock
        even when the lookahead window is smaller than the reordering
        distance (the OpStackBatches permuted-batches case)."""
        from nightlight_tpu.pipeline.operators import _DecodePrefetcher

        names = []
        for i in range(8):
            img = Image.from_naxisn(
                [16, 16], rng.normal(i * 5.0, 1, size=(16, 16)).astype(np.float32))
            p = str(tmp_path / f"pf{i}.fits")
            nlfits.write_file(img, p)
            names.append(p)
        pf = _DecodePrefetcher(list(enumerate(names)), io.StringIO(),
                               depth=2, lookahead=2)
        for i in reversed(range(8)):  # worst case: exact reverse order
            img = pf.get(names[i])
            assert np.asarray(img.data).mean() == pytest.approx(i * 5.0, abs=0.5)

    def test_error_propagates_inline(self, tmp_path):
        from nightlight_tpu.pipeline.operators import _DecodePrefetcher

        missing = str(tmp_path / "missing.fits")
        pf = _DecodePrefetcher([(0, missing)], io.StringIO(), depth=1, lookahead=1)
        with pytest.raises(FileNotFoundError):
            pf.get(missing)


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
