"""Alignment tests: transform math, triangle generation, and end-to-end
recovery of known transforms from synthetic star fields."""

import numpy as np
import jax.numpy as jnp
import pytest

from nightlight_tpu.align import transform as tf
from nightlight_tpu.align.aligner import Aligner, generate_triangles, pick_brightest_distant
from nightlight_tpu.detect.stars import StarList
from nightlight_tpu.ops.resample import project


class TestTransform:
    def test_identity(self):
        t = tf.identity()
        pts = np.array([[3.0, 4.0], [0.0, 0.0]], np.float32)
        np.testing.assert_allclose(tf.apply(t, pts), pts)

    def test_from_three_points_recovers_affine(self, rng):
        true = np.array([0.98, -0.21, 15.0, 0.21, 0.98, -7.0], np.float32)
        p = rng.uniform(0, 1000, size=(3, 2)).astype(np.float32)
        pp = tf.apply(true, p)
        t = tf.from_three_points(p[0], p[1], p[2], pp[0], pp[1], pp[2])
        np.testing.assert_allclose(t, true, rtol=1e-3, atol=1e-2)

    def test_invert(self, rng):
        t = np.array([0.9, -0.1, 5.0, 0.1, 0.9, -3.0], np.float32)
        inv = tf.invert(t)
        pts = rng.uniform(0, 100, size=(10, 2)).astype(np.float32)
        back = tf.apply(inv, tf.apply(t, pts))
        np.testing.assert_allclose(back, pts, atol=1e-3)

    def test_invert_singular_raises(self):
        with pytest.raises(ValueError):
            tf.invert(np.array([1.0, 2.0, 0.0, 0.5, 1.0, 0.0], np.float32))  # b*d-a*e=0


class TestTriangles:
    def test_sides_sorted(self, rng):
        xs = rng.uniform(0, 1000, size=10).astype(np.float32)
        ys = rng.uniform(0, 1000, size=10).astype(np.float32)
        sides, tris = generate_triangles(xs, ys, np.arange(10, dtype=np.int32))
        assert len(sides) > 0
        assert (sides[:, 0] < sides[:, 1]).all()
        assert (sides[:, 1] < sides[:, 2]).all()
        # verify side lengths actually correspond to the vertex order
        for s, t in zip(sides[:5], tris[:5]):
            a, b, c = t
            dab = np.hypot(xs[a] - xs[b], ys[a] - ys[b])
            dac = np.hypot(xs[a] - xs[c], ys[a] - ys[c])
            dbc = np.hypot(xs[b] - xs[c], ys[b] - ys[c])
            np.testing.assert_allclose([dab, dac, dbc], s, rtol=1e-5)

    def test_pick_brightest_distant(self):
        xs = np.array([0.0, 1.0, 100.0, 200.0], np.float32)
        ys = np.zeros(4, np.float32)
        picked = pick_brightest_distant(xs, ys, 50.0, 3)
        assert list(picked) == [0, 2, 3]  # star 1 is too close to star 0


def make_starlist(xs, ys, masses=None):
    n = len(xs)
    masses = masses if masses is not None else np.linspace(1000, 100, n)
    order = np.argsort(-masses)
    return StarList(
        x=np.asarray(xs, np.float32)[order], y=np.asarray(ys, np.float32)[order],
        value=np.ones(n, np.float32), mass=np.asarray(masses, np.float32)[order],
        hfr=np.full(n, 2.5, np.float32), count=n,
    )


class TestAligner:
    def _field(self, rng, n=40, w=1000, h=800):
        xs = rng.uniform(50, w - 50, size=n).astype(np.float32)
        ys = rng.uniform(50, h - 50, size=n).astype(np.float32)
        masses = rng.uniform(100, 10000, size=n).astype(np.float32)
        return xs, ys, masses

    def test_recovers_translation(self, rng):
        xs, ys, m = self._field(rng)
        ref = make_starlist(xs, ys, m)
        moved = make_starlist(xs - 12.5, ys + 7.25, m)  # frame shifted
        aligner = Aligner([1000, 800], ref, k=20)
        trans, residual = aligner.align([1000, 800], moved)
        assert residual < 0.1
        # transform must map frame coords -> reference coords
        proj = tf.apply(trans, np.array([[100.0, 100.0]], np.float32))
        np.testing.assert_allclose(proj[0], [112.5, 92.75], atol=0.1)

    def test_recovers_rotation(self, rng):
        xs, ys, m = self._field(rng)
        ref = make_starlist(xs, ys, m)
        theta = np.deg2rad(3.0)
        ct, st_ = np.cos(theta), np.sin(theta)
        # rotate about image center and translate
        cx, cy = 500.0, 400.0
        xr = ct * (xs - cx) - st_ * (ys - cy) + cx + 5.0
        yr = st_ * (xs - cx) + ct * (ys - cy) + cy - 3.0
        frame = make_starlist(xr.astype(np.float32), yr.astype(np.float32), m)
        aligner = Aligner([1000, 800], ref, k=20)
        trans, residual = aligner.align([1000, 800], frame)
        assert residual < 0.1
        # the recovered transform should invert the rotation
        proj = tf.apply(trans, np.stack([xr, yr], -1).astype(np.float32))
        d = proj - np.stack([xs, ys], -1)
        assert np.sqrt((d * d).sum(-1)).max() < 0.5

    def test_identity_frame(self, rng):
        xs, ys, m = self._field(rng)
        ref = make_starlist(xs, ys, m)
        aligner = Aligner([1000, 800], ref, k=20)
        trans, residual = aligner.align([1000, 800], ref)
        assert residual < 0.01
        np.testing.assert_allclose(trans, tf.identity(), atol=0.01)

    def test_unalignable_returns_inf(self, rng):
        xs, ys, m = self._field(rng, n=30)
        ref = make_starlist(xs, ys, m)
        # completely unrelated star field
        xs2, ys2, m2 = self._field(np.random.default_rng(999), n=30)
        frame = make_starlist(xs2, ys2, m2)
        aligner = Aligner([1000, 800], ref, k=15)
        _, residual = aligner.align([1000, 800], frame)
        assert residual > 1.0  # caller drops frames above threshold


class TestBatchAligner:
    """The whole-batch device align path (Aligner.align_batch_deferred):
    device star pick and triangle generation must match the host functions
    exactly, and the one-dispatch batch search must match the per-frame
    search."""

    def _field(self, rng, n=40, w=1000, h=800):
        xs = rng.uniform(50, w - 50, size=n).astype(np.float32)
        ys = rng.uniform(50, h - 50, size=n).astype(np.float32)
        masses = rng.uniform(100, 10000, size=n).astype(np.float32)
        return xs, ys, masses

    def test_device_pick_matches_host(self, rng):
        from nightlight_tpu.align.aligner import _pick_device

        ml = 800 / 20.0
        for n in (40, 12, 4):
            xs, ys, m = self._field(rng, n=n)
            s = make_starlist(xs, ys, m)
            hp = pick_brightest_distant(s.x, s.y, ml, 20)
            xs_p = np.zeros(256, np.float32)
            ys_p = np.zeros(256, np.float32)
            xs_p[:n], ys_p[:n] = s.x, s.y
            dp = np.asarray(_pick_device(
                jnp.asarray(xs_p), jnp.asarray(ys_p), jnp.int32(n),
                jnp.float32(ml * ml), 20))
            dp = dp[dp >= 0]
            assert len(dp) == len(hp)
            assert (dp == hp).all()

    def test_device_triangles_match_host(self, rng):
        from nightlight_tpu.align.aligner import (
            _combos_for, _pick_device, _tris_device)

        n, ml, scale = 30, 40.0, 0.75
        xs, ys, m = self._field(rng, n=n)
        s = make_starlist(xs, ys, m)
        hp = pick_brightest_distant(s.x, s.y, ml, 20)
        h_sides, h_tris = generate_triangles(s.x, s.y, hp, scale)
        xs_p = np.zeros(256, np.float32)
        ys_p = np.zeros(256, np.float32)
        xs_p[:n], ys_p[:n] = s.x, s.y
        picked = _pick_device(jnp.asarray(xs_p), jnp.asarray(ys_p),
                              jnp.int32(n), jnp.float32(ml * ml), 20)
        d_sides, d_pts = _tris_device(
            jnp.asarray(xs_p), jnp.asarray(ys_p), picked,
            jnp.asarray(_combos_for(20)), jnp.float32(scale))
        d_sides, d_pts = np.asarray(d_sides), np.asarray(d_pts)
        ok = d_sides[:, 0] < 1e29
        assert int(ok.sum()) == len(h_sides)
        # same canonical triangles: sides AND vertex coordinates per triple
        h_pts = np.stack([s.x[h_tris], s.y[h_tris]], -1)
        h_map = {tuple(np.round(r, 3)): np.round(p, 2).tobytes()
                 for r, p in zip(h_sides, h_pts)}
        d_map = {tuple(np.round(r, 3)): np.round(p, 2).tobytes()
                 for r, p in zip(d_sides[ok], d_pts[ok])}
        assert h_map == d_map

    def test_batch_matches_per_frame(self, rng):
        xs, ys, m = self._field(rng, n=60)
        ref = make_starlist(xs, ys, m)
        aligner = Aligner([1000, 800], ref, k=20)
        frames = []
        for dx, dy in ((-12.5, 7.25), (3.0, -9.5), (0.25, 0.5)):
            frames.append(make_starlist(xs - dx, ys + dy, m))
        per = [aligner.align([1000, 800], f) for f in frames]
        rows = aligner.align_batch_deferred([([1000, 800], f) for f in frames])
        for (tp, rp), (td, rd) in zip(per, rows):
            assert np.isfinite(rp)
            np.testing.assert_allclose(np.asarray(td.value, np.float32), tp,
                                       atol=1e-4)
            assert abs(float(rd) - rp) < 1e-4

    def test_op_align_batch_prepass_matches_per_frame(self, rng, monkeypatch):
        """OpAlign.make_promises' batch prepass must produce the same
        transforms/residuals and drop decisions as the per-frame path
        (NIGHTLIGHT_NO_BATCH_ALIGN=1)."""
        from nightlight_tpu.image import Image
        from nightlight_tpu.pipeline.context import Context
        from nightlight_tpu.pipeline.ops_post import OpAlign

        xs = rng.uniform(4, 60, size=60).astype(np.float32)
        ys = rng.uniform(4, 44, size=60).astype(np.float32)
        m = rng.uniform(100, 10000, size=60).astype(np.float32)
        ref = make_starlist(xs, ys, m)

        def run(no_batch):
            if no_batch:
                monkeypatch.setenv("NIGHTLIGHT_NO_BATCH_ALIGN", "1")
            else:
                monkeypatch.delenv("NIGHTLIGHT_NO_BATCH_ALIGN", raising=False)
            c = Context()
            c.align_naxisn = [64, 48]
            c.align_stars = ref
            imgs = []
            for i, (dx, dy) in enumerate(((-2.0, 1.25), (0.5, -1.5))):
                img = Image.from_naxisn(
                    [64, 48], jnp.asarray(rng.uniform(0, 1, (48, 64))
                                          .astype(np.float32)))
                img.id = i
                img.stars = make_starlist(xs - dx, ys + dy, m)
                imgs.append(img)
            op = OpAlign(k=20, threshold=1.0, defer_warp=False)
            proms = op.make_promises([lambda im=im: im for im in imgs], c)
            outs = [p() for p in proms]
            return [(o.trans, o.residual) for o in outs if o is not None]

        a = run(no_batch=False)
        b = run(no_batch=True)
        assert len(a) == len(b) == 2
        for (ta, ra), (tb, rb) in zip(a, b):
            np.testing.assert_allclose(ta, tb, atol=1e-4)
            assert abs(ra - rb) < 1e-4


class TestProject:
    def test_identity_projection(self, rng):
        img = rng.uniform(0, 100, size=(32, 48)).astype(np.float32)
        out = project(jnp.asarray(img), [48, 32], tf.identity(), np.nan)
        out = np.asarray(out)
        # interior pixels must match exactly; the last row/col go OOB since
        # bilinear needs xl+1 (project.go:52)
        np.testing.assert_allclose(out[:-1, :-1], img[:-1, :-1], rtol=1e-6)
        assert np.isnan(out[-1, -1])

    def test_translation(self, rng):
        img = rng.uniform(0, 100, size=(32, 48)).astype(np.float32)
        trans = np.array([1.0, 0.0, 5.0, 0.0, 1.0, 3.0], np.float32)  # dest = src + (5,3)
        out = np.asarray(project(jnp.asarray(img), [48, 32], trans, np.nan))
        np.testing.assert_allclose(out[3:-1, 5:-1], img[: 32 - 4, : 48 - 6], rtol=1e-5)
        assert np.isnan(out[0, 0])  # uncovered corner

    def test_oob_fill_value(self, rng):
        img = rng.uniform(0, 100, size=(16, 16)).astype(np.float32)
        trans = np.array([1.0, 0.0, 100.0, 0.0, 1.0, 100.0], np.float32)
        out = np.asarray(project(jnp.asarray(img), [16, 16], trans, -7.0))
        assert (out == -7.0).all()


def _shift_plan_of(inv, src_shape, dest_naxisn):
    from nightlight_tpu.ops.resample import _shift_plan

    return _shift_plan(np.asarray(inv, np.float64), src_shape, dest_naxisn)


class TestShiftWarp:
    """Gather-free shift-blend warp vs the general gather warp: identical
    results for alignment-sized transforms; large transforms fall back."""

    def _both(self, img, dest_naxisn, trans, oob=np.nan):
        from nightlight_tpu.align import transform as tf
        from nightlight_tpu.ops.resample import _shift_plan, _warp, _warp_shift

        inv = tf.invert(trans)
        plan = _shift_plan(inv, img.shape, dest_naxisn)
        dest_w, dest_h = int(dest_naxisn[0]), int(dest_naxisn[1])
        gather = np.asarray(_warp(jnp.asarray(img), jnp.asarray(inv),
                                  float(oob), dest_h, dest_w))
        return plan, gather

    def test_alignment_transform_matches_gather(self, rng):
        from nightlight_tpu.ops.resample import _warp_shift

        img = rng.uniform(0, 100, size=(64, 80)).astype(np.float32)
        # realistic alignment result: tiny rotation/scale + dither offset
        trans = np.array([0.99991, 0.00007, 15.99,
                          0.00001, 1.00010, -12.04], np.float32)
        plan, gather = self._both(img, [80, 64], trans)
        assert plan is not None
        kmin, mmin, n_k, n_m = plan
        from nightlight_tpu.align import transform as tf

        out = np.asarray(_warp_shift(
            jnp.asarray(img), jnp.asarray(tf.invert(trans), np.float32),
            jnp.float32(np.nan), jnp.int32(kmin), jnp.int32(mmin),
            64, 80, n_k, n_m))
        np.testing.assert_array_equal(np.isnan(out), np.isnan(gather))
        m = ~np.isnan(gather)
        np.testing.assert_allclose(out[m], gather[m], rtol=0, atol=1e-4)

    def test_nonfinite_source_matches_gather_propagation(self, rng):
        """A NaN/Inf source pixel must poison exactly the destination pixels
        whose 4 bilinear neighbors include it (the gather-path rule, where
        0*NaN=NaN hits even zero-weight neighbors) -- NOT every pixel whose
        shift window overlaps it."""
        from nightlight_tpu.align import transform as tf
        from nightlight_tpu.ops.resample import _shift_plan, _warp, _warp_shift

        img = rng.uniform(0, 100, size=(64, 80)).astype(np.float32)
        img[20, 30] = np.nan
        img[40, 55] = np.nan
        trans = np.array([1.00003, 0.00002, 4.6,
                          -0.00001, 0.99998, -2.3], np.float32)
        inv = tf.invert(trans)
        plan = _shift_plan(inv, img.shape, [80, 64])
        assert plan is not None
        kmin, mmin, n_k, n_m = plan
        gather = np.asarray(_warp(jnp.asarray(img), jnp.asarray(inv),
                                  float(np.nan), 64, 80))
        out = np.asarray(_warp_shift(
            jnp.asarray(img), jnp.asarray(inv, np.float32),
            jnp.float32(np.nan), jnp.int32(kmin), jnp.int32(mmin),
            64, 80, n_k, n_m))
        np.testing.assert_array_equal(np.isnan(out), np.isnan(gather))
        m = ~np.isnan(gather)
        # poisoning stayed local: only the OOB border plus ~4 bilinear
        # neighbors per bad pixel go NaN, not whole shift windows
        assert m.sum() > 0.85 * gather.size
        np.testing.assert_allclose(out[m], gather[m], rtol=0, atol=1e-4)

    def test_batch_warp_matches_per_frame(self, rng):
        """_warp_shift_batch (the fused stack tail's one-program warp) must
        equal per-frame _warp_shift under the SHARED shift bucket, and pass
        flag=False frames through untouched (the alignment reference keeps
        its pixels, no bilinear NaN border)."""
        from nightlight_tpu.align import transform as tf
        from nightlight_tpu.ops.resample import (
            _warp_shift, _warp_shift_batch, plan_batch_shift_warp)

        h, w = 48, 64
        imgs = rng.uniform(0, 100, size=(3, h, w)).astype(np.float32)
        transs = [
            np.array([1.0, 0.0, 0.0, 0.0, 1.0, 0.0], np.float32),      # ref
            np.array([1.00002, 0.00001, 3.3, 0.0, 0.99998, -2.1], np.float32),
            np.array([0.99997, -0.00002, -6.7, 0.00001, 1.00001, 5.4], np.float32),
        ]
        invs = [tf.invert(t) for t in transs]
        plan = plan_batch_shift_warp([im.shape for im in imgs], [w, h], invs)
        assert plan is not None
        kmins, mmins, n_k, n_m = plan
        flags = np.array([False, True, True])
        out = np.asarray(_warp_shift_batch(
            jnp.asarray(imgs), jnp.asarray(np.stack(invs), np.float32),
            jnp.asarray(np.full(3, np.nan, np.float32)),
            jnp.asarray(kmins), jnp.asarray(mmins), jnp.asarray(flags),
            n_k, n_m))
        # frame 0: passthrough, bit-identical, finite everywhere
        np.testing.assert_array_equal(out[0], imgs[0])
        # frames 1-2: equal to the per-frame warp AT ITS OWN bucket
        for i in (1, 2):
            own = _shift_plan_of(invs[i], (h, w), [w, h])
            ref = np.asarray(_warp_shift(
                jnp.asarray(imgs[i]), jnp.asarray(invs[i], np.float32),
                jnp.float32(np.nan), jnp.int32(own[0]), jnp.int32(own[1]),
                h, w, own[2], own[3]))
            np.testing.assert_array_equal(np.isnan(out[i]), np.isnan(ref))
            m = ~np.isnan(ref)
            np.testing.assert_allclose(out[i][m], ref[m], rtol=0, atol=1e-4)

    def test_project_routes_small_transforms_to_shift_path(self, rng):
        from unittest import mock

        import nightlight_tpu.ops.resample as rs

        img = jnp.asarray(rng.uniform(0, 100, size=(32, 48)).astype(np.float32))
        trans = np.array([1.0, 0.0, 2.5, 0.0, 1.0, -1.5], np.float32)
        with mock.patch.object(rs, "_warp_shift", wraps=rs._warp_shift) as spy:
            project(img, [48, 32], trans, np.nan)
        assert spy.called

    def test_large_rotation_falls_back_to_gather(self, rng):
        from nightlight_tpu.align import transform as tf
        from nightlight_tpu.ops.resample import _shift_plan

        # ~3 degree rotation: offsets span far more than the shift budget
        th = np.deg2rad(3.0)
        trans = np.array([np.cos(th), -np.sin(th), 0.0,
                          np.sin(th), np.cos(th), 0.0], np.float32)
        assert _shift_plan(tf.invert(trans), (512, 512), [512, 512]) is None
        # and project still produces correct output through the gather
        img = rng.uniform(0, 100, size=(64, 64)).astype(np.float32)
        out = np.asarray(project(jnp.asarray(img), [64, 64], trans, np.nan))
        assert np.isfinite(out).any()

    def test_huge_translation_falls_back(self, rng):
        from nightlight_tpu.align import transform as tf
        from nightlight_tpu.ops.resample import _SHIFT_PAD, _shift_plan

        trans = np.array([1.0, 0.0, float(_SHIFT_PAD + 50), 0.0, 1.0, 0.0], np.float32)
        assert _shift_plan(tf.invert(trans), (2048, 2048), [2048, 2048]) is None

    def test_deferred_warp_e2e_matches_immediate(self, tmp_path, monkeypatch):
        """CLI stack with defer_warp (projection at the stack barrier) vs the
        same pipeline with OpAlign(defer_warp=False) (immediate warp inside
        the align op): same planted-shift recovery, same stacked pixels."""
        from nightlight_tpu.io import fits as nlfits
        from tests.test_pipeline_e2e import run_cli, write_frames

        rng = np.random.default_rng(5)
        write_frames(tmp_path, rng, n_frames=3)
        rc = run_cli(["-out", "a.fits", "-jpg", "", "-exportStats", "", "-log", "",
                      "stack", "light*.fits"], tmp_path)
        assert rc == 0
        # NIGHTLIGHT_NO_DEFER_WARP makes the preset build
        # OpAlign(defer_warp=False), so run b actually takes the
        # immediate-warp branch of OpAlign.apply
        monkeypatch.setenv("NIGHTLIGHT_NO_DEFER_WARP", "1")
        rc = run_cli(["-out", "b.fits", "-jpg", "", "-exportStats", "", "-log", "",
                      "stack", "light*.fits"], tmp_path)
        assert rc == 0
        a = np.asarray(nlfits.read_file(str(tmp_path / "a.fits")).data)
        b = np.asarray(nlfits.read_file(str(tmp_path / "b.fits")).data)
        np.testing.assert_array_equal(np.isnan(a), np.isnan(b))
        m = ~np.isnan(a)
        np.testing.assert_allclose(a[m], b[m], rtol=0, atol=1e-3)
