"""Device mesh and sharded pipeline steps.

The reference is single-process CPU-threaded (SURVEY.md section 2.7); its
scaling axes map onto a JAX device mesh as:

* pixel-tile data parallelism: the stacking reduction, calibration, and all
  elementwise post-processing are independent per pixel, so the pixel axis
  shards cleanly across chips ("dp" over rows). Global scalars -- clip
  counters, statistics reductions -- become psums that XLA inserts
  automatically from the sharding annotations; they ride ICI.
* frame-axis parallelism: per-frame preprocessing (calibrate/debayer) is
  embarrassingly parallel over frames; for the sharded step the frame axis
  stays replicated because stacking reduces over it per pixel.

The mesh layout keeps every collective on ICI: only stacked tiles (already
reduced over frames) ever cross shards.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nightlight_tpu.ops import stack as stk


def make_mesh(devices=None, axis: str = "pix") -> Mesh:
    """1D mesh over the pixel-row axis."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (axis,))


def shard_rows(mesh: Mesh, axis: str = "pix") -> NamedSharding:
    """Sharding for (frames, rows, cols): rows split across the mesh."""
    return NamedSharding(mesh, P(None, axis, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def place_on_mesh(data, mesh: Mesh, axis: str = "pix"):
    """Row-shard an image array of shape (..., H, W) across the mesh.

    This is the one placement the operator pipeline needs: once a loaded
    frame lives row-sharded, XLA's sharding propagation runs every
    downstream jitted program (calibrate, bad-pixel, star detect, histogram
    match, warp, stack, stretch) sharded without per-op annotations,
    inserting ICI collectives only where pixels cross shard rows. Arrays
    whose row count does not divide the mesh stay replicated.
    """
    n = int(mesh.devices.size)
    if data.ndim < 2 or data.shape[-2] % n != 0:
        spec = P()
    else:
        spec = P(*([None] * (data.ndim - 2) + [axis, None]))
    return jax.device_put(data, NamedSharding(mesh, spec))


def sharded_star_detect(mesh: Mesh, radius: int = 16, max_candidates: int = 2048,
                        axis: str = "pix"):
    """Jit the 6-phase star detector with the image row-sharded over the
    mesh (the detector's global reductions -- threshold stats, top-k
    candidate selection -- become collectives). Returns the compiled
    function (img, location, scale, star_sig, bp_sig, star_in_out,
    median_diff_std) -> packed star arrays; outputs are replicated since
    star lists are small."""
    from functools import partial as _partial

    from nightlight_tpu.detect.stars import _find_stars_device

    img_sharding = NamedSharding(mesh, P(axis, None))
    rep = NamedSharding(mesh, P())

    def fn(img, location, scale, star_sig, bp_sig, star_in_out, median_diff_std):
        return _find_stars_device(img, location, scale, star_sig, bp_sig,
                                  star_in_out, radius, median_diff_std,
                                  max_candidates)

    return jax.jit(fn,
                   in_shardings=(img_sharding, rep, rep, rep, rep, rep, rep),
                   out_shardings=rep)


def sharded_auto_stretch(mesh: Mesh, max_iter: int = 50, axis: str = "pix"):
    """Jit the iterative auto-stretch with the image row-sharded: the
    per-iteration histogram/statistics reductions become psums over ICI and
    the gamma/black-point transforms stay local to each shard."""
    from nightlight_tpu.ops.autostretch import auto_stretch

    img_sharding = NamedSharding(mesh, P(axis, None))
    rep = NamedSharding(mesh, P())

    def fn(data, target_loc, target_scale):
        return auto_stretch(data, target_loc, target_scale, max_iter=max_iter)

    return jax.jit(fn,
                   in_shardings=(img_sharding, rep, rep),
                   out_shardings=(img_sharding, rep, rep, rep))


def _pipeline_step(frames, dark, flat, flat_max, weights, ref_locs, ref_scales,
                   loc0, scale0, sigma_low, sigma_high, mode: int,
                   use_pallas: bool | None = False, mesh: Mesh | None = None,
                   axis: str = "pix"):
    """One fused training-step analog: calibrate every frame, match
    histograms to the reference, and reduce the frame axis with the
    configured outlier-rejection stack. All math is per-pixel independent,
    so a row-sharded input runs without any cross-device transfers until
    the scalar clip counters (psum).

    With `mesh` set the stacking reduction runs through shard_map
    (ops/stack.stack_sharded), which keeps the Pallas kernels usable under
    SPMD -- a pallas_call cannot be auto-partitioned by sharding
    annotations, but runs unchanged on each shard's local rows. Without a
    mesh, `use_pallas` selects the single-chip kernel path (bench)."""
    # calibration (pre/preprocess.go:68-99)
    cal = frames - dark[None]
    cal = jnp.where(flat[None] <= 0.0, cal, cal * flat_max / flat[None])
    # per-frame linear histogram match (pixelops.go:601-611)
    mult = (ref_scales / scale0)[:, None, None]
    off = (ref_locs - loc0 * (ref_scales / scale0))[:, None, None]
    matched = cal * mult + off
    stacked, clip_lo, clip_hi = stk.stack(
        matched, stk.StackMode(mode), weights=weights,
        sigma_low=sigma_low, sigma_high=sigma_high, ref_frame_loc=loc0,
        use_pallas=use_pallas, mesh=mesh, axis=axis)
    return stacked, clip_lo, clip_hi


def _warp_frames(frames, invs):
    """Per-frame affine bilinear warp with NaN out-of-bounds fill (the
    alignment phase, internal/fits/project.go:26-76), vmapped over frames.
    invs: (N, 6) inverse transforms [a, b, c, d, e, f]."""
    _, h, w = frames.shape
    col = jnp.arange(w, dtype=jnp.float32)[None, :]
    row = jnp.arange(h, dtype=jnp.float32)[:, None]

    def one(img, inv):
        px = inv[0] * col + inv[1] * row + inv[2]
        py = inv[3] * col + inv[4] * row + inv[5]
        xl = jnp.floor(px)
        yl = jnp.floor(py)
        xr = px - xl
        yr = py - yl
        xl_i = xl.astype(jnp.int32)
        yl_i = yl.astype(jnp.int32)
        oob = (xl_i < 0) | (xl_i + 1 >= w) | (yl_i < 0) | (yl_i + 1 >= h)
        xc = jnp.clip(xl_i, 0, w - 2)
        yc = jnp.clip(yl_i, 0, h - 2)
        v00 = img[yc, xc]
        v01 = img[yc, xc + 1]
        v10 = img[yc + 1, xc]
        v11 = img[yc + 1, xc + 1]
        v = ((v00 * (1 - xr) + v01 * xr) * (1 - yr)
             + (v10 * (1 - xr) + v11 * xr) * yr)
        return jnp.where(oob, jnp.nan, v)

    return jax.vmap(one)(frames, invs)


def _full_pipeline_step(frames, dark, flat, flat_max, weights, ref_locs, ref_scales,
                        loc0, scale0, invs, sigma_low, sigma_high, mode: int,
                        use_pallas: bool | None = False, mesh: Mesh | None = None,
                        axis: str = "pix"):
    """The complete per-batch device program: calibrate + histogram-match +
    align-warp + outlier-rejection stack. The warp's bilinear gather is the
    one phase whose row-sharded reads cross shard boundaries (a frame's
    pixels move between rows under the transform); XLA resolves it with a
    collective on the frames operand, so only this phase pays ICI traffic.
    With `mesh` set the stack reduction runs shard_map'ed (Pallas-capable
    under SPMD, see _pipeline_step)."""
    cal = frames - dark[None]
    cal = jnp.where(flat[None] <= 0.0, cal, cal * flat_max / flat[None])
    mult = (ref_scales / scale0)[:, None, None]
    off = (ref_locs - loc0 * (ref_scales / scale0))[:, None, None]
    matched = cal * mult + off
    warped = _warp_frames(matched, invs)
    stacked, clip_lo, clip_hi = stk.stack(
        warped, stk.StackMode(mode), weights=weights,
        sigma_low=sigma_low, sigma_high=sigma_high, ref_frame_loc=loc0,
        use_pallas=use_pallas, mesh=mesh, axis=axis)
    return stacked, clip_lo, clip_hi


def _warp_frames_halo(frames, invs, mesh: Mesh, halo: int, axis: str = "pix"):
    """Row-sharded affine warp with HALO EXCHANGE instead of a gather
    collective: each shard ppermutes its boundary rows to its neighbors
    (2 x halo x W words over ICI) and warps locally, instead of XLA
    all-gathering whole frames. Alignment displacements in stacking are
    small (a few pixels of dither), so a fixed halo covers them; source
    pixels beyond the halo produce NaN -- the same missing-data protocol as
    out-of-bounds pixels, which the stacker already skips.

    frames: (N, H, W) sharded P(None, axis, None). invs: (N, 6) replicated.
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    n_shards = int(mesh.devices.size)
    _, h, w = frames.shape
    rows_per = h // n_shards

    fwd = [(i, i + 1) for i in range(n_shards - 1)]  # my bottom rows -> next shard's top halo
    bwd = [(i, i - 1) for i in range(1, n_shards)]   # my top rows -> previous shard's bottom halo

    def local_warp(fl, invs):
        # fl: (N, rows_per, W) local block
        idx = jax.lax.axis_index(axis)
        recv_top = jax.lax.ppermute(fl[:, -halo:, :], axis, fwd)   # rows above my block
        recv_bot = jax.lax.ppermute(fl[:, :halo, :], axis, bwd)    # rows below my block
        padded = jnp.concatenate([recv_top, fl, recv_bot], axis=1)  # (N, halo+rows+halo, W)
        start = idx * rows_per  # first global row of my block

        col = jnp.arange(w, dtype=jnp.float32)[None, :]
        g_row = (start + jnp.arange(rows_per)).astype(jnp.float32)[:, None]

        def one(img, inv):
            px = inv[0] * col + inv[1] * g_row + inv[2]
            py = inv[3] * col + inv[4] * g_row + inv[5]
            xl = jnp.floor(px)
            yl = jnp.floor(py)
            xr = px - xl
            yr = py - yl
            xl_i = xl.astype(jnp.int32)
            yl_i = yl.astype(jnp.int32)
            # global out-of-bounds (project.go:52-61) OR beyond the halo
            yl_loc = yl_i - start + halo
            oob = ((xl_i < 0) | (xl_i + 1 >= w) | (yl_i < 0) | (yl_i + 1 >= h)
                   | (yl_loc < 0) | (yl_loc + 1 >= rows_per + 2 * halo))
            xc = jnp.clip(xl_i, 0, w - 2)
            yc = jnp.clip(yl_loc, 0, rows_per + 2 * halo - 2)
            v00 = img[yc, xc]
            v01 = img[yc, xc + 1]
            v10 = img[yc + 1, xc]
            v11 = img[yc + 1, xc + 1]
            v = ((v00 * (1 - xr) + v01 * xr) * (1 - yr)
                 + (v10 * (1 - xr) + v11 * xr) * yr)
            return jnp.where(oob, jnp.nan, v)

        return jax.vmap(one)(padded, invs)

    return shard_map(
        local_warp, mesh=mesh,
        in_specs=(P(None, axis, None), P()),
        out_specs=P(None, axis, None),
    )(frames, invs)


def sharded_full_pipeline_step_halo(mesh: Mesh, mode: int = int(stk.StackMode.Sigma),
                                    halo: int = 32, axis: str = "pix",
                                    use_pallas: bool | None = None):
    """Like sharded_full_pipeline_step, but the warp exchanges halo rows
    over ICI instead of gathering frames. Cross-device traffic per frame
    drops from O(H x W) to O(2 x halo x W). The stack reduction runs
    shard_map'ed (Pallas kernels per shard on TPU)."""
    data_sharding = NamedSharding(mesh, P(None, axis, None))
    out_sharding = NamedSharding(mesh, P(axis, None))
    rep = NamedSharding(mesh, P())
    plane = NamedSharding(mesh, P(axis, None))

    def step(frames, dark, flat, flat_max, weights, ref_locs, ref_scales,
             loc0, scale0, invs, sigma_low, sigma_high):
        cal = frames - dark[None]
        cal = jnp.where(flat[None] <= 0.0, cal, cal * flat_max / flat[None])
        mult = (ref_scales / scale0)[:, None, None]
        off = (ref_locs - loc0 * (ref_scales / scale0))[:, None, None]
        matched = cal * mult + off
        warped = _warp_frames_halo(matched, invs, mesh, halo, axis)
        return stk.stack(warped, stk.StackMode(mode), weights=weights,
                         sigma_low=sigma_low, sigma_high=sigma_high,
                         ref_frame_loc=loc0, use_pallas=use_pallas,
                         mesh=mesh, axis=axis)

    return jax.jit(
        step,
        in_shardings=(data_sharding, plane, plane, rep, rep, rep, rep, rep, rep,
                      rep, rep, rep),
        out_shardings=(out_sharding, rep, rep),
    )


def required_halo(invs, dest_h: int, dest_w: int) -> int:
    """Smallest halo (in rows) that lets every destination pixel of every
    frame read its bilinear source rows locally under the given inverse
    transforms: max |py - y| over the destination corners, plus 1 for the
    bilinear +1 neighbor. Affine transforms attain their extreme row
    displacement at a corner, so checking the 4 corners is exact."""
    import math

    invs = np.asarray(invs, np.float64).reshape(-1, 6)
    corners = [(0.0, 0.0), (dest_w - 1.0, 0.0), (0.0, dest_h - 1.0),
               (dest_w - 1.0, dest_h - 1.0)]
    worst = 0.0
    for inv in invs:
        for (x, y) in corners:
            py = inv[3] * x + inv[4] * y + inv[5]
            worst = max(worst, abs(py - y))
    return int(math.floor(worst)) + 2


def sharded_full_pipeline_step_auto(mesh: Mesh, invs,
                                    mode: int = int(stk.StackMode.Sigma),
                                    dest_h: int = 0, dest_w: int = 0,
                                    halo_cap: int = 128, axis: str = "pix",
                                    use_pallas: bool | None = None, log=None):
    """Pick the warp strategy from the batch's ACTUAL transforms: the
    halo-exchange warp with a halo sized to the largest row displacement
    (bucketed to powers of two so the step compiles once per bucket), or
    the gather-warp step when the displacement exceeds `halo_cap` rows.

    The fixed-halo step silently NaNs rows whose source lies beyond the
    halo (the stacker then treats them as missing data) -- a frame with a
    40 px dither would quietly lose rows. This dispatcher makes that
    impossible for host-known transforms: the halo always covers the batch
    or the gather path takes over. Returns the jitted step function."""
    need = required_halo(invs, dest_h, dest_w)
    if need > halo_cap:
        if log is not None:
            log.write(f"Halo warp: displacement needs {need} rows > cap "
                      f"{halo_cap}; using the gather-warp step\n")
        return sharded_full_pipeline_step(mesh, mode, axis=axis,
                                          use_pallas=use_pallas)
    halo = 8
    while halo < need:
        halo *= 2
    rows_per = dest_h // int(mesh.devices.size) if dest_h else halo
    halo = min(halo, max(rows_per, 1))
    if halo < need:
        # shard blocks are shorter than the needed halo: exchange cannot
        # reach far enough, use the gather step
        if log is not None:
            log.write(f"Halo warp: displacement {need} exceeds shard height "
                      f"{rows_per}; using the gather-warp step\n")
        return sharded_full_pipeline_step(mesh, mode, axis=axis,
                                          use_pallas=use_pallas)
    if log is not None:
        log.write(f"Halo warp: exchanging {halo} boundary rows "
                  f"(batch needs {need})\n")
    return sharded_full_pipeline_step_halo(mesh, mode, halo=halo, axis=axis,
                                           use_pallas=use_pallas)


def sharded_full_pipeline_step(mesh: Mesh, mode: int = int(stk.StackMode.Sigma),
                               axis: str = "pix", use_pallas: bool | None = None):
    """Jit the calibrate+match+warp+stack step with row sharding over the
    mesh; the stack reduction runs shard_map'ed (Pallas kernels per shard
    on TPU). Returns the compiled function."""
    data_sharding = NamedSharding(mesh, P(None, axis, None))
    out_sharding = NamedSharding(mesh, P(axis, None))
    rep = NamedSharding(mesh, P())
    plane = NamedSharding(mesh, P(axis, None))

    return jax.jit(
        partial(_full_pipeline_step, mode=mode, mesh=mesh, axis=axis,
                use_pallas=use_pallas),
        in_shardings=(data_sharding, plane, plane, rep, rep, rep, rep, rep, rep,
                      rep, rep, rep),
        out_shardings=(out_sharding, rep, rep),
    )


def run_sharded_full_stack(frames: np.ndarray, dark: np.ndarray, flat: np.ndarray,
                           invs: np.ndarray, mesh: Mesh | None = None,
                           mode: int = int(stk.StackMode.Sigma),
                           sigma_low: float = 2.75, sigma_high: float = 2.75):
    """Place host frames on the mesh and run one full calibrate+match+warp+
    stack step. invs: (N, 6) inverse alignment transforms."""
    if mesh is None:
        mesh = make_mesh()
    n = frames.shape[0]
    fn = sharded_full_pipeline_step(mesh, mode)
    dev_frames = jax.device_put(jnp.asarray(frames), shard_rows(mesh))
    plane = NamedSharding(mesh, P("pix", None))
    ones = jnp.ones(n, jnp.float32)
    return fn(dev_frames, jax.device_put(jnp.asarray(dark), plane),
              jax.device_put(jnp.asarray(flat), plane), jnp.float32(flat.max()),
              ones, ones, ones, jnp.float32(1.0), jnp.float32(1.0),
              jnp.asarray(invs, jnp.float32),
              jnp.float32(sigma_low), jnp.float32(sigma_high))


def sharded_pipeline_step(mesh: Mesh, mode: int = int(stk.StackMode.Sigma),
                          axis: str = "pix", use_pallas: bool | None = None):
    """Jit the full calibrate+match+stack step with row sharding over the
    mesh; the stack reduction runs shard_map'ed (Pallas kernels per shard
    on TPU). Returns the compiled function."""
    data_sharding = NamedSharding(mesh, P(None, axis, None))
    out_sharding = NamedSharding(mesh, P(axis, None))
    rep = NamedSharding(mesh, P())
    plane = NamedSharding(mesh, P(axis, None))

    fn = jax.jit(
        partial(_pipeline_step, mode=mode, mesh=mesh, axis=axis,
                use_pallas=use_pallas),
        in_shardings=(data_sharding, plane, plane, rep, rep, rep, rep, rep, rep, rep, rep),
        out_shardings=(out_sharding, rep, rep),
    )
    return fn


def run_sharded_stack(frames: np.ndarray, dark: np.ndarray, flat: np.ndarray,
                      mesh: Mesh | None = None, mode: int = int(stk.StackMode.Sigma),
                      sigma_low: float = 2.75, sigma_high: float = 2.75):
    """Convenience wrapper: place host frames on the mesh and run one step."""
    if mesh is None:
        mesh = make_mesh()
    n = frames.shape[0]
    fn = sharded_pipeline_step(mesh, mode)
    dev_frames = jax.device_put(jnp.asarray(frames), shard_rows(mesh))
    plane = NamedSharding(mesh, P("pix", None))
    dev_dark = jax.device_put(jnp.asarray(dark), plane)
    dev_flat = jax.device_put(jnp.asarray(flat), plane)
    ones = jnp.ones(n, jnp.float32)
    weights = jnp.ones(n, jnp.float32)
    return fn(dev_frames, dev_dark, dev_flat, jnp.float32(flat.max()), weights,
              ones, ones, jnp.float32(1.0), jnp.float32(1.0),
              jnp.float32(sigma_low), jnp.float32(sigma_high))
