"""Star detection with half-flux-radius measurement.

TPU-native rebuild of the reference's 6-phase detector
(reference: internal/star/findstars.go:59-396):

1. bright-pixel candidates above location + scale*starSig -- here a 3x3
   local-max mask + top_k over the image replaces the sequential scan with
   same-row suppression (findstars.go:105-129); the later overlap filter
   enforces the same one-star-per-radius invariant either way.
2. bad-pixel rejection against the local 9-neighborhood median
   (findstars.go:134-169), with the stddev of the median-difference map
   computed over the full image instead of a random 1% sample.
3. overlap filtering by descending mass (findstars.go:209-271): the
   sequential 256px-grid greedy walk becomes a priority-MIS fixed point --
   a star survives iff no surviving higher-priority star lies within the
   radius -- iterated to convergence with a lax.while_loop over a KxK
   conflict matrix. The fixed point equals the sequential greedy result.
4. iterative center-of-mass refinement, <=10 rounds to 0.01px
   (findstars.go:274-322), as a fori_loop over batched patch gathers.
5. re-sort by mass + overlap filter again (findstars.go:80-82).
6. HFR by radial first moment + in/out brightness plausibility filter
   (findstars.go:327-396).

All phases run on fixed-capacity arrays (MAX_CANDIDATES) with validity
masks; the result is compacted and sorted by descending mass.

Divergence from the reference: out-of-frame patch reads are clamped in 2D
(the reference indexes the flat array with 1D bounds checks, which wraps
across row ends for border stars, findstars.go:287-296).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

MAX_CANDIDATES = 2048


@dataclass
class StarList:
    """Fixed-capacity star detection result (host copy).

    Fields mirror star.Star (findstars.go:30-37): index, value, x, y, mass,
    hfr -- plus the valid count. Arrays are mass-descending and compacted.
    """

    x: np.ndarray
    y: np.ndarray
    value: np.ndarray
    mass: np.ndarray
    hfr: np.ndarray
    count: int

    def __len__(self) -> int:
        return self.count

    def __iter__(self):
        for i in range(self.count):
            yield Star(
                x=float(self.x[i]), y=float(self.y[i]), value=float(self.value[i]),
                mass=float(self.mass[i]), hfr=float(self.hfr[i]),
            )

    def __getitem__(self, i):
        if i >= self.count:
            raise IndexError(i)
        return Star(x=float(self.x[i]), y=float(self.y[i]), value=float(self.value[i]),
                    mass=float(self.mass[i]), hfr=float(self.hfr[i]))

    @staticmethod
    def empty() -> "StarList":
        z = np.zeros(0, np.float32)
        return StarList(z, z, z, z, z, 0)


@dataclass
class Star:
    x: float
    y: float
    value: float
    mass: float
    hfr: float


def _patches(img: jax.Array, cys: jax.Array, cxs: jax.Array, radius: int):
    """(K, 2r+1, 2r+1) patches around integer centers as ONE batched gather.

    Deliberately NOT a vmapped dynamic_slice: jax's batching rule for
    dynamic_slice under inner control flow broadcasts the full operand per
    batch element (a 137GB allocation at 16MP x 2048 candidates); advanced
    indexing lowers to a gather of exactly K*(2r+1)^2 elements. Out-of-frame
    positions are index-clamped and masked out.
    """
    h, w = img.shape
    size = 2 * radius + 1
    offs = jnp.arange(size)
    yy = cys[:, None, None] + offs[None, :, None] - radius
    xx = cxs[:, None, None] + offs[None, None, :] - radius
    ok = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
    patch = img[jnp.clip(yy, 0, h - 1), jnp.clip(xx, 0, w - 1)]
    return patch, ok


def _overlap_filter(x, y, mass, valid, radius: float):
    """Priority-MIS overlap filter (replaces findstars.go:209-271).

    Keeps a star iff no surviving star with higher priority (greater mass,
    ties by lower candidate index) lies within `radius`. Iterated to its
    fixed point, which equals the sequential greedy filter's output.
    """
    k = x.shape[0]
    dx = x[:, None] - x[None, :]
    dy = y[:, None] - y[None, :]
    # reference rounds the squared distance to int (findstars.go:238)
    d2 = jnp.floor(dx * dx + dy * dy + 0.5)
    conflict = d2 <= radius * radius
    conflict = conflict & ~jnp.eye(k, dtype=bool)
    idx = jnp.arange(k)
    higher = (mass[None, :] > mass[:, None]) | (
        (mass[None, :] == mass[:, None]) & (idx[None, :] < idx[:, None])
    )
    dominates = conflict & higher  # [i, j]: j can dominate i

    def body(state):
        alive, _ = state
        dom = jnp.any(dominates & alive[None, :] & valid[None, :], axis=1)
        new_alive = valid & ~dom
        return new_alive, jnp.any(new_alive != alive)

    def cond(state):
        return state[1]

    alive, _ = jax.lax.while_loop(cond, body, (valid, jnp.bool_(True)))
    return alive


def _center_of_mass(img, cy0, cx0, x0, y0, threshold, radius: int,
                    use_pallas_gather: bool = False):
    """Iterative CoM refinement for all stars at once (findstars.go:274-322).

    <=10 rounds of recentering, stars below the 0.01px shift threshold stop
    updating. Returns (cy, cx, x, y, mass, patch, ok) where patch/ok are the
    oversized gather reused by the HFR phase.

    One (K, 2(2r)+1, 2(2r)+1) patch is gathered ONCE around the initial
    centers; each round then re-centers a (2r+1)^2 window inside it with
    mask arithmetic instead of re-gathering (gathers dominated this
    program's device time). Drift is clamped to +-radius of the initial
    center -- the reference re-gathers unboundedly (findstars.go:287-296),
    but a candidate drifting further than its own radius is not a star and
    is dropped by the later overlap/plausibility filters either way.
    """
    big = 2 * radius  # window radius + max tracked drift
    size = 2 * big + 1
    if use_pallas_gather:
        # per-candidate DMA instead of XLA's element-wise gather (9x,
        # ops/gather_pallas.py); identical mask contract
        from nightlight_tpu.ops.gather_pallas import gather_patches_pallas

        patch, ok = gather_patches_pallas(img, cy0, cx0, big)
    else:
        patch, ok = _patches(img, cy0, cx0, big)  # single gather
    val = jnp.maximum(jnp.where(ok, patch, 0.0) - threshold, 0.0)
    val = jnp.where(ok, val, 0.0)  # (K, size, size)
    offs = jnp.arange(size, dtype=jnp.float32) - big  # rel. to initial center

    def round_body(_, state):
        oy, ox, px, py, mass, shift2 = state  # oy/ox: int window offsets
        active = shift2 > 1e-4
        oyf = oy.astype(jnp.float32)
        oxf = ox.astype(jnp.float32)
        wy = jnp.abs(offs[None, :] - oyf[:, None]) <= radius  # (K, size)
        wx = jnp.abs(offs[None, :] - oxf[:, None]) <= radius
        v = val * (wy[:, :, None] & wx[:, None, :])
        m = jnp.sum(v, axis=(1, 2))
        m = jnp.where(m == 0.0, 1e-8, m)
        dx = jnp.sum(v * (offs[None, None, :] - oxf[:, None, None]), axis=(1, 2)) / m
        dy = jnp.sum(v * (offs[None, :, None] - oyf[:, None, None]), axis=(1, 2)) / m
        new_x = cx0.astype(jnp.float32) + oxf + dx
        new_y = cy0.astype(jnp.float32) + oyf + dy
        s2 = (new_x - px) ** 2 + (new_y - py) ** 2
        new_oy = jnp.clip(oy + jnp.round(dy).astype(jnp.int32), -big + radius, big - radius)
        new_ox = jnp.clip(ox + jnp.round(dx).astype(jnp.int32), -big + radius, big - radius)
        return (jnp.where(active, new_oy, oy), jnp.where(active, new_ox, ox),
                jnp.where(active, new_x, px), jnp.where(active, new_y, py),
                jnp.where(active, m, mass), jnp.where(active, s2, shift2))

    k = cy0.shape[0]
    zero = jnp.zeros(k, jnp.int32)
    init = (zero, zero, x0, y0, jnp.zeros(k, jnp.float32), jnp.full(k, 3.4e38, jnp.float32))
    oy, ox, px, py, mass, _ = jax.lax.fori_loop(0, 10, round_body, init)
    return cy0 + oy, cx0 + ox, px, py, mass, (patch, ok, offs, oy, ox)


def _hfr(big_patch, location, radius: int):
    """Half-flux radius + plausibility masses for all stars at once
    (findstars.go:327-396). Returns (hfr, mass, inner_mass, pixels,
    inner_pixels) as (K,) vectors.

    Reuses the oversized CoM patch (gathered once around the INITIAL
    centers) with per-candidate distance grids about the refined centers --
    the refined center always stays within the patch because CoM drift is
    clamped to +-radius.
    """
    patch, ok, offs, oy, ox = big_patch
    dy = offs[None, :, None] - oy.astype(jnp.float32)[:, None, None]  # (K, size, 1)
    dx = offs[None, None, :] - ox.astype(jnp.float32)[:, None, None]  # (K, 1, size)
    dist2 = dy * dy + dx * dx  # (K, size, size) about refined centers
    dist2_limit = jnp.ceil((radius + 1e-8) * (radius + 1e-8))

    in_disk = (dist2 <= dist2_limit) & ok
    v0 = jnp.maximum(jnp.where(ok, patch, 0.0) - location, 0.0)
    v = jnp.where(in_disk, v0, 0.0)
    mass = jnp.sum(v, axis=(1, 2))
    moment = jnp.sum(v * jnp.sqrt(dist2), axis=(1, 2))
    # The reference counts disk pixels including out-of-bounds ones
    # (findstars.go:345): a fixed lattice-point count, independent of K.
    small = jnp.arange(2 * radius + 1, dtype=jnp.float32) - radius
    sd2 = small[:, None] ** 2 + small[None, :] ** 2
    pixels = jnp.sum(sd2 <= dist2_limit)
    mass_safe = jnp.where(mass == 0.0, 1e-8, mass)
    hfr = moment / mass_safe

    inner_limit = jnp.ceil(hfr * hfr)  # (K,)
    in_inner = (dist2 <= inner_limit[:, None, None]) & ok
    vi = jnp.where(in_inner, v0, 0.0)
    inner_mass = jnp.sum(vi, axis=(1, 2))
    inner_pixels = jnp.sum(sd2[None] <= inner_limit[:, None, None], axis=(1, 2))
    return hfr, mass_safe, inner_mass, pixels, inner_pixels


def _candidate_values(img, threshold):
    """Phase 1a: flat candidate map -- each 3x3 local maximum above
    `threshold` keeps its pixel value, everything else is -inf
    (findstars.go:105-129; the later overlap filter enforces the same
    one-star-per-radius invariant as the reference's same-row suppression).
    """
    from functools import reduce

    h, w = img.shape
    padded = jnp.pad(img, 1, constant_values=-jnp.inf)
    # pairwise maximum chain, NOT jnp.max over a stacked axis: XLA
    # materializes the 9-slice stack (4.05 ms/frame at 16MP) while the
    # chain fuses into one elementwise pass (1.68 ms)
    neighborhood = reduce(jnp.maximum,
                          [padded[dy : dy + h, dx : dx + w]
                           for dy in range(3) for dx in range(3)])
    is_max = img >= neighborhood
    return jnp.where((img > threshold) & is_max, img, -jnp.inf).reshape(-1)


# Hierarchical candidate selection: one flat lax.top_k over a 16MP frame
# costs 42.6 ms on v5e-1; a per-tile top_k (capacity _SELECT_KT each) feeding
# a small global top_k costs 7.9 ms including the exactness guard below.
_SELECT_TILE = 16384  # flat elements per tile (4 rows of a 4096-wide frame)
_SELECT_KT = 32       # per-tile candidate capacity (fast path)
_SELECT_MIN_N = 1 << 22  # below ~4M pixels the flat top_k is already cheap


def _tiled_view(cand_vals, tiles: int):
    n = cand_vals.shape[0]
    pad = tiles * _SELECT_TILE - n
    v = (jnp.pad(cand_vals, (0, pad), constant_values=-jnp.inf)
         if pad else cand_vals)
    return v.reshape(tiles, _SELECT_TILE)


def _select_tiled(v, n: int, max_candidates: int):
    """Fast branch: per-tile top_k then a global top_k over the per-tile
    winners. Set-exact whenever no tile holds more than _SELECT_KT
    candidates (the caller guards on that) AND fewer than max_candidates
    survive overall. Among EQUAL values the tie-break differs from the
    flat top_k's index-ascending order, so when >max_candidates candidates
    tie exactly at the capacity boundary (e.g. saturated stars clipped to
    full scale) the kept subset can differ from the flat branch's -- an
    arbitrary-but-valid choice either way. Candidate ORDER differences are
    immaterial: the overlap filter keys on (mass, candidate index) and the
    final output re-sorts by refined mass."""
    tiles = v.shape[0]
    tv, ti = jax.lax.top_k(v, _SELECT_KT)
    base = (jnp.arange(tiles, dtype=ti.dtype) * _SELECT_TILE)[:, None]
    vals, sel = jax.lax.top_k(tv.reshape(-1), max_candidates)
    idx = (ti + base).reshape(-1)[sel]
    # padding tail indices (value -inf, valid=False downstream) must still be
    # in-range for the patch gathers
    return vals, jnp.minimum(idx, n - 1)


def _select_flat(v, n: int, max_candidates: int):
    vals, idx = jax.lax.top_k(v.reshape(-1), max_candidates)
    return vals, jnp.minimum(idx, n - 1)


def _select_brightest(cand_vals, max_candidates: int):
    """Phase 1b: brightest `max_candidates` candidates (values, flat indices).

    Tiled top_k with an exact fallback: if any tile holds more than
    _SELECT_KT candidates (dense cluster field), a lax.cond takes the flat
    top_k instead, so the result always equals the flat selection as a SET.
    """
    n = cand_vals.shape[0]
    tiles = -(-n // _SELECT_TILE)
    if n < _SELECT_MIN_N or tiles * _SELECT_KT < 2 * max_candidates:
        return _select_flat(cand_vals, n, max_candidates)
    v = _tiled_view(cand_vals, tiles)
    per_tile = jnp.sum(v > -jnp.inf, axis=1)
    return jax.lax.cond(
        jnp.max(per_tile) <= _SELECT_KT,
        lambda vv: _select_tiled(vv, n, max_candidates),
        lambda vv: _select_flat(vv, n, max_candidates),
        v)


def _select_brightest_batch(cand_vals, max_candidates: int):
    """Batched selection for (B, n) candidate maps with ONE guard for the
    whole batch. Under vmap a lax.cond degrades to both-branches-execute
    (select), so the fused preprocess guards once per detection chunk.
    Inside the guard the frames are UNROLLED, not vmapped: XLA's batched
    top_k lowering is 2.3x slower than B separate top_k calls (11.5 vs 4.9
    ms/frame measured on v5e-1 at 8x16.8M)."""
    b, n = cand_vals.shape
    tiles = -(-n // _SELECT_TILE)

    def stack_outs(outs):
        return (jnp.stack([o[0] for o in outs]),
                jnp.stack([o[1] for o in outs]))

    if n < _SELECT_MIN_N or tiles * _SELECT_KT < 2 * max_candidates:
        return stack_outs([_select_flat(cand_vals[i], n, max_candidates)
                           for i in range(b)])
    per_tile = jnp.stack([
        jnp.sum(_tiled_view(cand_vals[i], tiles) > -jnp.inf, axis=1)
        for i in range(b)])
    return jax.lax.cond(
        jnp.max(per_tile) <= _SELECT_KT,
        lambda cv: stack_outs([
            _select_tiled(_tiled_view(cv[i], tiles), n, max_candidates)
            for i in range(b)]),
        lambda cv: stack_outs([_select_flat(cv[i], n, max_candidates)
                               for i in range(b)]),
        cand_vals)


@partial(jax.jit, static_argnames=("radius", "max_candidates", "use_pallas_gather"))
def _find_stars_device(img, location, scale, star_sig, bp_sig, star_in_out,
                       radius: int, median_diff_std, max_candidates: int,
                       use_pallas_gather: bool = False, candidates=None):
    h, w = img.shape
    threshold = location + scale * star_sig

    # Phase 1: local-max candidates above threshold, brightest first.
    # Batched callers (models/fastpath.py) pass `candidates` precomputed by
    # _select_brightest_batch so the tiled/flat guard stays one real cond
    # per chunk instead of a vmapped select.
    if candidates is None:
        cand_vals = _candidate_values(img, threshold)
        values, flat_idx = _select_brightest(cand_vals, max_candidates)
    else:
        values, flat_idx = candidates
    valid = values > -jnp.inf
    cy = (flat_idx // w).astype(jnp.int32)
    cx = (flat_idx % w).astype(jnp.int32)
    x = cx.astype(jnp.float32)
    y = cy.astype(jnp.float32)
    mass = values

    # Phase 2: bad-pixel rejection against the 9-neighborhood median.
    from nightlight_tpu.ops.prestack import median9

    bp_threshold = median_diff_std * bp_sig
    patch9, _ = _patches(img, cy, cx, 1)
    med = median9([patch9[:, j // 3, j % 3] for j in range(9)])
    diff = values - med
    bp_ok = jnp.logical_or(bp_sig <= 0.0, jnp.abs(diff) < bp_threshold)
    valid = valid & bp_ok

    # Phase 3: overlap filter by mass (value at this point).
    valid = _overlap_filter(x, y, mass, valid, float(radius))

    # Phase 4: center-of-mass refinement.
    com_threshold = location + scale * star_sig * 0.5
    cy, cx, x, y, mass, big_patch = _center_of_mass(
        img, cy, cx, x, y, com_threshold, radius,
        use_pallas_gather=use_pallas_gather)

    # Phase 5: overlap filter again with refined positions and CoM masses.
    valid = _overlap_filter(x, y, mass, valid, float(radius))

    # Phase 6: HFR + plausibility (reuses the CoM patch -- no second gather).
    hfr, mass2, inner_mass, pixels, inner_pixels = _hfr(big_patch, location, radius)
    plausible = hfr <= radius
    outer_mass = mass2 - inner_mass
    outer_pixels = pixels - inner_pixels
    plausible = plausible & (
        inner_mass * outer_pixels.astype(jnp.float32)
        > star_in_out * outer_mass * inner_pixels.astype(jnp.float32)
    )
    valid = valid & plausible
    mass = mass2

    # Compact: valid stars first, sorted by descending mass.
    sort_key = jnp.where(valid, -mass, jnp.inf)
    order = jnp.argsort(sort_key)
    num = jnp.sum(valid)
    avg_hfr = jnp.sum(jnp.where(valid, hfr, 0.0)) / jnp.maximum(num, 1)
    return (x[order], y[order], values[order], mass[order], hfr[order], num, avg_hfr)


class LazyStarList:
    """Star detection result whose arrays are still on device.

    Creating one costs no synchronization; the first host access resolves it
    through the deferred pool (one batched transfer for everything pending,
    typically all frames of a batch at the reference-selection barrier).
    Mimics StarList's read interface.
    """

    __slots__ = ("_packed", "_count", "_inner")

    def __init__(self, packed_deferred, count_deferred):
        self._packed = packed_deferred   # Deferred of (5, K) f32
        self._count = count_deferred     # Deferred count
        self._inner: StarList | None = None

    @property
    def count_lazy(self):
        """The count as a pending value (for deferred log lines)."""
        return self._count

    def _resolve(self) -> StarList:
        if self._inner is None:
            packed = self._packed.value
            n = int(self._count)
            self._inner = StarList(
                x=packed[0, :n], y=packed[1, :n], value=packed[2, :n],
                mass=packed[3, :n], hfr=packed[4, :n], count=n)
        return self._inner

    def __len__(self) -> int:
        return self._resolve().count

    def __iter__(self):
        return iter(self._resolve())

    def __getitem__(self, i):
        return self._resolve()[i]

    @property
    def x(self):
        return self._resolve().x

    @property
    def y(self):
        return self._resolve().y

    @property
    def value(self):
        return self._resolve().value

    @property
    def mass(self):
        return self._resolve().mass

    @property
    def hfr(self):
        return self._resolve().hfr

    @property
    def count(self):
        return self._resolve().count


def _as_device_scalar(v):
    """jnp.float32 scalar from a float, device array, or pending Deferred
    (without forcing resolution)."""
    from nightlight_tpu.deferred import Deferred

    if isinstance(v, Deferred):
        if not v.resolved:
            return v.array
        return jnp.float32(float(v))
    if hasattr(v, "dtype") and hasattr(v, "shape"):
        return v
    return jnp.float32(v)


def find_stars(img, location, scale, star_sig: float, bp_sig: float,
               star_in_out: float, radius: int, median_diff_std=None,
               max_candidates: int = MAX_CANDIDATES, deferred: bool = False,
               use_pallas_gather: bool | None = None):
    """Run star detection. Returns (StarList | LazyStarList, avg_hfr).

    `location`/`scale`/`median_diff_std` may be floats, device scalars, or
    pending Deferreds -- the detection program chains on device either way.
    `median_diff_std` is the stddev of the image-minus-3x3-median map; when
    None and bp_sig > 0 it is computed here (findstars.go:139-150 estimates
    it from a 1% random sample; we use the full image). With deferred=True
    nothing is fetched: the result resolves lazily via the deferred pool.
    use_pallas_gather: None = auto (DMA patch gather on TPU); pass False for
    mesh-sharded inputs -- a pallas_call cannot address global rows of a
    sharded operand.
    """
    if median_diff_std is None:
        if bp_sig > 0:
            from nightlight_tpu.ops.prestack import bad_pixel_stats

            _, median_diff_std = bad_pixel_stats(img)
        else:
            median_diff_std = 0.0

    if use_pallas_gather is None:
        from nightlight_tpu.ops.gather_pallas import pallas_gather_available

        use_pallas_gather = pallas_gather_available()

    x, y, value, mass, hfr, num, avg_hfr = _find_stars_device(
        img, _as_device_scalar(location), _as_device_scalar(scale),
        jnp.float32(star_sig), jnp.float32(bp_sig), jnp.float32(star_in_out),
        int(radius), _as_device_scalar(median_diff_std), max_candidates,
        use_pallas_gather=bool(use_pallas_gather),
    )
    packed_dev = jnp.stack([x, y, value, mass, hfr])

    from nightlight_tpu.deferred import defer

    stars = LazyStarList(defer(packed_dev, conv=np.asarray), defer(num, conv=int))
    hfr_out = defer(avg_hfr)
    if deferred:
        return stars, hfr_out
    # Eager callers get the classic host StarList in one batched transfer.
    return stars._resolve(), float(hfr_out)
