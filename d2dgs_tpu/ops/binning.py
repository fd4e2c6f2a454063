"""Tile binning under static shapes.

The reference builds variable-length per-tile Gaussian lists with an
inclusive scan + 64-bit radix sort (rasterizer_impl.cu:70-138,196-342).
The TPU-native equivalent mirrors that structure exactly:

1. Gaussians are depth-sorted once (stable argsort on view z — matching the
   CUDA sort of positive float depth bits, ties broken by index).
2. FLAT emission (the CUDA duplicateWithKeys analogue): an exclusive scan
   of per-Gaussian rect areas gives each splat's slot range in ONE
   [emission_cap] buffer; the slot->gaussian map is a run-start scatter +
   cumsum (searchsorted lowers to a 100x-slower while loop on TPU).  No
   per-gaussian tile cap exists — every splat emits its FULL rect, like
   getRect (auxiliary.h:64-74); `clamped` counts slots dropped only when
   the whole workload exceeds ``emission_cap`` (deepest splats first,
   since slots are depth-ordered).
3. One int32 sort by fused (tile, depth-rank) key orders pairs as
   (tile, depth) — pair keys are unique, so no stability or payload
   movement is needed.
4. Per-tile [start, count) ranges come from a vectorized searchsorted
   (cheap at [num_tiles] queries).

An earlier revision emitted a static [N, R] grid (R = max tiles per
gaussian) — simpler, but it silently cropped rects wider than R (a real
correctness hole at trained scale, VERDICT r4 weak #3) and sorted N*R
keys where this sorts only ~num_pairs.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import TILE, RasterConfig
from .projection import Preprocessed


def circle_tile_overlap(center: jnp.ndarray, radius, tx, ty,
                        pixel_offset: float = 0.5):
    """True where a splat's visibility circle touches tile (tx, ty).

    center: [..., 2] pixel coords; radius: [...] float (the exact
    ``opacity_radius`` visibility bound); tx/ty broadcast against them.
    The test is distance(center, tile sample rect) <= radius, where the
    rect spans the tile's actual sample positions: ``pixel_offset=0.5``
    for center-sampled paths (surfel blend, pixels at x+0.5) and 0.0
    for the corner-sampled 3DGS conic blend (ops/raster3d.py samples at
    integer coordinates).  Shared by the binning emission, the
    distributed-exchange emission (parallel/gauss_shard), and the dense
    oracle so all paths bin identically."""
    x0 = tx.astype(jnp.float32) * TILE + pixel_offset
    y0 = ty.astype(jnp.float32) * TILE + pixel_offset
    cx = center[..., 0]
    cy = center[..., 1]
    dx = cx - jnp.clip(cx, x0, x0 + (TILE - 1.0))
    dy = cy - jnp.clip(cy, y0, y0 + (TILE - 1.0))
    return dx * dx + dy * dy <= radius * radius


class Binning(NamedTuple):
    order: jnp.ndarray        # [N] gaussian index by ascending depth
    pair_rank: jnp.ndarray    # [B] sorted-pair DEPTH RANKS (index into order)
    pair_valid: jnp.ndarray   # [B] bool
    tile_start: jnp.ndarray   # [T] int32 offset into pair arrays
    tile_count: jnp.ndarray   # [T] int32
    num_pairs: jnp.ndarray    # scalar int32 (valid pairs)
    clamped: jnp.ndarray      # scalar int32: emission slots dropped
    #                           (pre-cull workload exceeded emission_cap)

    # NOTE on layout: pairs are stored as depth ranks, not gaussian ids.
    # A [B]-sized ids gather from the unsorted side costs ~1 elem/cycle
    # on TPU (~58 ms at B=6.4M); consumers instead pre-sort per-gaussian
    # features ONCE by `order` (an [N]-row gather) and index those with
    # `pair_rank`.  Use `pair_gid` only for [N]-scale consumers.

    @property
    def pair_gid(self) -> jnp.ndarray:
        """[B] gaussian ids (original index space) — prefer pair_rank +
        pre-sorted features in hot paths (see layout note)."""
        return self.order[self.pair_rank]


def opacity_radius(radius: jnp.ndarray, opacity: jnp.ndarray,
                   extent: jnp.ndarray | None = None,
                   sigma: jnp.ndarray | None = None):
    """Exact visibility radius for the CONIC (3DGS) blend law.

    The blend drops contributions with alpha = op*exp(-rho/2) < 1/255,
    i.e. a pixel is visible only when rho <= 2L, L = ln(255*op).  For
    the conic law rho = d^T Sigma^-1 d >= d^2 / lambda_max, so
    d <= sigma_max * sqrt(2L) with sigma_max = sqrt(lambda_max) — pass
    it via ``sigma``; the 3DGS path uses radius/3, exact since its
    radius is ceil(3*sqrt(lambda_max)) (ops/raster3d.py preprocess3d).
    The max(.., sqrt(L)) low-pass term only widens the bound (the conic
    law has no separate low-pass branch).

    The SURFEL law's intersection response is projective, not a screen
    Gaussian — its exact bound is ``visibility_circles`` below; the
    legacy ``extent`` path here (AABB-diagonal, affine scaling) is a
    conservative approximation kept for reference.

    The bound is deliberately NOT clamped to the 3-sigma binning
    radius: for opaque splats the visible region extends BEYOND 3 sigma
    (alpha there is up to 1.1% > 1/255), so min(r, vis) would cull real
    contributions — the round-4 raster3d parity regression.  Culling
    with this bound drops only pairs whose every pixel has
    alpha < 1/255, i.e. it is output-invariant (within the rect the
    reference itself bins)."""
    r = radius.astype(jnp.float32)
    op = jax.lax.stop_gradient(opacity).astype(jnp.float32)
    L = jnp.log(jnp.maximum(255.0 * op, 1e-12))
    L = jnp.maximum(L, 0.0)
    if sigma is not None:
        sig = jax.lax.stop_gradient(sigma).astype(jnp.float32)
    elif extent is not None:
        ex = jax.lax.stop_gradient(extent).astype(jnp.float32)
        sig = jnp.sqrt(ex[..., 0] ** 2 + ex[..., 1] ** 2)
    else:
        sig = r / 3.0
    vis = jnp.maximum(sig * jnp.sqrt(2.0 * L), jnp.sqrt(L))
    return jnp.where(op >= 1.0 / 255.0, vis, 0.0)


class VisCircles(NamedTuple):
    """Exact visibility circle of the surfel blend (see
    ``visibility_circles``).  All [N]-shaped in the ORIGINAL index
    space."""
    center: jnp.ndarray     # [N,2] enclosing circle center
    radius: jnp.ndarray     # [N]   enclosing circle radius
    cullable: jnp.ndarray   # [N]   bool: the circle is a valid bound
    cull_all: jnp.ndarray   # [N]   bool: opacity < 1/255, nothing visible


def visibility_circles(prep: Preprocessed, opacity) -> VisCircles:
    """EXACT visibility region bound for the surfel blend law.

    A pixel can have alpha = op*exp(-rho/2) >= 1/255 only when
    rho = min(rho3d, rho2d) <= 2L, L = ln(255*op), i.e. it lies in

      * the LOW-PASS circle: rho2d = 2*d^2 <= 2L  ->  |pix - center|
        <= sqrt(L)  (forward.cu:381-385), OR
      * the LEVEL SET {rho3d <= 2L}.  rho3d is the squared splat-plane
        radius of the ray-splat intersection (2DGS Eq. 8-10); the level
        set is the image of the radius-sqrt(2L) disk under the splat's
        screen homography — an ellipse whose EXACT bounding data comes
        from the same dual-form trick as the reference's 1-sigma AABB
        (computeAABB, forward.cu:133-163) with the splat axes scaled by
        sqrt(2L): temp vector (rho, rho, -1), rho = 2L.  The
        circumscribed circle is center_rho +- sqrt(lambda_max of
        [[vxx,vxy],[vxy,vyy]]).  NO affine/linear-scaling assumption —
        this is exact under the true projective model (the affine
        3*sigma scaling the reference's own radius uses, and which an
        earlier cull here relied on, leaks real contributions under
        perspective; tests/test_cull_invariance.py pins this).

    The two circles are merged into their smallest ENCLOSING circle so
    the per-(splat, tile-slot) test costs one distance check — a
    superset of the visible region, so still output-invariant.

    When the level set is not a bounded ellipse (degenerate d or
    negative vxx/vyy: splat nearly edge-on or crossing the image
    plane), ``cullable`` is False and callers must NOT cull that splat.
    ``cull_all`` marks op < 1/255: alpha is below the blend cutoff at
    every pixel, so every pair may be dropped.
    """
    op = jax.lax.stop_gradient(opacity).astype(jnp.float32)
    L = jnp.maximum(jnp.log(jnp.maximum(255.0 * op, 1e-12)), 0.0)
    rho = 2.0 * L
    T = jax.lax.stop_gradient(prep.T).astype(jnp.float32)
    Tu, Tv, Tw = T[:, 0, :], T[:, 1, :], T[:, 2, :]

    d = rho * (Tw[:, 0] ** 2 + Tw[:, 1] ** 2) - Tw[:, 2] ** 2
    good = d != 0.0
    inv_d = jnp.where(good, 1.0 / jnp.where(good, d, 1.0), 0.0)
    frho = rho * inv_d
    fz = -inv_d
    dot2 = lambda A, B: frho * (A[:, 0] * B[:, 0] + A[:, 1] * B[:, 1]) \
        + fz * A[:, 2] * B[:, 2]
    cx = dot2(Tu, Tw)
    cy = dot2(Tv, Tw)
    vxx = cx * cx - dot2(Tu, Tu)
    vyy = cy * cy - dot2(Tv, Tv)
    vxy = cx * cy - dot2(Tu, Tv)
    mid = 0.5 * (vxx + vyy)
    dif = 0.5 * (vxx - vyy)
    lam = mid + jnp.sqrt(jnp.maximum(dif * dif + vxy * vxy, 0.0))
    # +1e-2 px pad absorbs float rounding at the alpha-cutoff boundary
    # (the reference pads its AABB the same way, forward.cu:159)
    r_lv = jnp.sqrt(jnp.maximum(lam, 0.0)) + 1e-2
    cullable = good & (vxx >= 0.0) & (vyy >= 0.0)

    # smallest circle enclosing the level circle and the low-pass
    # circle (radius sqrt(L) around the AABB center)
    c_lp = jax.lax.stop_gradient(prep.center).astype(jnp.float32)
    r_lp = jnp.sqrt(L) + 1e-2
    c_lv = jnp.stack([cx, cy], axis=-1)
    delta = c_lv - c_lp
    dd = jnp.sqrt(delta[:, 0] ** 2 + delta[:, 1] ** 2)
    t = jnp.clip((dd + r_lv - r_lp) / jnp.maximum(2.0 * dd, 1e-12),
                 0.0, 1.0)
    center_u = c_lp + t[:, None] * delta
    radius_u = jnp.maximum(t * dd + r_lp, (1.0 - t) * dd + r_lv)
    return VisCircles(center=center_u, radius=radius_u, cullable=cullable,
                      cull_all=op < 1.0 / 255.0)


def circles_tile_hit(vc: VisCircles, tx, ty, pixel_offset: float = 0.5):
    """Per-(splat, tile) keep-mask from the exact visibility circle.

    ``vc`` fields must already be indexed/broadcast to align with
    tx/ty's leading dims.  A pair is kept when the circle touches the
    tile's sample rect, or the splat isn't cullable; pairs of splats
    below the alpha cutoff are always dropped."""
    hit = circle_tile_overlap(vc.center, vc.radius, tx, ty, pixel_offset)
    return (hit | ~vc.cullable) & ~vc.cull_all


def required_emission(prep: Preprocessed) -> jnp.ndarray:
    """Total tile-rect slots over valid splats — the reference's
    ``num_rendered`` (InclusiveSum of tiles_touched,
    rasterizer_impl.cu:278) and the exact lower bound on
    ``RasterConfig.emission_cap`` for drop-free binning.  Size the cap
    from this measurement per workload (bench.py) so
    ``Binning.clamped == 0`` holds by construction."""
    rw = prep.rect_max[:, 0] - prep.rect_min[:, 0]
    rh = prep.rect_max[:, 1] - prep.rect_min[:, 1]
    return jnp.sum(jnp.where(prep.valid, rw * rh, 0))


def emission_slots(area: jnp.ndarray, E: int):
    """Flat-emission slot->run map for runs of ``area[i]`` slots each.

    area: [N] int32 (0 for invalid rows; positive-area rows must come
    first if total may exceed E, so truncation drops tail rows).
    Returns (g [E] int32 row index per slot, offs [N] int32 exclusive
    offsets, total scalar).  The map is a run-start scatter + cumsum:
    g[e] = (# rows with offs <= e) - 1, i.e. searchsorted(offs, e,
    'right') - 1, but ~100x faster than XLA's searchsorted-as-loop."""
    offs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(area, dtype=jnp.int32)[:-1]])
    total = offs[-1] + area[-1]
    starts = jnp.zeros((E,), jnp.int32).at[offs].add(1, mode="drop")
    g = jnp.cumsum(starts, dtype=jnp.int32) - 1
    return g, offs, total


# signed-r^2 sentinels (plain floats: a module-level jnp constant would
# initialize the JAX backend at import time)
_NO_CULL = 1e30    # circle always hits
_CULL_ALL = -1.0   # circle never hits


def bin_gaussians(prep: Preprocessed, grid_x: int, grid_y: int,
                  cfg: RasterConfig, opacity=None,
                  cull_sigma=None, pixel_offset: float = 0.5) -> Binning:
    """Bin splats into per-tile depth-ordered pair lists.

    ``opacity`` enables the output-invariant circle cull (see
    ``visibility_circles``); without it the cull is skipped — the plain
    AABB-rect binning matches the reference's getRect exactly.
    ``cull_sigma``: optional per-splat sigma_max override ([N], original
    index space) — the 3DGS path passes radius/3, exact for its conic
    law.  ``pixel_offset``: sample-rect convention of the consuming
    blend (0.5 = pixel centers, 0.0 = corners; see
    ``circle_tile_overlap``)."""
    n = prep.depth.shape[0]
    E = cfg.emission_cap
    num_tiles = grid_x * grid_y

    depth_key = jnp.where(prep.valid, prep.depth, jnp.inf)
    order = jnp.argsort(depth_key, stable=True).astype(jnp.int32)

    # per-splat visibility circle as (cx, cy, signed r^2): sentinel
    # +inf => keep every rect tile, -1 => splat below the alpha cutoff
    if cfg.tile_circle_cull and opacity is not None:
        if cull_sigma is not None:
            # conic (3DGS) law: the screen Gaussian IS the model, the
            # sigma-based circle is exact
            r_bin = opacity_radius(prep.radius, opacity, sigma=cull_sigma)
            op = jax.lax.stop_gradient(opacity).astype(jnp.float32)
            sr2 = jnp.where(op >= 1.0 / 255.0, r_bin * r_bin, _CULL_ALL)
            ccen = jax.lax.stop_gradient(prep.center).astype(jnp.float32)
        else:
            # surfel law: exact projective visibility-circle bound
            vc = visibility_circles(prep, opacity)
            sr2 = jnp.where(vc.cull_all, _CULL_ALL,
                            jnp.where(vc.cullable, vc.radius * vc.radius,
                                      _NO_CULL))
            ccen = vc.center
    else:
        sr2 = jnp.full((n,), _NO_CULL)
        ccen = jnp.zeros((n, 2), jnp.float32)

    # ONE packed [N,8] depth-order gather instead of five row gathers
    # (rect_min, rect_max, valid, circle center, r^2): TPU row gathers
    # are latency-bound (~0.5 ms EACH at N=100k regardless of width),
    # so packing the per-splat columns first is ~4x cheaper.  Bitwise
    # identical: tile coords and rect widths are tiny ints (exact in
    # f32) and ccen/sr2 pass through unchanged.
    pk = jnp.concatenate([
        prep.rect_min.astype(jnp.float32),               # 0,1  (x, y)
        prep.rect_max.astype(jnp.float32),               # 2,3
        prep.valid.astype(jnp.float32)[:, None],         # 4
        ccen, sr2[:, None]], axis=-1)[order]             # 5,6 | 7  [N,8]
    rw = (pk[:, 2] - pk[:, 0]).astype(jnp.int32)
    rh = (pk[:, 3] - pk[:, 1]).astype(jnp.int32)
    area = jnp.where(pk[:, 4] > 0.5, rw * rh, 0)

    # flat depth-major emission (duplicateWithKeys analogue): one packed
    # [N,8] row per splat, ONE [E]-row gather expands it to slots
    g, offs, total = emission_slots(area, E)
    clamped = jnp.maximum(total - E, 0)
    pack = jnp.stack([
        offs.astype(jnp.float32),
        jnp.maximum(rw, 1).astype(jnp.float32),
        pk[:, 0], pk[:, 1],
        pk[:, 5], pk[:, 6], pk[:, 7],
        jnp.zeros((n,), jnp.float32)], axis=-1)          # [N,8]
    pe = pack[g]                                          # [E,8]
    e = jnp.arange(E, dtype=jnp.int32)
    slot = e - pe[:, 0].astype(jnp.int32)
    sw = pe[:, 1].astype(jnp.int32)
    tx = pe[:, 2].astype(jnp.int32) + slot % sw
    ty = pe[:, 3].astype(jnp.int32) + slot // sw
    pair_ok = e < total

    # circle-vs-tile-sample-rect test (see circle_tile_overlap)
    x0 = tx.astype(jnp.float32) * TILE + pixel_offset
    y0 = ty.astype(jnp.float32) * TILE + pixel_offset
    dx = pe[:, 4] - jnp.clip(pe[:, 4], x0, x0 + (TILE - 1.0))
    dy = pe[:, 5] - jnp.clip(pe[:, 5], y0, y0 + (TILE - 1.0))
    pair_ok &= dx * dx + dy * dy <= pe[:, 6]

    tile = jnp.where(pair_ok, ty * grid_x + tx, num_tiles).astype(jnp.int32)

    # sort by fused (tile, depth-rank) int32 key: unique keys => no
    # stability or payload movement needed (CUDA key = tile<<32 | depth
    # bits).  The barrier keeps the sort a standalone kernel (XLA's
    # fused forms are far off their fast paths at this size).
    rank_bits = max((n - 1).bit_length(), 1)
    tile_bits = (num_tiles + 1).bit_length()
    assert rank_bits + tile_bits <= 31, (
        f"fused sort key needs {rank_bits}+{tile_bits} bits; shard the "
        f"scene (parallel/gauss_shard.py) before growing past this")
    key = tile * jnp.int32(1 << rank_bits) + g
    skey = jax.lax.optimization_barrier(
        jax.lax.sort(key, is_stable=False))
    sorted_tile = skey >> rank_bits
    sorted_rank = skey & jnp.int32((1 << rank_bits) - 1)
    sorted_ok = sorted_tile < num_tiles

    tile_edges = jnp.searchsorted(
        sorted_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    tile_start = tile_edges[:-1]
    tile_count = tile_edges[1:] - tile_edges[:-1]

    return Binning(order=order, pair_rank=sorted_rank, pair_valid=sorted_ok,
                   tile_start=tile_start, tile_count=tile_count,
                   num_pairs=tile_edges[-1],
                   clamped=clamped)
