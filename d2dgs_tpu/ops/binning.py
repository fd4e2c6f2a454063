"""Tile binning under static shapes.

The reference builds variable-length per-tile Gaussian lists with an
inclusive scan + 64-bit radix sort (rasterizer_impl.cu:70-138,196-342).
The TPU-native equivalent:

1. Gaussians are depth-sorted once (stable argsort on view z — matching the
   CUDA sort of positive float depth bits, ties broken by index).
2. Each sorted Gaussian emits up to ``max_tiles_per_gaussian`` (tile, rank)
   pairs for the tiles its screen rect covers — a *static* [N, R] array
   with a validity mask instead of dynamic allocation.
3. One stable int32 sort by tile id orders pairs as (tile, depth): pairs
   are emitted depth-major, so stability gives the per-tile depth order
   for free (no 64-bit keys needed).
4. Per-tile [start, count) ranges come from a vectorized searchsorted.

Rects larger than R tiles are clamped around their center (and the clamp
count is reported); the reference prunes >20 px splats during training so
this is a startup-transient concern only.
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
    clamped: jnp.ndarray      # scalar int32: gaussians whose rect was cut

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
    """Exact per-splat visibility radius given its opacity.

    The blend drops contributions with alpha = op*exp(-rho/2) < 1/255
    (forward.cu:397-402), i.e. a pixel is visible only when
    rho <= 2L, L = ln(255*op).  rho = min(rho3d, rho2d):

    * low-pass branch rho2d = 2*d^2  ->  d <= sqrt(L);
    * splat branch: the farthest point of the 1-sigma level set from
      the AABB center is sigma_max <= ||extent||_2 (the semi-major axis
      is bounded by the AABB half-diagonal), and level sets scale as
      sqrt(rho) under the same affine model the reference's own AABB
      uses (forward.cu:133-163)  ->  d <= sigma_max * sqrt(2L).

    ``extent``: per-splat [.., 2] 1-sigma AABB half-extents (surfel
    path).  ``sigma``: direct per-splat sigma_max override, taking
    precedence — the 3DGS conic path passes radius/3, exact since its
    radius is ceil(3*sqrt(lambda_max)) (ops/raster3d.py preprocess3d).
    With neither, sigma_max falls back to radius/3 (conservative only
    for the conic law).

    The bound is deliberately NOT clamped to the 3-sigma binning
    radius: for opaque splats the visible region extends BEYOND 3 sigma
    (alpha there is up to 1.1% > 1/255), so min(r, vis) would cull real
    contributions — the round-4 raster3d parity regression.  Culling
    with this bound drops only pairs whose every pixel has
    alpha < 1/255, i.e. it is output-invariant for both blend laws
    (within the rect the reference itself bins)."""
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


def max_rect_tiles(prep: Preprocessed) -> jnp.ndarray:
    """Largest tile-rect area of any valid splat — the exact lower bound
    on ``max_tiles_per_gaussian`` for clamp-free binning.  The reference
    never truncates rects (auxiliary.h getRect:64-74 bins the full
    AABB); sizing the cap from this measurement per workload (bench.py,
    tools) makes ``Binning.clamped == 0`` hold by construction instead
    of by hope."""
    rw = prep.rect_max[:, 0] - prep.rect_min[:, 0]
    rh = prep.rect_max[:, 1] - prep.rect_min[:, 1]
    area = jnp.where(prep.valid, rw * rh, 0)
    return jnp.max(area)


def bin_gaussians(prep: Preprocessed, grid_x: int, grid_y: int,
                  cfg: RasterConfig, opacity=None,
                  cull_sigma=None, pixel_offset: float = 0.5) -> Binning:
    """Bin splats into per-tile depth-ordered pair lists.

    ``opacity`` enables the output-invariant circle cull (see
    ``opacity_radius``); without it the cull is skipped — the plain
    AABB-rect binning matches the reference's getRect exactly.
    ``cull_sigma``: optional per-splat sigma_max override ([N], original
    index space) — the 3DGS path passes radius/3 since its prep carries
    no surfel extents.  ``pixel_offset``: sample-rect convention of the
    consuming blend (0.5 = pixel centers, 0.0 = corners; see
    ``circle_tile_overlap``)."""
    n = prep.depth.shape[0]
    r_cap = cfg.max_tiles_per_gaussian
    num_tiles = grid_x * grid_y

    depth_key = jnp.where(prep.valid, prep.depth, jnp.inf)
    order = jnp.argsort(depth_key, stable=True).astype(jnp.int32)

    rmin = prep.rect_min[order]          # [N,2] (x, y)
    rmax = prep.rect_max[order]
    valid = prep.valid[order]

    rw = rmax[:, 0] - rmin[:, 0]
    rh = rmax[:, 1] - rmin[:, 1]
    rw_c = jnp.minimum(rw, r_cap)
    rh_c = jnp.minimum(rh, jnp.maximum(r_cap // jnp.maximum(rw_c, 1), 1))
    clamped = jnp.sum((valid & ((rw_c < rw) | (rh_c < rh))).astype(jnp.int32))
    # center the clamped window on the original rect
    ox = rmin[:, 0] + (rw - rw_c) // 2
    oy = rmin[:, 1] + (rh - rh_c) // 2

    slot = jnp.arange(r_cap, dtype=jnp.int32)[None, :]    # [1,R]
    sw = jnp.maximum(rw_c, 1)[:, None]
    dx = slot % sw
    dy = slot // sw
    tx = ox[:, None] + dx
    ty = oy[:, None] + dy
    pair_ok = valid[:, None] & (slot < (rw_c * rh_c)[:, None])
    if cfg.tile_circle_cull and opacity is not None:
        r_bin = opacity_radius(prep.radius, opacity, extent=prep.extent,
                               sigma=cull_sigma)
        pair_ok &= circle_tile_overlap(
            prep.center[order][:, None, :], r_bin[order][:, None], tx, ty,
            pixel_offset=pixel_offset)
    tile = jnp.where(pair_ok, ty * grid_x + tx, num_tiles).astype(jnp.int32)

    # flattened depth-major emission; sort by tile id, depth order inside
    # each tile preserved (CUDA key = tile<<32 | depth bits).  When the
    # (tile, depth-rank) pair fits in 31 bits, sort ONE fused int32 key
    # (unique => no stability needed, no payload movement); otherwise
    # fall back to a stable 3-operand sort.
    rank_bits = max((n - 1).bit_length(), 1)
    tile_bits = (num_tiles + 1).bit_length()
    rank = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, r_cap))
    if rank_bits + tile_bits <= 31:
        key = tile * jnp.int32(1 << rank_bits) + rank
        # barrier keeps the sort a standalone kernel (XLA's fused forms
        # are far off their fast paths at this size)
        skey = jax.lax.optimization_barrier(
            jax.lax.sort(key.ravel(), is_stable=False))
        sorted_tile = skey >> rank_bits
        sorted_rank = skey & jnp.int32((1 << rank_bits) - 1)
        sorted_ok = sorted_tile < num_tiles
    else:
        sorted_tile, sorted_rank, sorted_ok = jax.lax.sort(
            (tile.ravel(), rank.ravel(), pair_ok.ravel()),
            num_keys=1, is_stable=True)

    tile_edges = jnp.searchsorted(
        sorted_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    tile_start = tile_edges[:-1]
    tile_count = tile_edges[1:] - tile_edges[:-1]

    return Binning(order=order, pair_rank=sorted_rank, pair_valid=sorted_ok,
                   tile_start=tile_start, tile_count=tile_count,
                   num_pairs=tile_edges[-1],
                   clamped=clamped)
