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


def circle_tile_overlap(center: jnp.ndarray, radius, tx, ty):
    """True where a splat's truncation circle touches tile (tx, ty).

    center: [..., 2] pixel coords; radius: [...] float (the preprocess
    3-sigma circumscribed radius, forward.cu:150-163); tx/ty broadcast
    against them.  The test is distance(center, tile pixel-center rect)
    <= radius — exact for pixel-center sampling.  Shared by the binning
    emission, the distributed-exchange emission (parallel/gauss_shard),
    and the dense oracle so all paths bin identically."""
    x0 = tx.astype(jnp.float32) * TILE + 0.5
    y0 = ty.astype(jnp.float32) * TILE + 0.5
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


def opacity_radius(radius: jnp.ndarray, opacity: jnp.ndarray):
    """Exact per-splat visibility radius given its opacity.

    The blend drops contributions with alpha = op*exp(-rho/2) < 1/255
    (forward.cu:397-402), i.e. rho > 2*ln(255*op).  With the preprocess
    radius r >= 3*sigma_max (so sigma_max <= r/3) and the low-pass
    branch rho2d = 2*d^2, a pixel at distance d can only be visible if
    d <= max(sigma_max*sqrt(2L), sqrt(L)), L = ln(255*op).  Binning
    with min(r, that bound) drops ONLY pairs the blend would zero
    anyway — output-invariant, and a large win on converged scenes
    where a quarter of the splats sit at low opacity after resets."""
    r = radius.astype(jnp.float32)
    op = jax.lax.stop_gradient(opacity).astype(jnp.float32)
    L = jnp.log(jnp.maximum(255.0 * op, 1e-12))
    L = jnp.maximum(L, 0.0)
    vis = jnp.maximum((r / 3.0) * jnp.sqrt(2.0 * L), jnp.sqrt(L))
    vis = jnp.where(op >= 1.0 / 255.0, vis, 0.0)
    return jnp.minimum(r, vis)


def bin_gaussians(prep: Preprocessed, grid_x: int, grid_y: int,
                  cfg: RasterConfig, opacity=None) -> Binning:
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
    if cfg.tile_circle_cull:
        r_bin = prep.radius.astype(jnp.float32)
        if opacity is not None:
            r_bin = opacity_radius(r_bin, opacity)
        pair_ok &= circle_tile_overlap(
            prep.center[order][:, None, :], r_bin[order][:, None], tx, ty)
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
