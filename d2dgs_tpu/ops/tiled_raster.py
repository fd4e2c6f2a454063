"""Tiled rasterizer, pure-XLA path.

Blends each 16x16 tile's depth-sorted Gaussian list in fixed-size chunks
(a lax.scan over chunk index, vmapped over all tiles).  Fully
differentiable: the backward pass is XLA autodiff — per-chunk gather VJPs
become scatter-adds, which is exactly the segmented cross-tile gradient
reduction the CUDA backward implements with atomics (backward.cu:142-449).

The Pallas path (ops/pallas/) replaces only the per-tile blend loop; this
module is the semantics oracle and the CPU/fallback implementation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import TILE, RasterConfig
from ..data.cameras import Camera
from . import blend as B
from .binning import Binning, bin_gaussians
from .projection import preprocess, tile_grid


def _tile_pixels(grid_x: int, grid_y: int):
    """Pixel-center coordinates for every tile: [T, TILE*TILE, 2]."""
    t = jnp.arange(grid_x * grid_y, dtype=jnp.int32)
    bx = (t % grid_x) * TILE
    by = (t // grid_x) * TILE
    oy, ox = jnp.mgrid[0:TILE, 0:TILE]
    px = bx[:, None] + ox.ravel()[None, :]
    py = by[:, None] + oy.ravel()[None, :]
    return jnp.stack([px + 0.5, py + 0.5], axis=-1).astype(jnp.float32)


def blend_tiles_xla(Tmat, center, normal, colors, opacity, depth,
                    binning: Binning, grid_x: int, grid_y: int,
                    cfg: RasterConfig):
    """Blend all tiles. Per-Gaussian inputs are in ORIGINAL index space.

    Returns (color [T,P,3], allmap [T,P,8]) with P = TILE*TILE.
    """
    num_tiles = grid_x * grid_y
    P = TILE * TILE
    pix = _tile_pixels(grid_x, grid_y)                     # [T,P,2]
    n_chunks = max(cfg.tile_cap // cfg.chunk, 1)
    B_pairs = binning.pair_rank.shape[0]

    # pre-sort per-gaussian features by depth order once; pair lists then
    # index the sorted side via pair_rank (see Binning layout note)
    Tmat_s, center_s, normal_s, colors_s, opacity_s = jax.tree.map(
        lambda a: a[binning.order],
        (Tmat, center, normal, colors, opacity))

    state0 = jax.vmap(lambda _: B.init_state(P))(jnp.arange(num_tiles))

    # remat: without it, scan backward saves every chunk's [T,chunk,P]
    # response/weight intermediates (tile_cap/chunk of them — gigabytes at
    # 800x800).  Recompute them in the backward from the (small) carries,
    # exactly like the CUDA backward re-walks the per-tile lists from
    # saved final_T (backward.cu:142-449).
    @jax.checkpoint
    def chunk_step(state, c):
        base = binning.tile_start + c * cfg.chunk          # [T]
        offs = base[:, None] + jnp.arange(cfg.chunk, dtype=jnp.int32)[None, :]
        in_range = offs < (binning.tile_start + binning.tile_count)[:, None]
        offs = jnp.clip(offs, 0, B_pairs - 1)
        ids = binning.pair_rank[offs]                      # [T,chunk]
        ok = in_range & binning.pair_valid[offs]

        g_T = Tmat_s[ids]                                  # [T,chunk,3,3]
        g_center = center_s[ids]
        g_normal = normal_s[ids]
        g_color = colors_s[ids]
        g_opac = jnp.where(ok, opacity_s[ids], 0.0)

        def tile_blend(st, tT, tc, tn, tcol, topac, tpix):
            a, d = B.pixel_responses(tT, tc, topac, tpix)
            return B.blend_chunk(st, a, d, tcol, tn)

        state = jax.vmap(tile_blend)(state, g_T, g_center, g_normal,
                                     g_color, g_opac, pix)
        return state, None

    state, _ = jax.lax.scan(chunk_step, state0,
                            jnp.arange(n_chunks, dtype=jnp.int32))
    color, allmap = jax.vmap(B.finalize, in_axes=(0, None))(
        state, jnp.zeros((3,), jnp.float32))
    return color, allmap, state


def blend_tiles(Tmat, center, normal, colors, opacity, binning: Binning,
                grid_x: int, grid_y: int, cfg: RasterConfig):
    """Backend dispatch: Pallas TPU kernel or pure-XLA oracle.

    Returns (tile_color [T,P,3], tile_allmap [T,P,8], overflow scalar
    i32 — PAIRS dropped by the static caps: per-tile tile_cap
    truncation on every path, plus the work queue's pair_cap drops).
    """
    from .pallas.blend_tpu import (CHUNK, NFEAT, _is_tpu, blend_tiles_pallas,
                                   blend_tiles_wq, build_gdata,
                                   build_work_queue)
    # tile_cap clipping drops a busy tile's DEEPEST pairs on every
    # backend — surface it (silent truncation starved a training run
    # when a cap was undersized for a bigger resolution)
    overflow = jnp.sum(jnp.maximum(binning.tile_count - cfg.tile_cap, 0))
    if (cfg.use_pallas and cfg.tile_cap % 128 == 0
            and (_is_tpu() or cfg.pallas_interpret)):
        n = Tmat.shape[0]
        feats = jnp.concatenate(
            [Tmat.reshape(n, 9), center, normal, colors, opacity[:, None]],
            axis=-1)
        assert feats.shape[-1] == NFEAT
        num_tiles = grid_x * grid_y
        if cfg.use_workqueue and cfg.pair_cap % cfg.chunk == 0:
            gdata, work_tile, first, last, overflow = build_work_queue(
                feats, binning, num_tiles, cfg)
            out = blend_tiles_wq(gdata, work_tile, work_tile, first, last,
                                 num_tiles, grid_x,
                                 cfg.pair_cap // cfg.chunk)
        else:
            gdata, counts = build_gdata(feats, binning, num_tiles, cfg)
            out = blend_tiles_pallas(gdata, counts, num_tiles, grid_x,
                                     cfg.tile_cap // 128)
        st = jnp.swapaxes(out, 1, 2)                    # [T, PIX, NSTATE]
        tile_color = st[..., 4:7]
        tile_allmap = jnp.concatenate([
            st[..., 7:8],                # expected-depth accumulator
            1.0 - st[..., 0:1],          # alpha = 1 - T_final
            st[..., 8:11],               # camera-frame normal
            st[..., 12:13],              # median depth
            st[..., 11:12],              # distortion
            st[..., 13:14],              # median weight
        ], axis=-1)
        return tile_color, tile_allmap, overflow
    tile_color, tile_allmap, _ = blend_tiles_xla(
        Tmat, center, normal, colors, opacity, None, binning,
        grid_x, grid_y, cfg)
    return tile_color, tile_allmap, overflow


def tiles_to_image(tile_img: jnp.ndarray, grid_x: int, grid_y: int,
                   H: int, W: int) -> jnp.ndarray:
    """[T, TILE*TILE, C] -> [H, W, C] (cropping tile padding)."""
    C = tile_img.shape[-1]
    img = tile_img.reshape(grid_y, grid_x, TILE, TILE, C)
    img = img.transpose(0, 2, 1, 3, 4).reshape(grid_y * TILE, grid_x * TILE, C)
    return img[:H, :W]


def rasterize_tiled(means3d, scales, quats, opacities, colors, cam: Camera,
                    bg=None, scale_modifier: float = 1.0,
                    cfg: RasterConfig = RasterConfig()):
    """Full tiled pipeline: preprocess -> bin -> blend -> assemble.

    Same contract as rasterize_dense. Background composite happens here
    (blend_tiles_xla returns zero-bg tiles so the Pallas path can share).
    """
    H, W = cam.H, cam.W
    gx, gy = tile_grid(H, W)
    if bg is None:
        bg = jnp.zeros((3,), jnp.float32)
    prep = preprocess(means3d, scales, quats, cam, scale_modifier)
    opac = jnp.where(prep.valid, opacities, 0.0)
    binning = bin_gaussians(prep, gx, gy, cfg, opacity=opac)
    tile_color, tile_allmap, _ = blend_tiles(
        prep.T, prep.center, prep.normal, colors, opac,
        binning, gx, gy, cfg)
    # bg composite: color tiles already include nothing for bg; add T*bg
    Tfinal = 1.0 - tile_allmap[..., 1:2]
    tile_color = tile_color + Tfinal * bg[None, None, :]
    color = tiles_to_image(tile_color, gx, gy, H, W)
    allmap = tiles_to_image(tile_allmap, gx, gy, H, W)
    return color, allmap, prep.radius, prep, binning
