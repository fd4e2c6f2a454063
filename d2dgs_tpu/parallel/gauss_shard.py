"""Gaussian-sharded + tile-sharded rendering with a distributed
tile-binning exchange.

The reference is strictly single-GPU: its CUB sort builds per-tile lists
in one device's memory (rasterizer_impl.cu:70-138).  This module is the
TPU-native scaling path (SURVEY.md §2c): Gaussian primitives are sharded
over the mesh axis ``gauss``; each device preprocesses its shard, emits
(tile, depth, features) records, routes them to the device that OWNS the
tile via ``jax.lax.all_to_all``, and blends its tile slab locally.

Design points:
  * Tile ownership is INTERLEAVED (tile t -> device t % D) — occupancy is
    wildly non-uniform across the image, interleaving balances it
    (SURVEY.md §7 hard part #4).
  * The per-device tile-slab blend runs the SAME Pallas work-queue kernel
    as the single-chip path (ops/pallas/blend_tpu.py): local tile ids
    drive the output slab, a second scalar-prefetch map carries the
    GLOBAL tile id for pixel coordinates.  cfg.use_pallas=False falls
    back to the pure-XLA chunk scan (the CPU-test oracle).
  * Fixed per-(src,dst) record capacity keeps shapes static under jit; an
    overflow counter is returned, and `measure_exchange_counts` sizes the
    cap from the actual scene instead of a magic constant.
  * The whole pipeline is differentiable: the exchange transposes to an
    all_to_all, sorts/gathers transpose to scatters — XLA's equivalent of
    the CUDA backward's cross-tile atomic reductions.
  * `shard_render_core` is usable inside ANY shard_map that has a gauss
    axis (the 2-D data x gauss train step in parallel/gauss_train.py
    calls it per data-row); `render_gauss_sharded` wraps it in a 1-D
    shard_map for standalone use.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import TILE, RasterConfig
from ..data.cameras import Camera
from ..ops import blend as B
from ..ops.projection import preprocess, tile_grid
from ..ops.tiled_raster import _tile_pixels

AXIS = "gauss"
NFEAT = 19  # T(9) + center(2) + normal(3) + color(3) + opacity(1) + depth(1)


class ShardRender(NamedTuple):
    image: jnp.ndarray      # [H,W,3] (replicated result)
    allmap: jnp.ndarray     # [H,W,8]
    overflow: jnp.ndarray   # scalar int32: records dropped at the exchange
    radii: jnp.ndarray      # [N] per-gaussian screen radius (sharded)


def _emit_records(prep, feats, grid_x: int, grid_y: int, n_dev: int,
                  cfg: RasterConfig, exchange_cap: int,
                  counts_only: bool = False, opacity=None):
    """Per-device: depth-sort local gaussians, expand tile rects, group
    records by destination device (tile % n_dev).  Returns
    (blocks [n_dev, cap, NFEAT+1], valid [n_dev, cap], overflow), or
    per-destination counts [n_dev] when counts_only.

    Emission is the same FLAT scheme as the single-chip binning
    (ops/binning.py bin_gaussians): exclusive scan of rect areas +
    run-start scatter + one packed-row gather, no per-gaussian rect cap
    — so sharded and replicated paths bin literally the same pairs
    (losses AND pair counts match).  The per-shard slot budget is
    emission_cap / n_dev: each device holds ~1/n_dev of the scene.
    """
    from ..ops.binning import (_CULL_ALL, _NO_CULL, emission_slots,
                               visibility_circles)
    n = prep.depth.shape[0]
    E = max(-(-cfg.emission_cap // max(n_dev, 1)), 1024)
    num_tiles = grid_x * grid_y

    depth_key = jnp.where(prep.valid, prep.depth, jnp.inf)
    order = jnp.argsort(depth_key, stable=True).astype(jnp.int32)

    if cfg.tile_circle_cull and opacity is not None:
        # identical visibility-circle test as the single-chip binning
        vc = visibility_circles(prep, opacity)
        sr2 = jnp.where(vc.cull_all, _CULL_ALL,
                        jnp.where(vc.cullable, vc.radius * vc.radius,
                                  _NO_CULL))
        ccen = vc.center
    else:
        sr2 = jnp.full((n,), _NO_CULL)
        ccen = jnp.zeros((n, 2), jnp.float32)

    # one packed depth-order gather, same as bin_gaussians (row gathers
    # are latency-bound; packing keeps the emission bitwise identical)
    pk = jnp.concatenate([
        prep.rect_min.astype(jnp.float32),               # 0,1  (x, y)
        prep.rect_max.astype(jnp.float32),               # 2,3
        prep.valid.astype(jnp.float32)[:, None],         # 4
        ccen, sr2[:, None]], axis=-1)[order]             # 5,6 | 7  [n,8]
    rw = (pk[:, 2] - pk[:, 0]).astype(jnp.int32)
    rh = (pk[:, 3] - pk[:, 1]).astype(jnp.int32)
    area = jnp.where(pk[:, 4] > 0.5, rw * rh, 0)

    g, offs, total = emission_slots(area, E)
    pack = jnp.stack([
        offs.astype(jnp.float32), jnp.maximum(rw, 1).astype(jnp.float32),
        pk[:, 0], pk[:, 1],
        pk[:, 5], pk[:, 6], pk[:, 7],
        order.astype(jnp.float32)], axis=-1)              # [n,8]
    pe = pack[g]                                          # [E,8]
    e = jnp.arange(E, dtype=jnp.int32)
    slot = e - pe[:, 0].astype(jnp.int32)
    sw = pe[:, 1].astype(jnp.int32)
    tx = pe[:, 2].astype(jnp.int32) + slot % sw
    ty = pe[:, 3].astype(jnp.int32) + slot // sw
    ok = e < total
    x0 = tx.astype(jnp.float32) * TILE + 0.5
    y0 = ty.astype(jnp.float32) * TILE + 0.5
    dx = pe[:, 4] - jnp.clip(pe[:, 4], x0, x0 + (TILE - 1.0))
    dy = pe[:, 5] - jnp.clip(pe[:, 5], y0, y0 + (TILE - 1.0))
    ok &= dx * dx + dy * dy <= pe[:, 6]
    tile = jnp.where(ok, ty * grid_x + tx, num_tiles).astype(jnp.int32)

    dest = jnp.where(ok, tile % n_dev, n_dev).astype(jnp.int32)
    if counts_only:
        return jnp.sum(jax.nn.one_hot(dest, n_dev, dtype=jnp.int32), axis=0)
    flat_dest = dest
    flat_tile = tile
    flat_gid = pe[:, 7].astype(jnp.int32)
    flat_ok = ok

    # group by destination, keeping depth-major emission order per dest
    sort_dest, s_tile, s_gid, s_ok = jax.lax.sort(
        (flat_dest, flat_tile, flat_gid, flat_ok), num_keys=1,
        is_stable=True)
    edges = jnp.searchsorted(sort_dest,
                             jnp.arange(n_dev + 1, dtype=jnp.int32),
                             side="left").astype(jnp.int32)
    start, end = edges[:-1], edges[1:]
    overflow = jnp.sum(jnp.maximum(end - start - exchange_cap, 0))

    offs = start[:, None] + jnp.arange(exchange_cap, dtype=jnp.int32)[None]
    in_seg = offs < end[:, None]
    offs = jnp.clip(offs, 0, flat_dest.shape[0] - 1)
    blk_tile = jnp.where(in_seg, s_tile[offs], num_tiles)
    blk_ok = in_seg & s_ok[offs]
    blk_feat = feats[s_gid[offs]]                     # [n_dev, cap, NFEAT]
    blocks = jnp.concatenate(
        [blk_feat, blk_tile[..., None].astype(jnp.float32)], axis=-1)
    return blocks, blk_ok, overflow


def _sort_records(recs, rec_ok, my_tiles, num_tiles, n_dev, dev_id):
    """Merge exchanged records by (tile, depth) and find this device's
    per-local-tile ranges.  Returns (s_feat [R,NFEAT], s_ok [R],
    tile_start [my_tiles], tile_count [my_tiles], glob [my_tiles])."""
    tile_g = recs[..., -1].astype(jnp.int32)            # global tile id
    tile_g = jnp.where(rec_ok, tile_g, num_tiles)
    depth = jnp.where(rec_ok, recs[..., 18], jnp.inf)
    feat_cols = [recs[..., i] for i in range(NFEAT)]
    sorted_all = jax.lax.sort((tile_g, depth, *feat_cols, rec_ok),
                              num_keys=2, is_stable=True)
    s_tile = sorted_all[0]
    s_feat = jnp.stack(sorted_all[2:2 + NFEAT], axis=-1)
    s_ok = sorted_all[-1]

    # local tile t_loc owns global tile t_loc * n_dev + dev_id
    glob = jnp.arange(my_tiles, dtype=jnp.int32) * n_dev + dev_id
    tile_start = jnp.searchsorted(s_tile, glob, side="left").astype(
        jnp.int32)
    tile_end = jnp.searchsorted(s_tile, glob + 1, side="left").astype(
        jnp.int32)
    return s_feat, s_ok, tile_start, tile_end - tile_start, glob


def _blend_tiles_scan(s_feat, s_ok, tile_start, tile_count, glob,
                      grid_x, grid_y, cfg: RasterConfig, my_tiles):
    """Pure-XLA chunked scan over the sorted records (CPU oracle)."""
    num_tiles = grid_x * grid_y
    Ppix = TILE * TILE
    tile_end = tile_start + tile_count
    all_pix = _tile_pixels(grid_x, grid_y)              # [T_all, P, 2]
    pad = jnp.zeros((1, Ppix, 2), jnp.float32)
    pix = jnp.concatenate([all_pix, pad], axis=0)[
        jnp.clip(glob, 0, num_tiles)]                   # [my_tiles, P, 2]

    n_chunks = max(cfg.tile_cap // cfg.chunk, 1)
    R = s_feat.shape[0]
    state0 = jax.vmap(lambda _: B.init_state(Ppix))(jnp.arange(my_tiles))

    @jax.checkpoint
    def chunk_step(state, ci):
        base = tile_start + ci * cfg.chunk
        offs = base[:, None] + jnp.arange(cfg.chunk, dtype=jnp.int32)[None]
        in_range = offs < tile_end[:, None]
        offs = jnp.clip(offs, 0, R - 1)
        f = s_feat[offs]                                # [T,chunk,NFEAT]
        ok = in_range & s_ok[offs]
        Tm = f[..., 0:9].reshape(f.shape[0], f.shape[1], 3, 3)
        cen, nor = f[..., 9:11], f[..., 11:14]
        col = f[..., 14:17]
        opc = jnp.where(ok, f[..., 17], 0.0)

        def tile_blend(st, tT, tc, tn, tcol, topac, tpix):
            a, d = B.pixel_responses(tT, tc, topac, tpix)
            return B.blend_chunk(st, a, d, tcol, tn)

        return jax.vmap(tile_blend)(state, Tm, cen, nor, col, opc,
                                    pix), None

    state, _ = jax.lax.scan(chunk_step, state0,
                            jnp.arange(n_chunks, dtype=jnp.int32))
    color, allmap = jax.vmap(B.finalize, in_axes=(0, None))(
        state, jnp.zeros((3,), jnp.float32))
    return color, allmap


def _blend_tiles_wq(s_feat, s_ok, tile_start, tile_count, glob,
                    grid_x, grid_y, cfg: RasterConfig, my_tiles, n_dev,
                    dev_id):
    """Per-device-slab blend through the Pallas work-queue kernel
    (ops/pallas/blend_tpu.py): one grid step per actual record chunk of
    this device's tiles; local ids index the output slab, global ids give
    pixel coordinates."""
    from ..ops.pallas.blend_tpu import NSTATE, blend_tiles_wq

    ch = cfg.chunk
    R = s_feat.shape[0]
    # static work capacity: every record chunk + one partial per tile
    # (ceil so the queue can never truncate)
    w_cap = -(-R // ch) + my_tiles
    counts = jnp.minimum(tile_count, cfg.tile_cap).astype(jnp.int32)
    nch = (counts + ch - 1) // ch
    work_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nch, dtype=jnp.int32)])
    total_work = work_start[-1]

    w = jnp.arange(w_cap, dtype=jnp.int32)
    wt = jnp.clip(jnp.searchsorted(work_start, w, side="right") - 1,
                  0, my_tiles - 1).astype(jnp.int32)
    wc = w - work_start[wt]
    pad = w >= total_work
    first = ((wc == 0) & ~pad).astype(jnp.int32)
    end = jnp.minimum(work_start[wt + 1], w_cap)
    last = ((w == end - 1) & ~pad).astype(jnp.int32)
    work_tile = jnp.where(pad, my_tiles, wt).astype(jnp.int32)
    gtile = jnp.where(pad, 0, glob[wt]).astype(jnp.int32)

    base = tile_start[wt] + wc * ch
    slots = base[:, None] + jnp.arange(ch, dtype=jnp.int32)[None, :]
    ok = ((jnp.arange(ch, dtype=jnp.int32)[None, :]
           < (counts[wt] - wc * ch)[:, None]) & ~pad[:, None])
    slots = jnp.clip(slots, 0, R - 1)
    ok = ok & s_ok[slots]
    gdata = jnp.where(ok[..., None], s_feat[slots][..., :18], 0.0)

    out = blend_tiles_wq(gdata, work_tile, gtile, first, last,
                         my_tiles, grid_x, w_cap)       # [myT,NSTATE,PIX]
    st = jnp.swapaxes(out, 1, 2)                        # [myT,PIX,NSTATE]
    color = st[..., 4:7]
    allmap = jnp.concatenate([
        st[..., 7:8], 1.0 - st[..., 0:1], st[..., 8:11],
        st[..., 12:13], st[..., 11:12], st[..., 13:14]], axis=-1)
    return color, allmap


def shard_render_core(cam: Camera, means, scl, qt, opc, col, alv,
                      grid_x: int, grid_y: int, n_dev: int,
                      cfg: RasterConfig, exchange_cap: int,
                      screen_probe=None, axis: str = AXIS):
    """Per-shard render body — call INSIDE a shard_map that has `axis`.
    Returns (color_all [D,myT,P,3], allmap_all [D,myT,P,8],
    overflow scalar, radii [n_local]) — color/allmap replicated (gathered),
    radii per-shard."""
    num_tiles = grid_x * grid_y
    my_tiles = -(-num_tiles // n_dev)
    dev_id = jax.lax.axis_index(axis)

    prep = preprocess(means, scl, qt, cam)
    valid = prep.valid & alv
    prep = prep._replace(valid=valid,
                         radius=jnp.where(valid, prep.radius, 0))
    Tmat = prep.T
    if screen_probe is not None:
        # NDC screen-grad hack for densification stats
        # (render/renderer.py docstring; backward.cu:645-648)
        sx = jax.lax.stop_gradient(Tmat[:, 2, 2] * (cam.W / 2.0))
        sy = jax.lax.stop_gradient(Tmat[:, 2, 2] * (cam.H / 2.0))
        Tmat = Tmat.at[:, 0, 2].add(screen_probe[:, 0] * sx)
        Tmat = Tmat.at[:, 1, 2].add(screen_probe[:, 1] * sy)
    opc_m = jnp.where(valid, opc, 0.0)
    n = means.shape[0]
    feats = jnp.concatenate(
        [Tmat.reshape(n, 9), prep.center, prep.normal, col,
         opc_m[:, None], prep.depth[:, None]], axis=-1)

    blocks, blk_ok, overflow = _emit_records(
        prep, feats, grid_x, grid_y, n_dev, cfg, exchange_cap,
        opacity=opc_m)
    # the exchange: blocks[d] -> device d   (ICI all_to_all)
    recs = jax.lax.all_to_all(blocks, axis, split_axis=0,
                              concat_axis=0, tiled=True)
    rec_ok = jax.lax.all_to_all(blk_ok, axis, split_axis=0,
                                concat_axis=0, tiled=True)

    s_feat, s_ok, tile_start, tile_count, glob = _sort_records(
        recs.reshape(-1, NFEAT + 1), rec_ok.reshape(-1), my_tiles,
        num_tiles, n_dev, dev_id)
    from ..ops.pallas.blend_tpu import _is_tpu
    if (cfg.use_pallas and cfg.tile_cap % cfg.chunk == 0
            and (_is_tpu() or cfg.pallas_interpret)):
        color, allmap = _blend_tiles_wq(
            s_feat, s_ok, tile_start, tile_count, glob, grid_x, grid_y,
            cfg, my_tiles, n_dev, dev_id)
    else:
        color, allmap = _blend_tiles_scan(
            s_feat, s_ok, tile_start, tile_count, glob, grid_x, grid_y,
            cfg, my_tiles)
    overflow = jax.lax.psum(overflow, axis)
    # gather everyone's tile slabs -> full interleaved tile array
    color_all = jax.lax.all_gather(color, axis)   # [D, my_tiles, P, 3]
    allmap_all = jax.lax.all_gather(allmap, axis)
    return color_all, allmap_all, overflow, prep.radius


def assemble_interleaved(color_all, allmap_all, bg, grid_x, grid_y,
                         H, W):
    """[D, my_tiles, P, C] interleaved slabs -> composited [H,W,*] maps."""
    from ..ops.tiled_raster import tiles_to_image
    num_tiles = grid_x * grid_y

    def deinterleave(x):
        D, T_loc = x.shape[0], x.shape[1]
        x = jnp.swapaxes(x, 0, 1).reshape(D * T_loc, *x.shape[2:])
        return x[:num_tiles]

    tile_color = deinterleave(color_all)
    tile_allmap = deinterleave(allmap_all)
    Tfinal = 1.0 - tile_allmap[..., 1:2]
    tile_color = tile_color + Tfinal * bg[None, None, :]
    image = tiles_to_image(tile_color, grid_x, grid_y, H, W)
    allmap = tiles_to_image(tile_allmap, grid_x, grid_y, H, W)
    return image, allmap


def render_gauss_sharded(mesh: Mesh, cam: Camera, means3d, scales, quats,
                         opacity, colors, alive, bg,
                         cfg: RasterConfig = RasterConfig(),
                         exchange_cap: int = 4096,
                         screen_probe=None) -> ShardRender:
    """Render with Gaussians sharded over mesh axis AXIS and image tiles
    sharded (interleaved) over the same axis.  All per-gaussian arrays
    must be shardable on dim 0 by the mesh size; returns replicated maps.
    """
    n_dev = mesh.shape[AXIS]
    H, W = cam.H, cam.W
    gx, gy = tile_grid(H, W)

    def shard_fn(means, scl, qt, opc, col, alv, probe):
        return shard_render_core(cam, means, scl, qt, opc, col, alv,
                                 gx, gy, n_dev, cfg, exchange_cap,
                                 screen_probe=(probe if screen_probe
                                               is not None else None))

    in_specs = (P(AXIS),) * 7
    probe = (screen_probe if screen_probe is not None
             else jnp.zeros((means3d.shape[0], 2), jnp.float32))
    # outputs ARE replicated (all_gather/psum) but the vma tracker can't
    # prove it through the sort/scan pipeline — hence check_vma=False
    color_all, allmap_all, overflow, radii = jax.shard_map(
        shard_fn, mesh=mesh, in_specs=in_specs,
        out_specs=(P(), P(), P(), P(AXIS)), check_vma=False)(
        means3d, scales, quats, opacity, colors, alive, probe)

    image, allmap = assemble_interleaved(color_all, allmap_all, bg,
                                         gx, gy, H, W)
    return ShardRender(image=image, allmap=allmap, overflow=overflow,
                       radii=radii)


def measure_exchange_counts(mesh: Mesh, cam: Camera, means3d, scales,
                            quats, alive,
                            cfg: RasterConfig = RasterConfig(),
                            opacity=None, full: bool = False):
    """Max per-(src,dst) record count of the exchange for THIS scene —
    the auto-sizing input for exchange_cap (instead of magic constants).
    Pass ``opacity`` so the count reflects the visibility cull the real
    render applies (else the cap sizes to the uncalled emission, which
    is only an over-estimate).  Returns a scalar int (host); with
    ``full`` the whole [src, dst] count matrix (the scaling harness
    reports per-device pair balance from it)."""
    n_dev = mesh.shape[AXIS]
    gx, gy = tile_grid(cam.H, cam.W)
    if opacity is None:
        opacity = jnp.ones((means3d.shape[0],), jnp.float32)

    def shard_fn(means, scl, qt, alv, opc):
        prep = preprocess(means, scl, qt, cam)
        valid = prep.valid & alv
        prep = prep._replace(valid=valid,
                             radius=jnp.where(valid, prep.radius, 0))
        counts = _emit_records(prep, None, gx, gy, n_dev, cfg,
                               exchange_cap=0, counts_only=True,
                               opacity=jnp.where(valid, opc, 0.0))
        return jax.lax.all_gather(counts, AXIS)          # [src, dst]

    mat = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh, in_specs=(P(AXIS),) * 5,
        out_specs=P(), check_vma=False))(means3d, scales, quats, alive,
                                         opacity)
    mat = np.asarray(mat)
    return mat if full else int(mat.max())


def suggest_exchange_cap(mesh: Mesh, cams, means3d, scales, quats, alive,
                         cfg: RasterConfig = RasterConfig(),
                         margin: float = 1.5, quantum: int = 256,
                         opacity=None) -> int:
    """Size the exchange from measured per-destination counts over a
    sample of cameras, with headroom for training-time growth."""
    mx = max(measure_exchange_counts(mesh, c, means3d, scales, quats,
                                     alive, cfg, opacity=opacity)
             for c in cams)
    return max(quantum, int(-(-mx * margin // quantum)) * quantum)


def shard_gaussians(mesh: Mesh, tree):
    """Place per-gaussian arrays (dim 0 = N) on the gauss axis."""
    return jax.device_put(tree, NamedSharding(mesh, P(AXIS)))


def pad_to_multiple(arr: np.ndarray, m: int, fill=0.0):
    n = arr.shape[0]
    pad = (-n) % m
    if pad == 0:
        return arr
    pad_block = np.full((pad, *arr.shape[1:]), fill, arr.dtype)
    return np.concatenate([arr, pad_block], axis=0)
