"""Pallas TPU kernels for the tiled surfel blend (forward + analytic VJP).

TPU-native re-design of the reference CUDA render kernels
(diff-surfel-rasterization cuda_rasterizer/forward.cu:265-463 and
backward.cu:142-449):

* CUDA runs one 16x16 thread block per tile with 256-Gaussian shared-memory
  batches and a sequential per-pixel blend loop.  Here one Pallas grid step
  processes (tile, chunk-of-128-Gaussians): the chunk's 18 features stream
  HBM->VMEM through the BlockSpec pipeline (the shared-memory staging
  analogue), and the 128x256 Gaussian-x-pixel interaction runs on the VPU
  with Gaussians in sublanes and the tile's 256 pixels in lanes.
* Front-to-back compositing is restructured as an exclusive prefix product
  of (1 - alpha) along the Gaussian axis (log-step shifts, 7 rounds), so
  the whole chunk blends in parallel instead of a sequential loop.
* Early termination (T < 1e-4) and the reference's quirk that the
  triggering Gaussian is dropped (forward.cu:400-405) are reproduced with
  rank masks; whole chunks are skipped with @pl.when once every pixel of a
  tile is done or the tile's pair list is exhausted.
* The CUDA backward re-walks each tile back-to-front with atomics
  (backward.cu:142-449).  TPUs have no atomics: the backward kernel walks
  chunks in *reverse* grid order, re-materializes each chunk's pre-state
  from 4 saved carry channels (T, done, dist1, dist2 - everything else is
  a linear accumulator whose value doesn't affect gradients), applies the
  chunk VJP (derived by jax.vjp over the same chunk math as the forward,
  traced inside the kernel), and writes per-pair feature gradients.  The
  cross-tile gradient reduction (CUDA atomicAdd) becomes the dense
  scatter-add of the surrounding XLA gather's autodiff transpose.

The pure-XLA path in ops/tiled_raster.py is the semantics oracle; tests
compare both (interpret mode on CPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import (ALPHA_CLIP, ALPHA_CUTOFF, FAR_PLANE,
                       FILTER_INV_SQUARE, NEAR_PLANE, T_CUTOFF, TILE,
                       RasterConfig)

CHUNK = 128            # Gaussians per grid step (sublane dim)
PIX = TILE * TILE      # 256 pixels per tile (lane dim)
NFEAT = 18             # Tmat(9) center(2) normal(3) color(3) opacity(1)
NSTATE = 16            # state rows (14 used, padded for tiling)
NCARRY = 4             # saved per-chunk-boundary rows: T, done, dist1, dist2

# state-row layout (shared by kernel, dispatch, and tests)
ROW_T, ROW_DONE, ROW_D1, ROW_D2 = 0, 1, 2, 3
ROW_COLOR = slice(4, 7)
ROW_DEPTH = 7
ROW_NORMAL = slice(8, 11)
ROW_DISTORTION = 11
ROW_MED_D = 12
ROW_MED_W = 13


def _shift_down(x, k, fill):
    """Shift rows down by k (static), filling the top with `fill`."""
    return jnp.concatenate(
        [jnp.full((k,) + x.shape[1:], fill, x.dtype), x[:-k]], axis=0)


def _incl_cumprod0(x):
    """Inclusive cumulative product along axis 0 (log-step doubling).

    NOTE: an MXU formulation (triangular [G,G]@[G,P] matmul at HIGHEST
    precision) was measured SLOWER than this VPU ladder — f32 HIGHEST
    lowers to the 6-pass bf16 decomposition on the MXU, costing more
    than the 7 shift/add rounds it replaces."""
    acc = x
    k = 1
    while k < x.shape[0]:
        acc = acc * _shift_down(acc, k, 1.0)
        k *= 2
    return acc


def _incl_cumsum0(x):
    """Inclusive cumulative sum along axis 0 (log-step doubling)."""
    acc = x
    k = 1
    while k < x.shape[0]:
        acc = acc + _shift_down(acc, k, 0.0)
        k *= 2
    return acc


def _ex_cumsum0(x):
    """Exclusive cumulative sum along axis 0."""
    return _shift_down(_incl_cumsum0(x), 1, 0.0)


def _resp(feats, px, py):
    """Elementwise ray-splat response: feats [G,NFEAT] -> (alpha, depth),
    both [G,PIX].  Identical math to ops/blend.py pixel_responses
    (forward.cu:336-402).  alpha is pre-masked by the p.z==0 / near-plane
    / 1-255-cutoff rules."""
    f = lambda i: feats[:, i:i + 1]                     # [G,1]
    kx = px * f(6) - f(0)
    ky = px * f(7) - f(1)
    kz = px * f(8) - f(2)
    lx = py * f(6) - f(3)
    ly = py * f(7) - f(4)
    lz = py * f(8) - f(5)
    p_x = ky * lz - kz * ly
    p_y = kz * lx - kx * lz
    p_z = kx * ly - ky * lx
    good = p_z != 0.0
    inv_pz = jnp.where(good, 1.0 / jnp.where(good, p_z, 1.0), 0.0)
    sx = p_x * inv_pz
    sy = p_y * inv_pz
    rho3d = sx * sx + sy * sy
    dx = f(9) - px
    dy = f(10) - py
    rho2d = FILTER_INV_SQUARE * (dx * dx + dy * dy)
    use3d = rho3d <= rho2d
    depth = jnp.where(use3d, sx * f(6) + sy * f(7) + f(8), f(8))
    alpha = jnp.minimum(ALPHA_CLIP, f(17) * jnp.exp(-0.5 *
                                                    jnp.minimum(rho3d, rho2d)))
    keep = good & (depth >= NEAR_PLANE) & (alpha >= ALPHA_CUTOFF)
    return jnp.where(keep, alpha, 0.0), depth           # [G,P] each


def _resp_manual_vjp(feats, px, py):
    """``_resp`` forward + HAND-DERIVED adjoint closure.

    Replaces ``jax.vjp(_resp)`` inside the backward kernel: the autodiff
    transpose re-materializes roughly twice the elementwise work
    (ablation-measured ~6 ms of the ~20 ms backward kernel at the bench
    workload); this closure reuses the forward's intermediates and
    writes the minimal adjoint chain of the cross-product / homogeneous
    division (mirrors the structure of the CUDA backward's explicit
    chain, backward.cu:142-449).  Branch subgradients (min, where)
    match autodiff away from ties; parity is pinned by
    tests/test_pallas_blend.py::test_chunk_bwd_matches_autodiff.
    Returns (alpha [G,P], depth [G,P], vjp(abar, dbar) -> gfeats
    [G, NFEAT])."""
    f = lambda i: feats[:, i:i + 1]                     # [G,1]
    f6, f7, f8 = f(6), f(7), f(8)
    kx = px * f6 - f(0)
    ky = px * f7 - f(1)
    kz = px * f8 - f(2)
    lx = py * f6 - f(3)
    ly = py * f7 - f(4)
    lz = py * f8 - f(5)
    p_x = ky * lz - kz * ly
    p_y = kz * lx - kx * lz
    p_z = kx * ly - ky * lx
    good = p_z != 0.0
    inv_pz = jnp.where(good, 1.0 / jnp.where(good, p_z, 1.0), 0.0)
    sx = p_x * inv_pz
    sy = p_y * inv_pz
    rho3d = sx * sx + sy * sy
    dx = f(9) - px
    dy = f(10) - py
    rho2d = FILTER_INV_SQUARE * (dx * dx + dy * dy)
    m3 = rho3d <= rho2d
    depth = jnp.where(m3, sx * f6 + sy * f7 + f8, f8)
    E = jnp.exp(-0.5 * jnp.minimum(rho3d, rho2d))
    raw = f(17) * E
    alpha = jnp.minimum(ALPHA_CLIP, raw)
    keep = good & (depth >= NEAR_PLANE) & (alpha >= ALPHA_CUTOFF)
    alpha_out = jnp.where(keep, alpha, 0.0)

    def vjp(abar, dbar):
        ab = jnp.where(keep, abar, 0.0)
        raw_bar = jnp.where(raw < ALPHA_CLIP, ab, 0.0)
        rho_bar = -0.5 * raw_bar * raw
        m3f = m3.astype(jnp.float32)
        r3b = rho_bar * m3f
        r2b = rho_bar - r3b
        # rho2d branch -> low-pass center (features 9, 10)
        g9 = jnp.sum(2.0 * FILTER_INV_SQUARE * r2b * dx, axis=1)
        g10 = jnp.sum(2.0 * FILTER_INV_SQUARE * r2b * dy, axis=1)
        # depth + rho3d branches -> intersection point s
        dbm = dbar * m3f
        sx_bar = dbm * f6 + 2.0 * r3b * sx
        sy_bar = dbm * f7 + 2.0 * r3b * sy
        pxb = sx_bar * inv_pz
        pyb = sy_bar * inv_pz
        pzb = -(sx_bar * sx + sy_bar * sy) * inv_pz
        # cross-product transpose: p = k x l
        kx_b = pzb * ly - pyb * lz
        ky_b = pxb * lz - pzb * lx
        kz_b = pyb * lx - pxb * ly
        lx_b = pyb * kz - pzb * ky
        ly_b = pzb * kx - pxb * kz
        lz_b = pxb * ky - pyb * kx
        g0 = -jnp.sum(kx_b, axis=1)
        g1 = -jnp.sum(ky_b, axis=1)
        g2 = -jnp.sum(kz_b, axis=1)
        g3 = -jnp.sum(lx_b, axis=1)
        g4 = -jnp.sum(ly_b, axis=1)
        g5 = -jnp.sum(lz_b, axis=1)
        g6 = jnp.sum(kx_b * px + lx_b * py + dbm * sx, axis=1)
        g7 = jnp.sum(ky_b * px + ly_b * py + dbm * sy, axis=1)
        g8 = jnp.sum(kz_b * px + lz_b * py + dbar, axis=1)
        g17 = jnp.sum(raw_bar * E, axis=1)
        z = jnp.zeros_like(g0)
        return jnp.stack([g0, g1, g2, g3, g4, g5, g6, g7, g8, g9, g10,
                          z, z, z, z, z, z, g17], axis=-1)

    return alpha_out, depth, vjp


def _chunk_step(st, feats, px, py):
    """Blend one depth-sorted chunk of Gaussians into the tile state.

    st:    [NSTATE, PIX] state rows (see ROW_*).
    feats: [CHUNK, NFEAT] per-Gaussian features.
    px/py: [1, PIX] pixel centers.

    Pure function of its inputs; identical math to ops/blend.py
    (pixel_responses + blend_chunk), differentiable w.r.t. st and feats.
    """
    f = lambda i: feats[:, i:i + 1]                     # [G,1]
    T_in = st[ROW_T:ROW_T + 1]                          # [1,P]
    done = st[ROW_DONE:ROW_DONE + 1]
    d1_in = st[ROW_D1:ROW_D1 + 1]
    d2_in = st[ROW_D2:ROW_D2 + 1]

    alpha, depth = _resp(feats, px, py)                 # [G,P]

    # --- front-to-back compositing as a prefix product ---
    om = 1.0 - alpha
    Tb = T_in * _shift_down(_incl_cumprod0(om), 1, 1.0)  # T before each g
    Ta = Tb * om
    rows = jax.lax.broadcasted_iota(jnp.int32, alpha.shape, 0)
    trig = (alpha > 0.0) & (Ta < T_CUTOFF)
    first = jnp.min(jnp.where(trig, rows, alpha.shape[0]), axis=0,
                    keepdims=True)
    include = (rows < first) & (done < 0.5)
    w = jnp.where(include, alpha * Tb, 0.0)

    csum = lambda x: jnp.sum(x, axis=0, keepdims=True)
    # normal+color accumulation as ONE [6,G]@[G,P] MXU contraction
    # (the per-Gaussian columns are constant along P; depth/distortion
    # accumulators vary per pixel and stay on the VPU)
    nc_acc = jax.lax.dot_general(
        feats[:, 11:17], w, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [6, P]
    normal = [st[i:i + 1] + nc_acc[i - ROW_NORMAL.start:
                                   i - ROW_NORMAL.start + 1]
              for i in range(ROW_NORMAL.start, ROW_NORMAL.stop)]
    color = [st[i:i + 1] + nc_acc[3 + i - ROW_COLOR.start:
                                  4 + i - ROW_COLOR.start]
             for i in range(ROW_COLOR.start, ROW_COLOR.stop)]
    depth_acc = st[ROW_DEPTH:ROW_DEPTH + 1] + csum(w * depth)

    # --- depth distortion (forward.cu:408-428) ---
    safe_d = jnp.where(depth != 0.0, depth, 1.0)
    m = (FAR_PLANE * depth - FAR_PLANE * NEAR_PLANE) / (
        (FAR_PLANE - NEAR_PLANE) * safe_d)
    wm = w * m
    wmm = wm * m
    dist1_b = d1_in + _ex_cumsum0(wm)
    dist2_b = d2_in + _ex_cumsum0(wmm)
    err = m * m * (1.0 - Tb) + dist2_b - 2.0 * m * dist1_b
    distortion = st[ROW_DISTORTION:ROW_DISTORTION + 1] + csum(err * w)

    # --- median depth: last blended Gaussian with pre-blend T > 0.5 ---
    cond = include & (alpha > 0.0) & (Tb > 0.5)
    has = jnp.max(cond.astype(jnp.float32), axis=0, keepdims=True)
    last = jnp.max(jnp.where(cond, rows, -1), axis=0, keepdims=True)
    onehot = (rows == last).astype(jnp.float32)
    md = csum(depth * onehot)
    mw = csum(w * onehot)
    med_d = has * md + (1.0 - has) * st[ROW_MED_D:ROW_MED_D + 1]
    med_w = has * mw + (1.0 - has) * st[ROW_MED_W:ROW_MED_W + 1]

    # T after the chunk = Ta at the last included row (include is the
    # prefix rows < first, and om=1 for alpha-0 rows) — read it off the
    # already-computed Ta instead of a second full prefix product
    live = done < 0.5
    T_last = csum(jnp.where(rows == first - 1, Ta, 0.0))
    T_new = jnp.where((first > 0) & live, T_last, T_in)
    any_trig = jnp.max(trig.astype(jnp.float32), axis=0, keepdims=True)
    done_new = jnp.maximum(done, any_trig)

    return jnp.concatenate(
        [T_new, done_new,
         d1_in + csum(wm), d2_in + csum(wmm),
         color[0], color[1], color[2], depth_acc,
         normal[0], normal[1], normal[2], distortion,
         med_d, med_w, st[14:NSTATE]], axis=0)


def _chunk_bwd(saved, feats, px, py, gst):
    """Hand-derived VJP of ``_chunk_step`` w.r.t. (carry state, feats).

    saved: [NCARRY, PIX] pre-chunk carry rows (T, done, dist1, dist2);
    gst:   [NSTATE, PIX] cotangent of the chunk's OUTPUT state.
    Returns (gst_prev [NSTATE, PIX], gfeats [G, NFEAT]).

    Replaces the in-kernel ``jax.vjp(_chunk_step)`` (which re-runs the
    whole forward then transposes every scan) with the suffix-sum
    formulation of the CUDA back-to-front walk (backward.cu:142-449):
    compositing cotangents reduce to three suffix sums over the chunk
    (for the distortion dist1/dist2 coupling and the cumprod
    transmittance), and the ray-splat response adjoint is the
    hand-written chain in ``_resp_manual_vjp``.  Parity with
    jax.vjp(_chunk_step) is pinned by
    tests/test_pallas_blend.py::test_chunk_bwd_matches_autodiff.
    """
    G = feats.shape[0]
    T_in = saved[ROW_T:ROW_T + 1]
    done = saved[ROW_DONE:ROW_DONE + 1]
    d1_in = saved[ROW_D1:ROW_D1 + 1]
    d2_in = saved[ROW_D2:ROW_D2 + 1]

    alpha, depth, resp_vjp = _resp_manual_vjp(feats, px, py)

    # --- recompute the compositing forward (residuals) ---
    om = 1.0 - alpha
    ecp = _shift_down(_incl_cumprod0(om), 1, 1.0)       # exclusive cumprod
    Tb = T_in * ecp
    Ta = Tb * om
    rows = jax.lax.broadcasted_iota(jnp.int32, alpha.shape, 0)
    trig = (alpha > 0.0) & (Ta < T_CUTOFF)
    first = jnp.min(jnp.where(trig, rows, G), axis=0, keepdims=True)
    live = done < 0.5
    include = (rows < first) & live
    w = jnp.where(include, alpha * Tb, 0.0)

    safe_d = jnp.where(depth != 0.0, depth, 1.0)
    C = FAR_PLANE - NEAR_PLANE
    m = (FAR_PLANE * depth - FAR_PLANE * NEAR_PLANE) / (C * safe_d)
    wm = w * m
    wmm = wm * m
    tot = lambda x: jnp.sum(x, axis=0, keepdims=True)
    cs_wm = _incl_cumsum0(wm)
    cs_wmm = _incl_cumsum0(wmm)
    d1b = d1_in + (cs_wm - wm)                          # exclusive prefixes
    d2b = d2_in + (cs_wmm - wmm)
    err = m * m * (1.0 - Tb) + d2b - 2.0 * m * d1b

    cond = include & (alpha > 0.0) & (Tb > 0.5)
    has = jnp.max(cond.astype(jnp.float32), axis=0, keepdims=True)
    last = jnp.max(jnp.where(cond, rows, -1), axis=0, keepdims=True)
    oh = (rows == last).astype(jnp.float32)

    # --- output cotangent rows ---
    gT = gst[ROW_T:ROW_T + 1]
    gd1o = gst[ROW_D1:ROW_D1 + 1]
    gd2o = gst[ROW_D2:ROW_D2 + 1]
    gcol = gst[ROW_COLOR]                               # [3,P]
    gda = gst[ROW_DEPTH:ROW_DEPTH + 1]
    gnorm = gst[ROW_NORMAL]                             # [3,P]
    gD = gst[ROW_DISTORTION:ROW_DISTORTION + 1]
    gmd = gst[ROW_MED_D:ROW_MED_D + 1]
    gmw = gst[ROW_MED_W:ROW_MED_W + 1]

    # --- w / m / depth cotangents ---
    # suffix sums over h>g: the wm_g / wmm_g terms inside later Gaussians'
    # dist1_b/dist2_b (backward.cu keeps the same running sums reversed)
    S1 = gd1o - 2.0 * gD * (tot(wm) - cs_wm)            # d(L)/d(wm_g)
    S2 = gd2o + gD * (tot(w) - _incl_cumsum0(w))        # d(L)/d(wmm_g)
    ncvals = feats[:, 11:17]                            # [G,6] normal+color
    gnc = jnp.concatenate([gnorm, gcol], axis=0)        # [6,P]
    wbar = (jax.lax.dot(ncvals, gnc,
                        preferred_element_type=jnp.float32)
            + gda * depth + gD * err + m * S1 + m * m * S2 + gmw * oh)
    mbar = (w * S1 + 2.0 * wm * S2
            + gD * w * (2.0 * m * (1.0 - Tb) - 2.0 * d1b))
    dm_dd = jnp.where(depth != 0.0,
                      FAR_PLANE * NEAR_PLANE / (C * safe_d * safe_d),
                      FAR_PLANE / C)
    dbar = gda * w + mbar * dm_dd + gmd * oh

    # --- transmittance / alpha cotangents ---
    is_tl = ((rows == first - 1) & live).astype(jnp.float32)
    Tbbar = (jnp.where(include, wbar * alpha, 0.0)
             - gD * w * (m * m) + gT * is_tl * om)
    abar = jnp.where(include, wbar * Tb, 0.0) - gT * is_tl * Tb
    TbT = Tbbar * Tb
    abar = abar - (tot(TbT) - _incl_cumsum0(TbT)) / om  # om >= 1-ALPHA_CLIP

    # --- feature gradients ---
    gfeats = resp_vjp(abar, dbar)
    gnc_feat = jax.lax.dot(w, gnc.T,
                           preferred_element_type=jnp.float32)  # [G,6]
    gfeats = gfeats + jnp.pad(gnc_feat, ((0, 0), (11, NFEAT - 17)))

    # --- carry-state cotangents ---
    condT = ((first > 0) & live).astype(jnp.float32)
    gT_in = tot(Tbbar * ecp) + gT * (1.0 - condT)
    gd1_in = gd1o - 2.0 * gD * tot(wm)
    gd2_in = gd2o + gD * tot(w)
    gst_prev = jnp.concatenate(
        [gT_in, jnp.zeros_like(gT_in), gd1_in, gd2_in,
         gcol, gda, gnorm, gD,
         gmd * (1.0 - has), gmw * (1.0 - has), gst[14:]], axis=0)
    return gst_prev, gfeats


def _tile_pix(t, gx):
    """Pixel-center coords of tile t's 256 pixels, as [1, PIX] each."""
    tx = t % gx
    ty = t // gx
    col = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
    px = (tx * TILE).astype(jnp.float32) + (col % TILE).astype(jnp.float32)
    py = (ty * TILE).astype(jnp.float32) + (col // TILE).astype(jnp.float32)
    return px + 0.5, py + 0.5


def _fwd_kernel(counts_ref, gdata_ref, out_ref, carry_ref, st_ref, *,
                gx, n_chunks):
    t = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        st_ref[:] = jnp.concatenate(
            [jnp.ones((1, PIX), jnp.float32),
             jnp.zeros((NSTATE - 1, PIX), jnp.float32)], axis=0)

    # save the pre-chunk carry rows for the backward re-walk
    carry_ref[0, 0] = st_ref[0:NCARRY]

    count = counts_ref[t]
    all_done = jnp.all(st_ref[ROW_DONE:ROW_DONE + 1] > 0.5)
    active = jnp.logical_and(c * CHUNK < count, jnp.logical_not(all_done))

    @pl.when(active)
    def _():
        px, py = _tile_pix(t, gx)
        st_ref[:] = _chunk_step(st_ref[:], gdata_ref[0], px, py)

    @pl.when(c == n_chunks - 1)
    def _():
        out_ref[0] = st_ref[:]


def _bwd_kernel(counts_ref, gdata_ref, carries_ref, gout_ref, dg_ref,
                gst_ref, *, gx, n_chunks):
    t = pl.program_id(0)
    ci = pl.program_id(1)                  # reversed: chunk = n_chunks-1-ci
    c = n_chunks - 1 - ci

    @pl.when(ci == 0)
    def _():
        g0 = gout_ref[0]
        # done row is non-differentiable bookkeeping; dist1/dist2 finals are
        # never consumed downstream -> zero their cotangents defensively
        rows = jax.lax.broadcasted_iota(jnp.int32, (NSTATE, PIX), 0)
        dead = ((rows == ROW_DONE) | (rows == ROW_D1) | (rows == ROW_D2)
                | (rows >= 14))
        gst_ref[:] = jnp.where(dead, 0.0, g0)

    count = counts_ref[t]
    saved = carries_ref[0, 0]                            # [NCARRY, PIX]
    all_done = jnp.all(saved[ROW_DONE:ROW_DONE + 1] > 0.5)
    active = jnp.logical_and(c * CHUNK < count, jnp.logical_not(all_done))

    @pl.when(active)
    def _():
        px, py = _tile_pix(t, gx)
        g_st, g_feats = _chunk_bwd(saved, gdata_ref[0], px, py, gst_ref[:])
        gst_ref[:] = g_st
        dg_ref[0] = g_feats

    @pl.when(jnp.logical_not(active))
    def _():
        dg_ref[0] = jnp.zeros((CHUNK, NFEAT), jnp.float32)


def _is_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


@functools.lru_cache(maxsize=None)
def _fwd_call(num_tiles: int, gx: int, n_chunks: int, interpret: bool):
    kern = functools.partial(_fwd_kernel, gx=gx, n_chunks=n_chunks)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,                 # counts [T] in SMEM
        grid=(num_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec((1, CHUNK, NFEAT), lambda t, c, *_: (t, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, NSTATE, PIX), lambda t, c, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NCARRY, PIX), lambda t, c, *_: (t, c, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((NSTATE, PIX), jnp.float32)],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((num_tiles, NSTATE, PIX), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, n_chunks, NCARRY, PIX),
                                 jnp.float32),
        ),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _bwd_call(num_tiles: int, gx: int, n_chunks: int, interpret: bool):
    kern = functools.partial(_bwd_kernel, gx=gx, n_chunks=n_chunks)
    rev = lambda ci: n_chunks - 1 - ci
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec((1, CHUNK, NFEAT),
                         lambda t, ci, *_: (t, rev(ci), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NCARRY, PIX),
                         lambda t, ci, *_: (t, rev(ci), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NSTATE, PIX), lambda t, ci, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, CHUNK, NFEAT),
                               lambda t, ci, *_: (t, rev(ci), 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((NSTATE, PIX), jnp.float32)],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (num_tiles, n_chunks * CHUNK, NFEAT), jnp.float32),
        interpret=interpret,
    )


# ======================================================================
# Work-queue variant: one grid step per ACTUAL chunk of binned pairs.
#
# The (tile, chunk) grid above streams tile_cap/CHUNK blocks for every
# tile, even near-empty ones, and needs a dense [T, tile_cap, NFEAT]
# gather (~184 MB at 800x800) whose autodiff transpose is a giant
# scatter-add.  The CUDA rasterizer only ever touches the ~num_pairs
# sorted records (rasterizer_impl.cu:196-342).  This variant restores
# that economics on TPU:
#
#   * pairs are gathered into a compact, chunk-aligned [W*CHUNK, NFEAT]
#     buffer (W = ceil(count_t/CHUNK) summed over tiles, statically
#     capped by cfg.pair_cap),
#   * a 1-D grid walks work items; scalar-prefetched work->tile /
#     first / last maps drive the BlockSpec index_maps,
#   * the OUTPUT block doubles as the tile accumulator: consecutive
#     work items of one tile map to the same out block, so Mosaic keeps
#     it resident in VMEM (revisiting) and copies it back once per tile,
#   * the backward walks the queue in reverse, re-materializing chunk
#     pre-state from the saved NCARRY carry rows exactly like the
#     (tile, chunk) kernel, emitting per-pair gradients into the same
#     compact layout; the cross-tile reduction is the (now ~4x smaller)
#     scatter-add transpose of the compact gather.
# ======================================================================


def _window_gather_i32(arr: jnp.ndarray, base: jnp.ndarray, width: int):
    """``arr[base[w] + j] for j < width`` — contiguous-window gather.

    A direct [W, width] gather from a 1-column int32 array runs at
    ~10 ns/ELEMENT on TPU (measured 6.5 ms for 700k elements — XLA row
    gathers pay per row and these rows are 4 bytes).  Windows are
    contiguous, so instead gather 8-element BLOCKS (8x fewer rows) and
    realign each window with 8 static-shift selects (pure VPU work).
    Out-of-range rows are clipped; callers mask invalid lanes."""
    W = base.shape[0]
    nblk = width // 8 + 1                       # covers width + 7 offset
    a = jnp.concatenate([arr, jnp.zeros((8,), arr.dtype)])
    a = a[: (a.shape[0] // 8) * 8]
    blocks = a.reshape(-1, 8)
    b0 = base // 8
    rows = b0[:, None] + jnp.arange(nblk, dtype=jnp.int32)[None, :]
    win = blocks[jnp.clip(rows, 0, blocks.shape[0] - 1)]
    win = win.reshape(W, nblk * 8)              # [W, width + 8]
    r = (base % 8)[:, None]
    out = jax.lax.slice_in_dim(win, 0, width, axis=1)
    for s in range(1, 8):
        out = jnp.where(r == s,
                        jax.lax.slice_in_dim(win, s, s + width, axis=1),
                        out)
    return out


def build_work_queue(feats: jnp.ndarray, binning, num_tiles: int,
                     cfg: RasterConfig):
    """Compact chunk-aligned pair gather + work-item maps.

    Returns (gdata [W, chunk, NFEAT], work_tile [W] i32 (num_tiles =
    padding), first [W] i32, last [W] i32, overflow scalar i32).
    Differentiable in `feats`; the gather transpose is the segment-sum
    of per-pair gradients (CUDA atomicAdd analogue).
    """
    ch = cfg.chunk
    w_cap = cfg.pair_cap // ch
    n_pairs = binning.pair_rank.shape[0]
    counts = jnp.minimum(binning.tile_count, cfg.tile_cap).astype(jnp.int32)
    nch = (counts + ch - 1) // ch                             # [T]
    work_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nch, dtype=jnp.int32)])
    total_work = work_start[-1]
    # overflow counts DROPPED PAIRS from BOTH static caps: per-tile
    # truncation (tile_cap, deepest pairs of the busiest tiles) and the
    # global queue cap (pair_cap, deepest tiles' chunks).  Either drop
    # was previously partly silent — exactly the truncation class that
    # starved training when a cap was undersized (trainers log it,
    # bench asserts it zero).
    tile_trunc = jnp.sum(jnp.maximum(binning.tile_count - cfg.tile_cap, 0))
    overflow = tile_trunc + jnp.maximum(total_work - w_cap, 0) * ch

    w = jnp.arange(w_cap, dtype=jnp.int32)
    wt = jnp.clip(jnp.searchsorted(work_start, w, side="right") - 1,
                  0, num_tiles - 1).astype(jnp.int32)         # [W]
    wc = w - work_start[wt]                                   # chunk-in-tile
    pad = w >= total_work
    first = ((wc == 0) & ~pad).astype(jnp.int32)
    # `last` marks each tile's FINAL IN-CAP work item: the backward's
    # reverse walk seeds its VMEM gradient scratch at last==1, so when
    # total_work > w_cap the truncated tile's last flag must be clamped
    # into the cap (otherwise the scratch is read uninitialized and the
    # tile's pair gradients are garbage).  end = min(tile end, cap).
    end = jnp.minimum(work_start[wt + 1], w_cap)
    last = ((w == end - 1) & ~pad).astype(jnp.int32)
    work_tile = jnp.where(pad, num_tiles, wt).astype(jnp.int32)

    base = binning.tile_start[wt] + wc * ch                   # [W]
    ok = (jnp.arange(ch, dtype=jnp.int32)[None, :]
          < (counts[wt] - wc * ch)[:, None]) & ~pad[:, None]
    # Gather features via depth ranks: pre-sort the [N] feature rows once
    # (cheap), then index with the compact pair ranks — never gather at
    # [B]-pair granularity from the unsorted side (see Binning layout
    # note).  The rank lookup itself rides the contiguous-window trick
    # (_window_gather_i32); invalid lanes all hit row 0 so pad work
    # items add no real gather row traffic.  Barriers keep each gather
    # a standalone kernel on XLA's fast gather path.
    ranks = _window_gather_i32(
        jnp.clip(binning.pair_rank, 0, None), base, ch)
    ranks = jnp.where(ok, ranks, 0)
    feats_sorted = jax.lax.optimization_barrier(feats[binning.order])
    g = jax.lax.optimization_barrier(feats_sorted[ranks])    # [W,CHUNK,NFEAT]
    g = jnp.where(ok[..., None], g, 0.0)
    return g, work_tile, first, last, overflow


def _wq_slots(work_tile, num_tiles: int, w_cap: int):
    """Block-slot maps that make PAD work items free: pads re-read the
    last real gdata block (consecutive equal indices -> Mosaic revisits
    the resident block, no DMA) and write carries/grads to a single trash
    slot (index w_cap).  work_tile == num_tiles marks pads (the builders'
    convention)."""
    pad = work_tile == num_tiles
    total = jnp.sum((~pad).astype(jnp.int32))
    w = jnp.arange(work_tile.shape[0], dtype=jnp.int32)
    rslot = jnp.where(pad, jnp.maximum(total - 1, 0), w)
    wslot = jnp.where(pad, w_cap, w)
    return rslot.astype(jnp.int32), wslot.astype(jnp.int32)


def _fwd_wq_kernel(tile_ref, gtile_ref, first_ref, last_ref, rslot_ref,
                   wslot_ref, gdata_ref, out_ref, carry_ref, *, gx,
                   num_tiles):
    # tile_ref: OUTPUT-slot tile index (local slab index when sharded);
    # gtile_ref: tile index in the GLOBAL pixel grid (pixel coords).
    # Single-chip passes the same array twice.
    w = pl.program_id(0)

    @pl.when(first_ref[w] == 1)
    def _():
        out_ref[0] = jnp.concatenate(
            [jnp.ones((1, PIX), jnp.float32),
             jnp.zeros((NSTATE - 1, PIX), jnp.float32)], axis=0)

    # pre-chunk carry rows for the backward re-walk
    carry_ref[0] = out_ref[0, 0:NCARRY]

    t = tile_ref[w]
    all_done = jnp.all(out_ref[0, ROW_DONE:ROW_DONE + 1] > 0.5)
    active = jnp.logical_and(t < num_tiles, jnp.logical_not(all_done))

    @pl.when(active)
    def _():
        px, py = _tile_pix(gtile_ref[w], gx)
        out_ref[0] = _chunk_step(out_ref[0], gdata_ref[0], px, py)


def _bwd_wq_kernel(tile_ref, gtile_ref, first_ref, last_ref, rslot_ref,
                   wslot_ref, gdata_ref, carries_ref, gout_ref, dg_ref,
                   gst_ref, *, gx, num_tiles, w_cap):
    i = pl.program_id(0)
    w = w_cap - 1 - i

    @pl.when(last_ref[w] == 1)
    def _():
        g0 = gout_ref[0]
        rows = jax.lax.broadcasted_iota(jnp.int32, (NSTATE, PIX), 0)
        dead = ((rows == ROW_DONE) | (rows == ROW_D1) | (rows == ROW_D2)
                | (rows >= 14))
        gst_ref[:] = jnp.where(dead, 0.0, g0)

    t = tile_ref[w]
    saved = carries_ref[0]                                    # [NCARRY, PIX]
    all_done = jnp.all(saved[ROW_DONE:ROW_DONE + 1] > 0.5)
    active = jnp.logical_and(t < num_tiles, jnp.logical_not(all_done))

    @pl.when(active)
    def _():
        px, py = _tile_pix(gtile_ref[w], gx)
        g_st, g_feats = _chunk_bwd(saved, gdata_ref[0], px, py, gst_ref[:])
        gst_ref[:] = g_st
        dg_ref[0] = g_feats

    @pl.when(jnp.logical_not(active))
    def _():
        dg_ref[0] = jnp.zeros(dg_ref.shape[1:], jnp.float32)


@functools.lru_cache(maxsize=None)
def _fwd_wq_call(num_tiles: int, gx: int, w_cap: int, chunk: int,
                 interpret: bool):
    kern = functools.partial(_fwd_wq_kernel, gx=gx, num_tiles=num_tiles)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        # work_tile, gtile, first, last, rslot, wslot in SMEM
        num_scalar_prefetch=6,
        grid=(w_cap,),
        in_specs=[
            pl.BlockSpec((1, chunk, NFEAT),
                         lambda w, t, g, f, l, rs, ws: (rs[w], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, NSTATE, PIX),
                         lambda w, tile_ref, *_: (tile_ref[w], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NCARRY, PIX),
                         lambda w, t, g, f, l, rs, ws: (ws[w], 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((num_tiles + 1, NSTATE, PIX), jnp.float32),
            jax.ShapeDtypeStruct((w_cap + 1, NCARRY, PIX), jnp.float32),
        ),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _bwd_wq_call(num_tiles: int, gx: int, w_cap: int, chunk: int,
                 interpret: bool):
    kern = functools.partial(_bwd_wq_kernel, gx=gx, num_tiles=num_tiles,
                             w_cap=w_cap)
    rev = lambda i: w_cap - 1 - i
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(w_cap,),
        in_specs=[
            pl.BlockSpec((1, chunk, NFEAT),
                         lambda i, t, g, f, l, rs, ws: (rs[rev(i)], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NCARRY, PIX),
                         lambda i, t, g, f, l, rs, ws: (ws[rev(i)], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NSTATE, PIX),
                         lambda i, tile_ref, *_: (tile_ref[rev(i)], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chunk, NFEAT),
                               lambda i, t, g, f, l, rs, ws:
                               (ws[rev(i)], 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((NSTATE, PIX), jnp.float32)],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((w_cap + 1, chunk, NFEAT),
                                       jnp.float32),
        interpret=interpret,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def blend_tiles_wq(gdata, work_tile, gtile, first, last, num_tiles: int,
                   gx: int, w_cap: int):
    """Work-queue blend: compact [W, chunk, NFEAT] pair features ->
    [num_tiles, NSTATE, PIX] blended state rows (empty tiles = init
    state).  work_tile indexes the OUTPUT slab (local tile id when the
    grid is sharded across devices); gtile gives each work item's tile
    in the GLOBAL pixel grid — pass work_tile for both on one chip."""
    rslot, wslot = _wq_slots(work_tile, num_tiles, w_cap)
    out, _ = _fwd_wq_call(num_tiles, gx, w_cap, gdata.shape[1],
                          not _is_tpu())(work_tile, gtile, first, last,
                                         rslot, wslot, gdata)
    return _fix_empty_tiles(out[:num_tiles], work_tile, first, num_tiles)


def _fix_empty_tiles(out, work_tile, first, num_tiles):
    """Tiles with no work items never get written: substitute the init
    state (T=1, all accumulators 0)."""
    has = jnp.zeros((num_tiles + 1,), jnp.bool_).at[work_tile].set(
        True, mode="drop")[:num_tiles]
    init = jnp.concatenate(
        [jnp.ones((1,), jnp.float32), jnp.zeros((NSTATE - 1,), jnp.float32)])
    return jnp.where(has[:, None, None], out, init[None, :, None])


def _blend_wq_fwd(gdata, work_tile, gtile, first, last, num_tiles, gx,
                  w_cap):
    rslot, wslot = _wq_slots(work_tile, num_tiles, w_cap)
    out, carries = _fwd_wq_call(num_tiles, gx, w_cap, gdata.shape[1],
                                not _is_tpu())(
        work_tile, gtile, first, last, rslot, wslot, gdata)
    fixed = _fix_empty_tiles(out[:num_tiles], work_tile, first, num_tiles)
    return fixed, (gdata, work_tile, gtile, first, last, rslot, wslot,
                   carries)


def _blend_wq_bwd(num_tiles, gx, w_cap, res, g_out):
    gdata, work_tile, gtile, first, last, rslot, wslot, carries = res
    g_pad = jnp.concatenate(
        [g_out, jnp.zeros((1,) + g_out.shape[1:], g_out.dtype)], axis=0)
    dg = _bwd_wq_call(num_tiles, gx, w_cap, gdata.shape[1],
                      not _is_tpu())(
        work_tile, gtile, first, last, rslot, wslot, gdata, carries, g_pad)
    # row w_cap is the pads' trash slot; rows >= total_work within the cap
    # are never written but are masked to zero by the gdata gather's
    # where-VJP downstream
    return (dg[:w_cap], None, None, None, None)


blend_tiles_wq.defvjp(_blend_wq_fwd, _blend_wq_bwd)


def build_gdata(feats: jnp.ndarray, binning, num_tiles: int,
                cfg: RasterConfig):
    """Gather per-pair features into the dense [T, cap, NFEAT] tensor.

    feats: [N, NFEAT] per-Gaussian rows. Differentiable: the gather's
    autodiff transpose is the cross-tile scatter-add of pair gradients
    (the TPU replacement for CUDA atomicAdd accumulation).
    """
    cap = cfg.tile_cap
    n_pairs = binning.pair_rank.shape[0]
    offs = binning.tile_start[:, None] + jnp.arange(cap, dtype=jnp.int32)
    in_range = jnp.arange(cap, dtype=jnp.int32)[None, :] < \
        binning.tile_count[:, None]
    offs = jnp.clip(offs, 0, n_pairs - 1)
    feats_sorted = jax.lax.optimization_barrier(feats[binning.order])
    g = feats_sorted[binning.pair_rank[offs]]           # [T, cap, NFEAT]
    g = jnp.where(in_range[..., None], g, 0.0)
    counts = jnp.minimum(binning.tile_count, cap).astype(jnp.int32)
    return g, counts


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def blend_tiles_pallas(gdata, counts, num_tiles: int, gx: int,
                       n_chunks: int):
    """[T, cap, NFEAT] pair features -> [T, NSTATE, PIX] blended state rows."""
    out, _ = _fwd_call(num_tiles, gx, n_chunks, not _is_tpu())(counts, gdata)
    return out


def _blend_fwd(gdata, counts, num_tiles, gx, n_chunks):
    out, carries = _fwd_call(num_tiles, gx, n_chunks,
                             not _is_tpu())(counts, gdata)
    return out, (gdata, counts, carries)


def _blend_bwd(num_tiles, gx, n_chunks, res, g_out):
    gdata, counts, carries = res
    dg = _bwd_call(num_tiles, gx, n_chunks, not _is_tpu())(
        counts, gdata, carries, g_out)
    return (dg, None)


blend_tiles_pallas.defvjp(_blend_fwd, _blend_bwd)
