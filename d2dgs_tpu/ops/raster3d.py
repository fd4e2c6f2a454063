"""Alternate 3DGS (3-D covariance, EWA conic) rasterizer.

TPU-native re-derivation of the reference's bundled diff-gaussian-
rasterization extension (submodules/diff-gaussian-rasterization/
cuda_rasterizer/forward.cu: computeCov3D:118-155, computeCov2D:74-113,
preprocessCUDA:159-252, renderCUDA conic blending) returning the 4-tuple
(color, radii, depth, alpha) that render_flow consumes
(gaussian_renderer/__init__.py:317-322).  Reuses the surfel pipeline's
static-shape tile binning; the backward pass is XLA autodiff of the same
chunked scan (scatter-adds replace the CUDA atomics).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import (ALPHA_CLIP, ALPHA_CUTOFF, NEAR_PLANE, T_CUTOFF, TILE,
                      RasterConfig)
from ..data.cameras import Camera
from .binning import bin_gaussians
from .projection import Preprocessed, tile_grid
from .tiled_raster import _tile_pixels, tiles_to_image
from ..utils.quaternion import quat_to_rotmat


class Prep3D(NamedTuple):
    conic: jnp.ndarray     # [N,3] inverse 2D covariance (a, b, c)
    center: jnp.ndarray    # [N,2] pixel-space mean
    depth: jnp.ndarray     # [N] view z
    radius: jnp.ndarray    # [N] int32
    valid: jnp.ndarray     # [N] bool
    rect_min: jnp.ndarray  # [N,2] int32 tile coords
    rect_max: jnp.ndarray  # [N,2]


def compute_cov3d(scales: jnp.ndarray, quats: jnp.ndarray,
                  scale_modifier: float = 1.0) -> jnp.ndarray:
    """World covariance Sigma = R diag(s^2) R^T, upper triangle [N,6]
    (computeCov3D, forward.cu:118-155). scales may be [N,2] (surfel);
    a near-zero third axis is padded — the 2D low-pass keeps the
    projected footprint non-degenerate."""
    if scales.shape[-1] == 2:
        scales = jnp.concatenate(
            [scales, jnp.full_like(scales[:, :1], 1e-6)], axis=-1)
    s = scales * scale_modifier
    R = quat_to_rotmat(quats)                                  # [N,3,3]
    M = R * s[:, None, :]
    sigma = jnp.einsum("nik,njk->nij", M, M)
    return jnp.stack([sigma[:, 0, 0], sigma[:, 0, 1], sigma[:, 0, 2],
                      sigma[:, 1, 1], sigma[:, 1, 2], sigma[:, 2, 2]],
                     axis=-1)


def preprocess3d(means3d: jnp.ndarray, scales: jnp.ndarray,
                 quats: jnp.ndarray, cam: Camera,
                 scale_modifier: float = 1.0,
                 cov3d_precomp: jnp.ndarray | None = None) -> Prep3D:
    Rw = cam.w2c[:3, :3]
    tw = cam.w2c[:3, 3]
    t = means3d @ Rw.T + tw
    in_front = t[:, 2] > NEAR_PLANE

    # pixel-space mean: fx*x/z + cx - 0.5 == ndc2Pix of the projected
    # point (forward.cu:233, auxiliary.h ndc2Pix)
    tz = jnp.where(t[:, 2] == 0, 1e-6, t[:, 2])
    center = jnp.stack([cam.fx * t[:, 0] / tz + cam.W / 2.0 - 0.5,
                        cam.fy * t[:, 1] / tz + cam.H / 2.0 - 0.5],
                       axis=-1)

    # EWA: clamp the Jacobian linearization point to 1.3x the frustum
    # (computeCov2D, forward.cu:82-88)
    limx, limy = 1.3 * cam.tan_fovx, 1.3 * cam.tan_fovy
    txz = jnp.clip(t[:, 0] / tz, -limx, limx) * tz
    tyz = jnp.clip(t[:, 1] / tz, -limy, limy) * tz

    if cov3d_precomp is None:
        cov3d = compute_cov3d(scales, quats, scale_modifier)
    else:
        cov3d = cov3d_precomp
    c = cov3d
    Vrk = jnp.stack([
        jnp.stack([c[:, 0], c[:, 1], c[:, 2]], -1),
        jnp.stack([c[:, 1], c[:, 3], c[:, 4]], -1),
        jnp.stack([c[:, 2], c[:, 4], c[:, 5]], -1)], -2)  # [N,3,3]

    z2 = tz * tz
    zero = jnp.zeros_like(tz)
    J = jnp.stack([
        jnp.stack([cam.fx / tz, zero, -cam.fx * txz / z2], -1),
        jnp.stack([zero, cam.fy / tz, -cam.fy * tyz / z2], -1)], -2)
    JW = jnp.einsum("nij,jk->nik", J, Rw,
                    precision=jax.lax.Precision.HIGHEST)      # [N,2,3]
    cov2d = jnp.einsum("nij,njk,nlk->nil", JW, Vrk, JW,
                       precision=jax.lax.Precision.HIGHEST)   # [N,2,2]
    # low-pass: every splat at least ~1px (forward.cu:109-111)
    cxx = cov2d[:, 0, 0] + 0.3
    cxy = cov2d[:, 0, 1]
    cyy = cov2d[:, 1, 1] + 0.3

    det = cxx * cyy - cxy * cxy
    nondeg = det != 0.0
    det_safe = jnp.where(nondeg, det, 1.0)
    conic = jnp.stack([cyy / det_safe, -cxy / det_safe, cxx / det_safe],
                      axis=-1)

    mid = 0.5 * (cxx + cyy)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(mid + disc, mid - disc)))

    gx, gy = tile_grid(cam.H, cam.W)
    cx_p, cy_p = center[:, 0], center[:, 1]
    rmin_x = jnp.clip(((cx_p - radius_f) / TILE).astype(jnp.int32), 0, gx)
    rmin_y = jnp.clip(((cy_p - radius_f) / TILE).astype(jnp.int32), 0, gy)
    rmax_x = jnp.clip(
        ((cx_p + radius_f + TILE - 1) / TILE).astype(jnp.int32), 0, gx)
    rmax_y = jnp.clip(
        ((cy_p + radius_f + TILE - 1) / TILE).astype(jnp.int32), 0, gy)
    area = (rmax_x - rmin_x) * (rmax_y - rmin_y)

    valid = in_front & nondeg & (area > 0)
    radius = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)
    return Prep3D(conic=conic, center=center, depth=t[:, 2],
                  radius=radius, valid=valid,
                  rect_min=jnp.stack([rmin_x, rmin_y], -1),
                  rect_max=jnp.stack([rmax_x, rmax_y], -1))


def _as_surfel_prep(p: Prep3D) -> Preprocessed:
    """Adapter so bin_gaussians (ops/binning.py) can bin 3DGS splats."""
    n = p.depth.shape[0]
    dummy = jnp.zeros((n, 3, 3))
    return Preprocessed(T=dummy, normal=dummy[:, 0], depth=p.depth,
                        center=p.center, extent=p.center, radius=p.radius,
                        valid=p.valid, rect_min=p.rect_min,
                        rect_max=p.rect_max)


def rasterize_3dgs(means3d, scales, quats, opacities, colors, cam: Camera,
                   bg=None, scale_modifier: float = 1.0,
                   cov3d_precomp=None, cfg: RasterConfig = RasterConfig()):
    """Full 3DGS pipeline. colors: [N,C] precomputed (render_flow passes
    uvz flow). Returns (image [H,W,C], radii [N], depth [H,W,1],
    alpha [H,W,1]) — the 4-tuple of the reference's 3DGS binding
    (diff-gaussian-rasterization rasterize_points.cu:68-70,118)."""
    H, W = cam.H, cam.W
    C = colors.shape[-1]
    gx, gy = tile_grid(H, W)
    if bg is None:
        bg = jnp.zeros((C,), jnp.float32)
    prep = preprocess3d(means3d, scales, quats, cam, scale_modifier,
                        cov3d_precomp)
    opac = jnp.where(prep.valid, opacities.reshape(-1), 0.0)
    # circle cull with the exact conic visibility bound (sigma_max =
    # radius/3, exact since radius = ceil(3*sqrt(lambda_max))) and the
    # corner-sample rect convention of this blend (pixels at integer
    # coords, see `pix` below) — output-invariant, so the dense oracle
    # needs no matching cull (test_raster3d).
    binning = bin_gaussians(_as_surfel_prep(prep), gx, gy, cfg,
                            opacity=opac,
                            cull_sigma=prep.radius.astype(jnp.float32) / 3.0,
                            pixel_offset=0.0)

    num_tiles = gx * gy
    P = TILE * TILE
    pix = _tile_pixels(gx, gy) - 0.5  # 3DGS measures from pixel corners
    n_chunks = max(cfg.tile_cap // cfg.chunk, 1)
    B_pairs = binning.pair_rank.shape[0]
    # hoist the id resolution out of the scan (pair_gid is a computed
    # property; evaluating it per chunk would re-gather the whole list)
    pair_gid = binning.pair_gid

    state0 = (jnp.ones((num_tiles, P)),          # transmittance
              jnp.zeros((num_tiles, P, C)),      # color accumulator
              jnp.zeros((num_tiles, P)))         # expected depth

    @jax.checkpoint
    def chunk_step(state, ci):
        T_acc, C_acc, D_acc = state
        base = binning.tile_start + ci * cfg.chunk
        offs = base[:, None] + jnp.arange(cfg.chunk, dtype=jnp.int32)[None]
        in_range = offs < (binning.tile_start + binning.tile_count)[:, None]
        offs = jnp.clip(offs, 0, B_pairs - 1)
        ids = pair_gid[offs]                               # [T,chunk]
        ok = in_range & binning.pair_valid[offs]

        g_con = prep.conic[ids]                            # [T,chunk,3]
        g_cen = prep.center[ids]
        g_col = colors[ids]                                # [T,chunk,C]
        g_d = prep.depth[ids]
        g_op = jnp.where(ok, opac[ids], 0.0)

        d = pix[:, None, :, :] - g_cen[:, :, None, :]      # [T,chunk,P,2]
        power = (-0.5 * (g_con[..., 0:1] * d[..., 0] ** 2
                         + g_con[..., 2:3] * d[..., 1] ** 2)
                 - g_con[..., 1:2] * d[..., 0] * d[..., 1])
        alpha = jnp.minimum(ALPHA_CLIP,
                            g_op[..., None] * jnp.exp(power))
        alpha = jnp.where((power <= 0.0) & (alpha >= ALPHA_CUTOFF),
                          alpha, 0.0)                      # [T,chunk,P]

        def scan_g(carry, inp):
            T_c, C_c, D_c = carry
            a, col, dz = inp
            live = T_c > T_CUTOFF
            w = jnp.where(live, a * T_c, 0.0)
            return (T_c * (1.0 - jnp.where(live, a, 0.0)),
                    C_c + w[..., None] * col[:, None, :],
                    D_c + w * dz[:, None]), None

        (T_acc, C_acc, D_acc), _ = jax.lax.scan(
            scan_g, (T_acc, C_acc, D_acc),
            (alpha.transpose(1, 0, 2), g_col.transpose(1, 0, 2),
             g_d.transpose(1, 0)))
        return (T_acc, C_acc, D_acc), None

    (T_acc, C_acc, D_acc), _ = jax.lax.scan(
        chunk_step, state0, jnp.arange(n_chunks, dtype=jnp.int32))

    tile_color = C_acc + T_acc[..., None] * bg[None, None, :]
    image = tiles_to_image(tile_color, gx, gy, H, W)
    depth = tiles_to_image(D_acc[..., None], gx, gy, H, W)
    alpha_img = tiles_to_image(1.0 - T_acc[..., None], gx, gy, H, W)
    return image, prep.radius, depth, alpha_img
