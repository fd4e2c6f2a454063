"""Per-Gaussian preprocessing: surfel->screen transform, AABB, culling.

Vectorized jnp re-derivation of the reference preprocess kernel
(diff-surfel-rasterization cuda_rasterizer/forward.cu:73-260):

* ``T = K [s_x W R_0 | s_y W R_1 | p_view]`` — the 3x3 homogeneous mapping
  from splat tangent-plane (u, v, 1) to screen (x z, y z, z), 2DGS Eq. 5-7.
* AABB center/extent extracted from T (forward.cu:133-163).
* Frustum cull at z <= 0.2, backface/degenerate cull, dual-visible normal
  sign flip (forward.cu:100-109).

Everything is a pure function of arrays -> arrays with a validity mask
instead of thread early-exits, so it vmaps/shards/differentiates cleanly.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import FILTER_SIZE, NEAR_PLANE, TILE, TRUNCATED_R
from ..data.cameras import Camera
from ..utils.quaternion import quat_to_rotmat


class Preprocessed(NamedTuple):
    T: jnp.ndarray        # [N, 3, 3] rows (Tu, Tv, Tw)
    normal: jnp.ndarray   # [N, 3] camera-frame splat normal (sign-flipped)
    depth: jnp.ndarray    # [N] view-space z
    center: jnp.ndarray   # [N, 2] screen-space AABB center (low-pass mean)
    extent: jnp.ndarray   # [N, 2] AABB half-extent (1 sigma)
    radius: jnp.ndarray   # [N] int32 screen radius in pixels (0 if culled)
    valid: jnp.ndarray    # [N] bool
    rect_min: jnp.ndarray  # [N, 2] int32 tile coords (x, y), inclusive
    rect_max: jnp.ndarray  # [N, 2] int32 tile coords, exclusive


def tile_grid(H: int, W: int) -> tuple[int, int]:
    return (-(-W // TILE), -(-H // TILE))  # (tiles_x, tiles_y)


def preprocess(means3d: jnp.ndarray, scales: jnp.ndarray, quats: jnp.ndarray,
               cam: Camera, scale_modifier: float = 1.0) -> Preprocessed:
    """means3d [N,3], scales [N,2] (linear, post-activation), quats [N,4]."""
    n = means3d.shape[0]
    Rw = cam.w2c[:3, :3]
    tw = cam.w2c[:3, 3]
    p_view = means3d @ Rw.T + tw                       # [N,3]
    in_front = p_view[:, 2] > NEAR_PLANE

    # geometry einsums pinned to f32: at default (bf16 MXU) precision the
    # splat->screen transforms wobble enough to flip median-depth /
    # termination branch selections downstream
    hi = jax.lax.Precision.HIGHEST
    R = quat_to_rotmat(quats)                          # [N,3,3]
    WR = jnp.einsum("ij,njk->nik", Rw, R, precision=hi)
    s = scales * scale_modifier
    M0 = WR[:, :, 0] * s[:, 0:1]                       # [N,3] tangent axis u
    M1 = WR[:, :, 1] * s[:, 1:2]                       # tangent axis v
    tn = WR[:, :, 2]                                   # unit normal

    cosang = -jnp.sum(tn * p_view, axis=-1)
    # DUAL_VISIABLE flip (forward.cu:104-109); cos==0 backface cull
    tn = jnp.where(cosang[:, None] > 0, tn, -tn)
    not_edge_on = cosang != 0.0

    # splat-to-screen homogeneous transform: rows (Tu, Tv, Tw)
    Smat = jnp.stack([M0, M1, p_view], axis=-1)        # [N,3,3] columns
    T = jnp.einsum("ij,njk->nik", cam.K, Smat, precision=hi)
    Tu, Tv, Tw = T[:, 0, :], T[:, 1, :], T[:, 2, :]

    # AABB from T (forward.cu:133-163)
    f_sign = jnp.array([1.0, 1.0, -1.0], T.dtype)
    d = jnp.sum(f_sign * Tw * Tw, axis=-1)
    nondegenerate = d != 0.0
    d_safe = jnp.where(nondegenerate, d, 1.0)
    f = f_sign / d_safe[:, None]
    cx = jnp.sum(f * Tu * Tw, axis=-1)
    cy = jnp.sum(f * Tv * Tw, axis=-1)
    ex = jnp.sqrt(jnp.maximum(cx * cx - jnp.sum(f * Tu * Tu, axis=-1), 0.0))
    ey = jnp.sqrt(jnp.maximum(cy * cy - jnp.sum(f * Tv * Tv, axis=-1), 0.0))
    center = jnp.stack([cx, cy], axis=-1)
    extent = jnp.stack([ex, ey], axis=-1)

    radius_f = jnp.ceil(
        TRUNCATED_R * jnp.maximum(jnp.maximum(ex, ey), FILTER_SIZE))

    # tile rect (auxiliary.h getRect:64-74)
    gx, gy = tile_grid(cam.H, cam.W)
    rmin_x = jnp.clip(((cx - radius_f) / TILE).astype(jnp.int32), 0, gx)
    rmin_y = jnp.clip(((cy - radius_f) / TILE).astype(jnp.int32), 0, gy)
    rmax_x = jnp.clip(((cx + radius_f + TILE - 1) / TILE).astype(jnp.int32), 0, gx)
    rmax_y = jnp.clip(((cy + radius_f + TILE - 1) / TILE).astype(jnp.int32), 0, gy)
    area = (rmax_x - rmin_x) * (rmax_y - rmin_y)

    valid = in_front & not_edge_on & nondegenerate & (area > 0)
    radius = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)

    return Preprocessed(
        T=T, normal=tn, depth=p_view[:, 2], center=center, extent=extent,
        radius=radius, valid=valid,
        rect_min=jnp.stack([rmin_x, rmin_y], axis=-1),
        rect_max=jnp.stack([rmax_x, rmax_y], axis=-1),
    )
