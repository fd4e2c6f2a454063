"""High-level render() — the equivalent of the reference's
gaussian_renderer/__init__.py:41-219, as a pure function.

Assembles deformed Gaussian parameters, evaluates SH, rasterizes, and
post-processes the aux maps (world-frame normals, expected/median depth,
depth->pseudo-normal, mesh-export background masking).

Densification statistics: the CUDA backward overwrites the screenspace
gradient with an NDC-scaled T-gradient hack (backward.cu:645-648):
    dL_dmean2D.x = dL_dTu.z * Tw.z * (W/2)
We reproduce it exactly with a zero-valued probe parameter added to
(Tu.z, Tv.z) pre-scaled by stop_grad(Tw.z * W/2): the probe's autodiff
gradient equals the hack. Trainers differentiate w.r.t. ``screen_probe``.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import RasterConfig, TILE
from ..data.cameras import Camera
from ..models.gaussians import GaussianParams, apply_deform
from ..ops import blend as B
from ..ops.binning import bin_gaussians
from ..ops.projection import preprocess, tile_grid
from ..ops.tiled_raster import blend_tiles, tiles_to_image
from ..utils.sh import sh_to_rgb


class RenderOutput(NamedTuple):
    image: jnp.ndarray        # [H,W,3]
    alpha: jnp.ndarray        # [H,W,1]
    rend_normal: jnp.ndarray  # [H,W,3] world-frame alpha-weighted normal
    rend_dist: jnp.ndarray    # [H,W,1] distortion map
    depth: jnp.ndarray        # [H,W,1] surf depth (median by default)
    surf_normal: jnp.ndarray  # [H,W,3] pseudo-normal from depth
    radii: jnp.ndarray        # [N]
    visibility: jnp.ndarray   # [N] bool: radii > 0
    allmap: jnp.ndarray       # [H,W,8] raw aux channels
    num_pairs: jnp.ndarray    # scalar: binned pair count (load metric)
    overflow: jnp.ndarray     # scalar i32: work-queue chunks dropped
                              # (pair_cap exceeded) — should be 0
    clamped: jnp.ndarray      # scalar i32: binning emission slots dropped
                              # (emission_cap exceeded; coverage loss for
                              # the deepest splats if nonzero)


def depth_to_normal(cam: Camera, depth: jnp.ndarray):
    """Backproject depth and finite-difference a normal map
    (utils/point_utils.py:9-41). depth: [H,W]. Returns ([H,W,3], points)."""
    H, W = cam.H, cam.W
    c2w = jnp.linalg.inv(cam.w2c)
    ys, xs = jnp.mgrid[0:H, 0:W]
    # ray dirs through pixel corners (reference uses arange, i.e. corner grid)
    x = (xs - W / 2.0) / cam.fx
    y = (ys - H / 2.0) / cam.fy
    dirs_cam = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    dirs_world = dirs_cam @ c2w[:3, :3].T
    points = depth[..., None] * dirs_world + c2w[:3, 3]
    dx = points[2:, 1:-1] - points[:-2, 1:-1]
    dy = points[1:-1, 2:] - points[1:-1, :-2]
    n = jnp.cross(dx, dy)
    # eps inside the sqrt: background pixels have exactly-zero normals and
    # jnp.linalg.norm has a NaN gradient at 0
    n = n / jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True) + 1e-20)
    normal = jnp.zeros_like(points)
    normal = normal.at[1:-1, 1:-1].set(n)
    return normal, points


def postprocess_maps(cam: Camera, image: jnp.ndarray, allmap: jnp.ndarray,
                     bg: jnp.ndarray, depth_filtering: bool,
                     cfg: RasterConfig):
    """Aux-map post-processing (gaussian_renderer/__init__.py:160-207):
    world-frame normals, expected/median surf depth, depth->pseudo-normal,
    mesh-export background masking.  Shared by the single-chip renderer
    and the gauss-sharded renderer (parallel/gauss_shard.py)."""
    H, W = image.shape[0], image.shape[1]
    if depth_filtering:
        white = jnp.all(bg >= 0.95)
        mask_w = 1.0 - jnp.all(image >= 0.95, axis=-1).astype(jnp.float32)
        mask_b = 1.0 - jnp.all(image <= 0.05, axis=-1).astype(jnp.float32)
        mask = jnp.where(white, mask_w, mask_b)[..., None]
    else:
        mask = jnp.ones((H, W, 1), jnp.float32)

    alpha = allmap[..., 1:2]
    # rotate camera-frame normals to world: n_w = R_w2c^T n_c
    rend_normal = (allmap[..., 2:5] @ cam.w2c[:3, :3]) * mask
    depth_median = jnp.nan_to_num(allmap[..., 5:6], 0, 0)
    depth_expected = jnp.nan_to_num(allmap[..., 0:1] / jnp.where(
        alpha == 0, 1.0, alpha), 0, 0)
    rend_dist = allmap[..., 6:7] * mask
    surf_depth = (depth_expected * (1.0 - cfg.depth_ratio)
                  + cfg.depth_ratio * depth_median) * mask
    surf_normal, _ = depth_to_normal(cam, surf_depth[..., 0])
    surf_normal = surf_normal * jax.lax.stop_gradient(alpha) * mask
    return alpha, rend_normal, rend_dist, surf_depth, surf_normal


def render(cam: Camera, params: GaussianParams, bg: jnp.ndarray,
           d_xyz=0.0, d_rotation=0.0, d_scaling=0.0, d_opacity=None,
           d_color=None, scaling_modifier: float = 1.0,
           override_color: jnp.ndarray | None = None,
           screen_probe: jnp.ndarray | None = None,
           depth_filtering: bool = False,
           cfg: RasterConfig = RasterConfig()) -> RenderOutput:
    H, W = cam.H, cam.W
    gx, gy = tile_grid(H, W)

    means3d, scales, quats, opacity, sh = apply_deform(
        params, d_xyz, d_rotation, d_scaling, d_opacity, d_color)

    if override_color is not None:
        colors = override_color
    else:
        dirs = means3d - cam.cam_center[None, :]
        dirs = dirs / jnp.sqrt(
            jnp.sum(dirs * dirs, axis=-1, keepdims=True) + 1e-20)
        colors = sh_to_rgb(params.active_sh_degree, sh, dirs)

    prep = preprocess(means3d, scales, quats, cam, scaling_modifier)
    # dead capacity slots are culled outright (not merely transparent)
    valid = prep.valid & params.alive
    prep = prep._replace(valid=valid,
                         radius=jnp.where(valid, prep.radius, 0))
    Tmat = prep.T
    if screen_probe is not None:
        # NDC gradient hack (see module docstring)
        sx = jax.lax.stop_gradient(Tmat[:, 2, 2] * (W / 2.0))
        sy = jax.lax.stop_gradient(Tmat[:, 2, 2] * (H / 2.0))
        Tmat = Tmat.at[:, 0, 2].add(screen_probe[:, 0] * sx)
        Tmat = Tmat.at[:, 1, 2].add(screen_probe[:, 1] * sy)

    opac = jnp.where(prep.valid, opacity, 0.0)
    binning = bin_gaussians(prep, gx, gy, cfg, opacity=opac)
    tile_color, tile_allmap, overflow = blend_tiles(
        Tmat, prep.center, prep.normal, colors, opac,
        binning, gx, gy, cfg)
    Tfinal = 1.0 - tile_allmap[..., 1:2]
    tile_color = tile_color + Tfinal * bg[None, None, :]
    image = tiles_to_image(tile_color, gx, gy, H, W)
    allmap = tiles_to_image(tile_allmap, gx, gy, H, W)

    (alpha, rend_normal, rend_dist, surf_depth,
     surf_normal) = postprocess_maps(cam, image, allmap, bg,
                                     depth_filtering, cfg)

    return RenderOutput(
        image=image, alpha=alpha, rend_normal=rend_normal,
        rend_dist=rend_dist, depth=surf_depth, surf_normal=surf_normal,
        radii=prep.radius, visibility=prep.radius > 0, allmap=allmap,
        num_pairs=binning.num_pairs, overflow=overflow,
        clamped=binning.clamped)


def _full_proj_uvz(xyz: jnp.ndarray, cam: Camera,
                   znear: float = 0.01, zfar: float = 100.0):
    """Project to NDC uvz via the 3DGS full projection
    (render_flow, gaussian_renderer/__init__.py:259-266).  The
    projection matrix is built with traced ops (cam.fx/fy are traced
    leaves under jit): P[0,0] = 1/tan(fovx/2) = 2*fx/W."""
    z = jnp.zeros((), jnp.float32)
    row0 = jnp.stack([2.0 * cam.fx / cam.W, z, z, z])
    row1 = jnp.stack([z, 2.0 * cam.fy / cam.H, z, z])
    row2 = jnp.array([0.0, 0.0, zfar / (zfar - znear),
                      -(zfar * znear) / (zfar - znear)], jnp.float32)
    row3 = jnp.array([0.0, 0.0, 1.0, 0.0], jnp.float32)
    P = jnp.stack([row0, row1, row2, row3])
    full = P @ cam.w2c                                     # [4,4]
    h = jnp.concatenate([xyz, jnp.ones_like(xyz[:, :1])], -1) @ full.T
    return h[:, :3] / (h[:, 3:4] + 1e-7)


def render_flow(params: GaussianParams, cam1: Camera, cam2: Camera | None,
                d_xyz1, d_xyz2, d_rotation1=0.0, d_scaling1=0.0,
                scaling_modifier: float = 1.0,
                scale_const: float | None = None,
                cfg: RasterConfig = RasterConfig()) -> dict:
    """Optical-flow rendering (gaussian_renderer/__init__.py:222-337):
    the uvz displacement of each Gaussian between (t1, cam1) and
    (t2, cam2), splatted through the 3DGS rasterizer as its 'color'.
    Channel 2 carries the motion-mask (line 273).  Returns the
    reference's dict contract."""
    from ..ops.raster3d import rasterize_3dgs

    xyz_c = jax.lax.stop_gradient(params.xyz)
    uvz1 = _full_proj_uvz(xyz_c + d_xyz1, cam1)
    uvz2 = _full_proj_uvz(xyz_c + d_xyz2,
                          cam1 if cam2 is None else cam2)
    flow = uvz2 - uvz1
    flow = jnp.concatenate([flow[:, :2], params.motion_mask], axis=-1)

    means3d = params.xyz + d_xyz1
    if scale_const is not None:
        scales = jnp.full_like(params.get_scaling, scale_const)
    else:
        scales = params.get_scaling + d_scaling1
    from ..utils.quaternion import quat_normalize
    quats = quat_normalize(params.rotation + d_rotation1, eps=1e-12)
    opacity = jnp.where(params.alive, params.get_opacity[:, 0], 0.0)

    image, radii, depth, alpha = rasterize_3dgs(
        means3d, scales, quats, opacity, flow, cam1,
        scale_modifier=scaling_modifier, cfg=cfg)
    return dict(render=image, depth=depth, alpha=alpha, radii=radii,
                visibility_filter=radii > 0)
