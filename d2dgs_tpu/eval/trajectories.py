"""Camera trajectory generation + trajectory rendering modes.

Covers the reference's offline tooling beyond plain test-set rendering:
* render.py:92-170 — `time_interpolate` (fixed view, sweep t) and
  spiral/orbit novel-view modes;
* utils/render_utils.py:203-268 — ellipse path generation + video export
  (mp4 there; PNG sequence + animated GIF here, no ffmpeg in this image);
* render_mesh_trajectory.py — per-frame mesh extraction along an orbit.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data.cameras import Camera, orbit_camera
from ..render.renderer import render


def ellipse_path(n_frames: int, radius: float, elevation: float,
                 fov: float, H: int, W: int,
                 target=(0.0, 0.0, 0.0), z_variation: float = 0.0,
                 times=None) -> list[Camera]:
    """Orbit/ellipse of cameras around `target` (render_utils ellipse
    paths).  `times`: None -> all t=0; "sweep" -> t ramps 0..1; array ->
    per-frame timestamps."""
    cams = []
    for i in range(n_frames):
        az = 2.0 * np.pi * i / n_frames
        el = elevation + z_variation * np.sin(2.0 * np.pi * i / n_frames)
        if times is None:
            t = 0.0
        elif isinstance(times, str) and times == "sweep":
            t = i / max(n_frames - 1, 1)
        else:
            t = float(np.asarray(times)[i])
        cams.append(orbit_camera(az, el, radius, fov, H, W, time=t,
                                 target=target))
    return cams


def time_sweep_cameras(cam: Camera, n_frames: int) -> list[Camera]:
    """Fixed viewpoint, t in [0,1] — render.py's `time_interpolate`."""
    import dataclasses
    return [dataclasses.replace(cam, time=jnp.float32(
        i / max(n_frames - 1, 1))) for i in range(n_frames)]


def render_trajectory(cams, gauss, nodes, node_cfg, raster_cfg,
                      out_dir: str | None = None, bg=None,
                      save_video: bool = True,
                      video_name: str = "video.gif",
                      fps: int = 20, deform_cfg=None) -> list[np.ndarray]:
    """Render a list of cameras (all same HxW) with the deformation field
    applied at each camera's time.  Saves frame PNGs and an animated GIF
    (the reference writes mp4 via imageio-ffmpeg, absent here)."""
    if bg is None:
        bg = jnp.zeros((3,), jnp.float32)
    if deform_cfg is None:
        from ..models.deform import DeformConfig
        deform_cfg = DeformConfig(deform_type="node", node=node_cfg)

    @jax.jit
    def render_view(cam):
        from ..models.deform import deform_gaussians
        d = deform_gaussians(nodes, deform_cfg, gauss.xyz, cam.time,
                             feature=gauss.feature,
                             motion_mask=gauss.motion_mask)
        out = render(cam, gauss, bg, d_xyz=d["d_xyz"],
                     d_rotation=d["d_rotation"], d_scaling=d["d_scaling"],
                     cfg=raster_cfg)
        return out.image

    frames = []
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    for i, cam in enumerate(cams):
        img = np.clip(np.asarray(render_view(cam)), 0.0, 1.0)
        frames.append(img)
        if out_dir:
            from PIL import Image
            Image.fromarray((img * 255).astype(np.uint8)).save(
                os.path.join(out_dir, f"{i:05d}.png"))
    if out_dir and save_video and frames:
        save_gif(os.path.join(out_dir, video_name), frames, fps=fps)
    return frames


def save_gif(path: str, frames, fps: int = 20) -> None:
    from PIL import Image
    ims = [Image.fromarray((np.clip(f, 0, 1) * 255).astype(np.uint8))
           for f in frames]
    ims[0].save(path, save_all=True, append_images=ims[1:],
                duration=max(int(1000 / fps), 20), loop=0)


def render_mesh_trajectory(cams, train_cams, gauss, nodes, node_cfg,
                           raster_cfg, out_dir: str, alpha_masks=None,
                           voxel: float = 0.008, keep_clusters: int = 1,
                           bg=None):
    """Per-trajectory-frame mesh extraction + re-render
    (render_mesh_trajectory.py): for each trajectory camera, fuse a mesh
    at that camera's time from the training views, then render it with the
    mesh rasterizer from the trajectory viewpoint."""
    from ..mesh.extract import reconstruct_mesh
    from ..mesh.render import mesh_shape_render, render_mesh
    from ..mesh.tsdf import save_mesh_ply
    os.makedirs(out_dir, exist_ok=True)
    shape_frames, image_frames = [], []
    for i, cam in enumerate(cams):
        verts, faces, colors = reconstruct_mesh(
            train_cams, gauss, nodes, node_cfg, raster_cfg,
            mesh_time=float(cam.time), bg=bg, alpha_masks=alpha_masks,
            voxel=voxel, keep_clusters=keep_clusters, return_colors=True)
        save_mesh_ply(os.path.join(out_dir, f"mesh_{i:04d}.ply"),
                      verts, faces, colors=colors)
        if faces.shape[0] == 0:
            continue
        img, _, _ = render_mesh(cam, verts, faces, colors)
        shp, _, _ = mesh_shape_render(cam, verts, faces)
        image_frames.append(np.asarray(img))
        shape_frames.append(np.asarray(shp))
        from PIL import Image
        for sub, arr in (("mesh_image", img), ("mesh_shape", shp)):
            d = os.path.join(out_dir, sub)
            os.makedirs(d, exist_ok=True)
            Image.fromarray((np.clip(np.asarray(arr), 0, 1) * 255).astype(
                np.uint8)).save(os.path.join(d, f"{i:04d}.png"))
    if image_frames:
        save_gif(os.path.join(out_dir, "mesh_image.gif"), image_frames)
        save_gif(os.path.join(out_dir, "mesh_shape.gif"), shape_frames)
    return image_frames, shape_frames
