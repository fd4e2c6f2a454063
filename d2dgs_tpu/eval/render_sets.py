"""Test-set rendering + metrics — the render.py:render_set equivalent
(render.py:33-90): render every camera of a split at its timestamp,
save rgb/depth images, aggregate PSNR/SSIM/MS-SSIM(/LPIPS) into a dict
(metrics.py:92-95 writes results.json).
"""
from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..models.deform import deform_gaussians
from ..render.renderer import render
from .metrics import evaluate_image_metrics


def _save_png(path, img):
    from PIL import Image
    arr = np.clip(np.asarray(img) * 255.0, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def render_test_set(samples, gauss, nodes, node_cfg, raster_cfg,
                    out_dir: str | None = None, bg=None,
                    lpips_weights: str | None = None,
                    save_images: bool = True,
                    deform_cfg=None, return_images: int = 0) -> dict:
    """samples: list of data.dnerf.CameraSample (or (camera, gt) pairs).
    deform_cfg: optional models.deform.DeformConfig — defaults to the
    node warp over `node_cfg`.  Returns {"per_view": [...], "mean": {...}};
    with return_images=k the first k views' (render, gt) uint8 arrays are
    returned under "images" for training-time reporting (train.py:54-142).
    """
    if bg is None:
        bg = jnp.zeros((3,), jnp.float32)
    if deform_cfg is None:
        from ..models.deform import DeformConfig
        deform_cfg = DeformConfig(deform_type="node", node=node_cfg)

    @jax.jit
    def render_view(cam):
        d = deform_gaussians(nodes, deform_cfg, gauss.xyz, cam.time,
                             feature=gauss.feature,
                             motion_mask=gauss.motion_mask)
        out = render(cam, gauss, bg, d_xyz=d["d_xyz"],
                     d_rotation=d["d_rotation"], d_scaling=d["d_scaling"],
                     cfg=raster_cfg)
        return out.image, out.depth

    if out_dir and save_images:
        os.makedirs(os.path.join(out_dir, "renders"), exist_ok=True)
        os.makedirs(os.path.join(out_dir, "depth"), exist_ok=True)
        os.makedirs(os.path.join(out_dir, "gt"), exist_ok=True)

    per_view = []
    images = []
    for i, s in enumerate(samples):
        if hasattr(s, "camera"):
            cam, gt = s.camera, jnp.asarray(s.gt(np.asarray(bg)))
        else:
            cam, gt = s[0], jnp.asarray(s[1])
        img, depth = render_view(cam)
        m = evaluate_image_metrics(img, gt, lpips_weights)
        m["view"] = i
        per_view.append(m)
        if i < return_images:
            to8 = lambda a: np.clip(np.asarray(a) * 255.0, 0,
                                    255).astype(np.uint8)
            images.append((to8(img), to8(gt)))
        if out_dir and save_images:
            _save_png(os.path.join(out_dir, "renders", f"{i:05d}.png"), img)
            _save_png(os.path.join(out_dir, "gt", f"{i:05d}.png"), gt)
            dmax = float(jnp.max(depth)) or 1.0
            _save_png(os.path.join(out_dir, "depth", f"{i:05d}.png"),
                      jnp.broadcast_to(depth / dmax, depth.shape[:2] + (3,)))

    keys = [k for k in per_view[0] if k != "view"]
    mean = {k: float(np.mean([v[k] for v in per_view])) for k in keys}
    result = {"per_view": per_view, "mean": mean}
    if return_images:
        result["images"] = images
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "results.json"), "w") as f:
            json.dump(result, f, indent=2)
    return result
