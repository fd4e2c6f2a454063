"""Mesh-image metric driver (reference metrics_mesh.py:1-75) + chamfer
distance against ground-truth meshes.

The reference batch-evaluates PSNR/SSIM/LPIPS between a directory of
mesh re-renders (`mesh_image/`) and the gt test images; mesh geometry
evaluation (chamfer) is deferred to the DG-Mesh repo.  Both live here:

* `mesh_image_metrics(renders_dir, gt_dir, ...)` — directory-driven
  PSNR/SSIM/MS-SSIM(/LPIPS substitute) with the reference's zero-padded
  name matching, written to `<name>_results.json`.
* `chamfer_distance(a, b)` — symmetric point-set chamfer via the exact
  KNN op (DG-Mesh's CD metric for gt OBJ meshes, read via mesh/obj.py).
"""
from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from ..ops.knn import knn
from .metrics import evaluate_image_metrics


def _load_image(path: str) -> np.ndarray:
    from PIL import Image
    img = np.asarray(Image.open(path), np.float32) / 255.0
    return img[..., :3] if img.ndim == 3 else np.repeat(
        img[..., None], 3, axis=-1)


def mesh_image_metrics(renders_dir: str, gt_dir: str,
                       out_dir: str | None = None,
                       name: str = "mesh_render",
                       lpips_weights: str | None = None) -> dict:
    """Pairs render files with gt files by zero-padded stem
    (metrics_mesh.py readImages:14-30), evaluates image metrics, writes
    `<out_dir>/<name>_results.json`, returns the mean dict."""
    per_view = []
    for fname in sorted(os.listdir(renders_dir)):
        stem = fname.split(".")[0]
        if len(stem) > 5 or not stem.isdigit():
            continue
        gt_name = stem.zfill(5) + ".png"
        gt_path = os.path.join(gt_dir, gt_name)
        if not os.path.exists(gt_path):
            continue
        render = _load_image(os.path.join(renders_dir, fname))
        gt = _load_image(gt_path)
        m = evaluate_image_metrics(jnp.asarray(render), jnp.asarray(gt),
                                   lpips_weights)
        m["view"] = stem
        per_view.append(m)
    if not per_view:
        raise FileNotFoundError(
            f"no matching render/gt pairs in {renders_dir} vs {gt_dir}")
    keys = [k for k in per_view[0] if k != "view"]
    mean = {k: float(np.mean([v[k] for v in per_view])) for k in keys}
    result = {"mean": mean, "per_view": per_view}
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, f"{name}_results.json"), "w") as f:
            json.dump(result, f, indent=2)
    return mean


def sample_mesh_surface(verts: np.ndarray, faces: np.ndarray, n: int,
                        seed: int = 0) -> np.ndarray:
    """Uniform area-weighted surface samples [n,3] (for chamfer)."""
    rng = np.random.RandomState(seed)
    v = verts[faces]                                   # [F,3,3]
    area = 0.5 * np.linalg.norm(
        np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]), axis=-1)
    p = area / max(area.sum(), 1e-12)
    fi = rng.choice(faces.shape[0], n, p=p)
    r1, r2 = rng.rand(n, 1), rng.rand(n, 1)
    s = np.sqrt(r1)
    bary = np.concatenate([1 - s, s * (1 - r2), s * r2], axis=-1)
    return np.einsum("nk,nkd->nd", bary, v[fi]).astype(np.float32)


def chamfer_distance(a: np.ndarray, b: np.ndarray) -> float:
    """Symmetric mean chamfer distance between two point sets [*,3]."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    d_ab, _ = knn(a, b, 1)
    d_ba, _ = knn(b, a, 1)
    return float(jnp.mean(jnp.sqrt(jnp.maximum(d_ab, 0.0)))
                 + jnp.mean(jnp.sqrt(jnp.maximum(d_ba, 0.0))))


def mesh_chamfer(verts_pred, faces_pred, verts_gt, faces_gt,
                 n_samples: int = 30_000, seed: int = 0) -> float:
    """Chamfer between two meshes via surface sampling (DG-Mesh eval)."""
    pa = sample_mesh_surface(np.asarray(verts_pred),
                             np.asarray(faces_pred), n_samples, seed)
    pb = sample_mesh_surface(np.asarray(verts_gt),
                             np.asarray(faces_gt), n_samples, seed + 1)
    return chamfer_distance(pa, pb)
