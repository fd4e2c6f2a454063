"""Procedural test scenes: random Gaussian clouds and an animated blob.

Used by unit tests and the benchmark harness (no dataset download needed).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .cameras import Camera, orbit_camera


def random_gaussians(key, n: int, extent: float = 1.0, scale_range=(0.02, 0.12),
                     opacity_range=(0.3, 1.0)):
    ks = jax.random.split(key, 5)
    means = jax.random.uniform(ks[0], (n, 3), minval=-extent, maxval=extent)
    scales = jax.random.uniform(ks[1], (n, 2), minval=scale_range[0],
                                maxval=scale_range[1])
    quats = jax.random.normal(ks[2], (n, 4))
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    opac = jax.random.uniform(ks[3], (n,), minval=opacity_range[0],
                              maxval=opacity_range[1])
    colors = jax.random.uniform(ks[4], (n, 3))
    return means, scales, quats, opac, colors


def test_camera(H: int = 64, W: int = 64, radius: float = 4.0,
                azimuth: float = 0.3, elevation: float = 0.2,
                time: float = 0.0) -> Camera:
    return orbit_camera(azimuth, elevation, radius, fov=0.8, H=H, W=W,
                        time=time)


def animated_scene(key, n: int = 24, amp: float = 0.35):
    """A compact cluster of Gaussians with a smooth, rigid-ish motion field:
    at time t, points rotate about the y axis and bob vertically.
    Returns (static_params, motion_fn(t) -> xyz[t])."""
    ks = jax.random.split(key, 5)
    means = jax.random.uniform(ks[0], (n, 3), minval=-0.5, maxval=0.5)
    scales = jax.random.uniform(ks[1], (n, 2), minval=0.08, maxval=0.18)
    quats = jax.random.normal(ks[2], (n, 4))
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    opac = jax.random.uniform(ks[3], (n,), minval=0.6, maxval=0.95)
    colors = jax.random.uniform(ks[4], (n, 3), minval=0.1, maxval=0.9)

    def motion(t):
        # linear-in-t rigid motion: NONZERO at every sampled timestamp
        # (a sin(2*pi*t) phase is zero at t=0/0.5/1 — exactly the grid a
        # small n_times dataset samples, making the scene silently static)
        ang = amp * (2.0 * t - 1.0)
        c, s = jnp.cos(ang), jnp.sin(ang)
        R = jnp.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        dy = 0.25 * (2.0 * t - 1.0)
        return means @ R.T + jnp.array([0.0, 1.0, 0.0]) * dy

    return (means, scales, quats, opac, colors), motion


def make_video_dataset(key, n_cams: int = 8, n_times: int = 4,
                       H: int = 64, W: int = 64, n_gauss: int = 24):
    """Render a ground-truth multi-view video with the dense renderer.
    Returns (cameras, images, init_points, init_colors)."""
    from ..ops.dense_raster import rasterize_dense
    (means, scales, quats, opac, colors), motion = animated_scene(
        key, n=n_gauss)
    cams, imgs = [], []
    k = key
    rng = np.random.RandomState(0)
    for i in range(n_cams * n_times):
        t = (i % n_times) / max(n_times - 1, 1)
        az = 2 * np.pi * (i // n_times) / n_cams + 0.05 * rng.randn()
        cam = orbit_camera(az, 0.3, 4.0, fov=0.9, H=H, W=W, time=t)
        xyz_t = motion(jnp.float32(t))
        img, _, _, _ = rasterize_dense(xyz_t, scales, quats, opac, colors,
                                       cam, jnp.zeros(3))
        cams.append(cam)
        imgs.append(np.asarray(img))
    k1, k2 = jax.random.split(key)
    init_pts = np.asarray(jax.random.uniform(k1, (256, 3), minval=-1.0,
                                             maxval=1.0))
    init_cols = np.asarray(jax.random.uniform(k2, (256, 3)))
    return cams, imgs, init_pts, init_cols


def single_facing_gaussian(cam: Camera, depth: float = 4.0,
                           scale: float = 0.3, opacity: float = 0.8):
    """One surfel centred on the optical axis, facing the camera."""
    c2w = np.linalg.inv(np.asarray(cam.w2c))
    center = c2w[:3, 3] + depth * c2w[:3, 2]
    # orient the surfel normal along the camera z axis: rotation whose third
    # column is the view direction
    z = c2w[:3, 2]
    x = np.cross([0.0, 1.0, 0.0], z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z], axis=1)
    # rotation matrix -> quaternion (wxyz)
    w = np.sqrt(max(0.0, 1 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
    q = np.array([w,
                  (R[2, 1] - R[1, 2]) / (4 * w),
                  (R[0, 2] - R[2, 0]) / (4 * w),
                  (R[1, 0] - R[0, 1]) / (4 * w)])
    return (jnp.asarray(center[None], jnp.float32),
            jnp.asarray([[scale, scale]], jnp.float32),
            jnp.asarray(q[None], jnp.float32),
            jnp.asarray([opacity], jnp.float32),
            jnp.asarray([[0.2, 0.5, 0.9]], jnp.float32))
