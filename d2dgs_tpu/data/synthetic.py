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
