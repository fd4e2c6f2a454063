"""Camera pytree.

The equivalent of the reference's scene/cameras.py Camera nn.Module, but as
an immutable jit-friendly pytree: geometry fields are array leaves, image
dimensions are static metadata (XLA shapes depend on them).
"""
from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import graphics


@partial(jax.tree_util.register_dataclass,
         data_fields=["w2c", "cam_center", "fx", "fy", "time"],
         meta_fields=["H", "W"])
@dataclasses.dataclass(frozen=True)
class Camera:
    """Pinhole camera. w2c maps world -> camera (x_cam = R x + t), row-major.

    Principal point is fixed at (W/2, H/2) like the reference rasterizer
    (forward.cu:208: intrins = {fx, fy, W/2, H/2}).
    """
    w2c: jnp.ndarray          # [4,4] float32
    cam_center: jnp.ndarray   # [3] camera position in world space
    fx: jnp.ndarray           # scalar focal in pixels
    fy: jnp.ndarray
    time: jnp.ndarray         # scalar normalized timestamp in [0,1]
    H: int
    W: int

    @property
    def cx(self):
        return self.W / 2.0

    @property
    def cy(self):
        return self.H / 2.0

    @property
    def K(self) -> jnp.ndarray:
        z = jnp.zeros((), jnp.float32)
        o = jnp.ones((), jnp.float32)
        return jnp.stack([
            jnp.stack([self.fx, z, jnp.full((), self.cx, jnp.float32)]),
            jnp.stack([z, self.fy, jnp.full((), self.cy, jnp.float32)]),
            jnp.stack([z, z, o]),
        ])

    @property
    def tan_fovx(self):
        return self.W / (2.0 * self.fx)

    @property
    def tan_fovy(self):
        return self.H / (2.0 * self.fy)


def make_camera(R: np.ndarray, t: np.ndarray, fovx: float, fovy: float,
                H: int, W: int, time: float = 0.0,
                translate=None, scale: float = 1.0) -> Camera:
    """Build a Camera from reference-style (R, T, FoV) camera infos."""
    w2c = graphics.get_world2view(R, t, translate=translate, scale=scale)
    c2w = np.linalg.inv(w2c)
    return Camera(
        w2c=jnp.asarray(w2c, jnp.float32),
        cam_center=jnp.asarray(c2w[:3, 3], jnp.float32),
        fx=jnp.float32(graphics.fov2focal(fovx, W)),
        fy=jnp.float32(graphics.fov2focal(fovy, H)),
        time=jnp.float32(time),
        H=int(H), W=int(W),
    )


def orbit_camera(azimuth: float, elevation: float, radius: float,
                 fov: float, H: int, W: int, time: float = 0.0,
                 target=(0.0, 0.0, 0.0)) -> Camera:
    """Simple look-at orbit camera for tests and trajectory rendering."""
    target = np.asarray(target, np.float64)
    ce, se = math.cos(elevation), math.sin(elevation)
    ca, sa = math.cos(azimuth), math.sin(azimuth)
    eye = target + radius * np.array([ce * sa, se, ce * ca])
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    # camera axes: x=right, y=down (image y grows down), z=forward
    R_w2c = np.stack([right, down, fwd], axis=0)
    t = -R_w2c @ eye
    # make_camera expects R = c2w rotation (it transposes internally)
    return make_camera(R_w2c.T, t, fov, fov, H, W, time=time)
