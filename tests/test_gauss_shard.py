"""Gaussian-sharded + tile-sharded rendering with the all_to_all binning
exchange must match the single-device tiled renderer (forward + grads)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from d2dgs_tpu.config import RasterConfig
from d2dgs_tpu.data.cameras import orbit_camera
from d2dgs_tpu.ops.tiled_raster import rasterize_tiled, tiles_to_image
from d2dgs_tpu.parallel.gauss_shard import (AXIS, pad_to_multiple,
                                            render_gauss_sharded)

CFG = RasterConfig(tile_cap=256, chunk=64, use_pallas=False)


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(7)
    n = 64
    ks = jax.random.split(key, 5)
    means = jax.random.normal(ks[0], (n, 3)) * 0.6
    scales = jnp.exp(jax.random.normal(ks[1], (n, 2)) * 0.3) * 0.1
    quats = jax.random.normal(ks[2], (n, 4))
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    opac = jax.random.uniform(ks[3], (n,), minval=0.3, maxval=0.9)
    colors = jax.random.uniform(ks[4], (n, 3))
    alive = jnp.arange(n) < n - 4   # a few dead slots
    cam = orbit_camera(0.4, 0.2, 4.0, fov=0.8, H=48, W=48)
    mesh = Mesh(np.array(jax.devices()), (AXIS,))
    return mesh, cam, means, scales, quats, opac, colors, alive


def _single_device(cam, means, scales, quats, opac, colors, alive, bg):
    img, allmap, radii, prep, _ = rasterize_tiled(
        means, scales, quats, jnp.where(alive, opac, 0.0), colors, cam,
        bg=bg, cfg=CFG)
    return img, allmap


def test_forward_parity(setup):
    mesh, cam, means, scales, quats, opac, colors, alive = setup
    bg = jnp.array([0.2, 0.1, 0.4])
    ref_img, ref_allmap = _single_device(cam, means, scales, quats, opac,
                                         colors, alive, bg)
    out = jax.jit(lambda *a: render_gauss_sharded(mesh, cam, *a, bg=bg,
                                                  cfg=CFG))(
        means, scales, quats, opac, colors, alive)
    assert int(out.overflow) == 0
    np.testing.assert_allclose(np.asarray(out.image), np.asarray(ref_img),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(out.allmap),
                               np.asarray(ref_allmap), atol=3e-4)


def test_gradient_parity(setup):
    mesh, cam, means, scales, quats, opac, colors, alive = setup
    bg = jnp.zeros(3)
    gt = jnp.ones((cam.H, cam.W, 3)) * 0.5

    def loss_sharded(m, o):
        out = render_gauss_sharded(mesh, cam, m, scales, quats, o, colors,
                                   alive, bg=bg, cfg=CFG)
        return jnp.mean((out.image - gt) ** 2)

    def loss_single(m, o):
        img, _ = _single_device(cam, m, scales, quats, o, colors, alive,
                                bg)
        return jnp.mean((img - gt) ** 2)

    g_sh = jax.jit(jax.grad(loss_sharded, argnums=(0, 1)))(means, opac)
    g_si = jax.jit(jax.grad(loss_single, argnums=(0, 1)))(means, opac)
    for a, b in zip(g_sh, g_si):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-3)


def test_overflow_reported(setup):
    mesh, cam, means, scales, quats, opac, colors, alive = setup
    out = jax.jit(lambda *a: render_gauss_sharded(
        mesh, cam, *a, bg=jnp.zeros(3), cfg=CFG, exchange_cap=2))(
        means, scales, quats, opac, colors, alive)
    assert int(out.overflow) > 0  # tiny cap must be detected, not silent


def test_pad_to_multiple():
    a = np.ones((10, 3))
    p = pad_to_multiple(a, 8)
    assert p.shape == (16, 3) and p[10:].sum() == 0
