"""Tiled (binned) renderer must match the dense ground truth exactly —
forward maps AND gradients (BASELINE config[1] parity criterion)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d2dgs_tpu.config import RasterConfig
from d2dgs_tpu.data import synthetic
from d2dgs_tpu.ops.dense_raster import rasterize_dense
from d2dgs_tpu.ops.tiled_raster import rasterize_tiled

CFG = RasterConfig(tile_cap=512, chunk=64)


@pytest.fixture(scope="module")
def scene():
    cam = synthetic.test_camera(H=64, W=48)  # non-square, tests tile crop
    key = jax.random.PRNGKey(7)
    return cam, synthetic.random_gaussians(key, 200)


def test_forward_parity(scene):
    cam, (means, scales, quats, opac, colors) = scene
    bg = jnp.array([0.1, 0.2, 0.3])
    d_img, d_map, d_radii, _ = rasterize_dense(
        means, scales, quats, opac, colors, cam, bg)
    t_img, t_map, t_radii, _, binning = rasterize_tiled(
        means, scales, quats, opac, colors, cam, bg, cfg=CFG)
    assert int(binning.clamped) == 0
    np.testing.assert_allclose(np.asarray(t_img), np.asarray(d_img),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(t_map), np.asarray(d_map),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(t_radii), np.asarray(d_radii))


def test_gradient_parity(scene):
    cam, (means, scales, quats, opac, colors) = scene
    bg = jnp.zeros(3)
    target = jnp.linspace(0, 1, cam.H * cam.W * 3).reshape(cam.H, cam.W, 3)

    def loss_dense(params):
        means, scales, quats, opac, colors = params
        img, amap, _, _ = rasterize_dense(
            means, scales, quats, opac, colors, cam, bg)
        return (jnp.mean((img - target) ** 2) + 0.01 * jnp.mean(amap[..., 6])
                + 0.01 * jnp.mean(amap[..., 0]))

    def loss_tiled(params):
        means, scales, quats, opac, colors = params
        img, amap, _, _, _ = rasterize_tiled(
            means, scales, quats, opac, colors, cam, bg, cfg=CFG)
        return (jnp.mean((img - target) ** 2) + 0.01 * jnp.mean(amap[..., 6])
                + 0.01 * jnp.mean(amap[..., 0]))

    params = (means, scales, quats, opac, colors)
    gd = jax.grad(loss_dense)(params)
    gt = jax.grad(loss_tiled)(params)
    for a, b, name in zip(gd, gt, ["means", "scales", "quats", "opac", "col"]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-5, rtol=5e-4, err_msg=name)


def test_tile_cap_overflow_drops_tail_only(scene):
    """With a tiny per-tile cap the nearest Gaussians must still render."""
    cam, (means, scales, quats, opac, colors) = scene
    img_full, amap_full, _, _, _ = rasterize_tiled(
        means, scales, quats, opac, colors, cam, cfg=CFG)
    img_cap, amap_cap, _, _, _ = rasterize_tiled(
        means, scales, quats, opac, colors, cam,
        cfg=RasterConfig(tile_cap=64, chunk=32))
    # truncation only *reduces* accumulated alpha
    assert float(jnp.min(amap_full[..., 1] - amap_cap[..., 1])) >= -1e-6
