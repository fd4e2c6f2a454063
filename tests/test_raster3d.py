"""3DGS (conic/EWA) alternate rasterizer vs a brute-force dense oracle,
plus render_flow output contract."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d2dgs_tpu.config import (ALPHA_CLIP, ALPHA_CUTOFF, T_CUTOFF,
                              RasterConfig)
from d2dgs_tpu.data.cameras import orbit_camera
from d2dgs_tpu.ops.raster3d import (compute_cov3d, preprocess3d,
                                    rasterize_3dgs)

CFG = RasterConfig(tile_cap=256, chunk=64, use_pallas=False)


def dense_3dgs(means3d, scales, quats, opac, colors, cam, bg):
    """Per-pixel loop over ALL gaussians in depth order — the oracle."""
    prep = preprocess3d(means3d, scales, quats, cam)
    order = np.argsort(np.where(np.asarray(prep.valid),
                                np.asarray(prep.depth), np.inf),
                       kind="stable")
    con = np.asarray(prep.conic)[order]
    cen = np.asarray(prep.center)[order]
    dep = np.asarray(prep.depth)[order]
    val = np.asarray(prep.valid)[order]
    op = np.asarray(opac)[order] * val
    col = np.asarray(colors)[order]

    H, W, C = cam.H, cam.W, colors.shape[-1]
    img = np.zeros((H, W, C))
    depth = np.zeros((H, W))
    alpha_img = np.zeros((H, W))
    for y in range(H):
        for x in range(W):
            T = 1.0
            for g in range(len(op)):
                dx, dy = cen[g, 0] - x, cen[g, 1] - y
                power = (-0.5 * (con[g, 0] * dx * dx + con[g, 2] * dy * dy)
                         - con[g, 1] * dx * dy)
                if power > 0:
                    continue
                a = min(ALPHA_CLIP, op[g] * np.exp(power))
                if a < ALPHA_CUTOFF:
                    continue
                if T <= T_CUTOFF:
                    break
                img[y, x] += col[g] * a * T
                depth[y, x] += dep[g] * a * T
                T *= 1.0 - a
            img[y, x] += T * np.asarray(bg)
            alpha_img[y, x] = 1.0 - T
    return img, depth, alpha_img


@pytest.fixture(scope="module")
def scene():
    key = jax.random.PRNGKey(0)
    n = 24
    ks = jax.random.split(key, 5)
    means = jax.random.normal(ks[0], (n, 3)) * 0.5
    scales = jnp.exp(jax.random.normal(ks[1], (n, 3)) * 0.3) * 0.15
    quats = jax.random.normal(ks[2], (n, 4))
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    opac = jax.random.uniform(ks[3], (n,), minval=0.3, maxval=0.9)
    colors = jax.random.uniform(ks[4], (n, 3))
    cam = orbit_camera(0.3, 0.2, 4.0, fov=0.8, H=32, W=32)
    return means, scales, quats, opac, colors, cam


def test_forward_matches_dense_oracle(scene):
    means, scales, quats, opac, colors, cam = scene
    bg = jnp.array([0.1, 0.2, 0.3])
    img, radii, depth, alpha = jax.jit(
        lambda *a: rasterize_3dgs(*a, cam=cam, bg=bg, cfg=CFG))(
        means, scales, quats, opac, colors)
    ref_img, ref_depth, ref_alpha = dense_3dgs(
        means, scales, quats, opac, colors, cam, bg)
    np.testing.assert_allclose(np.asarray(img), ref_img, atol=2e-5)
    np.testing.assert_allclose(np.asarray(depth)[..., 0], ref_depth,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(alpha)[..., 0], ref_alpha,
                               atol=2e-5)
    assert int((radii > 0).sum()) > 0


def test_cov3d_isotropic_is_diagonal():
    s = jnp.full((4, 3), 0.2)
    q = jnp.tile(jnp.array([1.0, 0, 0, 0]), (4, 1))
    cov = compute_cov3d(s, q)
    np.testing.assert_allclose(cov[:, [0, 3, 5]], 0.04, atol=1e-7)
    np.testing.assert_allclose(cov[:, [1, 2, 4]], 0.0, atol=1e-7)
    # 2-channel surfel scales pad a negligible third axis
    cov2 = compute_cov3d(s[:, :2], q)
    np.testing.assert_allclose(cov2[:, 5], 1e-12, atol=1e-13)


def test_gradients_finite(scene):
    means, scales, quats, opac, colors, cam = scene

    def loss(m, s, q, o, c):
        img, _, depth, alpha = rasterize_3dgs(m, s, q, o, c, cam, cfg=CFG)
        return jnp.sum(img ** 2) + jnp.sum(depth) + jnp.sum(alpha)

    grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))(
        means, scales, quats, opac, colors)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
    assert any(float(jnp.abs(g).max()) > 0 for g in grads)


def test_render_flow_contract(scene):
    from d2dgs_tpu.models.gaussians import create_from_pcd
    from d2dgs_tpu.render.renderer import render_flow

    means, scales, quats, opac, colors, cam = scene
    params = create_from_pcd(np.asarray(means), np.asarray(colors),
                             capacity=32, sh_degree=1, fea_dim=3)
    d1 = jnp.zeros_like(params.xyz)
    d2 = jnp.full_like(params.xyz, 0.05)
    out = jax.jit(lambda a, b: render_flow(params, cam, None, a, b,
                                           cfg=CFG))(d1, d2)
    assert out["render"].shape == (cam.H, cam.W, 3)
    assert out["depth"].shape == (cam.H, cam.W, 1)
    assert out["alpha"].shape == (cam.H, cam.W, 1)
    assert np.isfinite(np.asarray(out["render"])).all()
    # identical deformation => zero uv flow in the covered region
    out0 = render_flow(params, cam, None, d1, d1, cfg=CFG)
    np.testing.assert_allclose(np.asarray(out0["render"][..., :2]), 0.0,
                               atol=1e-6)
