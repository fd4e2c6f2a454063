"""Ground-truth renderer sanity: analytic expectations + autodiff health.

These pin the functional spec of the rasterizer (forward.cu semantics) that
the tiled/Pallas paths are validated against.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d2dgs_tpu.data import synthetic
from d2dgs_tpu.ops.dense_raster import rasterize_dense
from d2dgs_tpu.ops.projection import preprocess


@pytest.fixture(scope="module")
def cam():
    return synthetic.test_camera(H=64, W=64)


def test_preprocess_centered_gaussian(cam):
    means, scales, quats, opac, colors = synthetic.single_facing_gaussian(cam)
    prep = preprocess(means, scales, quats, cam)
    assert bool(prep.valid[0])
    # optical-axis point projects to the principal point
    np.testing.assert_allclose(np.asarray(prep.center[0]),
                               [cam.W / 2, cam.H / 2], atol=0.5)
    assert float(prep.depth[0]) == pytest.approx(4.0, abs=1e-4)
    assert int(prep.radius[0]) > 0
    # camera-frame normal of a camera-facing surfel is +/- z; the
    # dual-visible flip makes cos(-n, p_view) > 0 => n.z < 0
    assert abs(float(prep.normal[0, 2])) > 0.99


def test_behind_camera_culled(cam):
    means, scales, quats, opac, colors = synthetic.single_facing_gaussian(
        cam, depth=-4.0)
    prep = preprocess(means, scales, quats, cam)
    assert not bool(prep.valid[0])
    assert int(prep.radius[0]) == 0


def test_single_splat_alpha_and_color(cam):
    means, scales, quats, opac, colors = synthetic.single_facing_gaussian(
        cam, opacity=0.8)
    bg = jnp.array([1.0, 1.0, 1.0])
    img, allmap, radii, _ = rasterize_dense(
        means, scales, quats, opac, colors, cam, bg)
    cy, cx = cam.H // 2, cam.W // 2
    # at the exact splat center rho ~ (half-pixel offset)^2 via low-pass only
    a_center = float(allmap[cy, cx, 1])
    assert 0.7 < a_center <= 0.8 + 1e-5
    # color = a*c + (1-a)*bg
    exp = a_center * np.array([0.2, 0.5, 0.9]) + (1 - a_center)
    np.testing.assert_allclose(np.asarray(img[cy, cx]), exp, atol=1e-5)
    # depth ~ 4 where the splat hits
    assert float(allmap[cy, cx, 5]) == pytest.approx(4.0, abs=1e-3)
    # far corner untouched -> pure bg, alpha 0
    assert float(allmap[0, 0, 1]) == 0.0
    np.testing.assert_allclose(np.asarray(img[0, 0]), [1, 1, 1], atol=1e-6)


def test_opaque_occlusion(cam):
    """A nearly opaque near splat hides a far one (front-to-back order)."""
    m1, s1, q1, o1, c1 = synthetic.single_facing_gaussian(
        cam, depth=3.0, opacity=0.999)
    m2, s2, q2, o2, c2 = synthetic.single_facing_gaussian(
        cam, depth=5.0, opacity=0.999)
    means = jnp.concatenate([m2, m1])    # far one FIRST in memory
    scales = jnp.concatenate([s2, s1])
    quats = jnp.concatenate([q2, q1])
    opac = jnp.concatenate([o2, o1])
    colors = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    img, allmap, _, _ = rasterize_dense(
        means, scales, quats, opac, colors, cam, jnp.zeros(3))
    cy, cx = cam.H // 2, cam.W // 2
    # near (green) dominates despite memory order
    assert float(img[cy, cx, 1]) > 0.95
    assert float(img[cy, cx, 0]) < 0.05
    # median depth = near surface
    assert float(allmap[cy, cx, 5]) == pytest.approx(3.0, abs=1e-2)


def test_alpha_clip_and_cutoff(cam):
    means, scales, quats, opac, colors = synthetic.single_facing_gaussian(
        cam, opacity=1.0)
    img, allmap, _, _ = rasterize_dense(
        means, scales, quats, opac, colors, cam, jnp.zeros(3))
    assert float(jnp.max(allmap[..., 1])) <= 0.99 + 1e-6


def test_grads_finite_and_nonzero(cam):
    key = jax.random.PRNGKey(0)
    means, scales, quats, opac, colors = synthetic.random_gaussians(key, 50)
    target = jnp.zeros((cam.H, cam.W, 3))

    def loss(means, scales, quats, opac, colors):
        img, allmap, _, _ = rasterize_dense(
            means, scales, quats, opac, colors, cam, jnp.zeros(3))
        return jnp.mean((img - target) ** 2) + 1e-3 * jnp.mean(allmap[..., 6])

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        means, scales, quats, opac, colors)
    total = 0.0
    for g in grads:
        assert bool(jnp.all(jnp.isfinite(g))), "non-finite gradient"
        total += float(jnp.sum(jnp.abs(g)))
    assert total > 0.0


def test_grad_matches_finite_difference(cam):
    """Directional finite-difference check through the full blend."""
    key = jax.random.PRNGKey(1)
    means, scales, quats, opac, colors = synthetic.random_gaussians(key, 12)

    def loss(means):
        img, _, _, _ = rasterize_dense(
            means, scales, quats, opac, colors, cam, jnp.zeros(3))
        return jnp.mean(img ** 2)

    g = jax.grad(loss)(means)
    v = jax.random.normal(jax.random.PRNGKey(2), means.shape)
    v = v / jnp.linalg.norm(v)
    eps = 1e-3
    fd = (loss(means + eps * v) - loss(means - eps * v)) / (2 * eps)
    ad = jnp.sum(g * v)
    np.testing.assert_allclose(float(fd), float(ad), rtol=2e-2, atol=1e-6)
