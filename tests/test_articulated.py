"""Articulated benchmark-scene generator (data/articulated.py):
geometry sanity, determinism, motion richness, and a tiny end-to-end
render through the production renderer."""
import numpy as np
import pytest

from d2dgs_tpu.data.articulated import gt_gaussians, make_scene


@pytest.fixture(scope="module")
def scene():
    return make_scene(0, 4_000)


def test_geometry_sane(scene):
    for t in (0.0, 0.3, 0.7, 1.0):
        p, n = scene.surfel_positions(t)
        assert p.shape == (scene.n_surfels, 3) and n.shape == p.shape
        assert np.isfinite(p).all() and np.isfinite(n).all()
        # unit-ish normals
        assert np.allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-3)
        # figure stays in a bounded stage volume
        assert (np.abs(p) < 2.0).all()
    assert scene.surfel_colors.shape == (scene.n_surfels, 3)
    assert (scene.surfel_colors >= 0).all() and \
        (scene.surfel_colors <= 1).all()


def test_deterministic():
    a = make_scene(0, 2_000)
    b = make_scene(0, 2_000)
    pa, _ = a.surfel_positions(0.4)
    pb, _ = b.surfel_positions(0.4)
    np.testing.assert_array_equal(pa, pb)


def test_motion_nonrigid(scene):
    """Most of the surface moves between phases, by varying amounts
    (articulation, not a global rigid transform)."""
    p0, _ = scene.surfel_positions(0.0)
    p5, _ = scene.surfel_positions(0.5)
    d = np.linalg.norm(p5 - p0, axis=1)
    assert (d > 0.05).mean() > 0.4          # most of the body moves
    assert d.max() > 0.5                    # arm swings are large
    # displacement SPREAD rules out one rigid motion
    assert d.std() > 0.1


def test_motion_every_sampled_time(scene):
    """No sampled timestamp is accidentally the rest pose (the r1 blob
    lesson: sin(2*pi*t) vanishes exactly on a coarse t grid)."""
    times = [i / 7 for i in range(8)]
    for t1, t2 in zip(times[:-1], times[1:]):
        p1, _ = scene.surfel_positions(t1)
        p2, _ = scene.surfel_positions(t2)
        assert np.linalg.norm(p2 - p1, axis=1).max() > 0.02


def test_gt_gaussians_render():
    import jax
    import jax.numpy as jnp

    from d2dgs_tpu.config import RasterConfig
    from d2dgs_tpu.data.cameras import orbit_camera
    from d2dgs_tpu.render.renderer import render

    scene = make_scene(0, 2_000)
    g = gt_gaussians(scene, 0.25)
    cam = orbit_camera(0.5, 0.2, 3.6, fov=0.72, H=96, W=96, time=0.25)
    out = render(cam, g, jnp.zeros(3),
                 cfg=RasterConfig(tile_cap=512, chunk=64,
                                  pair_cap=1 << 17))
    img = np.asarray(out.image)
    assert np.isfinite(img).all()
    assert int(out.overflow) == 0
    # the figure covers a nontrivial part of the frame
    assert (np.asarray(out.alpha) > 0.5).mean() > 0.05
