"""TSDF fusion + marching tetrahedra: reconstruct a synthetic sphere from
rendered depth maps of an analytic SDF, check geometry."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d2dgs_tpu.data.cameras import orbit_camera
from d2dgs_tpu.mesh.tsdf import (extract_mesh, integrate_view,
                                 largest_components, make_volume,
                                 save_mesh_ply)

R_SPHERE = 0.5


def render_sphere_depth(cam):
    """Exact ray-sphere depth (z-depth) for a sphere at origin."""
    H, W = cam.H, cam.W
    ys, xs = jnp.mgrid[0:H, 0:W]
    x = (xs + 0.5 - W / 2.0) / cam.fx
    y = (ys + 0.5 - H / 2.0) / cam.fy
    dirs_cam = jnp.stack([x, y, jnp.ones_like(x)], -1)
    c2w = jnp.linalg.inv(cam.w2c)
    d = dirs_cam @ c2w[:3, :3].T
    o = c2w[:3, 3]
    # solve |o + s*d| = R
    a = jnp.sum(d * d, -1)
    b = 2 * jnp.sum(d * o[None, None], -1)
    c = jnp.sum(o * o) - R_SPHERE ** 2
    disc = b * b - 4 * a * c
    hit = disc > 0
    s = (-b - jnp.sqrt(jnp.maximum(disc, 0.0))) / (2 * a)
    # z-depth = s * z-component of unit-z-normalized dir = s (dirs have z=1
    # in cam frame before rotation) — s parametrizes cam-frame z directly
    return jnp.where(hit & (s > 0), s, 0.0)


@pytest.fixture(scope="module")
def sphere_mesh():
    vol = make_volume((-0.8, -0.8, -0.8), (0.8, 0.8, 0.8), voxel=0.05)
    for i in range(12):
        az = 2 * np.pi * i / 12
        el = 0.5 * np.sin(az * 2)
        cam = orbit_camera(az, el, 3.0, fov=0.6, H=64, W=64)
        depth = render_sphere_depth(cam)
        rgb = jnp.ones((64, 64, 3)) * 0.5
        vol = integrate_view(vol, depth, rgb, cam, depth_trunc=6.0)
    return extract_mesh(vol)


def test_sphere_geometry(sphere_mesh):
    verts, faces = sphere_mesh
    assert verts.shape[0] > 100
    assert faces.shape[0] > 100
    r = np.linalg.norm(verts, axis=-1)
    # all vertices near the sphere surface
    assert abs(np.median(r) - R_SPHERE) < 0.03
    assert np.percentile(np.abs(r - R_SPHERE), 95) < 0.08
    # faces index valid vertices
    assert faces.min() >= 0 and faces.max() < verts.shape[0]


def test_largest_component_filter(sphere_mesh):
    verts, faces = sphere_mesh
    # add a tiny floating triangle; the filter must remove it
    v2 = np.concatenate([verts, np.array(
        [[2, 2, 2], [2.1, 2, 2], [2, 2.1, 2]], np.float32)])
    f2 = np.concatenate([faces, np.array(
        [[len(verts), len(verts) + 1, len(verts) + 2]], np.int32)])
    v3, f3 = largest_components(v2, f2, keep=1)
    assert f3.shape[0] == faces.shape[0]
    assert np.abs(v3).max() < 1.0


def test_save_ply(tmp_path, sphere_mesh):
    verts, faces = sphere_mesh
    p = str(tmp_path / "m.ply")
    save_mesh_ply(p, verts, faces, colors=np.ones_like(verts) * 0.5)
    data = open(p, "rb").read()
    assert data.startswith(b"ply")
    assert f"element vertex {len(verts)}".encode() in data[:400]


@pytest.mark.slow  # mesh e2e (full-suite only)
def test_reconstruct_from_gaussians():
    """End-to-end: mesh a rendered gaussian blob through the full driver."""
    from d2dgs_tpu.config import RasterConfig
    from d2dgs_tpu.data.synthetic import make_video_dataset
    from d2dgs_tpu.mesh import reconstruct_mesh
    from d2dgs_tpu.train.config import TrainConfig
    from d2dgs_tpu.train.trainer import init_train_state

    cfg = TrainConfig(sh_degree=1, hyper_dim=2, node_num=16,
                      gaussian_capacity=64, node_gauss_capacity=32,
                      raster=RasterConfig(tile_cap=64, chunk=32))
    cams, imgs, pts, cols = make_video_dataset(
        jax.random.PRNGKey(0), n_cams=6, n_times=1, H=48, W=48, n_gauss=12)
    state = init_train_state(jax.random.PRNGKey(1), cfg, pts[:32], cols[:32])
    verts, faces = reconstruct_mesh(
        cams, state.gauss, state.nodes, cfg.node_cfg, cfg.raster,
        mesh_time=0.0, voxel=0.08, keep_clusters=0, depth_filtering=False)
    # random init cloud fills the volume: SOME surface must come out
    assert verts.shape[0] > 0
    assert np.isfinite(verts).all()
