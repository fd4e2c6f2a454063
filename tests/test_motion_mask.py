"""Motion-mask supervision (reference train_gui.py:363-370, 509-515):
the detached-geometry motion render must push per-Gaussian motion-mask
logits up inside the gt dynamic region and down outside it."""
import pytest

pytestmark = pytest.mark.slow  # full-suite only (see pytest.ini)
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from d2dgs_tpu.config import RasterConfig
from d2dgs_tpu.data.cameras import orbit_camera
from d2dgs_tpu.models.gaussians import create_from_pcd
from d2dgs_tpu.render.renderer import render
from d2dgs_tpu.train.config import TrainConfig
from d2dgs_tpu.train.trainer import Trainer, motion_mask_loss

RC = RasterConfig(tile_cap=256, chunk=64, pair_cap=4096)
CFG = TrainConfig(raster=RC, gaussian_capacity=64)


def _two_cluster_scene():
    """Left cluster = static, right cluster = dynamic."""
    rng = np.random.RandomState(0)
    left = rng.randn(24, 3) * 0.15 + np.array([-0.7, 0.0, 0.0])
    right = rng.randn(24, 3) * 0.15 + np.array([0.7, 0.0, 0.0])
    pts = np.concatenate([left, right]).astype(np.float32)
    cols = np.full((48, 3), 0.6, np.float32)
    gauss = create_from_pcd(pts, cols, capacity=64, sh_degree=0,
                            fea_dim=2, with_motion_mask=True)
    # visible splats
    gauss = dataclasses.replace(
        gauss,
        scaling=jnp.where(gauss.alive[:, None],
                          jnp.log(0.08), gauss.scaling),
        opacity=jnp.where(gauss.alive[:, None], 3.0, gauss.opacity))
    dynamic = np.zeros(64, bool)
    dynamic[24:48] = True
    return gauss, dynamic


def test_motion_mask_loss_separates_static_dynamic():
    gauss, dynamic = _two_cluster_scene()
    cam = orbit_camera(0.0, 0.0, 4.0, fov=0.8, H=64, W=64, time=0.0)
    bg = jnp.zeros(3)

    # gt dynamic-region mask: alpha render of the dynamic cluster only
    g_dyn = dataclasses.replace(
        gauss, opacity=jnp.where(jnp.asarray(dynamic)[:, None],
                                 gauss.opacity, -100.0))
    gt_alpha = render(cam, g_dyn, bg, cfg=RC).alpha

    def loss(feature):
        g = dataclasses.replace(gauss, feature=feature)
        return motion_mask_loss(g, cam, gt_alpha, bg, CFG)

    feature = gauss.feature
    g0 = jax.grad(loss)(feature)
    # gradients must touch ONLY the motion-mask channel (geometry detached)
    assert float(jnp.abs(g0[:, :-1]).max()) == 0.0

    step = jax.jit(jax.grad(loss))
    for _ in range(250):
        feature = feature - 150.0 * step(feature)

    mm = np.asarray(jax.nn.sigmoid(feature[:, -1]))
    assert mm[dynamic].mean() > 0.8, mm[dynamic].mean()
    assert mm[~dynamic & np.asarray(gauss.alive)].mean() < 0.2


def test_trainer_motion_loss_smoke():
    """Both stage steps jit and run with the motion loss enabled."""
    from d2dgs_tpu.data.synthetic import make_video_dataset
    cams, imgs, pts, cols = make_video_dataset(
        jax.random.PRNGKey(3), n_cams=2, n_times=2, H=32, W=32, n_gauss=8)
    alphas = [np.clip(im.sum(-1, keepdims=True) * 10, 0, 1) for im in imgs]
    cfg = TrainConfig(
        sh_degree=1, hyper_dim=2, node_num=16, gaussian_capacity=512,
        node_gauss_capacity=64, warm_up=2, node_warm_up=2,
        iterations_node_sampling=4, iterations_node_rendering=6,
        iterations=20, densification_interval=50, densify_from_iter=100,
        opacity_reset_interval=1000, normal_dist_from_iter=5,
        oneup_sh_degree_step=100, node_force_densify_prune_step=1000,
        gt_alpha_mask_as_dynamic_mask=True,
        raster=RC)
    tr = Trainer(cfg, cams, imgs, pts, cols, cameras_extent=4.0, seed=0,
                 alphas=alphas)
    assert tr.state.ngauss.with_motion_mask
    for _ in range(10):
        m = tr.step()
        if m:
            assert np.isfinite(float(m["loss"]))
