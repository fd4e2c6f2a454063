"""Optical-flow loss (reference train_gui.py:318-361) and the RAFT file
discovery/loading hooks (scene/__init__.py:82-87, data/flow.py)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d2dgs_tpu.config import RasterConfig
from d2dgs_tpu.data.flow import find_flow_dirs, load_flow, target_name
from d2dgs_tpu.data.synthetic import make_video_dataset
from d2dgs_tpu.train.config import TrainConfig
from d2dgs_tpu.train.trainer import Trainer, main_stage_step

RC = RasterConfig(tile_cap=256, chunk=64, pair_cap=4096)


def test_flow_file_discovery_and_loading(tmp_path):
    class S:
        def __init__(self, n):
            self.image_name = n
    os.makedirs(tmp_path / "raft_neighbouring")
    os.makedirs(tmp_path / "raft_masks")
    flow = np.random.RandomState(0).randn(8, 8, 2).astype(np.float32)
    np.save(tmp_path / "raft_neighbouring" / "r_000.to_r_001.npy", flow)
    from PIL import Image
    Image.fromarray(np.full((8, 8, 3), 255, np.uint8)).save(
        tmp_path / "raft_masks" / "r_000.to_r_001.png")
    dirs = find_flow_dirs(str(tmp_path), [S("r_000.png"), S("r_001.png")])
    assert len(dirs[0]) == 1 and dirs[1] == []
    assert target_name(dirs[0][0]) == "001"
    f, m = load_flow(dirs[0][0], 16, 16)      # also exercises resizing
    assert f.shape == (16, 16, 2) and m.shape == (16, 16, 1)
    assert m.min() == 1.0                     # fully valid mask
    # normalization: pixel flow / [W,H] * 2, and 2x upscale of the field
    np.testing.assert_allclose(f[0, 0], flow[0, 0] * 2 / 16.0 * 2,
                               rtol=1e-5)


@pytest.mark.slow  # trainer e2e (full-suite only)
def test_flow_loss_step_runs_and_grads_flow():
    cams, imgs, pts, cols = make_video_dataset(
        jax.random.PRNGKey(3), n_cams=2, n_times=2, H=32, W=32, n_gauss=8)
    cfg = TrainConfig(
        sh_degree=1, hyper_dim=2, node_num=16, gaussian_capacity=256,
        node_gauss_capacity=64, warm_up=0, node_warm_up=2,
        iterations_node_sampling=3, iterations_node_rendering=4,
        iterations=20, densification_interval=50, densify_from_iter=100,
        opacity_reset_interval=1000, normal_dist_from_iter=5,
        oneup_sh_degree_step=100, node_force_densify_prune_step=1000,
        raster=RC)
    tr = Trainer(cfg, cams, imgs, pts, cols, cameras_extent=4.0, seed=0)
    while tr.iteration_node < cfg.iterations_node_rendering:
        tr.step()

    gt_flow = jnp.zeros((32, 32, 2))
    flow_mask = jnp.ones((32, 32, 1))
    sched = dict(warm=jnp.float32(0.0), lambda_normal=jnp.float32(0.0),
                 lambda_dist=jnp.float32(0.0),
                 lambda_arap=jnp.float32(0.0),
                 deform_lr=jnp.float32(1e-3), xyz_lr=jnp.float32(1e-4),
                 lambda_optical=jnp.float32(0.1))
    st, m = main_stage_step(
        tr.state, cams[0], jnp.asarray(imgs[0]), cfg, sched,
        flow_sample=(cams[1], gt_flow, flow_mask, jnp.float32(1.0)),
        flow_loss=True)
    assert np.isfinite(float(m["loss"]))
    # the flow term must actually alter the MLP gradient path: compare
    # the updated MLP params with vs without the flow loss
    st0, _ = main_stage_step(
        tr.state, cams[0], jnp.asarray(imgs[0]), cfg,
        {k: v for k, v in sched.items() if k != "lambda_optical"})
    diff = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()),
                     st.nodes.mlp, st0.nodes.mlp))
    assert diff > 0.0


def test_trainer_picks_flow_sample(tmp_path):
    """End-to-end: Trainer consumes discovered flow files in its main
    loop without error."""
    cams, imgs, pts, cols = make_video_dataset(
        jax.random.PRNGKey(3), n_cams=2, n_times=2, H=32, W=32, n_gauss=8)
    names = [f"r_{i:03d}.png" for i in range(len(cams))]
    os.makedirs(tmp_path / "raft_neighbouring")
    for i in range(len(cams)):
        j = (i + 1) % len(cams)
        np.save(tmp_path / "raft_neighbouring" /
                f"r_{i:03d}.to_r_{j:03d}.npy",
                np.zeros((32, 32, 2), np.float32))

    class S:
        def __init__(self, n):
            self.image_name = n
    dirs = find_flow_dirs(str(tmp_path), [S(n) for n in names])
    assert all(len(d) == 1 for d in dirs)
    cfg = TrainConfig(
        sh_degree=1, hyper_dim=2, node_num=16, gaussian_capacity=256,
        node_gauss_capacity=64, warm_up=0, node_warm_up=2,
        iterations_node_sampling=3, iterations_node_rendering=4,
        iterations=20, densification_interval=50, densify_from_iter=100,
        opacity_reset_interval=1000, normal_dist_from_iter=5,
        oneup_sh_degree_step=100, node_force_densify_prune_step=1000,
        raster=RC)
    tr = Trainer(cfg, cams, imgs, pts, cols, cameras_extent=4.0, seed=0,
                 flow_dirs=dirs, image_names=names)
    for _ in range(8):
        m = tr.step()
        if m:
            assert np.isfinite(float(m["loss"]))
