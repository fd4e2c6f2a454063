"""End-to-end: two-stage training on a synthetic multi-view video must
reduce loss / increase PSNR (config[3] smoke-scale)."""
import dataclasses

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-suite only (see pytest.ini)

from d2dgs_tpu.config import RasterConfig
from d2dgs_tpu.data.synthetic import make_video_dataset
from d2dgs_tpu.models.deform_mlp import MLPConfig
from d2dgs_tpu.train.config import TrainConfig
from d2dgs_tpu.train.trainer import Trainer

# Schedule scaled ~1:25 from the reference recipe.  node_warm_up must be
# long enough for the stage-1 canonical fit to converge BEFORE the MLP
# trains — otherwise photometric gradients push badly-placed gaussians
# off-screen (empty render beats a bad fit on a black background) and the
# deformation field diverges.  Mirrors the reference's 2000/10000 ratio.
TINY = TrainConfig(
    sh_degree=1, hyper_dim=2, node_num=16, gaussian_capacity=512,
    node_gauss_capacity=256, warm_up=30,
    node_warm_up=120, iterations_node_sampling=260,
    iterations_node_rendering=320, iterations=400,
    densification_interval=25, densify_from_iter=20,
    opacity_reset_interval=10_000,  # no reset in this short run
    normal_dist_from_iter=150,
    oneup_sh_degree_step=100,
    node_force_densify_prune_step=1_000,
    raster=RasterConfig(tile_cap=256, chunk=64),
)


@pytest.fixture(scope="module")
def dataset():
    return make_video_dataset(jax.random.PRNGKey(3), n_cams=6, n_times=3,
                              H=48, W=48, n_gauss=16)


def test_two_stage_training_improves(dataset):
    cams, imgs, pts, cols = dataset
    tr = Trainer(TINY, cams, imgs, pts, cols, cameras_extent=4.0, seed=0)

    # stage 1 through downsample boundary
    node_psnrs = []
    while tr.iteration_node < TINY.iterations_node_rendering:
        m = tr.step()
        if m:
            node_psnrs.append(float(m["psnr"]))
    assert tr.iteration_node == TINY.iterations_node_rendering
    # node count collapsed to node_num after sampling
    assert int(tr.state.ngauss.num_alive) == TINY.node_num
    assert np.isfinite(node_psnrs).all()
    # stage-1 fitting actually progressed
    assert np.mean(node_psnrs[-5:]) > np.mean(node_psnrs[:5])

    # main stage
    main_psnrs = []
    for _ in range(300):
        m = tr.step()
        main_psnrs.append(float(m["psnr"]))
    assert np.isfinite(main_psnrs).all()
    assert np.mean(main_psnrs[-10:]) > np.mean(main_psnrs[:10]) + 1.0
    # the scene must actually render (guards against the flee-to-empty
    # collapse: an empty black render scores ~20 PSNR on these scenes)
    assert np.mean(main_psnrs[-10:]) > 24.0
    assert int(tr.state.gauss.num_alive) > 0
