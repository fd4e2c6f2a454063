"""Data-parallel sharded training step on the 8-virtual-device CPU mesh
(SURVEY.md §4: multi-device logic tested without a pod)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d2dgs_tpu.config import RasterConfig
from d2dgs_tpu.data.synthetic import make_video_dataset
from d2dgs_tpu.parallel import (batched_main_step, make_dp_main_step,
                                make_mesh, shard_batch, shard_replicated,
                                stack_cameras)
from d2dgs_tpu.train.config import TrainConfig
from d2dgs_tpu.train.trainer import init_train_state, main_stage_step

pytestmark = pytest.mark.slow  # full-suite only (see pytest.ini)


@pytest.fixture(scope="module", autouse=True)
def _no_persistent_cache():
    """The big 8-device sharded executables of this module segfault
    jaxlib's persistent-cache serialize/deserialize when compiled after a
    long full-suite run (write crash -> poisoned entry -> read crash on
    the next run).  Compile them fresh instead of caching."""
    jax.config.update("jax_enable_compilation_cache", False)
    yield
    jax.config.update("jax_enable_compilation_cache", True)

CFG = TrainConfig(
    sh_degree=1, hyper_dim=2, node_num=16, gaussian_capacity=256,
    node_gauss_capacity=128, warm_up=0,
    raster=RasterConfig(tile_cap=128, chunk=64))

SCHED = dict(warm=jnp.float32(0.0), lambda_normal=jnp.float32(0.02),
             lambda_dist=jnp.float32(100.0), lambda_arap=jnp.float32(0.01),
             deform_lr=jnp.float32(1e-3), xyz_lr=jnp.float32(1e-4))


@pytest.fixture(scope="module")
def setup():
    cams, imgs, pts, cols = make_video_dataset(
        jax.random.PRNGKey(0), n_cams=4, n_times=2, H=32, W=32, n_gauss=8)
    state = init_train_state(jax.random.PRNGKey(1), CFG, pts[:128],
                             cols[:128])
    return state, cams, imgs


def test_dp_step_matches_unsharded(setup):
    state, cams, imgs = setup
    n_dev = len(jax.devices())
    assert n_dev == 8, "conftest should force 8 virtual CPU devices"
    batch = n_dev
    cams_b = stack_cameras([cams[i % len(cams)] for i in range(batch)])
    gts = jnp.stack([jnp.asarray(imgs[i % len(imgs)], jnp.float32)
                     for i in range(batch)])

    # unsharded reference
    ref_state, ref_metrics = jax.jit(
        batched_main_step, static_argnames=("cfg",))(
        state, cams_b, gts, cfg=CFG, sched=SCHED)

    mesh = make_mesh()
    step = make_dp_main_step(mesh, CFG)
    st = jax.device_put(state, shard_replicated(mesh))
    cb = jax.device_put(cams_b, shard_batch(mesh))
    gb = jax.device_put(gts, shard_batch(mesh))
    dp_state, dp_metrics = step(st, cb, gb, SCHED)

    assert np.isfinite(float(dp_metrics["loss"]))
    np.testing.assert_allclose(float(dp_metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dp_state.gauss.xyz),
                               np.asarray(ref_state.gauss.xyz),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dp_state.gauss_stats.grad_accum),
                               np.asarray(ref_state.gauss_stats.grad_accum),
                               rtol=1e-3, atol=1e-7)


def test_batched_step_consistent_with_single(setup):
    """A batch of B copies of ONE camera must produce the same parameter
    update as the single-camera step (grads average to the same value);
    densify stats must count B observations."""
    state, cams, imgs = setup
    batch = 4
    cams_b = stack_cameras([cams[0]] * batch)
    gts = jnp.stack([jnp.asarray(imgs[0], jnp.float32)] * batch)

    b_state, _ = jax.jit(batched_main_step, static_argnames=("cfg",))(
        state, cams_b, gts, cfg=CFG, sched=SCHED)
    s_state, _ = main_stage_step(state, cams[0],
                                 jnp.asarray(imgs[0], jnp.float32),
                                 CFG, SCHED)
    np.testing.assert_allclose(np.asarray(b_state.gauss.xyz),
                               np.asarray(s_state.gauss.xyz),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(b_state.gauss_stats.denom),
                               batch * np.asarray(s_state.gauss_stats.denom),
                               rtol=1e-6)


def test_graft_entry_dryrun():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    fn, args = ge.entry()
    img = jax.jit(fn)(*args)
    assert img.shape == (32, 32, 3)
    assert np.isfinite(np.asarray(img)).all()
    ge.dryrun_multichip(8)
