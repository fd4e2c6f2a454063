"""Full-loss sharded training step on the 2-D (data x gauss) mesh
(parallel/gauss_train.py): loss parity vs the replicated single-chip
main_stage_step, Pallas work-queue blend parity inside the shard, and
exchange auto-sizing (VERDICT r2 item 1/7 done-criteria)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-suite only (see pytest.ini)

from d2dgs_tpu.config import RasterConfig
from d2dgs_tpu.data.synthetic import make_video_dataset
from d2dgs_tpu.parallel import (make_mesh2d, make_sharded_train_step,
                                measure_exchange_counts, shard_gauss_state,
                                stack_cameras, suggest_exchange_cap)
from d2dgs_tpu.parallel.gauss_shard import render_gauss_sharded
from d2dgs_tpu.train.config import TrainConfig
from d2dgs_tpu.train.trainer import init_train_state, main_stage_step


def _cfg(**kw):
    raster = kw.pop("raster", None) or RasterConfig(
        tile_cap=256, chunk=64, pair_cap=8192, use_pallas=False)
    base = dict(sh_degree=1, hyper_dim=2, node_num=16,
                gaussian_capacity=256, node_gauss_capacity=64, warm_up=0,
                raster=raster)
    base.update(kw)
    return TrainConfig(**base)


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg()
    cams, imgs, pts, cols = make_video_dataset(
        jax.random.PRNGKey(0), n_cams=4, n_times=2, H=32, W=32, n_gauss=8)
    state = init_train_state(jax.random.PRNGKey(1), cfg, pts[:128],
                             cols[:128])
    return cfg, state, cams, [jnp.asarray(i, jnp.float32) for i in imgs]


def _sched():
    return dict(warm=jnp.float32(0.0), lambda_normal=jnp.float32(0.02),
                lambda_dist=jnp.float32(100.0),
                lambda_arap=jnp.float32(0.01),
                deform_lr=jnp.float32(1e-3), xyz_lr=jnp.float32(1e-4),
                step=jnp.float32(100.0))


def test_full_loss_parity_vs_replicated(setup):
    """Per-camera L1/PSNR of the sharded full-loss step must equal the
    replicated main_stage_step on the same state (overflow 0)."""
    cfg, state, cams, imgs = setup
    mesh = make_mesh2d(2, 4)
    gstate = shard_gauss_state(mesh, state)
    step = make_sharded_train_step(mesh, cfg, exchange_cap=4096)
    cams_b = stack_cameras(cams[:2])
    gts = jnp.stack(imgs[:2])
    s2, m = step(gstate, cams_b, gts, _sched())
    assert int(m["overflow"]) == 0

    # replicated reference on each camera
    for i in range(2):
        _, mr = main_stage_step(state, cams[i], imgs[i], cfg, _sched())
        # m["loss"] is the mean L1 across the data rows; compare psnr
        # per-row via a 1-row mesh run for exactness
        pass
    mesh1 = make_mesh2d(1, 8)
    g1 = shard_gauss_state(mesh1, state)
    step1 = make_sharded_train_step(mesh1, cfg, exchange_cap=4096)
    for i in range(2):
        _, m1 = step1(g1, stack_cameras(cams[i:i + 1]),
                      jnp.stack(imgs[i:i + 1]), _sched())
        _, mr = main_stage_step(state, cams[i], imgs[i], cfg, _sched())
        assert int(m1["overflow"]) == 0
        np.testing.assert_allclose(float(m1["loss"]), float(mr["loss"]),
                                   rtol=2e-4, atol=1e-6)
        np.testing.assert_allclose(float(m1["psnr"]), float(mr["psnr"]),
                                   rtol=2e-4)


def test_param_updates_match_replicated(setup):
    """One full-loss sharded step (1 data row) must produce the same
    parameter update as the replicated step — the gradient path through
    the exchange transposes correctly."""
    cfg, state, cams, imgs = setup
    mesh = make_mesh2d(1, 8)
    gstate = shard_gauss_state(mesh, state)
    step = make_sharded_train_step(mesh, cfg, exchange_cap=4096)
    s_sh, _ = step(gstate, stack_cameras(cams[:1]), jnp.stack(imgs[:1]),
                   _sched())
    s_re, _ = main_stage_step(state, cams[0], imgs[0], cfg, _sched())
    np.testing.assert_allclose(np.asarray(s_sh.gauss.xyz),
                               np.asarray(s_re.gauss.xyz),
                               atol=5e-6, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(s_sh.gauss.opacity),
                               np.asarray(s_re.gauss.opacity),
                               atol=5e-6, rtol=1e-4)
    # densify stats (screen-probe grads) must match too
    np.testing.assert_allclose(np.asarray(s_sh.gauss_stats.grad_accum),
                               np.asarray(s_re.gauss_stats.grad_accum),
                               atol=1e-6, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(s_sh.gauss_stats.denom),
                               np.asarray(s_re.gauss_stats.denom))


def test_wq_pallas_blend_in_shard(setup):
    """The Pallas work-queue blend inside the shard (interpret mode on
    CPU) must match the XLA scan path."""
    cfg, state, cams, imgs = setup
    mesh = make_mesh2d(1, 2)
    g = state.gauss
    means, scales = g.xyz, g.get_scaling
    from d2dgs_tpu.utils.quaternion import quat_normalize
    quats = quat_normalize(g.rotation, eps=1e-12)
    opac = g.get_opacity[:, 0]
    colors = jnp.broadcast_to(jnp.array([0.4, 0.7, 0.2]),
                              (means.shape[0], 3))
    bg = jnp.zeros(3)
    kw = dict(bg=bg, exchange_cap=4096)
    r_x = render_gauss_sharded(
        mesh, cams[0], means, scales, quats, opac, colors, g.alive,
        cfg=RasterConfig(tile_cap=256, chunk=64, use_pallas=False), **kw)
    r_p = render_gauss_sharded(
        mesh, cams[0], means, scales, quats, opac, colors, g.alive,
        cfg=RasterConfig(tile_cap=256, chunk=64, use_pallas=True,
                         pallas_interpret=True), **kw)
    np.testing.assert_allclose(np.asarray(r_p.image),
                               np.asarray(r_x.image), atol=3e-5)
    np.testing.assert_allclose(np.asarray(r_p.allmap),
                               np.asarray(r_x.allmap), atol=3e-4)

    def loss(fn_cfg, m):
        out = render_gauss_sharded(mesh, cams[0], m, scales, quats, opac,
                                   colors, g.alive, cfg=fn_cfg, **kw)
        return jnp.mean((out.image - 0.5) ** 2)

    gx = jax.grad(lambda m: loss(RasterConfig(
        tile_cap=256, chunk=64, use_pallas=False), m))(means)
    gp = jax.grad(lambda m: loss(RasterConfig(
        tile_cap=256, chunk=64, use_pallas=True, pallas_interpret=True), m))(means)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               atol=1e-5, rtol=1e-3)


def test_trainer_sharded_main_stage(setup):
    """Trainer.enable_sharded_training drives the full-loss sharded step
    through the host loop, including a densify boundary on sharded
    state (cli --mesh_shape path)."""
    from d2dgs_tpu.train.trainer import Trainer
    cfg, _, cams, imgs = setup
    import dataclasses
    tcfg = dataclasses.replace(
        cfg, deform_type="node", iterations=8, warm_up=0,
        iterations_node_rendering=2, iterations_node_sampling=1,
        node_warm_up=1, densify_from_iter=2, densify_until_iter=8,
        densification_interval=3, opacity_reset_interval=1000,
        node_force_densify_prune_step=1000, normal_dist_from_iter=1)
    pts = np.random.RandomState(0).randn(64, 3).astype(np.float32) * 0.4
    cols = np.full((64, 3), 0.5, np.float32)
    tr = Trainer(tcfg, cams, imgs, pts, cols, cameras_extent=4.0, seed=0)
    tr.enable_sharded_training((2, 4))
    losses = []
    for _ in range(tr.total_iterations()):
        m = tr.step()
        if m:
            losses.append(float(m["loss"]))
            assert int(m.get("overflow", 0)) == 0
    assert np.isfinite(losses).all()
    # densify stats accumulated through the sharded probe grads
    assert float(jnp.sum(tr.state.gauss_stats.denom)) > 0


def test_exchange_autosizing(setup):
    cfg, state, cams, imgs = setup
    mesh = make_mesh2d(1, 4)
    g = state.gauss
    from d2dgs_tpu.utils.quaternion import quat_normalize
    quats = quat_normalize(g.rotation, eps=1e-12)
    mx = measure_exchange_counts(mesh, cams[0], g.xyz, g.get_scaling,
                                 quats, g.alive, cfg.raster)
    assert mx > 0
    cap = suggest_exchange_cap(mesh, cams[:2], g.xyz, g.get_scaling,
                               quats, g.alive, cfg.raster)
    assert cap >= mx and cap % 256 == 0
    # a render at the suggested cap must not overflow
    colors = jnp.zeros((g.xyz.shape[0], 3))
    out = render_gauss_sharded(mesh, cams[0], g.xyz, g.get_scaling,
                               quats, g.get_opacity[:, 0], colors,
                               g.alive, bg=jnp.zeros(3), cfg=cfg.raster,
                               exchange_cap=cap)
    assert int(out.overflow) == 0
