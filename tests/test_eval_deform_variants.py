"""Eval metrics + deform facade variants + DQB skinning."""
import jax
import jax.numpy as jnp
import numpy as np

from d2dgs_tpu.eval.metrics import evaluate_image_metrics, msssim
from d2dgs_tpu.models.deform import (DeformConfig, apply_deform_field,
                                     init_deform)
from d2dgs_tpu.models.deform_mlp import MLPConfig
from d2dgs_tpu.models.nodes import NodeConfig, warp


def test_msssim_identity_and_noise():
    img = jax.random.uniform(jax.random.PRNGKey(0), (64, 64, 3))
    assert float(msssim(img, img)) > 0.999
    noisy = jnp.clip(img + 0.3 * jax.random.normal(
        jax.random.PRNGKey(1), img.shape), 0, 1)
    assert float(msssim(img, noisy)) < 0.9


def test_evaluate_image_metrics_keys():
    a = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 3))
    m = evaluate_image_metrics(a, a)
    assert m["psnr"] > 60 and m["ssim"] > 0.999 and m["ms_ssim"] > 0.999
    assert "lpips_vgg" not in m  # no weights in this environment


def test_deform_variants_shapes():
    xyz = jax.random.normal(jax.random.PRNGKey(0), (32, 3))
    for typ in ["node", "mlp", "static"]:
        cfg = DeformConfig(
            deform_type=typ,
            node=NodeConfig(node_num=8, K=3, hyper_dim=2,
                            mlp=MLPConfig(is_blender=True, width=32,
                                          depth=2)),
            mlp=MLPConfig(is_blender=True, width=32, depth=2))
        params = init_deform(jax.random.PRNGKey(1), cfg, init_pcl=xyz)
        d = apply_deform_field(params, cfg, xyz, jnp.float32(0.3),
                               feature=jnp.zeros((32, 2)))
        assert d["d_xyz"].shape == (32, 3)
        assert d["d_rotation"].shape == (32, 4)
        assert d["d_scaling"].shape == (32, 2)
        assert np.isfinite(np.asarray(d["d_xyz"])).all()
        if typ == "static":
            assert float(jnp.abs(d["d_xyz"]).max()) == 0.0


def test_dqb_skinning_matches_lbs_at_identity():
    """With near-zero MLP heads both skinning modes are ~identity; they
    must agree closely at init and both be finite."""
    xyz = jax.random.normal(jax.random.PRNGKey(0), (64, 3))
    base = NodeConfig(node_num=16, K=3, hyper_dim=0,
                      mlp=MLPConfig(is_blender=True, width=32, depth=2,
                                    local_frame=True))
    cfg_lbs = base
    import dataclasses
    cfg_dqb = dataclasses.replace(base, skinning="dqb")
    params = init_deform(jax.random.PRNGKey(1),
                         DeformConfig(deform_type="node", node=base),
                         init_pcl=xyz)
    mm = jnp.ones((64, 1))
    d1 = warp(params, cfg_lbs, xyz, jnp.float32(0.5), feature=None,
              motion_mask=mm)
    d2 = warp(params, cfg_dqb, xyz, jnp.float32(0.5), feature=None,
              motion_mask=mm)
    assert np.isfinite(np.asarray(d2["d_xyz"])).all()
    np.testing.assert_allclose(np.asarray(d1["d_xyz"]),
                               np.asarray(d2["d_xyz"]), atol=5e-3)


def test_dqb_rigid_exactness():
    """DQB of K identical rigid transforms must reproduce that transform
    exactly (LBS only matches for pure translation)."""
    from d2dgs_tpu.utils.dual_quaternion import dq_blend, quat_apply
    q = jnp.asarray([[0.9238795, 0.0, 0.3826834, 0.0]])  # 45 deg about y
    t = jnp.asarray([[0.3, -0.2, 0.1]])
    N, K = 8, 3
    qk = jnp.broadcast_to(q[:, None], (N, K, 4))
    tk = jnp.broadcast_to(t[:, None], (N, K, 3))
    w = jnp.full((N, K), 1.0 / K)
    qb, tb = dq_blend(qk, tk, w)
    x = jax.random.normal(jax.random.PRNGKey(2), (N, 3))
    got = quat_apply(qb, x) + tb
    want = quat_apply(jnp.broadcast_to(q, (N, 4)), x) + t
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


def test_render_test_set(tmp_path):
    from d2dgs_tpu.config import RasterConfig
    from d2dgs_tpu.data.synthetic import make_video_dataset
    from d2dgs_tpu.eval import render_test_set
    from d2dgs_tpu.train.config import TrainConfig
    from d2dgs_tpu.train.trainer import init_train_state

    cfg = TrainConfig(sh_degree=1, hyper_dim=2, node_num=8,
                      gaussian_capacity=64, node_gauss_capacity=32,
                      raster=RasterConfig(tile_cap=64, chunk=32))
    cams, imgs, pts, cols = make_video_dataset(
        jax.random.PRNGKey(0), n_cams=2, n_times=2, H=32, W=32, n_gauss=8)
    state = init_train_state(jax.random.PRNGKey(1), cfg, pts[:32], cols[:32])
    res = render_test_set(list(zip(cams, imgs)), state.gauss, state.nodes,
                          cfg.node_cfg, cfg.raster, out_dir=str(tmp_path))
    assert len(res["per_view"]) == 4
    assert np.isfinite(res["mean"]["psnr"])
    import os
    assert os.path.exists(tmp_path / "results.json")
    assert os.path.exists(tmp_path / "renders" / "00000.png")
