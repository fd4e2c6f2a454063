"""Deformation stack: MLP init/identity, node binding, warp, regularizers."""
import jax
import jax.numpy as jnp
import numpy as np

from d2dgs_tpu.models import regularizers as R
from d2dgs_tpu.models.deform_mlp import (MLPConfig, embed_dim, init_mlp,
                                         mlp_forward, positional_encoding)
from d2dgs_tpu.models.nodes import (NodeConfig, cal_nn_weight,
                                    init_node_params, init_nodes_from_pcl,
                                    node_deform, warp)

CFG = NodeConfig(node_num=32, hyper_dim=4,
                 mlp=MLPConfig(depth=4, width=64, is_blender=True))


def make_nodes(key=0, n_pcl=100):
    k = jax.random.PRNGKey(key)
    p = init_node_params(k, CFG)
    pcl = jax.random.uniform(jax.random.PRNGKey(key + 1), (n_pcl, 3),
                             minval=-1, maxval=1)
    return init_nodes_from_pcl(p, CFG, pcl, k), pcl


def test_positional_encoding_shape_and_values():
    x = jnp.array([[0.5, -0.2, 1.0]])
    e = positional_encoding(x, 10)
    assert e.shape == (1, embed_dim(10, 3))
    np.testing.assert_allclose(np.asarray(e[0, :3]), [0.5, -0.2, 1.0])
    # first frequency block: sin(x * 2^0)
    np.testing.assert_allclose(np.asarray(e[0, 3:6]),
                               np.sin([0.5, -0.2, 1.0]), rtol=1e-6)


def test_mlp_near_identity_at_init():
    cfg = MLPConfig(depth=8, width=256, is_blender=True)
    params = init_mlp(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (17, 3))
    t = jnp.full((17, 1), 0.37)
    out = mlp_forward(params, cfg, x, t)
    assert float(jnp.max(jnp.abs(out["d_xyz"]))) < 1e-2
    assert float(jnp.max(jnp.abs(out["d_scaling"]))) < 1e-4
    assert out["d_rotation"].shape == (17, 4)
    assert out["d_scaling"].shape == (17, 2)


def test_nn_weights_normalized_and_alive_only():
    p, pcl = make_nodes()
    import dataclasses
    p = dataclasses.replace(p, alive=p.alive.at[5:].set(False))
    feat = jnp.zeros((50, 4))
    w, d2, idx = cal_nn_weight(p, CFG, pcl[:50], feat)
    np.testing.assert_allclose(np.asarray(jnp.sum(w, axis=-1)), 1.0,
                               rtol=1e-5)
    assert int(jnp.max(idx)) < 5  # only alive nodes selected


def test_warp_shapes_and_motion_mask_gating():
    p, pcl = make_nodes()
    n = 80
    x = pcl[:n]
    feat = jnp.full((n, 4), 1e-2)
    mm = jnp.ones((n, 1)).at[40:].set(0.0)
    out = warp(p, CFG, x, jnp.float32(0.5), feat, mm)
    assert out["d_xyz"].shape == (n, 3)
    assert out["d_rotation"].shape == (n, 4)
    assert out["d_scaling"].shape == (n, 2)
    # masked gaussians get exactly zero deltas
    assert float(jnp.max(jnp.abs(out["d_xyz"][40:]))) == 0.0
    assert float(jnp.max(jnp.abs(out["d_rotation"][40:]))) == 0.0


def test_estimate_rotation_recovers_rigid():
    key = jax.random.PRNGKey(3)
    src = jax.random.normal(key, (30, 3))
    theta = 0.7
    Rz = jnp.array([[np.cos(theta), -np.sin(theta), 0],
                    [np.sin(theta), np.cos(theta), 0], [0, 0, 1.0]])
    tgt = src @ Rz.T + jnp.array([1.0, -2.0, 0.5])
    nn_idx, w, _ = R.connectivity_from_points(src, K=8)
    Rhat = R.estimate_rotation(src, tgt, nn_idx, w)
    np.testing.assert_allclose(np.asarray(Rhat),
                               np.tile(np.asarray(Rz), (30, 1, 1)), atol=1e-4)
    # ARAP energy of a rigid motion is ~0
    seq = jnp.stack([src, tgt])
    e = R.arap_energy(seq, nn_idx, w)
    assert float(e) < 1e-8


def test_reg_losses_finite():
    p, _ = make_nodes()
    key = jax.random.PRNGKey(0)
    for fn in (R.arap_loss, R.elastic_loss, R.acc_loss):
        v = fn(p, CFG, key)
        assert np.isfinite(float(v)), fn.__name__
        assert float(v) >= 0.0
    # gradient flows to MLP
    g = jax.grad(lambda mlp: R.elastic_loss(
        p.__class__(nodes=p.nodes, node_radius=p.node_radius,
                    node_weight=p.node_weight, mlp=mlp, alive=p.alive),
        CFG, key))(p.mlp)
    leaves = jax.tree.leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in leaves)


def test_landmark_interpolate():
    lm = [1e-4, 1e-4, 1e-5, 1e-5, 0]
    st = [0, 5000, 10000, 20000, 20001]
    assert R.landmark_interpolate(lm, st, 0) == 1e-4 or \
        R.landmark_interpolate(lm, st, 1) > 0
    assert R.landmark_interpolate(lm, st, 2500) == np.exp(
        (np.log(1e-4) + np.log(1e-4)) / 2)
    assert R.landmark_interpolate(lm, st, 30000) == 0
