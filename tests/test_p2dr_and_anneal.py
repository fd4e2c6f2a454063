"""p2dR SVD rotation fitting + warp_with_bias editing path
(time_utils.py:1044-1078, 1165-1214) and ProgressiveBandFrequency time
annealing (time_utils.py:259-286)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from d2dgs_tpu.models.deform_mlp import (MLPConfig, init_mlp, mlp_forward,
                                         positional_encoding,
                                         progressive_band_encoding)
from d2dgs_tpu.models.nodes import (NodeConfig, init_node_params,
                                    init_nodes_from_pcl, p2dR, warp,
                                    warp_with_bias)
from d2dgs_tpu.utils.quaternion import quat_to_rotmat

CFG = NodeConfig(node_num=32, K=3, hyper_dim=2,
                 mlp=MLPConfig(depth=2, width=32, is_blender=True))


def _params(seed=0):
    key = jax.random.PRNGKey(seed)
    pcl = jax.random.normal(key, (64, 3))
    p = init_node_params(key, CFG)
    return init_nodes_from_pcl(p, CFG, pcl, jax.random.PRNGKey(1))


def _rotmat(axis, ang):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * K @ K


def test_p2dr_recovers_rigid_rotation():
    params = _params()
    p0 = params.nodes[:, :3]
    R = jnp.asarray(_rotmat([0.3, 1.0, -0.2], 0.7), jnp.float32)
    p = p0 @ R.T + jnp.array([0.1, -0.2, 0.05])
    q = p2dR(params, CFG, p=p, p0=p0, K=8, mode="nodes")
    R_fit = np.asarray(quat_to_rotmat(q))
    err = np.abs(R_fit - np.asarray(R)[None]).max()
    assert err < 5e-3, err


def test_warp_with_bias_translation():
    """A constant node translation bias must shift every (fully dynamic)
    Gaussian by exactly that amount (p2dR gives identity rotations)."""
    params = _params()
    x = jax.random.normal(jax.random.PRNGKey(2), (40, 3)) * 0.5
    feat = jnp.zeros((40, CFG.hyper_dim))
    mm = jnp.ones((40, 1))
    c = jnp.array([0.25, -0.1, 0.4])
    base = warp(params, CFG, x, 0.3, feature=feat, motion_mask=mm)
    out = warp_with_bias(params, CFG, x, 0.3, feat, mm,
                         node_trans_bias=jnp.broadcast_to(
                             c, (CFG.node_num, 3)))
    np.testing.assert_allclose(np.asarray(out["d_xyz"]),
                               np.asarray(base["d_xyz"] + c),
                               rtol=1e-3, atol=1e-3)
    # residual-mode: rotation bias reported separately, near identity
    qb = np.asarray(out["d_rotation_bias"])
    np.testing.assert_allclose(np.abs(qb[:, 0]), 1.0, atol=1e-3)
    np.testing.assert_allclose(qb[:, 1:], 0.0, atol=1e-3)


def test_progressive_band_encoding_ramp():
    t = jax.random.uniform(jax.random.PRNGKey(0), (16, 1))
    F, steps = 6, 600
    e0 = np.asarray(progressive_band_encoding(t, F, 0, steps))
    assert np.abs(e0).max() == 0.0            # step 0: everything masked
    efull = np.asarray(progressive_band_encoding(t, F, 10**9, steps))
    ref = np.asarray(positional_encoding(t, F))[:, 1:]  # drop identity
    np.testing.assert_allclose(efull, ref, rtol=1e-6, atol=1e-6)
    ehalf = np.asarray(progressive_band_encoding(t, F, steps // 2, steps))
    # low bands on, high bands still masked
    assert np.abs(ehalf[:, :2]).max() > 0.0
    assert np.abs(ehalf[:, -2:]).max() == 0.0


def test_mlp_with_progressive_band_time():
    cfg = MLPConfig(depth=2, width=32, progressive_band_time=True,
                    freq_masking_steps=100)
    params = init_mlp(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 3))
    t = jnp.full((8, 1), 0.4)
    d0 = mlp_forward(params, cfg, x, t, step=0)
    d1 = mlp_forward(params, cfg, x, t, step=10**9)
    assert d0["d_xyz"].shape == (8, 3)
    # annealing state changes the output (different effective embedding)
    assert not np.allclose(np.asarray(d0["d_xyz"]),
                           np.asarray(d1["d_xyz"]))
