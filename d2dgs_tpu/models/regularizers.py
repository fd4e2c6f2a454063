"""Deformation-field regularizers: ARAP, elastic, acceleration.

Re-derivations of utils/deform_utils.py (cal_connectivity_from_points,
estimate_rotation, cal_arap_error) and the loss entries in
utils/time_utils.py:1080-1131.  Variable-length edge lists become dense
[M, K] neighbour tables with zero weights for dropped edges (numerically
identical: dropped edges contribute nothing to covariances or energies).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.knn import knn
from .nodes import NodeConfig, NodeParams, cal_nn_weight, node_deform


def _safe_norm(x, axis=-1, eps=1e-20):
    """||x|| with a finite gradient at 0 (jnp.linalg.norm NaNs there)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis) + eps)


def landmark_interpolate(landmarks, steps, step, interpolation="log"):
    """Piecewise schedule used for loss weights (time_utils.py:485-503).
    Host-side (python floats)."""
    stage = int((step >= np.array(steps)).sum())
    if stage == len(steps):
        return max(0, landmarks[-1])
    if stage == 0:
        return 0
    ldm1, ldm2 = landmarks[stage - 1], landmarks[stage]
    if ldm2 <= 0:
        return 0
    s1, s2 = steps[stage - 1], steps[stage]
    ratio = (step - s1) / (s2 - s1)
    if interpolation == "log":
        return float(np.exp(np.log(ldm1) * (1 - ratio) + np.log(ldm2) * ratio))
    return float(ldm1 * (1 - ratio) + ldm2 * ratio)


def connectivity_from_points(points: jnp.ndarray, radius: float = 0.1,
                             K: int = 10, least_edge_num: int = 3):
    """KNN graph with radius cutoff beyond the first `least_edge_num`
    neighbours and adaptive softmax-free weighting
    (deform_utils.py:59-115). Returns (nn_idx [M,K], weight [M,K])."""
    d2, idx = knn(points, points, K, exclude_self=True)
    keep = jnp.arange(K)[None, :] < least_edge_num
    keep = keep | (d2 < radius * radius)
    d2 = jnp.where(keep, d2, jnp.inf)
    w = jnp.exp(-d2 / jnp.mean(jnp.where(jnp.isfinite(d2), d2, 0.0)))
    w = jnp.where(keep, w, 0.0)
    w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-12)
    return idx, w, keep


def estimate_rotation(source: jnp.ndarray, target: jnp.ndarray,
                      nn_idx: jnp.ndarray, weight: jnp.ndarray):
    """Per-vertex weighted Procrustes rotations (deform_utils.py:131-167),
    det-flip corrected. source/target: [M,3]. Returns R [M,3,3] with
    target_edges ~ R @ source_edges."""
    E0 = source[nn_idx] - source[:, None]       # [M,K,3]
    E1 = target[nn_idx] - target[:, None]
    S = jnp.einsum("mka,mk,mkb->mab", E0, weight, E1)
    unchanged = jnp.all(E0 == E1, axis=(1, 2))
    S = jnp.where(unchanged[:, None, None], 0.0, S)
    U, sig, Vh = jnp.linalg.svd(S)
    V = jnp.swapaxes(Vh, -1, -2)
    R = V @ jnp.swapaxes(U, -1, -2)
    det = jnp.linalg.det(R)
    col = jnp.argmin(sig, axis=-1)
    flip = jnp.where(jnp.arange(3)[None, :] == col[:, None], -1.0, 1.0)
    U_mod = U * flip[:, None, :]
    R_fix = V @ jnp.swapaxes(U_mod, -1, -2)
    return jnp.where((det <= 0)[:, None, None], R_fix, R)


def arap_energy(nodes_seq: jnp.ndarray, nn_idx, weight, sample_idx=None):
    """cal_arap_error (deform_utils.py:177-207): sum over t>0 of weighted
    stretch ||E_t - R E_0||^2 with no-grad best-fit rotations.
    nodes_seq: [T, M, 3]."""
    src = nodes_seq[0]
    if sample_idx is not None:
        nn_idx_s = nn_idx[sample_idx]
        weight_s = weight[sample_idx]
    else:
        sample_idx = jnp.arange(src.shape[0])
        nn_idx_s, weight_s = nn_idx, weight

    E0 = src[nn_idx_s] - src[sample_idx][:, None]
    total = 0.0
    for ti in range(1, nodes_seq.shape[0]):
        tgt = nodes_seq[ti]
        R = jax.lax.stop_gradient(
            _estimate_rotation_sampled(src, tgt, nn_idx_s, weight_s,
                                       sample_idx))
        E1 = tgt[nn_idx_s] - tgt[sample_idx][:, None]
        stretch = E1 - jnp.einsum("mab,mkb->mka", R, E0)
        total = total + jnp.sum(weight_s * jnp.sum(stretch ** 2, axis=-1))
    return total


def _estimate_rotation_sampled(source, target, nn_idx_s, weight_s,
                               sample_idx):
    E0 = source[nn_idx_s] - source[sample_idx][:, None]
    E1 = target[nn_idx_s] - target[sample_idx][:, None]
    S = jnp.einsum("mka,mk,mkb->mab", E0, weight_s, E1)
    unchanged = jnp.all(E0 == E1, axis=(1, 2))
    S = jnp.where(unchanged[:, None, None], 0.0, S)
    U, sig, Vh = jnp.linalg.svd(S)
    V = jnp.swapaxes(Vh, -1, -2)
    R = V @ jnp.swapaxes(U, -1, -2)
    det = jnp.linalg.det(R)
    col = jnp.argmin(sig, axis=-1)
    flip = jnp.where(jnp.arange(3)[None, :] == col[:, None], -1.0, 1.0)
    R_fix = V @ jnp.swapaxes(U * flip[:, None, :], -1, -2)
    return jnp.where((det <= 0)[:, None, None], R_fix, R)


def arap_loss(params: NodeParams, cfg: NodeConfig, key,
              t=None, delta_t: float = 0.05, t_samp_num: int = 2,
              sample_num: int = 512) -> jnp.ndarray:
    """time_utils.py:1080-1089: sample t_samp_num times in a delta_t
    window, KNN graph (K=10) over the deformed nodes at the first sample,
    weighted stretch energy with frozen best-fit rotations."""
    k1, k2, k3 = jax.random.split(key, 3)
    if t is None:
        t = jax.random.uniform(k1)
    else:
        t = jnp.asarray(t).reshape(()) + delta_t * (jax.random.uniform(k1) - 0.5)
    t_samp = jax.random.uniform(k2, (t_samp_num,)) * delta_t + t - 0.5 * delta_t
    m = params.nodes.shape[0]
    tt = jnp.broadcast_to(t_samp[None, :, None], (m, t_samp_num, 1))
    d_xyz = node_deform(params, cfg, tt)["d_xyz"]          # [M,T,3]
    nodes_t = jax.lax.stop_gradient(params.nodes[:, None, :3]) + d_xyz
    nodes_seq = jnp.swapaxes(nodes_t, 0, 1)                 # [T,M,3]

    # cal_arap_error is invoked WITHOUT the adaptive connectivity weights
    # (time_utils.py:1086) — every surviving edge gets weight 1.
    nn_idx, _, keep = connectivity_from_points(nodes_seq[0], K=10)
    weight = keep.astype(jnp.float32)
    weight = weight * params.alive[nn_idx] * params.alive[:, None]
    if m > sample_num:
        # sample LIVE nodes without replacement (deform_utils.py:189-190
        # uses randperm; with-replacement double-counts energy and can
        # hit dead capacity slots).  Gumbel top-k == weighted sampling
        # without replacement restricted to alive slots.
        g = jax.random.gumbel(k3, (m,)) + jnp.where(params.alive, 0.0,
                                                    -jnp.inf)
        _, sample_idx = jax.lax.top_k(g, sample_num)
    else:
        sample_idx = None
    return arap_energy(nodes_seq, nn_idx, weight, sample_idx)


def elastic_loss(params: NodeParams, cfg: NodeConfig, key,
                 t=None, delta_t: float = 0.005, K: int = 2,
                 t_samp_num: int = 8) -> jnp.ndarray:
    """Edge-length variance over a short time window
    (time_utils.py:1091-1108)."""
    k1, k2 = jax.random.split(key)
    if t is None:
        t = jax.random.uniform(k1)
    else:
        t = jnp.asarray(t).reshape(()) + delta_t * (jax.random.uniform(k1) - 0.5)
    t_samp = jax.random.uniform(k2, (t_samp_num,)) * delta_t + t - 0.5 * delta_t
    m = params.nodes.shape[0]
    tt = jnp.broadcast_to(t_samp[None, :, None], (m, t_samp_num, 1))
    d_xyz = node_deform(params, cfg, tt)["d_xyz"]
    nodes_t = jax.lax.stop_gradient(params.nodes[:, None, :3]) + d_xyz  # [M,T,3]

    xyz = jax.lax.stop_gradient(params.nodes[:, :3])
    nn_weight, _, nn_idx = cal_nn_weight(params, cfg, xyz,
                                         params.nodes[:, 3:], K=K + 1)
    nn_weight, nn_idx = nn_weight[:, 1:], nn_idx[:, 1:]   # drop self

    edge_t = _safe_norm(nodes_t[nn_idx] - nodes_t[:, None])
    var = jnp.var(edge_t, axis=2, ddof=1)                  # [M,K]
    var = var / (jax.lax.stop_gradient(var) + 1e-5)
    per_node = jnp.sum(var * nn_weight, axis=1)
    return jnp.mean(jnp.where(params.alive, per_node, 0.0))


def acc_loss(params: NodeParams, cfg: NodeConfig, key,
             t=None, delta_t: float = 0.005) -> jnp.ndarray:
    """Second finite difference of node trajectories
    (time_utils.py:1110-1120)."""
    if t is None:
        t = jax.random.uniform(key)
    else:
        t = jnp.asarray(t).reshape(()) + delta_t * (jax.random.uniform(key) - 0.5)
    ts = jnp.stack([t - delta_t, t, t + delta_t])
    m = params.nodes.shape[0]
    tt = jnp.broadcast_to(ts[None, :, None], (m, 3, 1))
    d_xyz = node_deform(params, cfg, tt)["d_xyz"]
    nodes_t = jax.lax.stop_gradient(params.nodes[:, None, :3]) + d_xyz
    acc = _safe_norm(nodes_t[:, 0] + nodes_t[:, 2] - 2 * nodes_t[:, 1])
    acc = acc / (jax.lax.stop_gradient(acc) + 1e-5)
    return jnp.mean(jnp.where(params.alive, acc, 0.0))
