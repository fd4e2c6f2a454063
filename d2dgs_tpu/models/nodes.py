"""Sparse-control-node deformation — the reference's ControlNodeWarp
(utils/time_utils.py:770-1387), functional and capacity-padded.

A set of M control nodes carries (xyz + hyper coords), a log radius and a
weight logit.  Deformation of a Gaussian = KNN(K=3)-weighted blend of the
per-node MLP deltas, gated by the Gaussian's motion mask; KNN runs in
(xyz ⊕ hyper) space with Gaussian-kernel weights exp(-d^2 / 2r^2) * w_node
(cal_nn_weight, time_utils.py:934-967).

TPU adaptations: node count is capacity-padded with an ``alive`` mask
(dead nodes are +inf distance in the KNN), node densify/prune is a masked
scatter (mirroring models/densify.py), RNG is explicit.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.knn import knn
from ..utils.general import farthest_point_sample
from .deform_mlp import MLPConfig, init_mlp, mlp_forward

ROT_BIAS = np.array([1.0, 0.0, 0.0, 0.0], np.float32)


@dataclasses.dataclass(frozen=True)
class NodeConfig:
    node_num: int = 512          # capacity M
    K: int = 3
    hyper_dim: int = 8
    d_rot_as_res: bool = True
    with_node_weight: bool = True
    with_arap_loss: bool = False
    is_scene_static: bool = False
    # "lbs": linear blend of per-node local-frame transforms (reference
    # default, time_utils.py:1148-1154); "dqb": dual-quaternion blend
    # (BASELINE.json's LBS-style DQ skinning option, SURVEY.md §2d)
    skinning: str = "lbs"
    # f32 KNN membership selection for bit-parity with the reference's
    # exact knn_points (docs/PARITY.md); default bf16 halves selection
    # traffic and only near-tie memberships can differ
    exact_knn: bool = False
    mlp: MLPConfig = MLPConfig()

    @property
    def lambda_arap_schedule(self):
        """(landmarks, steps) for the ARAP weight (time_utils.py:790-795)."""
        if self.with_arap_loss and not self.is_scene_static:
            return ([1e-4, 1e-4, 1e-5, 1e-5, 0],
                    [0, 5000, 10000, 20000, 20001])
        return ([0], [0])


@partial(jax.tree_util.register_dataclass,
         data_fields=["nodes", "node_radius", "node_weight", "mlp", "alive"],
         meta_fields=[])
@dataclasses.dataclass(frozen=True)
class NodeParams:
    nodes: jnp.ndarray        # [M, 3+hyper]
    node_radius: jnp.ndarray  # [M] log radius
    node_weight: jnp.ndarray  # [M, 1] logit
    mlp: dict
    alive: jnp.ndarray        # [M] bool

    @property
    def num_alive(self):
        return jnp.sum(self.alive.astype(jnp.int32))


def init_node_params(key, cfg: NodeConfig) -> NodeParams:
    k1, k2, k3 = jax.random.split(key, 3)
    m = cfg.node_num
    return NodeParams(
        nodes=jax.random.normal(k1, (m, 3 + cfg.hyper_dim), jnp.float32),
        node_radius=jax.random.normal(k2, (m,), jnp.float32),
        node_weight=jnp.zeros((m, 1), jnp.float32),
        mlp=init_mlp(k3, cfg.mlp),
        alive=jnp.ones((m,), bool))


def init_nodes_from_pcl(params: NodeParams, cfg: NodeConfig,
                        pcl: jnp.ndarray, key,
                        sample_pcl: jnp.ndarray | None = None) -> NodeParams:
    """FPS-sample node positions from a point cloud, set hyper coords to
    1e-2, radius to log(0.1 * scene_range) (time_utils.py:886-927).
    sample_pcl: optional alternative space to FPS in (hyper trajectories)."""
    m = cfg.node_num
    scene_range = jnp.max(pcl) - jnp.min(pcl)
    n = pcl.shape[0]
    if n <= m:
        xyz = jnp.zeros((m, 3), pcl.dtype).at[:n].set(pcl)
        alive = jnp.zeros((m,), bool).at[:n].set(True)
    else:
        idx = farthest_point_sample(
            key, pcl if sample_pcl is None else sample_pcl, m)
        xyz = pcl[idx]
        alive = jnp.ones((m,), bool)
    nodes = jnp.concatenate(
        [xyz, 1e-2 * jnp.ones((m, cfg.hyper_dim), jnp.float32)], axis=-1)
    radius = jnp.log(0.1 * scene_range + 1e-7) * jnp.ones((m,), jnp.float32)
    return dataclasses.replace(
        params, nodes=nodes, node_radius=radius,
        node_weight=jnp.zeros((m, 1), jnp.float32), alive=alive)


def cal_nn_weight(params: NodeParams, cfg: NodeConfig, x: jnp.ndarray,
                  feature: jnp.ndarray | None, K: int | None = None,
                  nodes: jnp.ndarray | None = None):
    """Gaussian->node binding weights (time_utils.py:934-967).

    x: [N,3] (stop-gradded inside); feature: [N,hyper] learnable hyper
    coords of the Gaussians. Returns (weight [N,K], dist2 [N,K], idx [N,K]).
    """
    K = cfg.K if K is None else K
    q = jax.lax.stop_gradient(x)
    base = params.nodes if nodes is None else nodes
    ref = jax.lax.stop_gradient(base[:, :3])
    if feature is not None and cfg.hyper_dim > 0:
        q = jnp.concatenate([q, feature[..., :cfg.hyper_dim]], axis=-1)
        ref = jnp.concatenate([ref, params.nodes[:, 3:]], axis=-1)
    # Index selection is non-differentiable: compute the full [N, M]
    # distance matrix fully detached (otherwise the take_along_axis VJP
    # materializes a dense [N, M] cotangent and re-runs the matmul
    # backward — ~85 ms at N=100k, M=512).  Exact top-K via K rounds of
    # argmin (k is tiny; XLA top_k sorts the whole row).
    q_sg, ref_sg = jax.lax.stop_gradient(q), jax.lax.stop_gradient(ref)
    d2_full = (jnp.sum(q_sg * q_sg, axis=-1, keepdims=True)
               + jnp.sum(ref_sg * ref_sg, axis=-1)[None, :]
               - 2.0 * jnp.dot(q_sg, ref_sg.T,
                               preferred_element_type=jnp.float32))
    d2_full = jnp.maximum(d2_full, 0.0)
    d2_full = jnp.where(params.alive[None, :], d2_full, jnp.inf)
    # membership selection runs in bf16 (halves the [N, M] argmin-round
    # traffic); the EXACT distances used for the weights are recomputed
    # in f32 below, so only near-tie neighbor membership can differ
    # (docs/PARITY.md; exact_knn keeps the selection in f32)
    d2_sel = d2_full if cfg.exact_knn else d2_full.astype(jnp.bfloat16)
    cols = jnp.arange(d2_full.shape[1], dtype=jnp.int32)[None, :]
    idxs = []
    for _ in range(K):
        i = jnp.argmin(d2_sel, axis=1).astype(jnp.int32)
        idxs.append(i)
        d2_sel = jnp.where(cols == i[:, None], jnp.bfloat16(jnp.inf),
                           d2_sel)
    idx = jnp.stack(idxs, axis=-1)                        # [N,K]
    # differentiable distances recomputed ONLY at the K selected nodes
    # (grads w.r.t. hyper coords flow exactly as in the reference's
    # differentiable knn_points distances, time_utils.py:934-967).
    # ONE packed row gather instead of separate ref/radius/weight
    # lookups: K-wide 1-column gathers run at ~10 ns/element on TPU
    # (three of them were ~6 ms of the warp at N=100k).
    d_dim = ref.shape[-1]
    pack = jnp.concatenate(
        [ref, jnp.exp(params.node_radius)[:, None], params.node_weight],
        axis=-1)                                          # [M, D+2]
    pk = pack[idx]                                        # [N,K,D+2]
    diff = q[:, None, :] - pk[..., :d_dim]
    nn_dist = jnp.sum(diff * diff, axis=-1)               # [N,K]

    r = pk[..., d_dim]
    w = jnp.exp(-nn_dist / (2.0 * r * r))
    if cfg.with_node_weight:
        w = w * jax.nn.sigmoid(pk[..., d_dim + 1])
    w = w + 1e-7
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    return w, nn_dist, idx


def expand_time(params: NodeParams, t) -> jnp.ndarray:
    """scalar t -> [M,1] (time_utils.py:929-932)."""
    m = params.nodes.shape[0]
    return jnp.broadcast_to(jnp.asarray(t, jnp.float32).reshape(1, 1), (m, 1))


def node_deform(params: NodeParams, cfg: NodeConfig, t: jnp.ndarray,
                detach_node: bool = True, step=10**9) -> dict:
    """Query the MLP at node positions. t: [M,1] or [M,T,1]
    (time_utils.py:990-1002).  `step` is the traced training iteration
    driving progressive_band_time annealing (deform.update(iteration) at
    train_gui.py:434)."""
    xyz = params.nodes[:, :3]
    if detach_node:
        xyz = jax.lax.stop_gradient(xyz)
    if t.ndim == 3:
        m, tt, _ = t.shape
        xyz = jnp.broadcast_to(xyz[:, None, :], (m, tt, 3))
    return mlp_forward(params.mlp, cfg.mlp, xyz, t, step=step)


def warp(params: NodeParams, cfg: NodeConfig, x: jnp.ndarray, t,
         feature: jnp.ndarray | None, motion_mask: jnp.ndarray,
         step=10**9) -> dict:
    """Deform Gaussians at time t (ControlNodeWarp.forward,
    time_utils.py:1133-1226; the interactive-editing node_trans_bias paths
    live in the editing module, not here).

    x: [N,3] canonical xyz; t: scalar or [M,1]; motion_mask: [N,1];
    step: traced training iteration (progressive_band_time annealing).
    Returns dict(d_xyz [N,3], d_rotation [N,4], d_scaling [N,2],
    d_opacity, d_color).
    """
    t = expand_time(params, t) if jnp.ndim(t) == 0 else t
    x = jax.lax.stop_gradient(x)
    nn_weight, _, nn_idx = cal_nn_weight(params, cfg, x, feature)
    attrs = node_deform(params, cfg, t, step=step)
    node_trans, node_rot = attrs["d_xyz"], attrs["d_rotation"]
    node_scale = attrs["d_scaling"]
    m = params.nodes.shape[0]

    # K-sparse blend matrix [N, M] built from equality masks: every
    # per-node blend becomes ONE MXU matmul Wmat @ cols instead of K-row
    # gathers + scatter-add transposes (TPU gathers run ~1 elem/cycle;
    # at N=100k this was the single largest cost of the warp).
    # Differentiable w.r.t. nn_weight; nn_idx is integer/non-diff.
    colid = jnp.arange(m, dtype=jnp.int32)[None, :]
    Wmat = jnp.zeros((x.shape[0], m), jnp.float32)
    for k in range(nn_idx.shape[1]):
        Wmat = Wmat + nn_weight[:, k:k + 1] * (colid == nn_idx[:, k:k + 1])

    cols = [node_trans, node_rot, node_scale]
    if cfg.mlp.pred_opacity and attrs["d_opacity"] is not None:
        cols.append(attrs["d_opacity"])
    if cfg.mlp.pred_color and attrs["d_color"] is not None:
        cols.append(attrs["d_color"])

    use_dqb = cfg.mlp.local_frame and cfg.skinning == "dqb"
    if cfg.mlp.local_frame and not use_dqb:
        # rigid local frames: A_k(x) = R_k (x - p_k) + p_k + tr_k; the
        # x-dependence factors as (sum_k w R_k) x + sum_k w_k v_k with the
        # per-node v_k = p_k + tr_k - R_k p_k — all blendable by Wmat.
        from ..utils.quaternion import quat_to_rotmat
        Rl = quat_to_rotmat(attrs["local_rotation"] + ROT_BIAS)  # [M,3,3]
        p = jax.lax.stop_gradient(params.nodes[:, :3])
        v = p + node_trans - jnp.einsum("mij,mj->mi", Rl, p)
        cols = [Rl.reshape(m, 9), v] + cols[1:]   # node_trans folded into v

    widths = [c.shape[-1] for c in cols]
    blended = Wmat @ jnp.concatenate(cols, axis=-1)           # [N, sum(C)]
    parts = jnp.split(blended, np.cumsum(widths)[:-1], axis=-1)

    if use_dqb:
        # dual-quaternion blend of the per-node rigid transforms
        # A_k(x) = R_k (x - p_k) + p_k + tr_k  =>  (R_k, p_k + tr_k - R_k p_k)
        from ..utils.dual_quaternion import dq_blend, quat_apply
        from ..utils.quaternion import quat_normalize
        local_rot = quat_normalize(attrs["local_rotation"] + ROT_BIAS,
                                   eps=1e-12)
        nn_nodes = jax.lax.stop_gradient(params.nodes[nn_idx, :3])
        qk = local_rot[nn_idx]                            # [N,K,4]
        tk = (nn_nodes + node_trans[nn_idx]
              - quat_apply(qk, nn_nodes))                 # [N,K,3]
        qb, tb = dq_blend(qk, tk, nn_weight)
        translate = quat_apply(qb, x) + tb - x
        rot_b, scale_b, *rest = parts[1:]
    elif cfg.mlp.local_frame:
        Rb = parts[0].reshape(-1, 3, 3)
        translate = jnp.einsum("nij,nj->ni", Rb, x) + parts[1] - x
        rot_b, scale_b, *rest = parts[2:]
    else:
        translate = parts[0]
        rot_b, scale_b, *rest = parts[1:]
    translate = translate * motion_mask

    if cfg.d_rot_as_res:
        rotation = rot_b * motion_mask
    else:
        # blend(node_rot + ROT_BIAS) == rot_b + ROT_BIAS (weights sum to 1)
        rotation = rot_b * motion_mask + ROT_BIAS

    scale = scale_b * motion_mask
    out = {"d_xyz": translate, "d_rotation": rotation, "d_scaling": scale,
           "d_opacity": None, "d_color": None}
    ri = 0
    if cfg.mlp.pred_opacity and attrs["d_opacity"] is not None:
        out["d_opacity"] = rest[ri] * motion_mask
        ri += 1
    if cfg.mlp.pred_color and attrs["d_color"] is not None:
        out["d_color"] = rest[ri] * motion_mask
    return out


def get_trajectory(params: NodeParams, cfg: NodeConfig,
                   t_samp_num: int = 8) -> jnp.ndarray:
    """Node positions at linspace(0,1) timestamps, detached
    (time_utils.py:1026-1042). Returns [M, T, 3]."""
    m = params.nodes.shape[0]
    t_samp = jnp.linspace(0.0, 1.0, t_samp_num)
    t = jnp.broadcast_to(t_samp[None, :, None], (m, t_samp_num, 1))
    d_xyz = node_deform(params, cfg, t)["d_xyz"]
    return jax.lax.stop_gradient(params.nodes[:, None, :3] + d_xyz)


def p2dR(params: NodeParams, cfg: NodeConfig, p: jnp.ndarray,
         p0: jnp.ndarray, K: int = 8, mode: str = "trajectory"):
    """SVD-fit per-node rotations from node positions
    (time_utils.py:1044-1078): neighbors from the (hyper-)trajectory KNN
    graph, normalized edges at rest (p0) vs deformed (p), weighted
    covariance, dR = V U^T as quaternions.

    Faithful notes: the reference weights neighbors with
    softmax(d^2/mean(d^2)) (heavier weight on FAR neighbors) and applies
    no det(R) sign fix; both reproduced as-is for parity.  Everything is
    detached (torch.no_grad in all call sites)."""
    from ..utils.quaternion import rotmat_to_quat
    p = jax.lax.stop_gradient(p)
    p0 = jax.lax.stop_gradient(p0)
    if mode == "trajectory":
        traj = get_trajectory(params, cfg, t_samp_num=4)
        feats = traj.reshape(traj.shape[0], -1)
    else:   # plain node-position KNN (the reference's default branch)
        feats = jax.lax.stop_gradient(params.nodes[:, :3])
    d2, idx = knn(feats, feats, K, exclude_self=True)
    w = jax.nn.softmax(d2 / (jnp.mean(d2) + 1e-12), axis=-1)   # [M,K]
    e0 = p0[idx] - p0[:, None, :]
    et = p[idx] - p[:, None, :]
    e0 = e0 / (jnp.linalg.norm(e0, axis=-1, keepdims=True) + 1e-5)
    et = et / (jnp.linalg.norm(et, axis=-1, keepdims=True) + 1e-5)
    S = jnp.einsum("nka,nk,nkb->nab", e0, w, et)
    U, _, Vt = jnp.linalg.svd(S)
    dR = jnp.einsum("nji,nkj->nik", Vt, U)                     # V @ U^T
    return rotmat_to_quat(dR)


def warp_with_bias(params: NodeParams, cfg: NodeConfig, x: jnp.ndarray,
                   t, feature, motion_mask,
                   node_trans_bias: jnp.ndarray,
                   K_rebind: int = 32) -> dict:
    """Animation/editing warp with an extra per-node translation bias
    (ControlNodeWarp.forward's node_trans_bias paths,
    time_utils.py:1165-1214): the bias moves the nodes, p2dR fits the
    induced per-node rotations, and Gaussians are re-skinned rigidly
    about their (biased) nodes.  All bias handling is detached, exactly
    like the reference's torch.no_grad blocks."""
    from ..utils.quaternion import quat_multiply, quat_to_rotmat
    base = warp(params, cfg, x, t, feature=feature,
                motion_mask=motion_mask)
    sg = jax.lax.stop_gradient
    t_e = expand_time(params, t) if jnp.ndim(t) == 0 else t
    attrs = node_deform(params, cfg, t_e)
    node_trans = sg(attrs["d_xyz"])
    x = sg(x)

    cur_node = sg(params.nodes[:, :3]) + node_trans        # nodes at t
    nodes_t = cur_node + node_trans_bias                   # + edit bias
    node_rot_bias = p2dR(params, cfg, p=nodes_t, p0=cur_node, K=8)

    # re-bind Gaussians at their CURRENT positions to the moved nodes
    cur_gs = x + sg(base["d_xyz"])
    nn_weight, _, nn_idx = cal_nn_weight(
        params, cfg, cur_gs, feature=None,
        K=min(K_rebind, params.nodes.shape[0]), nodes=cur_node)
    Rb = quat_to_rotmat(node_rot_bias)[nn_idx]             # [N,K,3,3]
    rel = cur_gs[:, None, :] - cur_node[nn_idx]
    gs_t = nodes_t[nn_idx] + jnp.einsum("gkab,gkb->gka", Rb, rel)
    gs_avg = jnp.sum(gs_t * nn_weight[..., None], axis=1)
    translate = (gs_avg - x) * motion_mask

    d_rot_bias = jnp.sum(node_rot_bias[nn_idx] * nn_weight[..., None],
                         axis=1)
    d_rot_bias = (d_rot_bias - ROT_BIAS) * motion_mask + ROT_BIAS
    out = dict(base)
    out["d_xyz"] = translate
    if cfg.d_rot_as_res:
        out["d_rotation_bias"] = d_rot_bias
    else:
        # fold the bias rotation into the absolute rotation field
        rot = base["d_rotation"]
        out["d_rotation"] = quat_multiply(d_rot_bias, rot)
    return out


# ----------------------------------------------------------------------
# Node densification (time_utils.py:1269-1386) under static capacity
# ----------------------------------------------------------------------

def cal_node_importance(params: NodeParams, cfg: NodeConfig, x: jnp.ndarray,
                        weights: jnp.ndarray, feature: jnp.ndarray | None):
    """Importance voting: Gaussians scatter their (weighted) influence onto
    their KNN nodes. Returns (importance [M], avg_x [M,3+h], edge_count [M])."""
    m = params.nodes.shape[0]
    xh = x
    if cfg.hyper_dim > 0 and feature is not None:
        xh = jnp.concatenate([x, feature[..., :cfg.hyper_dim]], axis=-1)
    nn_weight, _, nn_idx = cal_nn_weight(params, cfg, x, feature)
    flat_idx = nn_idx.reshape(-1)
    ww = (nn_weight * weights[:, None]).reshape(-1)
    importance = jnp.zeros((m,), jnp.float32).at[flat_idx].add(ww)
    edge_count = jnp.zeros((m,), jnp.float32).at[flat_idx].add(
        nn_weight.reshape(-1))
    dim = xh.shape[-1]
    contrib = ww[:, None] * jnp.broadcast_to(
        xh[:, None, :], (*nn_weight.shape, dim)).reshape(-1, dim)
    avg_x = jnp.zeros((m, dim), jnp.float32).at[flat_idx].add(contrib)
    avg_x = avg_x / jnp.maximum(importance[:, None], 1e-12)
    importance = importance / (edge_count + 1e-7)
    return importance, avg_x, edge_count


def densify_nodes(params: NodeParams, cfg: NodeConfig, mu, nu,
                  x: jnp.ndarray, x_grad: jnp.ndarray,
                  feature: jnp.ndarray | None, max_grad: float,
                  alive_gaussians: jnp.ndarray):
    """Add nodes where Gaussian-gradient importance is high; prune nodes no
    Gaussian binds to (time_utils.py:1286-1386). mu/nu: Adam moment dicts
    with leaves {nodes, node_radius, node_weight}."""
    g = jnp.nan_to_num(jnp.linalg.norm(x_grad, axis=-1))
    g = jnp.where(alive_gaussians, g, 0.0)
    importance, avg_x, edge_count = cal_node_importance(
        params, cfg, x, g, feature)
    sel = params.alive & (importance > max_grad) & jnp.all(
        jnp.isfinite(avg_x), axis=-1)
    prune = params.alive & (edge_count == 0.0)
    alive = params.alive & ~prune

    # free-slot assignment (same scheme as models/densify.py)
    m = params.nodes.shape[0]
    free = ~alive
    rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    inv = jnp.full((m,), m, jnp.int32).at[
        jnp.where(free, rank, m)].set(jnp.arange(m, dtype=jnp.int32),
                                      mode="drop")
    num_free = jnp.sum(free.astype(jnp.int32))
    sel_rank = jnp.where(sel, jnp.cumsum(sel.astype(jnp.int32)) - 1, m)
    dest = jnp.where(sel & (sel_rank < num_free),
                     inv[jnp.clip(sel_rank, 0, m - 1)], m)

    nodes = params.nodes.at[dest].set(avg_x, mode="drop")
    radius = params.node_radius.at[dest].set(params.node_radius, mode="drop")
    weight = params.node_weight.at[dest].set(params.node_weight, mode="drop")
    alive = alive.at[dest].set(True, mode="drop")

    def zero_rows(t):
        return {k: v.at[dest].set(jnp.zeros_like(v[0]), mode="drop")
                for k, v in t.items()}

    info = dict(added=jnp.sum(dest < m), pruned=jnp.sum(prune))
    return (dataclasses.replace(params, nodes=nodes, node_radius=radius,
                                node_weight=weight, alive=alive),
            zero_rows(mu), zero_rows(nu), info)
