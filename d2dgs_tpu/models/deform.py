"""Deformation-field facade — the reference's DeformModel
(scene/deform_model.py:10-72) dispatching on deform_type:

* "node"   — ControlNodeWarp sparse-control skinning (models/nodes.py),
             the D-2DGS default.
* "mlp"    — DeformNetwork queried directly at each Gaussian
             (utils/time_utils.py:208-459; the SC-GS/D-NeRF route).
* "hash"   — multi-resolution hash-grid field (models/hash_deform.py;
             the reference's tinycudann HashDeformNetwork,
             utils/time_utils.py:517-767, re-built in JAX).
* "static" — no deformation (StaticNetwork, time_utils.py:462-470).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from .deform_mlp import MLPConfig, init_mlp, mlp_forward
from .hash_deform import HashConfig, hash_deform_forward, init_hash_deform
from .nodes import (NodeConfig, NodeParams, init_node_params,
                    init_nodes_from_pcl, warp)


@dataclasses.dataclass(frozen=True)
class DeformConfig:
    deform_type: str = "node"          # node | mlp | hash | static
    node: NodeConfig = NodeConfig()
    mlp: MLPConfig = MLPConfig()
    hash: HashConfig = HashConfig()


def init_deform(key, cfg: DeformConfig, init_pcl=None) -> Any:
    """Returns the parameter pytree for the chosen field."""
    if cfg.deform_type == "node":
        params = init_node_params(key, cfg.node)
        if init_pcl is not None:
            k1, k2 = jax.random.split(key)
            params = init_nodes_from_pcl(params, cfg.node,
                                         jnp.asarray(init_pcl), k2)
        return params
    if cfg.deform_type == "mlp":
        return init_mlp(key, cfg.mlp)
    if cfg.deform_type == "hash":
        return init_hash_deform(key, cfg.hash)
    if cfg.deform_type == "static":
        return {}
    raise ValueError(f"unknown deform_type {cfg.deform_type!r}")


def apply_deform_field(params, cfg: DeformConfig, xyz: jnp.ndarray, t,
                       feature=None, motion_mask=None, step=10**9) -> dict:
    """Uniform interface: -> dict(d_xyz, d_rotation, d_scaling,
    d_opacity, d_color) with the 'node'/'mlp'/'static' semantics of
    DeformModel.step (scene/deform_model.py:41-44)."""
    n = xyz.shape[0]
    if cfg.deform_type == "node":
        assert isinstance(params, NodeParams)
        mm = (motion_mask if motion_mask is not None
              else jnp.ones((n, 1), jnp.float32))
        return warp(params, cfg.node, xyz, t, feature=feature,
                    motion_mask=mm, step=step)
    if cfg.deform_type == "mlp":
        tt = jnp.broadcast_to(jnp.asarray(t, jnp.float32).reshape(1, 1),
                              (n, 1)) if jnp.ndim(t) == 0 else t
        d = mlp_forward(params, cfg.mlp, jax.lax.stop_gradient(xyz), tt,
                        step=step)
        return {"d_xyz": d["d_xyz"], "d_rotation": d["d_rotation"],
                "d_scaling": d["d_scaling"],
                "d_opacity": d.get("d_opacity"),
                "d_color": d.get("d_color")}
    if cfg.deform_type == "hash":
        d = hash_deform_forward(params, cfg.hash,
                                jax.lax.stop_gradient(xyz), t, step=step)
        return {"d_xyz": d["d_xyz"], "d_rotation": d["d_rotation"],
                "d_scaling": d["d_scaling"],
                "d_opacity": d.get("d_opacity"),
                "d_color": d.get("d_color")}
    # static
    z3 = jnp.zeros((n, 3))
    return {"d_xyz": z3, "d_rotation": jnp.zeros((n, 4)),
            "d_scaling": jnp.zeros((n, 2)), "d_opacity": None,
            "d_color": None}


def deform_gaussians(nodes: NodeParams, cfg: DeformConfig, xyz: jnp.ndarray,
                     t, feature=None, motion_mask=None, step=10**9) -> dict:
    """Training/eval dispatch over the single TrainState slot: the state
    always carries a NodeParams; for non-"node" deform types its `.mlp`
    dict holds the field parameters (MLP dict / hash tables / {}).  This
    is the DeformModel.step equivalent (scene/deform_model.py:41-44) used
    by the trainer, eval renderers, and the mesh extractor."""
    if cfg.deform_type == "node":
        return apply_deform_field(nodes, cfg, xyz, t, feature=feature,
                                  motion_mask=motion_mask, step=step)
    return apply_deform_field(nodes.mlp, cfg, xyz, t, feature=feature,
                              motion_mask=motion_mask, step=step)
