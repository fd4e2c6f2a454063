"""Training step over a 2-D (data x gauss) mesh using the sharded
renderer with the distributed tile-binning exchange.

This wires `render_gauss_sharded` (parallel/gauss_shard.py) into an
actual optimization step — the BASELINE north-star configuration where
Gaussian primitives are sharded over devices, binned records ride the
ICI via all_to_all to their tile owners, and the rasterizer backward's
cross-tile reduction transposes to the reverse all_to_all (the CUDA
reference is single-GPU; SURVEY.md §2c).

Layout:
  * per-Gaussian arrays: sharded on mesh axis "gauss" (dim 0)
  * deformation MLP + node params: replicated; their grads psum
    automatically from the sharding annotations
  * the warp (KNN + node MLP + skinning) is written globally and GSPMD
    row-partitions it over the same axis — only the rasterizer needs
    the explicit shard_map exchange.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.nodes import warp
from ..ops.ssim import l1, psnr, ssim
from ..train.config import TrainConfig
from ..train.optim import adam_update
from ..train.trainer import (TrainState, gauss_lr_tree, gauss_trainable,
                             node_trainable, with_node_trainable,
                             with_trainable)
from .gauss_shard import AXIS, render_gauss_sharded


def make_gauss_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    return Mesh(np.asarray(devs[:n]), (AXIS,))


def shard_gauss_state(mesh: Mesh, state: TrainState) -> TrainState:
    """Per-Gaussian leaves (dim 0 == capacity) onto the gauss axis;
    everything else replicated."""
    cap = state.gauss.xyz.shape[0]
    gspec = NamedSharding(mesh, P(AXIS))
    rspec = NamedSharding(mesh, P())

    def place(leaf):
        if hasattr(leaf, "shape") and leaf.ndim >= 1 and \
                leaf.shape[0] == cap:
            return jax.device_put(leaf, gspec)
        return jax.device_put(leaf, rspec)

    return jax.tree.map(place, state)


def gauss_sharded_step(state: TrainState, cam, gt: jnp.ndarray,
                       sched: dict, cfg: TrainConfig, mesh: Mesh,
                       exchange_cap: int = 4096):
    """One main-stage step with the sharded renderer.  Photometric-only
    losses (L1 + D-SSIM); densification stats are not collected on this
    path (the screen-probe NDC hack needs the single-chip renderer —
    run densification phases replicated, or on the DP path)."""
    bg = jnp.where(cfg.white_background, 1.0, 0.0) * jnp.ones(3)

    def loss_fn(g_train, mlp, node_train):
        gauss = with_trainable(state.gauss, g_train)
        nodes = with_node_trainable(state.nodes, node_train, mlp)
        d = warp(nodes, cfg.node_cfg, gauss.xyz, cam.time,
                 feature=gauss.feature, motion_mask=gauss.motion_mask)
        w = sched["warm"]
        gate = lambda v: jax.lax.stop_gradient(v) * w + v * (1.0 - w)
        means3d, scales, quats, opacity, sh = \
            _deformed_params(gauss, gate(d["d_xyz"]),
                             gate(d["d_rotation"]), gate(d["d_scaling"]))
        dirs = means3d - cam.cam_center[None, :]
        dirs = dirs / jnp.sqrt(jnp.sum(dirs * dirs, -1, keepdims=True)
                               + 1e-20)
        from ..utils.sh import sh_to_rgb
        colors = sh_to_rgb(gauss.active_sh_degree, sh, dirs)
        out = render_gauss_sharded(mesh, cam, means3d, scales, quats,
                                   opacity, colors, gauss.alive, bg,
                                   cfg=cfg.raster,
                                   exchange_cap=exchange_cap)
        ll1 = l1(out.image, gt)
        loss = ((1.0 - cfg.lambda_dssim) * ll1
                + cfg.lambda_dssim * (1.0 - ssim(out.image, gt)))
        return loss, (out, ll1)

    grads, (out, ll1) = jax.grad(loss_fn, argnums=(0, 1, 2),
                                 has_aux=True)(
        gauss_trainable(state.gauss), state.nodes.mlp,
        node_trainable(state.nodes))
    g_g, g_mlp, g_node = grads

    g_train, gauss_opt = adam_update(
        g_g, state.gauss_opt, gauss_trainable(state.gauss),
        gauss_lr_tree(cfg, sched["xyz_lr"]))
    mlp_p, mlp_opt = adam_update(
        g_mlp, state.mlp_opt, state.nodes.mlp,
        jax.tree.map(lambda _: sched["deform_lr"], state.nodes.mlp))
    node_train, node_opt = adam_update(
        g_node, state.node_opt, node_trainable(state.nodes),
        jax.tree.map(lambda _: jnp.asarray(cfg.deform_lr_init),
                     node_trainable(state.nodes)))

    new_state = state._replace(
        gauss=with_trainable(state.gauss, g_train), gauss_opt=gauss_opt,
        nodes=with_node_trainable(state.nodes, node_train, mlp_p),
        node_opt=node_opt, mlp_opt=mlp_opt)
    metrics = dict(loss=ll1, psnr=psnr(out.image, gt),
                   overflow=out.overflow)
    return new_state, metrics


def _deformed_params(gauss, d_xyz, d_rotation, d_scaling):
    from ..models.gaussians import apply_deform
    return apply_deform(gauss, d_xyz, d_rotation, d_scaling, None, None)


def make_gauss_sharded_step(mesh: Mesh, cfg: TrainConfig,
                            exchange_cap: int = 4096):
    """Jit the sharded step with explicit in/out shardings."""
    fn = partial(gauss_sharded_step, cfg=cfg, mesh=mesh,
                 exchange_cap=exchange_cap)
    return jax.jit(fn)
