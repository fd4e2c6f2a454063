"""Data-parallel training step: a batch of (camera, t) samples sharded
across the `data` mesh axis.

The reference trains batch-1 on one GPU (train_gui.py:238-258 picks a
single camera per step).  The TPU-native scaling axis is the sample batch:
each device renders its shard of cameras against the (replicated) Gaussian
and deformation parameters, and XLA inserts the gradient psum over ICI
automatically from the sharding annotations — the scaling-book recipe
(annotate shardings, let the compiler place collectives), not hand-written
NCCL calls.

Semantics vs the reference: one batched step of B cameras ≈ B reference
iterations' gradients averaged into one Adam update; densification
statistics are accumulated per-view exactly as B separate iterations would
(`add_stats_batched` un-scales the 1/B from the loss mean).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import densify as D
from ..models import regularizers as R
from ..train.config import TrainConfig
from ..train.optim import AdamState, adam_update
from ..train.trainer import (TrainState, gauss_lr_tree, gauss_trainable,
                             node_trainable, photometric_loss,
                             with_node_trainable, with_trainable)
from ..ops.ssim import psnr


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    """1-D device mesh over the first n devices (default: all)."""
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    return Mesh(np.asarray(devs[:n]), (axis,))


def shard_replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis))


def stack_cameras(cams) -> object:
    """list[Camera] -> one Camera pytree with a leading batch axis on every
    array leaf (H/W stay static metadata; all cameras must share them)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)


def add_stats_batched(stats: D.DensifyStats, screen_grad: jnp.ndarray,
                      visible: jnp.ndarray, radii: jnp.ndarray,
                      batch: int) -> D.DensifyStats:
    """Fold a batch of per-view screen-gradient probes into densification
    stats as if they were `batch` sequential reference iterations
    (gaussian_model.py:484-486).  The loss takes a 1/B mean over views, so
    each view's probe gradient is scaled back by B.

    screen_grad: [B,C,2]; visible: [B,C] bool; radii: [B,C].
    """
    g = jnp.linalg.norm(screen_grad, axis=-1) * float(batch)
    vis = visible.astype(jnp.float32)
    return D.DensifyStats(
        grad_accum=stats.grad_accum + jnp.sum(jnp.where(visible, g, 0.0),
                                              axis=0),
        denom=stats.denom + jnp.sum(vis, axis=0),
        max_radii2d=jnp.maximum(
            stats.max_radii2d,
            jnp.max(jnp.where(visible, radii, 0.0), axis=0)))


def batched_main_step(state: TrainState, cams, gts: jnp.ndarray,
                      cfg: TrainConfig, sched: dict):
    """Main-stage step over a camera batch.  cams: stacked Camera pytree,
    gts: [B,H,W,3].  Pure function — jit/shard with `make_dp_main_step`."""
    key, k_arap = jax.random.split(state.key)
    bg = jnp.where(cfg.white_background, 1.0, 0.0) * jnp.ones(3)
    batch = gts.shape[0]
    cap = state.gauss.xyz.shape[0]

    def loss_fn(g_train, mlp, node_train, probe):
        gauss = with_trainable(state.gauss, g_train)
        nodes = with_node_trainable(state.nodes, node_train, mlp)
        losses, (outs, ll1s) = jax.vmap(
            lambda cam, gt, pr: photometric_loss(gauss, nodes, cam, gt, pr,
                                                 cfg, sched, bg)
        )(cams, gts, probe)
        loss = jnp.mean(losses)
        # node-level reg is camera-independent: add once, not per view
        loss = loss + (1.0 - sched["warm"]) * sched["lambda_arap"] * \
            R.arap_loss(nodes, cfg.node_cfg, k_arap)
        return loss, (outs, jnp.mean(ll1s))

    grads, (outs, ll1) = jax.grad(loss_fn, argnums=(0, 1, 2, 3),
                                  has_aux=True)(
        gauss_trainable(state.gauss), state.nodes.mlp,
        node_trainable(state.nodes),
        jnp.zeros((batch, cap, 2)))
    g_g, g_mlp, g_node, g_probe = grads

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

    stats = add_stats_batched(state.gauss_stats, g_probe, outs.visibility,
                              outs.radii.astype(jnp.float32), batch)
    new_state = state._replace(
        gauss=with_trainable(state.gauss, g_train), gauss_opt=gauss_opt,
        nodes=with_node_trainable(state.nodes, node_train, mlp_p),
        node_opt=node_opt, mlp_opt=mlp_opt, gauss_stats=stats, key=key)
    metrics = dict(loss=ll1,
                   psnr=jnp.mean(jax.vmap(psnr)(outs.image, gts)),
                   num_pairs=jnp.max(outs.num_pairs),
                   overflow=jnp.max(outs.overflow))
    return new_state, metrics


def make_dp_main_step(mesh: Mesh, cfg: TrainConfig, axis: str = "data"):
    """Jit `batched_main_step` with data-parallel shardings over `mesh`:
    model/optimizer state replicated, (cams, gts) sharded on the batch
    axis.  XLA inserts the psum of parameter gradients over ICI.

    Returns fn(state, cams, gts, sched) -> (state, metrics).  The batch
    size must be divisible by the mesh size.
    """
    repl = NamedSharding(mesh, P())
    batch = NamedSharding(mesh, P(axis))
    step = partial(batched_main_step, cfg=cfg)

    return jax.jit(
        lambda state, cams, gts, sched: step(state, cams, gts, sched=sched),
        in_shardings=(repl, batch, batch, repl),
        out_shardings=(repl, repl))
