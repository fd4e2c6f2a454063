"""Full main-stage training step over a 2-D (data x gauss) mesh using
the sharded renderer with the distributed tile-binning exchange.

This is the production multichip trainer (BASELINE north star), NOT a
reduced demo: per data-row camera, it computes the reference's complete
main-stage loss set (train_gui.py:286-370) — L1 + D-SSIM,
normal-consistency, distortion, node-ARAP, optional motion-mask loss —
plus the screen-probe densification statistics, with:

  * per-Gaussian arrays sharded over mesh axis "gauss" (dim 0),
  * image tiles sharded (interleaved) over the same axis, fed by the
    all_to_all binning exchange whose backward is the reverse
    all_to_all (parallel/gauss_shard.py),
  * the per-device tile-slab blend running the SAME Pallas work-queue
    kernel as the single-chip path,
  * one camera per data-row (the reference trains batch-1 per step,
    train_gui.py:238-258; n_data rows average n_data reference
    iterations' gradients into one Adam update, with densify stats
    un-scaled back to per-view like parallel/data_parallel.py),
  * deformation MLP + node params replicated; their grads psum over
    BOTH axes from the shard_map transpose.

The reference has no distributed analogue (SURVEY.md §2c); the layout
follows the scaling-book recipe: pick a mesh, annotate shardings, let
XLA place collectives over ICI.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import regularizers as R
from ..models.deform import deform_gaussians
from ..models.gaussians import apply_deform
from ..ops.projection import tile_grid
from ..ops.ssim import l1, psnr, ssim
from ..render.renderer import postprocess_maps
from ..train.config import TrainConfig
from ..train.optim import AdamState, adam_update
from ..train.trainer import (TrainState, gauss_lr_tree, gauss_trainable,
                             node_trainable, with_node_trainable,
                             with_trainable)
from ..utils.sh import sh_to_rgb
from .data_parallel import add_stats_batched, stack_cameras
from .gauss_shard import (AXIS, assemble_interleaved, shard_render_core,
                          suggest_exchange_cap)

DATA = "data"


def make_gauss_mesh(n_devices: int | None = None) -> Mesh:
    """1-D (gauss,) mesh over the first n devices."""
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    return Mesh(np.asarray(devs[:n]), (AXIS,))


def make_mesh2d(n_data: int, n_gauss: int) -> Mesh:
    """2-D (data x gauss) mesh: rows train distinct cameras, columns
    shard the Gaussians + tiles."""
    devs = jax.devices()
    need = n_data * n_gauss
    assert len(devs) >= need, f"{need} devices needed, {len(devs)} present"
    return Mesh(np.asarray(devs[:need]).reshape(n_data, n_gauss),
                (DATA, AXIS))


def shard_gauss_state(mesh: Mesh, state: TrainState) -> TrainState:
    """Per-Gaussian leaves (dim 0 == capacity) onto the gauss axis;
    everything else replicated.  Works on 1-D and 2-D meshes."""
    cap = state.gauss.xyz.shape[0]
    gspec = NamedSharding(mesh, P(AXIS))
    rspec = NamedSharding(mesh, P())

    def place(leaf):
        if hasattr(leaf, "shape") and leaf.ndim >= 1 and \
                leaf.shape[0] == cap:
            return jax.device_put(leaf, gspec)
        return jax.device_put(leaf, rspec)

    return jax.tree.map(place, state)


def _gauss_axis_specs(tree, cap):
    """P(AXIS) for per-Gaussian leaves (dim0 == cap), P() otherwise."""
    return jax.tree.map(
        lambda x: P(AXIS) if (hasattr(x, "ndim") and x.ndim >= 1
                              and x.shape[0] == cap) else P(), tree)


def _squeeze0(tree):
    return jax.tree.map(lambda x: x[0], tree)


def sharded_train_step(state: TrainState, cams, gts: jnp.ndarray,
                       sched: dict, cfg: TrainConfig, mesh: Mesh,
                       exchange_cap: int, gt_alphas=None,
                       motion_loss: bool = False):
    """One full-loss main-stage step on the (data x gauss) mesh.

    cams: stacked Camera pytree with leading dim n_data (one camera per
    data-row, stack_cameras); gts: [n_data, H, W, 3]; gt_alphas:
    [n_data, H, W, 1] when motion_loss.  sched: the main_stage_step
    scalar dict (warm, lambda_normal, lambda_dist, lambda_arap,
    deform_lr, xyz_lr, step [, lambda_motion])."""
    n_data = mesh.shape[DATA]
    n_gauss = mesh.shape[AXIS]
    H, W = gts.shape[1], gts.shape[2]
    gx, gy = tile_grid(H, W)
    bg = jnp.where(cfg.white_background, 1.0, 0.0) * jnp.ones(3)
    key, k_arap = jax.random.split(state.key)
    cap = state.gauss.xyz.shape[0]
    alphas = (gt_alphas if gt_alphas is not None
              else jnp.zeros((n_data, H, W, 1), jnp.float32))

    def shard_fn(gauss_l, nodes_l, g_train_l, mlp_l, node_train_l,
                 probe_l, cam_b, gt_b, alpha_b, k):
        cam = _squeeze0(cam_b)               # local camera batch of 1
        gt, alpha, probe = gt_b[0], alpha_b[0], probe_l[0]
        gauss = with_trainable(gauss_l, g_train_l)
        nodes = with_node_trainable(nodes_l, node_train_l, mlp_l)

        d = deform_gaussians(nodes, cfg.deform_cfg, gauss.xyz, cam.time,
                             feature=gauss.feature,
                             motion_mask=gauss.motion_mask,
                             step=sched.get("step", 10**9))
        w = sched["warm"]
        gate = lambda v: (None if v is None else
                          jax.lax.stop_gradient(v) * w + v * (1.0 - w))
        means3d, scales, quats, opacity, sh = apply_deform(
            gauss, gate(d["d_xyz"]), gate(d["d_rotation"]),
            gate(d["d_scaling"]), gate(d["d_opacity"]),
            gate(d["d_color"]))
        dirs = means3d - cam.cam_center[None, :]
        dirs = dirs / jnp.sqrt(jnp.sum(dirs * dirs, -1, keepdims=True)
                               + 1e-20)
        colors = sh_to_rgb(gauss.active_sh_degree, sh, dirs)

        color_all, allmap_all, overflow, radii = shard_render_core(
            cam, means3d, scales, quats, opacity, colors, gauss.alive,
            gx, gy, n_gauss, cfg.raster, exchange_cap,
            screen_probe=probe)
        image, allmap = assemble_interleaved(color_all, allmap_all, bg,
                                             gx, gy, H, W)
        _alpha, rend_normal, rend_dist, _sd, surf_normal = \
            postprocess_maps(cam, image, allmap, bg, False, cfg.raster)

        ll1 = l1(image, gt)
        loss = ((1.0 - cfg.lambda_dssim) * ll1
                + cfg.lambda_dssim * (1.0 - ssim(image, gt)))
        normal_err = 1.0 - jnp.sum(rend_normal * surf_normal, axis=-1)
        loss = loss + sched["lambda_normal"] * jnp.mean(normal_err)
        loss = loss + sched["lambda_dist"] * jnp.mean(rend_dist)
        if cfg.deform_type == "node":
            # replicated node-graph reg, identical on every device
            loss = loss + (1.0 - w) * sched["lambda_arap"] * \
                R.arap_loss(nodes, cfg.node_cfg, k)
        if motion_loss:
            # motion-mask loss on detached geometry
            # (train_gui.py:363-370): render [mask, 0, 1-mask] colors
            sg = jax.lax.stop_gradient
            mm = gauss.motion_mask
            override = jnp.concatenate(
                [mm, jnp.zeros_like(mm), 1.0 - mm], axis=-1)
            m_col, m_map, _, _ = shard_render_core(
                cam, sg(means3d), sg(scales), sg(quats), sg(opacity),
                override, gauss.alive, gx, gy, n_gauss, cfg.raster,
                exchange_cap)
            m_img, _ = assemble_interleaved(m_col, m_map, bg, gx, gy,
                                            H, W)
            loss = loss + sched["lambda_motion"] * l1(
                m_img[..., 0], alpha[..., 0])

        loss = jax.lax.pmean(loss, DATA)
        overflow = jax.lax.psum(overflow, DATA)
        return (loss, ll1[None], image[None], radii[None],
                overflow)

    gspecs = _gauss_axis_specs(state.gauss, cap)
    nspecs = jax.tree.map(lambda _: P(), state.nodes)
    gt_specs = _gauss_axis_specs(gauss_trainable(state.gauss), cap)
    in_specs = (gspecs, nspecs, gt_specs,
                jax.tree.map(lambda _: P(), state.nodes.mlp),
                jax.tree.map(lambda _: P(),
                             node_trainable(state.nodes)),
                P(DATA, AXIS),                     # probe [D, cap, 2]
                jax.tree.map(lambda _: P(DATA), cams),
                P(DATA), P(DATA), P())
    out_specs = (P(), P(DATA), P(DATA), P(DATA, AXIS), P())
    mapped = jax.shard_map(shard_fn, mesh=mesh, in_specs=in_specs,
                           out_specs=out_specs, check_vma=False)

    def loss_fn(g_train, mlp, node_train, probe):
        loss, ll1s, images, radii, overflow = mapped(
            state.gauss, state.nodes, g_train, mlp, node_train, probe,
            cams, gts, alphas, k_arap)
        return loss, (ll1s, images, radii, overflow)

    grads, (ll1s, images, radii, overflow) = jax.grad(
        loss_fn, argnums=(0, 1, 2, 3), has_aux=True)(
        gauss_trainable(state.gauss), state.nodes.mlp,
        node_trainable(state.nodes),
        jnp.zeros((n_data, cap, 2), jnp.float32))
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

    visibility = radii > 0                         # [D, cap]
    stats = add_stats_batched(state.gauss_stats, g_probe, visibility,
                              radii.astype(jnp.float32), n_data)
    new_state = state._replace(
        gauss=with_trainable(state.gauss, g_train), gauss_opt=gauss_opt,
        nodes=with_node_trainable(state.nodes, node_train, mlp_p),
        node_opt=node_opt, mlp_opt=mlp_opt, gauss_stats=stats, key=key)
    metrics = dict(
        loss=jnp.mean(ll1s),
        psnr=jnp.mean(jax.vmap(psnr)(images, gts)),
        overflow=overflow,
        alive=state.gauss.num_alive)
    return new_state, metrics


def make_sharded_train_step(mesh: Mesh, cfg: TrainConfig,
                            exchange_cap: int,
                            motion_loss: bool = False):
    """Jit the full-loss sharded step.  Returns
    fn(state, cams, gts, sched[, gt_alphas]) -> (state, metrics)."""
    fn = partial(sharded_train_step, cfg=cfg, mesh=mesh,
                 exchange_cap=exchange_cap, motion_loss=motion_loss)
    if motion_loss:
        return jax.jit(lambda state, cams, gts, sched, alphas: fn(
            state, cams, gts, sched, gt_alphas=alphas))
    return jax.jit(lambda state, cams, gts, sched: fn(
        state, cams, gts, sched))


# ----------------------------------------------------------------------
# back-compat reduced step (photometric-only, 1-D mesh) used by older
# tests; prefer sharded_train_step
# ----------------------------------------------------------------------

def gauss_sharded_step(state: TrainState, cam, gt: jnp.ndarray,
                       sched: dict, cfg: TrainConfig, mesh: Mesh,
                       exchange_cap: int = 4096):
    """One-camera wrapper over the full-loss step for 1-D (gauss,)
    meshes: broadcast the single camera to a data axis of size 1."""
    if DATA not in mesh.shape:
        mesh = Mesh(mesh.devices.reshape(1, -1), (DATA, AXIS))
        state = shard_gauss_state(mesh, state)
    cams = stack_cameras([cam])
    gts = gt[None]
    full_sched = dict(sched)
    full_sched.setdefault("lambda_normal", jnp.float32(0.0))
    full_sched.setdefault("lambda_dist", jnp.float32(0.0))
    full_sched.setdefault("lambda_arap", jnp.float32(0.0))
    return sharded_train_step(state, cams, gts, full_sched, cfg, mesh,
                              exchange_cap)


def make_gauss_sharded_step(mesh: Mesh, cfg: TrainConfig,
                            exchange_cap: int = 4096):
    """Jit the 1-camera sharded step with the mesh lifted to 2-D."""
    if DATA not in mesh.shape:
        mesh = Mesh(mesh.devices.reshape(1, -1), (DATA, AXIS))
    fn = partial(sharded_train_step, cfg=cfg, mesh=mesh,
                 exchange_cap=exchange_cap)

    def step(state, cam, gt, sched):
        cams = stack_cameras([cam])
        full_sched = dict(sched)
        full_sched.setdefault("lambda_normal", jnp.float32(0.0))
        full_sched.setdefault("lambda_dist", jnp.float32(0.0))
        full_sched.setdefault("lambda_arap", jnp.float32(0.0))
        return fn(state, cams, gt[None], full_sched)

    return jax.jit(step)
