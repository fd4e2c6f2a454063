"""Densification and pruning under static shapes.

The reference grows/shrinks its tensors and performs optimizer-state
surgery (gaussian_model.py:415-486).  Here the point set lives in a fixed
capacity-C buffer with an ``alive`` mask, and densify/prune are pure jitted
functions: selected Gaussians are *scattered* into free slots (clone and
split), originals of splits are killed, Adam moments at the written slots
are zeroed — numerically identical bookkeeping, no reallocation.

Selection rules (densify_and_prune, gaussian_model.py:430-486):
  clone : |grad| >= tau and max(scale) <= percent_dense * extent
  split : |grad| >= tau and max(scale)  > percent_dense * extent,
          2 children sampled in the splat plane (3rd std = 0!),
          child scale = scale / (0.8 * 2); original pruned
  prune : opacity < min_opacity, or max(scale) > 0.1 * extent.
          (The screen-size prune is quoted in the reference but its
          max_radii2D buffer is zeroed by densification_postfix right
          before the check, so it never fires; we reproduce that.)
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.quaternion import quat_to_rotmat
from .gaussians import GaussianParams


class DensifyStats(NamedTuple):
    grad_accum: jnp.ndarray   # [C] accumulated view-space grad norms
    denom: jnp.ndarray        # [C] observation counts
    max_radii2d: jnp.ndarray  # [C]


def init_stats(capacity: int) -> DensifyStats:
    z = jnp.zeros((capacity,), jnp.float32)
    return DensifyStats(z, z, z)


def add_stats(stats: DensifyStats, screen_grad: jnp.ndarray,
              visible: jnp.ndarray, radii: jnp.ndarray) -> DensifyStats:
    """screen_grad: [C,2] NDC-hack gradient (see render docstring);
    accumulate its norm for visible Gaussians (gaussian_model.py:484-486)
    and track max screen radius (train_gui.py:389-391)."""
    g = jnp.linalg.norm(screen_grad, axis=-1)
    vis = visible.astype(jnp.float32)
    return DensifyStats(
        grad_accum=stats.grad_accum + jnp.where(visible, g, 0.0),
        denom=stats.denom + vis,
        max_radii2d=jnp.maximum(stats.max_radii2d,
                                jnp.where(visible, radii, 0.0)))


def _free_slot_lookup(alive: jnp.ndarray):
    """inv[r] = index of the r-th free slot (C if none)."""
    c = alive.shape[0]
    free = ~alive
    rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    inv = jnp.full((c,), c, jnp.int32)
    inv = inv.at[jnp.where(free, rank, c)].set(
        jnp.arange(c, dtype=jnp.int32), mode="drop")
    return inv, jnp.sum(free.astype(jnp.int32))


def _scatter_tree(tree, dest, make_row):
    """Scatter per-row transforms of a per-Gaussian pytree to dest slots
    (dest[i] >= C drops)."""
    return jax.tree.map(
        lambda x: x.at[dest].set(make_row(x), mode="drop"), tree)


def densify_and_prune(params: GaussianParams, mu, nu, stats: DensifyStats,
                      key: jnp.ndarray, max_grad: float, min_opacity: float,
                      extent: float, prune_big_ws,
                      percent_dense: float = 0.01):
    """Returns (params, mu, nu, stats, info dict). mu/nu are pytrees with
    the same per-Gaussian leading dim as the trainable leaves (dicts)."""
    c = params.capacity
    alive = params.alive
    grads = jnp.where(stats.denom > 0, stats.grad_accum / stats.denom, 0.0)
    grads = jnp.nan_to_num(grads)
    scale_max = jnp.max(params.get_scaling, axis=-1)

    hot = alive & (grads >= max_grad)
    clone_mask = hot & (scale_max <= percent_dense * extent)
    split_mask = hot & (scale_max > percent_dense * extent)

    inv, num_free = _free_slot_lookup(alive)
    n_clone = jnp.cumsum(clone_mask.astype(jnp.int32))
    clone_rank = jnp.where(clone_mask, n_clone - 1, c)
    total_clones = n_clone[-1]
    n_split = jnp.cumsum(split_mask.astype(jnp.int32))
    split_rank = jnp.where(split_mask, n_split - 1, c // 2)

    dest_clone = inv[jnp.clip(clone_rank, 0, c - 1)]
    dest_clone = jnp.where(clone_mask & (clone_rank < num_free), dest_clone, c)

    r1 = total_clones + 2 * split_rank
    r2 = r1 + 1
    both_fit = split_mask & (r2 < num_free)
    dest_s1 = jnp.where(both_fit, inv[jnp.clip(r1, 0, c - 1)], c)
    dest_s2 = jnp.where(both_fit, inv[jnp.clip(r2, 0, c - 1)], c)

    # split children: sample in the splat's local (u, v, 0) frame
    std = params.get_scaling                      # [C,2]
    noise = jax.random.normal(key, (2, c, 2)) * std[None]
    R = quat_to_rotmat(params.rotation)           # [C,3,3]
    plane = R[:, :, :2]                           # columns u, v
    offs = jnp.einsum("nij,knj->kni", plane, noise)   # [2,C,3]
    child_xyz = params.xyz[None] + offs
    child_scaling = params.scaling - jnp.log(0.8 * 2.0)

    trainable = dict(xyz=params.xyz, features_dc=params.features_dc,
                     features_rest=params.features_rest,
                     scaling=params.scaling, rotation=params.rotation,
                     opacity=params.opacity, feature=params.feature)

    def place(tree, dest, overrides):
        out = {}
        for name, x in tree.items():
            row = overrides.get(name, x)
            out[name] = x.at[dest].set(row, mode="drop")
        return out

    new = place(trainable, dest_clone, {})
    new = place(new, dest_s1, {"xyz": child_xyz[0],
                               "scaling": child_scaling})
    new = place(new, dest_s2, {"xyz": child_xyz[1],
                               "scaling": child_scaling})

    new_alive = alive
    for dest in (dest_clone, dest_s1, dest_s2):
        new_alive = new_alive.at[dest].set(True, mode="drop")
    # kill split originals (only when their children were actually placed)
    new_alive = new_alive & ~both_fit

    # zero Adam moments at every written slot (torch surgery zeroes the
    # extension rows, gaussian_model.py:369-377)
    def zero_slots(t):
        def z(x):
            for dest in (dest_clone, dest_s1, dest_s2):
                x = x.at[dest].set(jnp.zeros_like(x[0]), mode="drop")
            return x
        return jax.tree.map(z, t)

    mu, nu = zero_slots(mu), zero_slots(nu)

    # prune (after the stats reset quirk — see module docstring)
    opac = jax.nn.sigmoid(new["opacity"][:, 0])
    scale_max_new = jnp.max(jnp.exp(new["scaling"]), axis=-1)
    prune = opac < min_opacity
    # big in view space (>20 px, gaussian_model.py:465-467) or world —
    # gated by a TRACED flag (it flips once mid-schedule,
    # train_gui.py:418; a static flag would recompile the densify step)
    big = (stats.max_radii2d > 20.0) | (scale_max_new > 0.1 * extent)
    prune = prune | (big & jnp.asarray(prune_big_ws, bool))
    new_alive = new_alive & ~prune

    # dataclasses.replace preserves ALL meta fields — constructing
    # GaussianParams() by hand here once dropped isotropic_shared_scale,
    # silently turning stage-1 shared-isotropic node-Gaussians into
    # per-splat-scale ones after the first densify (and changing the
    # pytree treedef, retracing every downstream jitted step)
    import dataclasses as _dc
    new_params = _dc.replace(params, alive=new_alive, **new)

    overflow = (jnp.sum(clone_mask & (dest_clone >= c))
                + jnp.sum(split_mask & ~both_fit))
    info = dict(clones=jnp.sum(dest_clone < c),
                splits=jnp.sum(both_fit),
                pruned=jnp.sum(alive & prune),
                overflow=overflow)
    return new_params, mu, nu, init_stats(c), info


def reset_opacity(params: GaussianParams, mu, nu, ceiling: float = 0.01):
    """Clamp opacity to <= ceiling and reset its Adam moments
    (gaussian_model.py:251-254 + replace_tensor_to_optimizer zeroing)."""
    import dataclasses as _dc
    p = jnp.clip(jnp.minimum(jax.nn.sigmoid(params.opacity), ceiling),
                 1e-7, 1.0 - 1e-7)
    new_op = jnp.log(p) - jnp.log1p(-p)   # inverse sigmoid
    params = _dc.replace(params, opacity=new_op)

    def zero_op(t):
        t = dict(t)
        t["opacity"] = jnp.zeros_like(t["opacity"])
        return t

    return params, zero_op(mu), zero_op(nu)
