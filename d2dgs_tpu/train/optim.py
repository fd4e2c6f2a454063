"""Minimal functional Adam with per-leaf learning-rate schedules.

Matches torch.optim.Adam semantics used by the reference
(gaussian_model.py:203, eps=1e-15): bias-corrected moments, eps added
*after* sqrt.  Kept hand-rolled (not optax) so densification can permute /
zero moment rows with plain array ops — the functional replacement for the
reference's optimizer-state surgery (gaussian_model.py:309-390).
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


class AdamState(NamedTuple):
    mu: Any    # first moments, same pytree as params
    nu: Any    # second moments
    count: jnp.ndarray  # scalar int32 step


def adam_init(params) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params),
                     count=jnp.zeros((), jnp.int32))


def adam_update(grads, state: AdamState, params, lr_tree,
                b1: float = 0.9, b2: float = 0.999, eps: float = 1e-15):
    """lr_tree: pytree of scalar LRs matching params' structure (may be
    traced values from schedules). Returns (new_params, new_state)."""
    count = state.count + 1
    t = count.astype(jnp.float32)
    c1 = 1.0 - jnp.power(b1, t)
    c2 = 1.0 - jnp.power(b2, t)

    def upd(p, g, m, v, lr):
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * (g * g)
        step = lr * (m / c1) / (jnp.sqrt(v / c2) + eps)
        return p - step, m, v

    flat = jax.tree.map(upd, params, grads, state.mu, state.nu, lr_tree)
    new_params = jax.tree.map(lambda x: x[0], flat,
                              is_leaf=lambda x: isinstance(x, tuple))
    new_mu = jax.tree.map(lambda x: x[1], flat,
                          is_leaf=lambda x: isinstance(x, tuple))
    new_nu = jax.tree.map(lambda x: x[2], flat,
                          is_leaf=lambda x: isinstance(x, tuple))
    return new_params, AdamState(mu=new_mu, nu=new_nu, count=count)
