"""Small general-purpose helpers (activations, LR schedules, sampling).

Mirrors the semantics of the reference's utils/general_utils.py where noted.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


def get_expon_lr_func(lr_init: float, lr_final: float,
                      lr_delay_steps: int = 0, lr_delay_mult: float = 1.0,
                      max_steps: int = 1_000_000):
    """Log-linear LR interpolation with optional delayed warmup.

    Continuous-time schedule used for the Gaussian xyz LR and the deform-net
    LR (general_utils.py get_expon_lr_func). Returns a jit-safe callable.
    """
    def helper(step):
        step = jnp.asarray(step, jnp.float32)
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0))
        else:
            delay_rate = 1.0
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        log_lerp = jnp.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t)
        lr = delay_rate * log_lerp
        # the reference returns 0 for step<0 or degenerate configs
        ok = (lr_init > 0) and (lr_final > 0)
        return jnp.where((step >= 0) & ok, lr, 0.0)
    return helper


def get_linear_noise_func(lr_init: float, lr_final: float,
                          lr_delay_steps: int = 0,
                          lr_delay_mult: float = 1.0,
                          max_steps: int = 1_000_000):
    """Linear (not log) interpolation with the same delayed-warmup shape —
    the reference's AST time-noise magnitude schedule
    (general_utils.py get_linear_noise_func, used at train_gui.py:189)."""
    import numpy as _np

    def helper(step):
        if step < 0 or (lr_init == 0.0 and lr_final == 0.0):
            return 0.0
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * _np.sin(
                0.5 * _np.pi * _np.clip(step / lr_delay_steps, 0, 1))
        else:
            delay_rate = 1.0
        t = _np.clip(step / max_steps, 0, 1)
        return float(delay_rate * (lr_init * (1 - t) + lr_final * t))
    return helper


def farthest_point_sample(key, points: jnp.ndarray, n_sample: int,
                          mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """FPS over [N, D] points -> [n_sample] indices (time_utils.py:461-482).

    Greedy max-min sampling with a random start; jit-safe via fori_loop.
    mask: optional [N] bool — excluded points are never selected.
    """
    n = points.shape[0]
    if mask is None:
        start = jax.random.randint(key, (), 0, n)
        excluded = None
    else:
        # random start among included points
        logits = jnp.where(mask, 0.0, -jnp.inf)
        start = jax.random.categorical(key, logits)
        excluded = ~mask

    def body(i, carry):
        dist, idxs = carry
        last = idxs[i - 1]
        d = jnp.sum((points - points[last]) ** 2, axis=-1)
        dist = jnp.minimum(dist, d)
        pick = dist if excluded is None else jnp.where(excluded, -1.0, dist)
        idxs = idxs.at[i].set(jnp.argmax(pick).astype(jnp.int32))
        return dist, idxs

    dist0 = jnp.full((n,), jnp.inf, dtype=points.dtype)
    idxs0 = jnp.zeros((n_sample,), jnp.int32).at[0].set(start.astype(jnp.int32))
    _, idxs = jax.lax.fori_loop(1, n_sample, body, (dist0, idxs0))
    return idxs


def strip_lowerdiag_sym(m: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] symmetric -> packed [..., 6] (uplo upper triangle)."""
    return jnp.stack([m[..., 0, 0], m[..., 0, 1], m[..., 0, 2],
                      m[..., 1, 1], m[..., 1, 2], m[..., 2, 2]], axis=-1)
