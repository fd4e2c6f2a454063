"""Dual-quaternion rigid-transform blending (DQB).

The reference ships dual-quaternion utilities (utils/dual_quaternion.py,
SC-GS heritage) but its default D-2DGS path blends translations linearly;
BASELINE.json names LBS-style dual-quaternion skinning, so DQB is a
first-class blending option here (models/nodes.py skinning="dqb").

Convention: wxyz real part, dual part = 0.5 * t_quat (x) q_real.
"""
from __future__ import annotations

import jax.numpy as jnp

from .quaternion import quat_normalize, quat_raw_multiply


def rigid_to_dq(q: jnp.ndarray, t: jnp.ndarray):
    """(rotation quat [.,4], translation [.,3]) -> (real [.,4], dual [.,4])."""
    q = quat_normalize(q, eps=1e-12)
    tq = jnp.concatenate([jnp.zeros_like(t[..., :1]), t], axis=-1)
    return q, 0.5 * quat_raw_multiply(tq, q)


def dq_to_rigid(real: jnp.ndarray, dual: jnp.ndarray):
    """Normalized dq -> (rotation quat, translation)."""
    w = jnp.sqrt(jnp.sum(real * real, axis=-1, keepdims=True) + 1e-12)
    real, dual = real / w, dual / w
    conj = real * jnp.asarray([1.0, -1.0, -1.0, -1.0])
    t = 2.0 * quat_raw_multiply(dual, conj)[..., 1:]
    return real, t


def quat_apply(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v [.,3] by unit quats q [.,4]."""
    qv = jnp.concatenate([jnp.zeros_like(v[..., :1]), v], axis=-1)
    conj = q * jnp.asarray([1.0, -1.0, -1.0, -1.0])
    return quat_raw_multiply(quat_raw_multiply(q, qv), conj)[..., 1:]


def dq_blend(q: jnp.ndarray, t: jnp.ndarray, weight: jnp.ndarray):
    """Weighted DQB: q [N,K,4] per-neighbour rotation quats, t [N,K,3]
    translations, weight [N,K] (rows sum to 1).  Returns (q_blend [N,4],
    t_blend [N,3]) of the blended rigid transform.

    Sign-corrects each dq against the highest-weight pivot (antipodal
    quats represent the same rotation but cancel in a linear blend).
    """
    real, dual = rigid_to_dq(q, t)
    pivot_idx = jnp.argmax(weight, axis=-1)
    pivot = jnp.take_along_axis(real, pivot_idx[:, None, None].repeat(4, -1),
                                axis=1)[:, 0]
    sign = jnp.where(jnp.sum(real * pivot[:, None, :], -1) < 0, -1.0, 1.0)
    real = real * sign[..., None]
    dual = dual * sign[..., None]
    rb = jnp.sum(real * weight[..., None], axis=1)
    db = jnp.sum(dual * weight[..., None], axis=1)
    return dq_to_rigid(rb, db)
