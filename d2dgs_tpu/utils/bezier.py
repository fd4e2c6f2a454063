"""Bezier / piecewise trajectory interpolation (reference utils/bezier.py),
used by the interactive editing stack to interpolate keypoint handle
trajectories over time, and by trajectory rendering.

Pure jnp; `deCasteljau` is differentiable and jit/vmap friendly.
"""
from __future__ import annotations

import jax.numpy as jnp


def de_casteljau(ctrl: jnp.ndarray, t) -> jnp.ndarray:
    """Evaluate a Bezier curve with control points ctrl [K,D] at scalar or
    [T]-batched t in [0,1] via the numerically stable de Casteljau
    recursion.  Returns [D] or [T,D]."""
    t = jnp.asarray(t, jnp.float32)
    scalar = t.ndim == 0
    t = jnp.atleast_1d(t)[:, None, None]          # [T,1,1]
    pts = jnp.broadcast_to(ctrl[None], (t.shape[0],) + ctrl.shape)
    k = ctrl.shape[0]
    for _ in range(k - 1):
        pts = (1.0 - t) * pts[:, :-1] + t * pts[:, 1:]
    out = pts[:, 0]
    return out[0] if scalar else out


def bezier_trajectory(keypoints: jnp.ndarray, times, n_ctrl: int = 4):
    """Smooth a [K,D] keypoint sequence: fit successive overlapping Bezier
    spans (sliding window of n_ctrl points) and sample at `times` in [0,1].
    Matches the editing GUI's trajectory smoothing role."""
    keypoints = jnp.asarray(keypoints, jnp.float32)
    times = jnp.atleast_1d(jnp.asarray(times, jnp.float32))
    k = keypoints.shape[0]
    if k == 1:
        return jnp.broadcast_to(keypoints[0],
                                (times.shape[0], keypoints.shape[1]))
    # global parameterization: segment index + local t
    seg_t = times * (k - 1)
    idx = jnp.clip(seg_t.astype(jnp.int32), 0, k - 2)
    lt = seg_t - idx
    # each segment is a cubic using neighbors as tangent handles
    p1 = keypoints[idx]
    p2 = keypoints[idx + 1]
    prev = keypoints[jnp.maximum(idx - 1, 0)]
    nxt = keypoints[jnp.minimum(idx + 2, k - 1)]
    tan1 = (p2 - prev) / 2.0
    tan2 = (nxt - p1) / 2.0
    c0 = p1
    c1 = p1 + tan1 / 3.0
    c2 = p2 - tan2 / 3.0
    c3 = p2
    u = lt[:, None]
    # cubic Bezier (Catmull-Rom converted) evaluated directly
    return ((1 - u) ** 3 * c0 + 3 * (1 - u) ** 2 * u * c1
            + 3 * (1 - u) * u ** 2 * c2 + u ** 3 * c3)
