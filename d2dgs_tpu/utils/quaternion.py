"""Quaternion utilities (wxyz convention, matching the reference rasterizer).

Semantics follow /root/reference .../auxiliary.h:188-210 (quat_to_rotmat,
gsplat-style, component order [w, x, y, z]) and
gaussian_renderer/__init__.py:24-38 (multiply / standardize).
"""
from __future__ import annotations

import jax.numpy as jnp


def quat_normalize(q: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Normalize quaternions along the last axis."""
    n = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + eps)
    return q / n


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] wxyz quaternion -> [..., 3, 3] rotation matrix.

    Normalizes internally (rsqrt of squared norm, like auxiliary.h:190).
    Returned matrix uses standard row-major math convention:
    columns are the rotated basis vectors.

    eps keeps the all-zero quaternions of dead capacity slots finite
    (forward NaNs there poison gradients of live parameters via 0*NaN;
    the CUDA reference never sees zero quats because it has no padding).
    """
    q = quat_normalize(q, eps=1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def standardize_quaternion(q: jnp.ndarray) -> jnp.ndarray:
    """Flip sign so the real (w) part is non-negative."""
    return jnp.where(q[..., 0:1] < 0, -q, q)


def quat_raw_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b, wxyz layout."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    ow = aw * bw - ax * bx - ay * by - az * bz
    ox = aw * bx + ax * bw + ay * bz - az * by
    oy = aw * by - ax * bz + ay * bw + az * bx
    oz = aw * bz + ax * by - ay * bx + az * bw
    return jnp.stack([ow, ox, oy, oz], axis=-1)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return standardize_quaternion(quat_raw_multiply(a, b))


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] rotation matrix -> [..., 4] wxyz quaternion (branchless
    sqrt-positive-part construction, lap_deform.py:34-93 semantics).

    Selects the best-conditioned of the four candidate quaternions per
    matrix via where-chains (jit/vmap friendly, no data-dependent
    control flow)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    def _psqrt(x):
        return jnp.sqrt(jnp.maximum(x, 0.0))

    qw = 0.5 * _psqrt(1.0 + m00 + m11 + m22)
    qx = 0.5 * _psqrt(1.0 + m00 - m11 - m22)
    qy = 0.5 * _psqrt(1.0 - m00 + m11 - m22)
    qz = 0.5 * _psqrt(1.0 - m00 - m11 + m22)

    # four candidate reconstructions, each stable when its pivot is largest
    c0 = jnp.stack([qw, (m21 - m12) / (4 * qw + 1e-12),
                    (m02 - m20) / (4 * qw + 1e-12),
                    (m10 - m01) / (4 * qw + 1e-12)], -1)
    c1 = jnp.stack([(m21 - m12) / (4 * qx + 1e-12), qx,
                    (m01 + m10) / (4 * qx + 1e-12),
                    (m02 + m20) / (4 * qx + 1e-12)], -1)
    c2 = jnp.stack([(m02 - m20) / (4 * qy + 1e-12),
                    (m01 + m10) / (4 * qy + 1e-12), qy,
                    (m12 + m21) / (4 * qy + 1e-12)], -1)
    c3 = jnp.stack([(m10 - m01) / (4 * qz + 1e-12),
                    (m02 + m20) / (4 * qz + 1e-12),
                    (m12 + m21) / (4 * qz + 1e-12), qz], -1)

    mags = jnp.stack([qw, qx, qy, qz], -1)
    best = jnp.argmax(mags, axis=-1)[..., None]
    q = jnp.where(best == 0, c0,
                  jnp.where(best == 1, c1,
                            jnp.where(best == 2, c2, c3)))
    return standardize_quaternion(quat_normalize(q, eps=1e-12))
