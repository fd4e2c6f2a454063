"""Real spherical harmonics evaluation, degrees 0..4.

Coefficient constants and basis ordering match the reference
(utils/sh_utils.py and the CUDA computeColorFromSH, forward.cu:20-71).
Layout here: sh has shape [..., K, 3] with K = (deg+1)^2 coefficients,
channel-last (the reference's features tensor layout).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
      -1.0925484305920792, 0.5462742152960396)
C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
      0.3731763325901154, -0.4570457994644658, 1.445305721320277,
      -0.5900435899266435)
C4 = (2.5033429417967046, -1.7701307697799304, 0.9461746957575601,
      -0.6690465435572892, 0.10578554691520431, -0.6690465435572892,
      0.47308734787878004, -1.7701307697799304, 0.6258357354491761)


def eval_sh(deg, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH at unit directions. sh: [..., K, 3]; dirs: [..., 3].

    ``deg`` may be a Python int (bands above it are never built) or a
    TRACED scalar: then every band present in ``sh`` (K static) is
    computed and masked by ``deg >= band`` — one XLA program serves all
    active degrees, so the reference's every-1000-iters degree bump
    (train_gui.py:234) never retriggers compilation.  Masked bands get
    zero gradient, matching the reference's "unevaluated coefficients
    receive no update" semantics exactly.
    """
    static = isinstance(deg, int)
    if static:
        assert 0 <= deg <= 4
        n_bands = deg
        m = [1.0] * 5
    else:
        # bands limited by the coefficients actually present (static K)
        k = sh.shape[-2]
        n_bands = int(np.sqrt(k)) - 1
        d = jnp.asarray(deg, jnp.int32)
        m = [jnp.where(d >= b, 1.0, 0.0) for b in range(5)]
    return _eval_sh_bands(n_bands, m, sh, dirs)


def _eval_sh_bands(deg: int, m, sh: jnp.ndarray,
                   dirs: jnp.ndarray) -> jnp.ndarray:
    """deg: highest band to BUILD (static); m[b]: per-band weight (1.0 or
    a traced 0/1 mask)."""
    result = C0 * sh[..., 0, :]
    if deg > 0:
        x = dirs[..., 0:1]
        y = dirs[..., 1:2]
        z = dirs[..., 2:3]
        result = result + m[1] * (
            - C1 * y * sh[..., 1, :] + C1 * z * sh[..., 2, :]
            - C1 * x * sh[..., 3, :])
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = result + m[2] * (
                C2[0] * xy * sh[..., 4, :]
                + C2[1] * yz * sh[..., 5, :]
                + C2[2] * (2.0 * zz - xx - yy) * sh[..., 6, :]
                + C2[3] * xz * sh[..., 7, :]
                + C2[4] * (xx - yy) * sh[..., 8, :])
            if deg > 2:
                result = result + m[3] * (
                    C3[0] * y * (3 * xx - yy) * sh[..., 9, :]
                    + C3[1] * xy * z * sh[..., 10, :]
                    + C3[2] * y * (4 * zz - xx - yy) * sh[..., 11, :]
                    + C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[..., 12, :]
                    + C3[4] * x * (4 * zz - xx - yy) * sh[..., 13, :]
                    + C3[5] * z * (xx - yy) * sh[..., 14, :]
                    + C3[6] * x * (xx - 3 * yy) * sh[..., 15, :])
                if deg > 3:
                    result = result + m[4] * (
                        C4[0] * xy * (xx - yy) * sh[..., 16, :]
                        + C4[1] * yz * (3 * xx - yy) * sh[..., 17, :]
                        + C4[2] * xy * (7 * zz - 1) * sh[..., 18, :]
                        + C4[3] * yz * (7 * zz - 3) * sh[..., 19, :]
                        + C4[4] * (zz * (35 * zz - 30) + 3) * sh[..., 20, :]
                        + C4[5] * xz * (7 * zz - 3) * sh[..., 21, :]
                        + C4[6] * (xx - yy) * (7 * zz - 1) * sh[..., 22, :]
                        + C4[7] * xz * (xx - 3 * yy) * sh[..., 23, :]
                        + C4[8] * (xx * (xx - 3 * yy)
                                   - yy * (3 * xx - yy)) * sh[..., 24, :])
    return result


def sh_to_rgb(deg, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """SH -> clamped RGB, matching computeColorFromSH (forward.cu:63-70)."""
    return jnp.maximum(eval_sh(deg, sh, dirs) + 0.5, 0.0)


def rgb_to_sh(rgb: jnp.ndarray) -> jnp.ndarray:
    """Inverse of the DC band mapping (sh_utils.py RGB2SH)."""
    return (rgb - 0.5) / C0


def sh_from_rgb_dc(rgb):
    return rgb_to_sh(rgb)
