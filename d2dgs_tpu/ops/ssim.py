"""Window-SSIM matching the reference's utils/loss_utils.py:33-76
(11x11 Gaussian window sigma=1.5, same-padding, per-channel conv)."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache()
def _window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-((np.arange(window_size) - window_size // 2) ** 2)
               / (2 * sigma ** 2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def _filter2d(img: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """img [H,W,C], win [k,k] -> same-padded depthwise conv."""
    k = win.shape[0]
    x = img.transpose(2, 0, 1)[:, None]          # [C,1,H,W]
    kernel = win[None, None]                     # [1,1,k,k]
    out = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1),
        padding=[(k // 2, k // 2), (k // 2, k // 2)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out[:, 0].transpose(1, 2, 0)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray,
         window_size: int = 11) -> jnp.ndarray:
    """img: [H,W,C] in [0,1]. Returns mean SSIM (size_average=True)."""
    win = jnp.asarray(_window(window_size))
    mu1 = _filter2d(img1, win)
    mu2 = _filter2d(img2, win)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _filter2d(img1 * img1, win) - mu1_sq
    s2 = _filter2d(img2 * img2, win) - mu2_sq
    s12 = _filter2d(img1 * img2, win) - mu12
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu12 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return jnp.mean(m)


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((img1 - img2) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def l1(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a - b))
