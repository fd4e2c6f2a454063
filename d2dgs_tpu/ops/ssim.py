"""Window-SSIM matching the reference's utils/loss_utils.py:33-76
(11x11 Gaussian window sigma=1.5, same-padding, per-channel conv)."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache()
def _window1d(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-((np.arange(window_size) - window_size // 2) ** 2)
               / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _shift(x: jnp.ndarray, s: int, axis: int) -> jnp.ndarray:
    """Zero-padded static shift along `axis` (the 'same'-conv boundary)."""
    if s == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (max(-s, 0), max(s, 0))
    xp = jnp.pad(x, pad)
    idx = [slice(None)] * x.ndim
    n = x.shape[axis]
    idx[axis] = slice(max(s, 0), max(s, 0) + n)
    return xp[tuple(idx)]


def _filter2d(img: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """Separable 11x11 Gaussian blur as shift-and-add chains.

    The reference uses a per-channel 2-D conv (loss_utils.py:33-76); a
    1-channel conv can't feed the MXU, so on TPU the separable window
    as 2x11 shifted adds runs entirely on the VPU and XLA fuses the
    whole chain into one memory pass."""
    k = g.shape[0]
    r = k // 2
    out = jnp.zeros_like(img)
    for i in range(k):
        out = out + g[i] * _shift(img, i - r, 0)
    out2 = jnp.zeros_like(out)
    for i in range(k):
        out2 = out2 + g[i] * _shift(out, i - r, 1)
    return out2


def ssim(img1: jnp.ndarray, img2: jnp.ndarray,
         window_size: int = 11) -> jnp.ndarray:
    """img: [H,W,C] in [0,1]. Returns mean SSIM (size_average=True)."""
    win = jnp.asarray(_window1d(window_size))
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
