"""Image quality metrics — the reference's evaluation set
(render.py:63-89, metrics.py:74-81: PSNR, SSIM, MS-SSIM, LPIPS).

PSNR/SSIM come from ops.ssim (shared with the training loss); MS-SSIM is
implemented here (5-scale Wang et al. weights, matching pytorch_msssim
defaults).  LPIPS requires pretrained VGG/Alex weights, which are not
shippable in this environment (no torchvision, no network egress): the
`lpips` hook loads a user-provided npz of VGG16 conv weights + linear
calibration heads and otherwise reports None — a documented substitution,
not a silent drop (SURVEY.md §7 step 10).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.ssim import _window1d, psnr, ssim

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _avg_pool2(img: jnp.ndarray) -> jnp.ndarray:
    """2x2 average pool over [H,W,C] (pad to even first)."""
    H, W, C = img.shape
    img = jnp.pad(img, ((0, H % 2), (0, W % 2), (0, 0)), mode="edge")
    H2, W2 = img.shape[0] // 2, img.shape[1] // 2
    return img.reshape(H2, 2, W2, 2, C).mean(axis=(1, 3))


def _ssim_parts(a, b, window_size=11):
    """Returns (mean contrast-structure term, mean luminance*cs term)."""
    from ..ops.ssim import _filter2d
    win = jnp.asarray(_window1d(window_size))
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    mu1, mu2 = _filter2d(a, win), _filter2d(b, win)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _filter2d(a * a, win) - mu1_sq
    s2 = _filter2d(b * b, win) - mu2_sq
    s12 = _filter2d(a * b, win) - mu12
    cs = (2 * s12 + C2) / (s1 + s2 + C2)
    lum = (2 * mu12 + C1) / (mu1_sq + mu2_sq + C1)
    return jnp.mean(cs), jnp.mean(lum * cs)


def msssim(a: jnp.ndarray, b: jnp.ndarray, levels: int = 5) -> jnp.ndarray:
    """Multi-scale SSIM over [H,W,C] images in [0,1]."""
    vals = []
    for i in range(levels):
        cs, ss = _ssim_parts(a, b)
        vals.append(ss if i == levels - 1 else cs)
        if i < levels - 1:
            a, b = _avg_pool2(a), _avg_pool2(b)
    vals = jnp.stack(vals)
    w = jnp.asarray(_MSSSIM_WEIGHTS[:levels])
    return jnp.prod(jnp.maximum(vals, 1e-6) ** w)


# ----------------------------------------------------------------------
# LPIPS (VGG16 backbone) — weights must be provided
# ----------------------------------------------------------------------

_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512]
_TAP_LAYERS = (1, 3, 6, 9, 12)  # relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
_SHIFT = np.array([-.030, -.088, -.188], np.float32)
_SCALE = np.array([.458, .448, .450], np.float32)


class Lpips:
    """LPIPS-VGG.  weights npz layout: conv{i}_w [O,I,3,3], conv{i}_b [O]
    for the 13 VGG convs, lin{j}_w [C] for the 5 calibration heads."""

    def __init__(self, weights_path: str):
        z = np.load(weights_path)
        self.convs = [(jnp.asarray(z[f"conv{i}_w"]),
                       jnp.asarray(z[f"conv{i}_b"])) for i in range(13)]
        self.lins = [jnp.asarray(z[f"lin{j}_w"]) for j in range(5)]

    @classmethod
    def random(cls, seed: int = 0) -> "Lpips":
        """Deterministic He-initialized VGG16 features, uniform calibration
        heads.  Random-feature perceptual distance is a documented
        substitution for trained LPIPS when pretrained weights cannot be
        shipped (zero-egress env); reported as `lpips_rand`, never as
        `lpips_vgg`.  Untrained-VGG LPIPS is known to correlate with human
        judgement well above pixelwise metrics (LPIPS paper §5, "rand"
        rows)."""
        self = cls.__new__(cls)
        rng = np.random.RandomState(seed)
        convs, cin = [], 3
        for c in _VGG_CFG:
            if c == "M":
                continue
            fan_in = cin * 9
            w = rng.normal(0, np.sqrt(2.0 / fan_in),
                           (c, cin, 3, 3)).astype(np.float32)
            convs.append((jnp.asarray(w), jnp.zeros((c,), jnp.float32)))
            cin = c
        self.convs = convs
        taps = [64, 128, 256, 512, 512]
        self.lins = [jnp.full((t,), 1.0 / t, jnp.float32) for t in taps]
        return self

    def _features(self, x):
        # x [H,W,3] in [0,1] -> scaled, NCHW
        h = ((x * 2.0 - 1.0 - _SHIFT) / _SCALE).transpose(2, 0, 1)[None]
        feats, conv_i, relu_i = [], 0, 0
        for c in _VGG_CFG:
            if c == "M":
                h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                          (1, 1, 2, 2), (1, 1, 2, 2),
                                          "VALID")
                continue
            w, b = self.convs[conv_i]
            h = jax.lax.conv_general_dilated(h, w, (1, 1), "SAME")
            h = jax.nn.relu(h + b[None, :, None, None])
            if relu_i in _TAP_LAYERS:
                feats.append(h)
            conv_i += 1
            relu_i += 1
        return feats

    def __call__(self, a, b):
        fa, fb = self._features(a), self._features(b)
        total = 0.0
        for x, y, w in zip(fa, fb, self.lins):
            xn = x / jnp.sqrt(jnp.sum(x * x, 1, keepdims=True) + 1e-10)
            yn = y / jnp.sqrt(jnp.sum(y * y, 1, keepdims=True) + 1e-10)
            d = (xn - yn) ** 2
            total = total + jnp.mean(jnp.sum(
                d * w[None, :, None, None], axis=1))
        return total


_LPIPS_CACHE: dict = {}


def get_lpips(weights_path: str | None = None):
    """Returns an Lpips callable or None if no weights are available."""
    path = weights_path or os.environ.get("D2DGS_LPIPS_WEIGHTS", "")
    if not path or not os.path.exists(path):
        return None
    if path not in _LPIPS_CACHE:
        _LPIPS_CACHE[path] = Lpips(path)
    return _LPIPS_CACHE[path]


def get_lpips_rand():
    if "rand" not in _LPIPS_CACHE:
        _LPIPS_CACHE["rand"] = Lpips.random()
    return _LPIPS_CACHE["rand"]


def evaluate_image_metrics(pred, gt, lpips_weights: str | None = None,
                           lpips_rand: bool = True):
    """-> dict of floats.  `lpips_vgg` only with provided trained weights;
    `lpips_rand` is the always-available random-feature substitute."""
    pred = jnp.asarray(pred)
    gt = jnp.asarray(gt)
    out = {
        "psnr": float(psnr(pred, gt)),
        "ssim": float(ssim(pred, gt)),
        "ms_ssim": float(msssim(pred, gt)),
    }
    lp = get_lpips(lpips_weights)
    if lp is not None:
        out["lpips_vgg"] = float(lp(pred, gt))
    if lpips_rand:
        out["lpips_rand"] = float(get_lpips_rand()(pred, gt))
    return out
