"""Deformation MLP — functional re-implementation of the reference's
DeformNetwork (utils/time_utils.py:311-459).

NeRF-style MLP (D=8, W=256, skip at D/2) over positional encodings of the
canonical position and the timestamp.  For Blender/D-NeRF data a small
"timenet" compresses the time encoding to 30 dims (time_utils.py:348-352).
Heads (warp 3, scaling 2, rotation 4, optional opacity/color/local-rot) are
near-zero initialized so deformation starts at identity.

Parameters are a plain dict pytree; everything jits and vmaps.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class MLPConfig:
    depth: int = 8
    width: int = 256
    multires_x: int = 10
    is_blender: bool = False
    local_frame: bool = False
    pred_opacity: bool = False
    pred_color: bool = False
    max_d_scale: float = -1.0
    time_out: int = 30
    # ProgressiveBandFrequency time annealing (time_utils.py:259-286):
    # when on, the time embedding is sin/cos bands only (no identity
    # term) with a cosine ramp mask driven by the training step.
    progressive_band_time: bool = False
    freq_masking_steps: int = 5000

    @property
    def t_multires(self) -> int:
        return 6 if self.is_blender else 10

    @property
    def skip(self) -> int:
        return self.depth // 2


def embed_dim(multires: int, in_dim: int) -> int:
    return in_dim * (1 + 2 * multires)


def positional_encoding(x: jnp.ndarray, multires: int) -> jnp.ndarray:
    """[..., d] -> [..., d*(1+2*multires)]: (x, sin(2^k x), cos(2^k x))_k
    (time_utils.py Embedder, log-sampled frequencies)."""
    if multires == 0:
        return x
    freqs = 2.0 ** jnp.arange(multires, dtype=x.dtype)
    ang = x[..., None, :] * freqs[:, None]            # [..., F, d]
    enc = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)  # [...,F,2d]
    return jnp.concatenate([x, enc.reshape(*x.shape[:-1], -1)], axis=-1)


def progressive_band_encoding(x: jnp.ndarray, multires: int, step,
                              masking_steps: int) -> jnp.ndarray:
    """ProgressiveBandFrequency (time_utils.py:259-286): sin/cos bands
    ONLY (no identity term), each frequency gated by a cosine ramp of the
    traced training `step` — low frequencies first."""
    freqs = 2.0 ** jnp.arange(multires, dtype=x.dtype)
    ramp = jnp.clip(jnp.asarray(step, x.dtype)
                    / max(masking_steps, 1) * multires
                    - jnp.arange(multires, dtype=x.dtype), 0.0, 1.0)
    mask = (1.0 - jnp.cos(jnp.pi * ramp)) / 2.0       # [F]
    ang = x[..., None, :] * freqs[:, None]            # [..., F, d]
    enc = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)],
                          axis=-1) * mask[:, None]    # [..., F, 2d]
    return enc.reshape(*x.shape[:-1], -1)


def _kaiming_uniform(key, fan_in, fan_out):
    bound = np.sqrt(6.0 / fan_in)   # gain sqrt(2) * sqrt(3/fan_in)
    return jax.random.uniform(key, (fan_in, fan_out), minval=-bound,
                              maxval=bound, dtype=jnp.float32)


def _torch_default_linear(key, fan_in, fan_out):
    """torch nn.Linear default init (used for the reference's timenet)."""
    k1, k2 = jax.random.split(key)
    bound = 1.0 / np.sqrt(fan_in)
    w = jax.random.uniform(k1, (fan_in, fan_out), minval=-bound, maxval=bound)
    b = jax.random.uniform(k2, (fan_out,), minval=-bound, maxval=bound)
    return w.astype(jnp.float32), b.astype(jnp.float32)


def init_mlp(key, cfg: MLPConfig) -> dict:
    params = {}
    keys = jax.random.split(key, cfg.depth + 12)
    x_ch = embed_dim(cfg.multires_x, 3)
    t_raw_ch = (2 * cfg.t_multires if cfg.progressive_band_time
                else embed_dim(cfg.t_multires, 1))
    t_ch = cfg.time_out if cfg.is_blender else t_raw_ch
    in_ch = x_ch + t_ch

    if cfg.is_blender:
        w0, b0 = _torch_default_linear(keys[-1], t_raw_ch, 256)
        w1, b1 = _torch_default_linear(keys[-2], 256, cfg.time_out)
        params["timenet"] = {"w0": w0, "b0": b0, "w1": w1, "b1": b1}

    layers = []
    fan = in_ch
    for i in range(cfg.depth):
        fan_in = in_ch if i == 0 else (
            cfg.width + in_ch if i - 1 == cfg.skip else cfg.width)
        layers.append({"w": _kaiming_uniform(keys[i], fan_in, cfg.width),
                       "b": jnp.zeros((cfg.width,), jnp.float32)})
        fan = cfg.width
    params["layers"] = layers

    def head(key, out, std):
        return {"w": std * jax.random.normal(key, (cfg.width, out),
                                             dtype=jnp.float32),
                "b": jnp.zeros((out,), jnp.float32)}

    params["warp"] = head(keys[-3], 3, 1e-5)
    params["scaling"] = head(keys[-4], 2, 1e-8)
    params["rotation"] = head(keys[-5], 4, 1e-5)
    if cfg.local_frame:
        params["local_rotation"] = head(keys[-6], 4, 1e-4)
    if cfg.pred_opacity:
        params["opacity"] = head(keys[-7], 1, 1e-5)
    if cfg.pred_color:
        params["color"] = head(keys[-8], 3, 1e-5)
    return params


def mlp_forward(params: dict, cfg: MLPConfig, x: jnp.ndarray,
                t: jnp.ndarray, step=10**9) -> dict:
    """x: [..., 3] canonical positions; t: [..., 1] timestamps; step: the
    traced global step (drives progressive_band_time annealing only).

    Returns dict with d_xyz [...,3], d_rotation [...,4], d_scaling [...,2]
    and optional d_opacity/d_color/local_rotation (time_utils.py:410-453).
    """
    if cfg.progressive_band_time:
        t_emb = progressive_band_encoding(t, cfg.t_multires, step,
                                          cfg.freq_masking_steps)
    else:
        t_emb = positional_encoding(t, cfg.t_multires)
    if cfg.is_blender:
        tn = params["timenet"]
        h_t = jax.nn.relu(t_emb @ tn["w0"] + tn["b0"])
        t_emb = h_t @ tn["w1"] + tn["b1"]
    x_emb = positional_encoding(x, cfg.multires_x)
    inp = jnp.concatenate([x_emb, t_emb], axis=-1)

    h = inp
    depth = len(params["layers"])
    for i, layer in enumerate(params["layers"]):
        h = jax.nn.relu(h @ layer["w"] + layer["b"])
        # the concat feeds the NEXT layer (time_utils.py:432-436); when the
        # skip index is the final layer (tiny test depths) it has no
        # consumer and would widen the head input
        if i == cfg.skip and i + 1 < depth:
            h = jnp.concatenate([inp, h], axis=-1)

    def apply(name):
        hd = params[name]
        return h @ hd["w"] + hd["b"]

    d_scaling = apply("scaling")
    if cfg.max_d_scale > 0:
        d_scaling = jnp.tanh(d_scaling) * np.log(cfg.max_d_scale)
    out = {"d_xyz": apply("warp"), "d_rotation": apply("rotation"),
           "d_scaling": d_scaling, "hidden": h,
           "d_opacity": apply("opacity") if cfg.pred_opacity else None,
           "d_color": apply("color") if cfg.pred_color else None}
    if cfg.local_frame:
        out["local_rotation"] = apply("local_rotation")
    return out
