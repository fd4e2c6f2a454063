"""Front-to-back surfel alpha blending as data-parallel chunk math.

The reference blends sequentially per pixel with early termination
(forward.cu:265-463).  On TPU we restructure: alpha compositing is an
*associative* operation, so a chunk of G depth-sorted Gaussians can be
blended against P pixels with one exclusive cumprod along the Gaussian
axis plus weighted reductions (which XLA maps onto the MXU as (P,G)@(G,C)
matmuls).  Early termination (T < 1e-4) and the alpha cutoff (1/255) are
reproduced exactly via prefix masks — including the reference's quirk that
the Gaussian *crossing* the threshold is dropped, not blended
(forward.cu:400-405).

Chunk-to-chunk state is carried in ``BlendState`` so the same math serves:
  * the dense ground-truth renderer (one chunk = all Gaussians),
  * the tiled XLA renderer (scan over per-tile chunks),
  * the Pallas kernel (same recurrences inside a fori_loop).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import (ALPHA_CLIP, ALPHA_CUTOFF, FAR_PLANE, FILTER_INV_SQUARE,
                      NEAR_PLANE, T_CUTOFF)


def pixel_responses(T: jnp.ndarray, center: jnp.ndarray, opacity: jnp.ndarray,
                    pix: jnp.ndarray):
    """Ray-splat intersection for G Gaussians x P pixels.

    T: [G,3,3] rows (Tu,Tv,Tw); center: [G,2]; opacity: [G]; pix: [P,2]
    pixel centers (x+0.5, y+0.5).

    Returns (alpha [G,P], depth [G,P]).  alpha is already masked by the
    p.z==0 / near-plane / 1-255 cutoff rules (forward.cu:358-399); blending
    masks (tile membership, validity, termination) are applied by callers.
    """
    Tu = T[:, 0, :][:, None, :]       # [G,1,3]
    Tv = T[:, 1, :][:, None, :]
    Tw = T[:, 2, :][:, None, :]
    px = pix[None, :, 0:1]            # [1,P,1]
    py = pix[None, :, 1:2]
    # two homogeneous planes through the ray (2DGS Eq. 8-10)
    k = px * Tw - Tu                  # [G,P,3]
    l = py * Tw - Tv
    p = jnp.cross(k, l)               # homogeneous intersection point
    pz = p[..., 2]
    good = pz != 0.0
    inv_pz = jnp.where(good, 1.0 / jnp.where(good, pz, 1.0), 0.0)
    sx = p[..., 0] * inv_pz
    sy = p[..., 1] * inv_pz
    rho3d = sx * sx + sy * sy
    dx = center[:, None, 0] - pix[None, :, 0]
    dy = center[:, None, 1] - pix[None, :, 1]
    rho2d = FILTER_INV_SQUARE * (dx * dx + dy * dy)   # low-pass (2DGS Eq.11)
    rho = jnp.minimum(rho3d, rho2d)
    use3d = rho3d <= rho2d
    depth = jnp.where(use3d,
                      sx * Tw[..., 0] + sy * Tw[..., 1] + Tw[..., 2],
                      Tw[..., 2])
    alpha = jnp.minimum(ALPHA_CLIP, opacity[:, None] * jnp.exp(-0.5 * rho))
    keep = good & (depth >= NEAR_PLANE) & (alpha >= ALPHA_CUTOFF)
    return jnp.where(keep, alpha, 0.0), depth


class BlendState(NamedTuple):
    """Per-pixel accumulators carried across Gaussian chunks. All [P] or [P,C]."""
    T: jnp.ndarray           # transmittance
    done: jnp.ndarray        # bool: early-terminated
    color: jnp.ndarray       # [P,3]
    depth: jnp.ndarray       # expected-depth accumulator (D)
    normal: jnp.ndarray      # [P,3]
    dist1: jnp.ndarray       # sum w*m  (m = mapped depth)
    dist2: jnp.ndarray       # sum w*m^2
    distortion: jnp.ndarray
    med_depth: jnp.ndarray
    med_weight: jnp.ndarray


def init_state(P: int, dtype=jnp.float32) -> BlendState:
    z = jnp.zeros((P,), dtype)
    return BlendState(
        T=jnp.ones((P,), dtype), done=jnp.zeros((P,), bool),
        color=jnp.zeros((P, 3), dtype), depth=z,
        normal=jnp.zeros((P, 3), dtype),
        dist1=z, dist2=z, distortion=z, med_depth=z, med_weight=z)


def blend_chunk(state: BlendState, alpha: jnp.ndarray, depth: jnp.ndarray,
                color: jnp.ndarray, normal: jnp.ndarray) -> BlendState:
    """Composite a depth-sorted chunk.

    alpha/depth: [G,P] (alpha pre-masked, 0 => skip); color/normal: [G,3].
    """
    g = alpha.shape[0]
    one_minus = 1.0 - alpha
    # transmittance *before* each Gaussian (exclusive cumulative product)
    cp = jnp.cumprod(one_minus, axis=0)
    T_before = state.T[None, :] * jnp.concatenate(
        [jnp.ones_like(cp[:1]), cp[:-1]], axis=0)
    T_after = T_before * one_minus
    # termination: the Gaussian whose blend would push T below the cutoff is
    # itself dropped and everything after it (forward.cu:400-405)
    trig = (alpha > 0.0) & (T_after < T_CUTOFF)
    any_trig = jnp.any(trig, axis=0)
    first = jnp.where(any_trig, jnp.argmax(trig, axis=0), g)
    idx = jnp.arange(g)[:, None]
    include = (idx < first[None, :]) & (~state.done)[None, :]
    w = jnp.where(include, alpha * T_before, 0.0)       # [G,P]

    # color / expected depth / normal accumulation — (P,G)@(G,C) MXU matmuls
    color_acc = state.color + jnp.einsum(
        "gp,gc->pc", w, color, preferred_element_type=jnp.float32)
    normal_acc = state.normal + jnp.einsum(
        "gp,gc->pc", w, normal, preferred_element_type=jnp.float32)
    depth_acc = state.depth + jnp.sum(w * depth, axis=0)

    # distortion (2DGS depth-distortion, forward.cu:408-428): per-Gaussian
    # error = m^2*A + dist2 - 2*m*dist1 with A/dist1/dist2 the *pre-blend*
    # accumulators; A == 1 - T_before exactly (telescoping sum of weights).
    safe_d = jnp.where(depth != 0.0, depth, 1.0)
    m = (FAR_PLANE * depth - FAR_PLANE * NEAR_PLANE) / (
        (FAR_PLANE - NEAR_PLANE) * safe_d)
    wm = w * m
    wmm = wm * m
    ex_cumsum = lambda x: jnp.concatenate(
        [jnp.zeros_like(x[:1]), jnp.cumsum(x, axis=0)[:-1]], axis=0)
    dist1_b = state.dist1[None, :] + ex_cumsum(wm)
    dist2_b = state.dist2[None, :] + ex_cumsum(wmm)
    A_b = 1.0 - T_before
    err = m * m * A_b + dist2_b - 2.0 * m * dist1_b
    distortion = state.distortion + jnp.sum(err * w, axis=0)

    # median depth: the *last* blended Gaussian whose pre-blend T > 0.5
    # (forward.cu:416-420 keeps overwriting while T > 0.5)
    med_cond = include & (alpha > 0.0) & (T_before > 0.5)
    has_med = jnp.any(med_cond, axis=0)
    last = g - 1 - jnp.argmax(med_cond[::-1], axis=0)   # [P]
    md = jnp.take_along_axis(depth, last[None, :], axis=0)[0]
    mw = jnp.take_along_axis(w, last[None, :], axis=0)[0]

    return BlendState(
        T=state.T * jnp.prod(jnp.where(include, one_minus, 1.0), axis=0),
        done=state.done | any_trig,
        color=color_acc, depth=depth_acc, normal=normal_acc,
        dist1=state.dist1 + jnp.sum(wm, axis=0),
        dist2=state.dist2 + jnp.sum(wmm, axis=0),
        distortion=distortion,
        med_depth=jnp.where(has_med, md, state.med_depth),
        med_weight=jnp.where(has_med, mw, state.med_weight),
    )


def finalize(state: BlendState, bg: jnp.ndarray):
    """-> (color [P,3], allmap [P,8]) with the reference channel layout."""
    color = state.color + state.T[:, None] * bg[None, :]
    allmap = jnp.concatenate([
        state.depth[:, None],
        (1.0 - state.T)[:, None],
        state.normal,
        state.med_depth[:, None],
        state.distortion[:, None],
        state.med_weight[:, None],
    ], axis=-1)
    return color, allmap
