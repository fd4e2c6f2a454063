"""Dense (no-binning) reference renderer — the ground truth for kernel tests.

Blends *every*Aussian against *every* pixel in one chunk, with the same
tile-membership mask the binned renderers apply (a Gaussian only touches
pixels whose 16x16 tile lies inside its screen rect, matching the CUDA
binning semantics of rasterizer_impl.cu:70-138).  O(N*H*W) memory — use for
small scenes / unit tests only.  Fully differentiable via JAX autodiff;
this is the functional spec the Pallas kernels are validated against.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import TILE
from ..data.cameras import Camera
from . import blend as B
from .projection import preprocess


def rasterize_dense(means3d, scales, quats, opacities, colors, cam: Camera,
                    bg=None, scale_modifier: float = 1.0,
                    tile_circle_cull: bool = True):
    """Render [H,W,3] color + [H,W,8] allmap.

    colors: [N,3] precomputed RGB (SH evaluation happens outside, as in the
    renderer facade). opacities: [N] post-sigmoid.
    Returns (color, allmap, radii, prep).
    """
    H, W = cam.H, cam.W
    if bg is None:
        bg = jnp.zeros((3,), jnp.float32)
    prep = preprocess(means3d, scales, quats, cam, scale_modifier)

    # depth-sorted order (CUDA radix sort is stable on depth bits; invalid
    # Gaussians carry +inf keys and zero alpha)
    key = jnp.where(prep.valid, prep.depth, jnp.inf)
    order = jnp.argsort(key, stable=True)

    T = prep.T[order]
    center = prep.center[order]
    normal = prep.normal[order]
    col = colors[order]
    opac = jnp.where(prep.valid, opacities, 0.0)[order]
    gdepth = prep.depth[order]
    rmin = prep.rect_min[order]
    rmax = prep.rect_max[order]

    ys, xs = jnp.mgrid[0:H, 0:W]
    pix = jnp.stack([xs.ravel() + 0.5, ys.ravel() + 0.5], axis=-1)  # [P,2]
    tx = (xs.ravel() // TILE).astype(jnp.int32)
    ty = (ys.ravel() // TILE).astype(jnp.int32)

    alpha, depth_px = B.pixel_responses(T, center, opac, pix)       # [G,P]
    in_tile = ((tx[None, :] >= rmin[:, 0:1]) & (tx[None, :] < rmax[:, 0:1])
               & (ty[None, :] >= rmin[:, 1:2]) & (ty[None, :] < rmax[:, 1:2]))
    if tile_circle_cull:
        # match the binned paths' exact visibility-circle test
        # (ops/binning.py visibility_circles); everything here is
        # order-sorted, so index the circles the same way.  The cull is
        # output-invariant (it only drops alpha<1/255 pairs) — applying
        # it here keeps tiled-vs-dense parity exact to the bit rather
        # than merely to the invariance bound.
        from .binning import circles_tile_hit, visibility_circles
        vc = visibility_circles(prep, jnp.where(prep.valid, opacities, 0.0))
        vc_s = jax.tree.map(lambda a: a[order][..., None, :]
                            if a.ndim == 2 else a[order][:, None], vc)
        in_tile &= circles_tile_hit(vc_s, tx[None, :], ty[None, :])
    alpha = jnp.where(in_tile, alpha, 0.0)

    state = B.init_state(H * W)
    state = B.blend_chunk(state, alpha, depth_px, col, normal)
    color_img, allmap = B.finalize(state, bg)
    return (color_img.reshape(H, W, 3), allmap.reshape(H, W, 8),
            prep.radius, prep)
