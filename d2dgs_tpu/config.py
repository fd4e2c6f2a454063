"""Rasterizer constants and configuration dataclasses.

Numeric constants mirror the reference CUDA rasterizer so that images,
depth maps, and gradients can be compared bit-for-bit in spirit:
see /root/reference diff-surfel-rasterization cuda_rasterizer/config.h:15-17
and auxiliary.h:18-37.
"""
from __future__ import annotations

import dataclasses

# --- Tile / channel geometry (config.h:15-17) ---
TILE = 16  # BLOCK_X == BLOCK_Y == 16
NUM_CHANNELS = 3

# --- Blend constants (auxiliary.h:18-37, forward.cu:233-239,385,397-402) ---
FILTER_SIZE = 0.7071067811865476  # 1/sqrt(2) screen-space low-pass radius
FILTER_INV_SQUARE = 1.0 / (FILTER_SIZE * FILTER_SIZE)  # == 2.0
ALPHA_CLIP = 0.99           # max per-splat alpha
ALPHA_CUTOFF = 1.0 / 255.0  # splats below this alpha are skipped
T_CUTOFF = 1e-4             # transmittance early-termination threshold
TRUNCATED_R = 3.0           # 3-sigma truncation radius
NEAR_PLANE = 0.2
FAR_PLANE = 100.0

# --- allmap channel layout (auxiliary.h:25-30) ---
DEPTH_CH = 0          # expected depth * alpha
ALPHA_CH = 1
NORMAL_CH = slice(2, 5)  # camera-frame normal * alpha
MIDDEPTH_CH = 5       # median depth (first depth where T drops <= 0.5)
DISTORTION_CH = 6
MEDIAN_WEIGHT_CH = 7
NUM_AUX_CHANNELS = 8


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    """Static configuration of the tiled rasterizer.

    All fields are *static* under jit: they determine array capacities
    (XLA requires static shapes; the reference's dynamic per-tile lists
    become fixed-capacity padded buffers).
    """
    # Static capacity of the flat binning emission (total tile-rect slots
    # across all splats, BEFORE the visibility cull — the reference's
    # dynamically-sized num_rendered, rasterizer_impl.cu:278).  There is
    # no per-gaussian rect cap: every splat bins its full rect like the
    # CUDA getRect.  Oversubscription drops the DEEPEST splats' slots and
    # is reported via Binning.clamped; size from
    # ops/binning.required_emission for clamp-free guarantees (bench.py).
    emission_cap: int = 1 << 21
    # Gaussians are staged through the blend loop in chunks of this size
    # (the TPU analogue of the CUDA 256-thread shared-memory batches).
    chunk: int = 64
    # Per-tile capacity of the gathered-list renderer (pairs beyond this
    # depth-sorted prefix are dropped; increase for dense scenes).
    tile_cap: int = 4096
    # Total capacity of the work-queue blend path's compact pair buffer
    # (chunk-aligned pairs summed over tiles).  The CUDA rasterizer's
    # dynamically-sized binning buffer (rasterizer_impl.cu:196-342)
    # becomes this static cap; overflow drops the deepest tiles' tails
    # and is reported by build_work_queue.
    pair_cap: int = 1 << 20
    # Work-queue kernel (one grid step per actual chunk of binned pairs)
    # vs the dense (tile, chunk) grid kernel.
    use_workqueue: bool = True
    # Bin a pair only when the splat's 3-sigma circle intersects the
    # tile's pixel-center rect.  The reference bins the circle's AABB
    # (auxiliary.h getRect:64-74), which also admits corner tiles the
    # circle misses; the circle test applies the SAME truncation radius
    # isotropically (every dropped pair is beyond 3 sigma at every pixel
    # of its tile, response < 1.1% alpha) and cuts binned pairs ~20-35%
    # at trained scale — gather, blend, backward, and scatter all
    # shrink proportionally.  ops/dense_raster.py applies the identical
    # test so tiled-vs-oracle parity stays exact.
    tile_circle_cull: bool = True
    depth_ratio: float = 1.0  # 1 => median ("surf") depth, 0 => expected
    use_pallas: bool = True   # Pallas blend kernels vs pure-XLA fallback
    # Run the Pallas kernels in interpreter mode on non-TPU backends
    # (tests); when False, non-TPU backends use the XLA path instead.
    pallas_interpret: bool = False
