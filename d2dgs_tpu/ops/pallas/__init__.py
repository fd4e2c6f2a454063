"""Pallas TPU kernels for the hot rasterizer path."""
from .blend_tpu import blend_tiles_pallas, build_gdata  # noqa: F401
