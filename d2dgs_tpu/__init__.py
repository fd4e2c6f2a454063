"""d2dgs_tpu — a TPU-native framework for Dynamic 2D Gaussian Splatting.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of
hustvl/Dynamic-2DGS (ACMMM 2025): differentiable 2D-Gaussian-surfel
rasterization (RGB + depth + normal + distortion), sparse-control-point
deformation fields with LBS-style skinning, two-stage per-scene training,
densification/pruning under static shapes, and TSDF mesh extraction —
designed TPU-first (static shapes, fused jitted steps, Pallas kernels for
the hot tile-blend loop, sharding via jax.sharding over device meshes).
"""

__version__ = "0.1.0"
