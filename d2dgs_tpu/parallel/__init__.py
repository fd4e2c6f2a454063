"""Multi-chip scaling layer.

The reference is strictly single-process / single-GPU / batch-1 (SURVEY.md
§2c: no torch.distributed anywhere).  Scaling is therefore a new,
first-class TPU-native subsystem: shardings are expressed with
`jax.sharding.NamedSharding` over a device `Mesh`, and XLA places the
collectives (psum of replicated-parameter gradients) on ICI.
"""
from .data_parallel import (add_stats_batched, batched_main_step,
                            make_dp_main_step, make_mesh, shard_batch,
                            shard_replicated, stack_cameras)

__all__ = [
    "add_stats_batched", "batched_main_step", "make_dp_main_step",
    "make_mesh", "shard_batch", "shard_replicated", "stack_cameras",
]
