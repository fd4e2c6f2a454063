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
from .gauss_train import (gauss_sharded_step, make_gauss_mesh,
                          make_gauss_sharded_step, shard_gauss_state)

__all__ = [
    "add_stats_batched", "batched_main_step", "make_dp_main_step",
    "make_mesh", "shard_batch", "shard_replicated", "stack_cameras",
    "gauss_sharded_step", "make_gauss_mesh", "make_gauss_sharded_step",
    "shard_gauss_state",
]
