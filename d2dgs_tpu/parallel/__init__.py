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
from .gauss_shard import (measure_exchange_counts, render_gauss_sharded,
                          suggest_exchange_cap)
from .gauss_train import (gauss_sharded_step, make_gauss_mesh,
                          make_gauss_sharded_step, make_mesh2d,
                          make_sharded_train_step, shard_gauss_state,
                          sharded_train_step)

__all__ = [
    "add_stats_batched", "batched_main_step", "make_dp_main_step",
    "make_mesh", "shard_batch", "shard_replicated", "stack_cameras",
    "gauss_sharded_step", "make_gauss_mesh", "make_gauss_sharded_step",
    "shard_gauss_state", "make_mesh2d", "make_sharded_train_step",
    "sharded_train_step", "render_gauss_sharded",
    "measure_exchange_counts", "suggest_exchange_cap",
]
