"""Multi-host collective backend bootstrap.

The reference has no distributed layer at all (SURVEY.md §2c).  On TPU
the backend IS XLA: `jax.distributed.initialize` wires the hosts
together (coordinator via env), `jax.devices()` then spans the whole
slice/pod, and collectives ride ICI within a slice and DCN across
slices.  No NCCL/MPI equivalent code exists or is needed — shardings
and psum/all_to_all placement do the rest.

Usage: call `maybe_init_distributed()` first thing in a trainer/bench
process; it is a no-op in single-process runs so the same entry point
works everywhere.
"""
from __future__ import annotations

import os

import numpy as np

_INITIALIZED = False


def maybe_init_distributed(force: bool = False) -> tuple[int, int]:
    """Initialize the JAX distributed runtime when the environment says
    this is a multi-process run (TPU pod env vars or explicit
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES).  Returns
    (process_index, process_count)."""
    global _INITIALIZED
    import jax
    env = os.environ
    multiproc = (force
                 or "JAX_COORDINATOR_ADDRESS" in env
                 or "COORDINATOR_ADDRESS" in env
                 or "MEGASCALE_COORDINATOR_ADDRESS" in env
                 or env.get("JAX_NUM_PROCESSES", "1") not in ("", "1")
                 or env.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0)
    if multiproc and not _INITIALIZED:
        # args (coordinator_address, num_processes, process_id) resolve
        # from the environment on TPU pods; explicit env vars cover
        # non-TPU test rigs.
        kw = {}
        if "JAX_COORDINATOR_ADDRESS" in env:
            kw["coordinator_address"] = env["JAX_COORDINATOR_ADDRESS"]
        if "JAX_NUM_PROCESSES" in env:
            kw["num_processes"] = int(env["JAX_NUM_PROCESSES"])
        if "JAX_PROCESS_ID" in env:
            kw["process_id"] = int(env["JAX_PROCESS_ID"])
        jax.distributed.initialize(**kw)
        _INITIALIZED = True
    return jax.process_index(), jax.process_count()


def global_mesh(axes: tuple[str, ...] = ("data",),
                shape: tuple[int, ...] | None = None):
    """Mesh over ALL global devices (every host's chips).  With one axis
    the full device count is used; otherwise `shape` must multiply to
    it.  Axis order follows jax.devices() order, which groups devices by
    host — so the FIRST axis varies slowest across hosts and should be
    the DCN-friendly one (data)."""
    import jax
    from jax.sharding import Mesh
    devs = np.asarray(jax.devices())
    if shape is None:
        assert len(axes) == 1
        shape = (devs.size,)
    assert int(np.prod(shape)) == devs.size, (shape, devs.size)
    return Mesh(devs.reshape(shape), axes)


def is_primary() -> bool:
    import jax
    return jax.process_index() == 0
