"""Test config: run everything on CPU with 8 virtual devices so sharding
logic is exercised without TPU hardware (SURVEY.md §4).

NOTE: the jaxtyping pytest plugin imports jax BEFORE conftest runs, so
setting JAX_PLATFORMS via os.environ here is too late (the env default is
captured at jax import).  jax.config.update works until the backend is
actually initialized, so we force the platform through the config API.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses
# Subprocesses must NOT register the axon TPU PJRT plugin (sitecustomize
# gates on this env var): the relay claim can block behind the parent and
# hang CPU-only CLI smoke tests.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_max_isa" not in flags:
    # XLA:CPU's default target adds `prefer-no-scatter/gather` tuning
    # pseudo-features on AVX512 hosts; the persistent-cache AOT loader
    # then flags every reload as a machine mismatch ("could lead to
    # SIGILL" spam, VERDICT r4 weak #6).  Capping the ISA at AVX2 keeps
    # the target == host feature set, so cache reloads are silent.
    # Correctness-only CPU tests don't miss the AVX512 lanes.
    flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
# XLA compiles are very slow on small CI hosts; cache them across runs.
# Separate dir from the TPU runs' .jax_cache; additionally one dir PER
# xdist worker: concurrent writers to a single cache dir have segfaulted
# inside put_executable_and_time.
_worker = os.environ.get("PYTEST_XDIST_WORKER", "main")
# ... and keyed by host fingerprint (CPU feature set): replaying a cache
# written on a different machine spews cpu_aot_loader feature-mismatch
# errors and risks SIGILL (d2dgs_tpu/utils/cache.py, VERDICT r4 weak #6)
from d2dgs_tpu.utils.cache import host_fingerprint  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               ".jax_cache_cpu", host_fingerprint(),
                               _worker))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()

import pytest  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _bound_compile_state():
    """Drop the in-memory jit/executable cache after every module.  A
    single process holding every module's 8-device executables has
    aborted inside later XLA compiles (VERDICT r3 weak #3); per-module
    clearing plus the on-disk cache keeps state bounded without
    meaningfully slowing re-runs."""
    yield
    jax.clear_caches()
