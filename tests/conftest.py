"""Test configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding paths are
exercised without TPU hardware (the driver separately dry-runs them). This
must happen before jax is imported anywhere.
"""

import os

# Force CPU: the ambient environment pre-sets JAX_PLATFORMS=axon (TPU) and the
# axon plugin overrides the env var, so use jax.config directly. Tests run on
# an 8-virtual-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: the suite is compile-dominated (single-core
# box, many big unrolled graphs traced once per test); warm-cache reruns of
# the slowest tests are ~2-10x faster. CAUTION: XLA:CPU AOT cache entries
# embed the *compile host's* machine features but the cache key does NOT —
# the build VM migrates across heterogeneous hosts between sessions, and a
# stale entry loads fine yet computes WRONG NUMBERS (observed: chol JVP
# tangents 2x off after a host swap, with cpu_aot_loader SIGILL warnings on
# stderr). Fingerprint the cache dir by the host's CPU flags so each
# machine type gets its own cache.
from temporalgps_tpu.config import host_cpu_cache_tag  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir", f"/tmp/tgps_test_cache_{host_cpu_cache_tag()}"
)
# Persist only expensive compiles: XLA:CPU executable DESERIALIZATION has
# segfaulted on this box (round 5, twice, same spot: a disk read-back of a
# small same-boot scan executable mid-suite after in-memory eviction, jax
# compilation_cache.get_executable_and_time). Cheap graphs recompile faster
# than they deserialize anyway; the 2-10x warm-rerun win comes from the big
# unrolled graphs, which still persist.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(123456)


@pytest.fixture(autouse=True)
def _bound_memory_maps():
    """Keep the process's mmap count under vm.max_map_count (65530 default).

    Every XLA:CPU executable holds LLVM JIT mappings; a full-suite run
    accumulates thousands of compiled graphs and the map count was measured
    growing 6.7k -> 42k within minutes, after which mmap failures surface
    as SEGFAULTS inside backend_compile_and_load / cache deserialization
    (round 5, three crashed suite runs at ~45%). Dropping the jit caches
    unloads executables; the persistent compile cache makes the few
    re-compiles cheap."""
    yield
    try:
        with open("/proc/self/maps", "rb") as f:
            n = sum(1 for _ in f)
    except OSError:
        return
    if n > 35_000:
        jax.clear_caches()
