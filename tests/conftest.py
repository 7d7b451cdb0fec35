"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware."""

import os

# Force CPU even when the shell exports JAX_PLATFORMS=axon (the real-TPU
# tunnel): the suite needs 8 virtual devices for the sharding tests. The
# axon sitecustomize imports jax at interpreter startup, so the env var is
# already captured -- jax.config.update is the only effective override.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

# Persistent-cache WRITES are disabled for the suite by default, as a
# second layer of defense around the saturation crash documented on
# _bound_xla_code_memory below (before that fixture existed, the crash
# often surfaced inside cache serialize/deserialize). Reads stay enabled,
# so a cache built by short-lived processes still speeds the suite up;
# scripts/run_tests.sh re-enables writes per file (short processes are
# safe) and keeps building the cache for everyone else.
if os.environ.get("DRSLAM_TEST_CACHE_WRITES") != "1":
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1e9)
    except Exception:
        pass


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_xla_code_memory():
    """Free compiled executables at module boundaries.

    A long single process accumulates XLA:CPU JIT-loaded executables until
    a later compile (or cache load) segfaults -- deterministically at the
    same test given the same history, regardless of the persistent cache
    (crashes reproduced in backend_compile_and_load with the cache fully
    disabled and with a 64 MB stack). Dropping executable references at
    each module boundary keeps the loaded-code footprint bounded;
    recompiles of shared jits hit the persistent cache where present. For
    the per-file runner this is a no-op (one module per process)."""
    yield
    import jax
    jax.clear_caches()
