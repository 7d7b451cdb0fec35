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
