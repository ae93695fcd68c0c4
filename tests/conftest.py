"""Test configuration: run everything on a virtual 8-device CPU mesh so that
pjit/sharding tests exercise real multi-device partitioning without TPU
hardware. Must run before jax initialises its backends."""

import os

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The environment's sitecustomize registers the axon TPU platform at
# interpreter startup and exports JAX_PLATFORMS=axon, so the env var above is
# not sufficient — force the platform through the config API as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compile cache: makes repeated test runs fast (the first eager
# pass otherwise recompiles every primitive shape).
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
