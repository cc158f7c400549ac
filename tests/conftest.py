"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the multi-chip test strategy from SURVEY.md §4: pjit/sharding tests
use ``--xla_force_host_platform_device_count=8`` instead of real TPU chips.
Must set env vars before jax initializes a backend.
"""

import os

# FORCE cpu (not setdefault): the environment may export
# JAX_PLATFORMS=axon (the real TPU tunnel), and concurrent test processes
# contending for the single TPU deadlock each other.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Belt and braces: the env var is only read at jax import, and pytest
# plugin auto-loading may import jax before this conftest runs.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compile cache: CPU test-shape compiles are slow in this image.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
