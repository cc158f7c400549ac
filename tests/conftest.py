"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the multi-chip test strategy from SURVEY.md §4: pjit/sharding tests
use ``--xla_force_host_platform_device_count=8`` instead of real TPU chips.
Must set env vars before jax initializes a backend.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compile cache: CPU test-shape compiles are slow in this image.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
