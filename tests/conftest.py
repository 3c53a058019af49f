"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the standard JAX trick for exercising shard_map/psum collectives
without TPU hardware (SURVEY §4): force the host platform and split it into
8 virtual devices BEFORE jax is imported anywhere.
"""

import os

# Force, don't setdefault: the TPU environment exports JAX_PLATFORMS=axon
# globally; tests always run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache makes repeated test runs much faster.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
