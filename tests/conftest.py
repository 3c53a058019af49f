"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the standard JAX trick for exercising shard_map/psum collectives
without TPU hardware (SURVEY §4).  Environment gotchas (this image):

- The axon sitecustomize calls jax.config.update("jax_platforms",
  "axon,cpu") at interpreter start, which OVERRIDES the JAX_PLATFORMS env
  var — forcing cpu must itself go through jax.config, before the first
  device query.
- Ditto for virtual devices: XLA_FLAGS --xla_force_host_platform_device_count
  is ignored; jax_num_cpu_devices via jax.config works.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache makes repeated test runs much faster.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
