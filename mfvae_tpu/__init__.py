"""mfvae_tpu — a TPU-native multi-agent factorized VAE world-model framework.

A from-scratch re-design of the capabilities of anetnna/MF-VAE
(reference: /root/reference) for TPU hardware:

- agents are a stacked tensor axis (batched matmuls on the MXU) instead of a
  40-way Python loop (reference: jax_ver/model.py:149-181),
- the replay buffer is HBM-resident with jitted, donated add/sample
  (reference kept a host cpprb buffer, torch_ver/src/replay_buffer.py),
- data collection + training folds into a single compiled `lax.scan` program
  (the reference's own vdn.py:522-524 pattern, applied to the VAE path),
- data parallelism via `shard_map` + `psum` over ICI; tensor parallelism for
  the joint decoders via sharding annotations,
- explicit named RNG streams (the reference reuses keys: jax_ver/main.py:154-158).
"""

__version__ = "0.1.0"

from mfvae_tpu.config import (
    ExperimentConfig,
    ModelConfig,
    LossConfig,
    BufferConfig,
    TrainConfig,
    MeshConfig,
    load_config,
    save_config,
)
from mfvae_tpu.rng import RngStream, make_streams

__all__ = [
    "ExperimentConfig",
    "ModelConfig",
    "LossConfig",
    "BufferConfig",
    "TrainConfig",
    "MeshConfig",
    "load_config",
    "save_config",
    "RngStream",
    "make_streams",
]
