"""Experiment driver for the single/multimodal VAE families — the runnable
form of BASELINE.json acceptance configs 1-4:

1. MLP VAE, single flat modality            (family='mlp')
2. Conv encoder/decoder VAE, bf16, images    (family='conv')
3. Factorized multimodal, shared+private     (family='factorized')
4. beta-VAE: KL annealing + free bits        (kl_anneal_steps / free_bits)

Data comes from the on-device synthetic generators (data/synthetic.py) —
fresh batches every step, generated in HBM, zero host IO.  The whole
(generate -> train) step is one jit; metrics/checkpointing reuse the shared
infra.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from mfvae_tpu.data.synthetic import correlated_modalities, sprites
from mfvae_tpu.models.factorized import FactorizedMultimodalVAE
from mfvae_tpu.models.vae import VAE, ConvVAE
from mfvae_tpu.training.checkpoint import CheckpointManager
from mfvae_tpu.training.metrics import MetricsLogger
from mfvae_tpu.training.vae_trainer import create_vae_state, make_vae_train_step


@dataclass
class VaeExperimentConfig:
    family: str = "mlp"  # 'mlp' | 'conv' | 'factorized'
    steps: int = 1000
    batch_size: int = 64
    lr: float = 1e-3
    latent_dim: int = 32
    kl_weight: float = 1.0
    use_huber: bool = False
    kl_anneal_steps: int = 0  # beta-VAE warmup (config 4)
    free_bits: float = 0.0  # beta-VAE floor (config 4)
    # mlp family
    in_dim: int = 64
    # conv family
    image_size: int = 16
    image_channels: int = 3
    conv_channels: Tuple[int, ...] = (16, 32)
    compute_dtype: str = "bfloat16"
    # factorized family
    modality_dims: Tuple[int, int] = (32, 16)
    shared_latent: int = 16
    private_latent: int = 16
    seed: int = 0
    log_dir: str = "results"
    run_name: str = ""
    log_every: int = 100
    checkpoint_dir: str = ""


def _build(cfg: VaeExperimentConfig):
    if cfg.family == "mlp":
        model = VAE(in_dim=cfg.in_dim, latent_dim=cfg.latent_dim)

        def gen(key):
            # flat modality = flattened sprites (structured, learnable)
            x = sprites(key, cfg.batch_size, 8, 1)
            return x.reshape(cfg.batch_size, -1)[:, : cfg.in_dim]

    elif cfg.family == "conv":
        model = ConvVAE(
            image_shape=(cfg.image_size, cfg.image_size, cfg.image_channels),
            latent_dim=cfg.latent_dim,
            channels=tuple(cfg.conv_channels),
            dtype=jnp.dtype(cfg.compute_dtype),
        )

        def gen(key):
            return sprites(key, cfg.batch_size, cfg.image_size, cfg.image_channels)

    elif cfg.family == "factorized":
        model = FactorizedMultimodalVAE(
            modality_dims=tuple(cfg.modality_dims),
            shared_latent=cfg.shared_latent,
            private_latent=cfg.private_latent,
        )

        def gen(key):
            return correlated_modalities(
                key, cfg.batch_size, cfg.modality_dims[0], cfg.modality_dims[1]
            )

    else:
        raise ValueError(f"unknown VAE family {cfg.family!r}")
    return model, gen


def run_vae_experiment(cfg: VaeExperimentConfig) -> dict:
    model, gen = _build(cfg)
    key = jax.random.PRNGKey(cfg.seed)
    k_data, k_init, k_train = jax.random.split(key, 3)

    def build(k):
        batch = gen(jax.random.fold_in(k_data, 0))
        variables = model.init(k, batch, k)
        return create_vae_state(model, variables, cfg.lr)

    state = jax.jit(build)(k_init)
    step_fn = make_vae_train_step(
        kl_weight=cfg.kl_weight,
        use_huber=cfg.use_huber,
        kl_anneal_steps=cfg.kl_anneal_steps,
        free_bits=cfg.free_bits,
    )

    def fused(state, i):
        """generate + train in one program (scanned in chunks)."""
        batch = gen(jax.random.fold_in(k_data, i))
        return step_fn(state, batch, jax.random.fold_in(k_train, i))

    chunk = max(1, cfg.log_every)

    @jax.jit
    def run_chunk(state, start):
        def body(s, i):
            return fused(s, i)

        idx = start + jnp.arange(chunk)
        state, outs = jax.lax.scan(body, state, idx)
        return state, jax.tree.map(jnp.mean, outs)

    logger = MetricsLogger(cfg.log_dir, cfg.run_name or f"vae_{cfg.family}")
    t0 = time.time()
    first = last = None
    for start in range(0, cfg.steps, chunk):
        state, outs = run_chunk(state, jnp.int32(start))
        loss = float(outs.loss)
        logger.scalar("Loss/Train", loss, start + chunk)
        logger.scalar("Loss/Recon_Train", float(outs.recon_loss), start + chunk)
        logger.scalar("Loss/KL_Train", float(outs.kl_loss), start + chunk)
        first = first if first is not None else loss
        last = loss
    logger.flush()
    result = {
        "family": cfg.family,
        "first_loss": first,
        "final_loss": last,
        "steps": cfg.steps,
        "wall_s": time.time() - t0,
    }
    if cfg.checkpoint_dir:
        ckpt = CheckpointManager(cfg.checkpoint_dir)
        ckpt.save(cfg.steps, {"params": state.params, "step": cfg.steps})
        ckpt.wait()
    return result


if __name__ == "__main__":
    import sys

    fam = sys.argv[1] if len(sys.argv) > 1 else "mlp"
    print(run_vae_experiment(VaeExperimentConfig(family=fam, steps=300)))
