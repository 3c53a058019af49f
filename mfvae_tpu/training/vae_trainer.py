"""Train step for the single/multimodal VAE families (BASELINE configs 1-4).

One fused jitted step (forward + ELBO + grad + adam) with huber/mse recon,
beta-VAE KL weighting, linear KL annealing, and free-bits — the same loss
machinery as the MAVAE path (models/losses.py) minus the reward head.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax.training.train_state import TrainState

from mfvae_tpu.models.losses import huber, kl_gaussian, mse


class VaeLoss(NamedTuple):
    loss: jnp.ndarray
    recon_loss: jnp.ndarray
    kl_loss: jnp.ndarray


def make_vae_train_step(
    kl_weight: float = 1.0,
    use_huber: bool = False,
    kl_anneal_steps: int = 0,
    free_bits: float = 0.0,
) -> Callable:
    """(state, batch, rng) -> (state, VaeLoss).

    batch: one array (single modality) or a tuple/list (multimodal — recon
    losses are summed over modalities)."""

    recon_fn = huber if use_huber else mse

    def losses(out, batch, step) -> VaeLoss:
        if isinstance(batch, (tuple, list)):
            recons, mu, logvar = out
            recon = sum(recon_fn(r, x) for r, x in zip(recons, batch))
        else:
            recon_, mu, logvar = out
            recon = recon_fn(recon_, batch)
        kl = kl_gaussian(mu, logvar, free_bits)
        scale = kl_weight
        if kl_anneal_steps > 0:
            scale = scale * jnp.minimum(1.0, step.astype(jnp.float32) / kl_anneal_steps)
        loss = recon + scale * kl
        return VaeLoss(loss=loss, recon_loss=recon, kl_loss=kl)

    def train_step(state: TrainState, batch, rng_key):
        def loss_fn(params):
            out = state.apply_fn(params, batch, rng_key)
            l = losses(out, batch, state.step)
            return l.loss, l

        (_, outs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads=grads), outs

    def eval_step(state: TrainState, batch, rng_key):
        out = state.apply_fn(state.params, batch, rng_key)
        return losses(out, batch, state.step)

    train_step.eval_step = eval_step  # convenience attribute
    return train_step


def create_vae_state(model, variables, lr: float = 1e-3) -> TrainState:
    state = TrainState.create(
        apply_fn=model.apply, params=variables, tx=optax.adam(lr)
    )
    # pin step dtype so jits carrying the state don't retrace after step 1
    return state.replace(step=jnp.asarray(0, jnp.int32))
