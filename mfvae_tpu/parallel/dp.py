"""Data-parallel training via shard_map + psum over ICI.

The reference has no distributed execution at all (SURVEY §2.3: single
process, single device, no collectives).  This module is the TPU-native
equivalent of what DDP/NCCL would be in its world: the train step runs as an
SPMD program over the 'data' mesh axis — each device computes grads on its
batch shard, gradients and metrics are `psum`-reduced over ICI, and the
(replicated) optimizer update is applied identically everywhere.

Composes with tensor parallelism: inside the shard_map body the params can
themselves be sharded over 'model' (see parallel/sharding.py); here we keep
the explicit-collectives DP path self-contained and test it on the virtual
CPU mesh (SURVEY §4 test strategy).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from mfvae_tpu.config import LossConfig
from mfvae_tpu.models.losses import elbo_losses
from mfvae_tpu.parallel.mesh import DATA_AXIS
from mfvae_tpu.training.popart import normalize, pop_rescale_head
from mfvae_tpu.training.trainer import VaeTrainState, _kl_scale


def make_dp_train_step(
    loss_cfg: LossConfig,
    mesh: Mesh,
    mode: str = "Adam",
    popart_beta: float = 3e-4,
) -> Callable:
    """DP train step: (state, batch: VaeBatch, rng_key) -> (state, LossOutputs).

    Batch leaves are sharded [global_B, ...] over 'data'; state is
    replicated.  Per-shard grads are psum-averaged (each shard computes a
    mean over its local batch; psum/ndev == global mean since shards are
    equal-sized).  PopArt target statistics are computed from psum'd batch
    moments so every device sees identical stats.
    """
    use_art = mode in ("ART", "POPART")
    use_pop = mode == "POPART"
    ndev = mesh.shape[DATA_AXIS]

    state_spec = P()  # replicated

    def step(state: VaeTrainState, batch, rng_key):
        def body(state, batch, rng_key):
            params = state.params
            pa = state.popart
            reward_targets = batch.rewards
            if use_art:
                # global batch moments via psum of local sums
                local_n = reward_targets.shape[0]
                s1 = jax.lax.psum(jnp.sum(reward_targets, axis=0), DATA_AXIS)
                s2 = jax.lax.psum(
                    jnp.sum(reward_targets * reward_targets, axis=0), DATA_AXIS
                )
                n = local_n * ndev
                mu_b = s1 / n
                nu_b = s2 / n
                mu_new = (1.0 - popart_beta) * pa.mu + popart_beta * mu_b
                nu_new = (1.0 - popart_beta) * pa.nu + popart_beta * nu_b
                sigma_new = jnp.sqrt(jnp.clip(nu_new - mu_new * mu_new, 1e-8))
                pa_new = pa._replace(mu=mu_new, nu=nu_new, sigma=sigma_new)
                if use_pop:
                    params = pop_rescale_head(
                        params, pa, pa_new, ("params", "reward_linear")
                    )
                pa = pa_new
                reward_targets = normalize(pa, batch.rewards)

            kl_scale = _kl_scale(loss_cfg, state.step)
            # decorrelate eps across data shards (ndev==1 keeps the key
            # unchanged so the DP step degenerates to the plain step exactly)
            if ndev > 1:
                shard_key = jax.random.fold_in(
                    rng_key, jax.lax.axis_index(DATA_AXIS)
                )
            else:
                shard_key = rng_key

            def loss_fn(p):
                recon_s, recon_r, mu, logvar = state.apply_fn(
                    p, batch.inputs, None, shard_key
                )
                out = elbo_losses(
                    recon_s, recon_r, batch.next_state, reward_targets,
                    mu, logvar, loss_cfg, kl_scale=kl_scale,
                )
                return out.loss, out

            (_, outs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            grads = jax.lax.pmean(grads, DATA_AXIS)
            outs = jax.lax.pmean(outs, DATA_AXIS)
            updates, new_opt_state = state.tx.update(grads, state.opt_state, params)
            new_params = optax.apply_updates(params, updates)
            new_state = state.replace(
                step=state.step + 1,
                params=new_params,
                opt_state=new_opt_state,
                popart=pa,
            )
            return new_state, outs

        in_batch_specs = jax.tree.map(lambda _: P(DATA_AXIS), batch)
        return shard_map(
            body,
            mesh=mesh,
            in_specs=(state_spec, in_batch_specs, P()),
            out_specs=(state_spec, P()),
            check_vma=False,
        )(state, batch, rng_key)

    return step
