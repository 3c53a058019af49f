"""Multi-step open-loop (unroll) training for the world model.

The reference trains its "world model" purely one-step: every batch is an
i.i.d. transition and the decoder is scored on the single next state
(jax_ver/trainer.py:74-84).  Open-loop imagination error therefore
compounds unchecked — measured in PARITY.md's rollout-accuracy table, even
the dynamics-recipe model only MATCHES the frozen-world baseline by k=25.
This module trains the model the way it is served (inference.WorldModel
.rollout): sample windows of W consecutive transitions, roll the model
forward feeding its own predicted state back as the next observation, and
apply the ELBO at EVERY horizon — by default backpropagating through the
feedback loop (BPTT through the scan).  Feedback distribution caveat: the
default feedback is the SAMPLED reconstruction (z drawn through the
reparameterization, like the one-step objective), while the serving
rollout feeds back the posterior-MEAN prediction; ``mean_feedback=True``
(train.unroll_mean_feedback) switches the feedback to the serving-exact
mean path (MAVAE.mean_call — the same code serving runs), at the cost of
a second decode per step.

Loss pooling: per-step per-sample losses are validity-masked (a window may
cross an episode boundary — steps after the first stored ``done`` are
excluded) and pooled over all valid (sample, step) slots, so W=1 with all
slots valid reproduces the reference one-step loss (tests/test_unroll.py
asserts loss AND gradient equality to allclose tolerance).

Design constraints (asserted at factory time):
- mode='Adam' (PopArt reward normalization would need per-step target
  renormalization — not defined for the multi-step objective);
- use_pallas=False (the fused kernel is a one-step program);
- buffer windows must not straddle collection phases: the epoch program
  interleaves train/test collection, so ItemBuffer.sample_window is called
  with block=sample_num (requires max_size % sample_num == 0).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax

from mfvae_tpu.config import LossConfig
from mfvae_tpu.data.transitions import GroupedTransition
from mfvae_tpu.models.losses import (
    LossOutputs,
    _elem_loss,
    combine_losses,
    twohot_ce_rows,
)
from mfvae_tpu.models.mavae import (
    AgentSpec,
    GroupedBatch,
    agent_order_concat,
    state_to_grouped,
)


def _huber_rows(x: jnp.ndarray, y: jnp.ndarray, delta: float) -> jnp.ndarray:
    """Per-sample huber: mean over trailing dims -> [B].  Same elementwise
    form as models/losses.huber (whose full mean equals the unweighted mean
    of these rows)."""
    abs_err = jnp.abs((x - y).astype(jnp.float32))
    quadratic = jnp.minimum(abs_err, delta)
    linear = abs_err - quadratic
    per_el = 0.5 * quadratic * quadratic + delta * linear
    return jnp.mean(per_el.reshape(per_el.shape[0], -1), axis=-1)


def _mse_rows(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    d = (x - y).astype(jnp.float32)
    return jnp.mean((d * d).reshape(d.shape[0], -1), axis=-1)


def _kl_rows(mu: jnp.ndarray, logvar: jnp.ndarray, free_bits: float) -> jnp.ndarray:
    """Per-sample KL (sum over latent dims) -> [B]; matches
    losses.kl_gaussian's reduction before its batch mean."""
    mu = mu.astype(jnp.float32)
    logvar = logvar.astype(jnp.float32)
    per_dim = -0.5 * (1.0 + logvar - mu * mu - jnp.exp(logvar))
    if free_bits > 0.0:
        per_dim = jnp.maximum(per_dim, free_bits)
    return jnp.sum(per_dim.reshape(per_dim.shape[0], -1), axis=-1)


def make_unroll_loss_fn(
    spec: AgentSpec,
    loss_cfg: LossConfig,
    unroll_steps: int,
    stop_gradient: bool = False,
    mean_feedback: bool = False,
    s_col_weight=None,
) -> Callable:
    """Build ``loss_fn(apply_fn, params, wbatch, rng_key, kl_scale) ->
    (loss, LossOutputs)`` over a window batch (GroupedTransition leaves
    [B, W, ...]).  Exposed separately from the train step so eval-side
    consumers (scripts, tests) can score the multi-step objective without
    an optimizer.

    ``stop_gradient`` detaches the fed-back prediction: every horizon still
    trains on the model's own-prediction input distribution, but gradients
    stop at step boundaries (scheduled-sampling-style) instead of flowing
    through the whole chain (BPTT).  ``mean_feedback`` feeds back the
    posterior-MEAN prediction (MAVAE.mean_call — the exact serving path)
    instead of the sampled reconstruction; the per-step loss keeps scoring
    the sampled reconstruction either way (it IS the ELBO)."""
    W = int(unroll_steps)
    assert W >= 1

    def loss_fn(apply_fn, params, wbatch: GroupedTransition, rng_key, kl_scale=None):
        # time-major per-step inputs
        acts = tuple(jnp.moveaxis(a, 0, 1) for a in wbatch.actions)  # [W, B, ...]
        next_obs = tuple(jnp.moveaxis(o, 0, 1) for o in wbatch.next_obs)
        rewards = jnp.moveaxis(wbatch.rewards, 0, 1)  # [W, B, A]
        done = jnp.moveaxis(wbatch.done, 0, 1).astype(jnp.float32)  # [W, B]
        keys = jax.random.split(rng_key, W)
        obs0 = tuple(o[:, 0] for o in wbatch.obs)  # [B, A_g, od]
        b = rewards.shape[1]

        def step(carry, per_t):
            carry_obs, mask = carry
            act_t, nob_t, tgt_r, done_t, k_t = per_t
            tgt_s = agent_order_concat(spec, nob_t)  # [B, Σobs]
            recon_s, recon_r, mu, logvar = apply_fn(
                params, GroupedBatch(obs=carry_obs, actions=act_t), None, k_t
            )
            if s_col_weight is not None:
                # contact-sharpness column lever: weighted column mean
                # (same semantics as losses.weighted_state_loss)
                elem = _elem_loss(recon_s, tgt_s, loss_cfg)
                s_rows = jnp.sum(elem * s_col_weight, axis=-1) / jnp.sum(
                    s_col_weight
                )
            elif loss_cfg.use_huber:
                s_rows = _huber_rows(recon_s, tgt_s, loss_cfg.huber_delta)
            else:
                s_rows = _mse_rows(recon_s, tgt_s)
            if recon_r.ndim == tgt_r.ndim + 1:
                # two-hot reward head: logits [B, A, K], CE per sample
                r_rows = jnp.mean(twohot_ce_rows(recon_r, tgt_r), axis=-1)
            elif loss_cfg.use_huber:
                r_rows = _huber_rows(recon_r, tgt_r, loss_cfg.huber_delta)
            else:
                r_rows = _mse_rows(recon_r, tgt_r)
            kl_rows = _kl_rows(mu, logvar, loss_cfg.free_bits)
            if loss_cfg.contact_weight > 0.0:
                # contact-sharpness sample lever: contact transitions count
                # (1 + contact_weight)x in the STATE branch only
                contact = (
                    jnp.max(tgt_r, axis=-1) > loss_cfg.contact_threshold
                ).astype(jnp.float32)
                s_w = mask * (1.0 + loss_cfg.contact_weight * contact)
            else:
                s_w = mask
            sums = (
                jnp.sum(s_rows * s_w),
                jnp.sum(r_rows * mask),
                jnp.sum(kl_rows * mask),
                jnp.sum(mask),
                jnp.sum(s_w),
            )
            # feed the prediction back (gradients flow through the scan
            # carry unless stop_gradient); windows die at episode boundaries
            new_mask = mask * (1.0 - done_t)
            if mean_feedback:
                fb, _ = apply_fn(
                    params,
                    GroupedBatch(obs=carry_obs, actions=act_t),
                    None,
                    method="mean_call",
                )
            else:
                fb = recon_s
            if stop_gradient:
                fb = jax.lax.stop_gradient(fb)
            return (state_to_grouped(spec, fb), new_mask), sums

        _, (s_sum, r_sum, kl_sum, w_sum, sw_sum) = jax.lax.scan(
            step,
            (obs0, jnp.ones((b,), jnp.float32)),
            (acts, next_obs, rewards, done, keys),
        )
        total_w = jnp.maximum(jnp.sum(w_sum), 1.0)
        s_loss = jnp.sum(s_sum) / jnp.maximum(jnp.sum(sw_sum), 1.0)
        r_loss = jnp.sum(r_sum) / total_w
        kl_loss = jnp.sum(kl_sum) / total_w
        out = combine_losses(s_loss, r_loss, kl_loss, loss_cfg, kl_scale)
        return out.loss, out

    return loss_fn


def make_unroll_train_step(
    spec: AgentSpec,
    loss_cfg: LossConfig,
    unroll_steps: int,
    mode: str = "Adam",
    use_pallas: bool = False,
    stop_gradient: bool = False,
    mean_feedback: bool = False,
    s_col_weight=None,
) -> Callable:
    """Fused multi-step train step: (state, wbatch, rng_key) ->
    (state, LossOutputs).  ``wbatch`` is a GroupedTransition window batch
    from ItemBuffer.sample_window (leaves [B, W, ...])."""
    if mode != "Adam":
        raise NotImplementedError(
            "unroll_steps > 1 supports train.mode='Adam' only (PopArt reward "
            "normalization is undefined for the multi-step objective)"
        )
    if use_pallas:
        raise NotImplementedError(
            "unroll_steps > 1 is incompatible with model.use_pallas (the "
            "fused kernel is a one-step program)"
        )
    loss_fn = make_unroll_loss_fn(
        spec, loss_cfg, unroll_steps, stop_gradient, mean_feedback,
        s_col_weight=s_col_weight,
    )

    from mfvae_tpu.training.trainer import _kl_scale  # avoid cycle at import

    def train_step(state, wbatch: GroupedTransition, rng_key):
        kl_scale = _kl_scale(loss_cfg, state.step)

        def wrapped(p):
            return loss_fn(state.apply_fn, p, wbatch, rng_key, kl_scale)

        (_, outs), grads = jax.value_and_grad(wrapped, has_aux=True)(state.params)
        updates, new_opt_state = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
        )
        return state, outs

    return train_step
