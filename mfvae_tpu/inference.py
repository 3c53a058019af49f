"""Inference path: load a checkpoint, serve world-model predictions.

The reference has no inference story at all — it pickles params and never
loads them (SURVEY §5.4).  Here a trained MAVAE checkpoint becomes a jitted
predictor for the world-model queries the architecture supports:

- ``predict(obs, actions)``  -> (next_state, rewards): posterior-mean
  one-step prediction (deterministic; z = mu),
- ``sample(obs, actions, key, n)`` -> n stochastic next-state/reward draws
  from the posterior,
- ``encode(obs)`` -> per-agent (mu, logvar) latents,
- ``rollout(obs, action_plan)`` -> imagination: a T-step trajectory of
  (states, rewards) by closing the loop — the model's reconstructed global
  state IS the concatenation of every agent's next observation, so it
  re-splits into per-agent inputs and feeds back, all inside one
  ``lax.scan`` (model-based planning surface the reference lacks).

All entry points are donation-friendly jits over the GroupedBatch tensor
format; a dict adapter accepts the reference's idx_state/actions dicts.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mfvae_tpu.config import ModelConfig
from mfvae_tpu.models.mavae import (
    AgentSpec,
    GroupedBatch,
    MAVAE,
    state_to_grouped,
)


class WorldModel:
    def __init__(self, model: MAVAE, variables):
        self.model = model
        self.variables = variables
        spec = model.spec

        @jax.jit
        def _predict(batch: GroupedBatch):
            # posterior-mean forward (z = mu; PoE mean for the shared
            # latent) — the module's own mean_call, so serving and unroll
            # training's mean feedback are one code path
            return model.apply(variables, batch, None, method="mean_call")

        @jax.jit
        def _encode(batch: GroupedBatch):
            mu, logvar, *_ = model.apply(
                variables, batch, None, method=lambda m, b, ids: m.encode(b, ids)
            )
            return mu.astype(jnp.float32), logvar.astype(jnp.float32)

        def _sample(batch: GroupedBatch, key, n):
            def one(k):
                out = model.apply(variables, batch, None, k)
                return out[0], out[1]

            return jax.vmap(one)(jax.random.split(key, n))

        def _state_to_grouped(state: jnp.ndarray):
            # shared with training/unroll.py so serving and training
            # re-split the flat state identically (models/mavae.py)
            return state_to_grouped(spec, state)

        @jax.jit
        def _rollout(obs_g, action_plan):
            """obs_g: per-group [B, A_g, od]; action_plan: per-group
            [T, B, A_g].  Returns (states [T, B, Σobs], rewards [T, B, A])."""

            def step(carry_obs, acts_t):
                ns, rw = _predict(GroupedBatch(obs=carry_obs, actions=acts_t))
                return _state_to_grouped(ns), (ns, rw)

            _, (states, rewards) = jax.lax.scan(step, obs_g, action_plan)
            return states, rewards

        self._predict = _predict
        self._encode = _encode
        self._sample = jax.jit(_sample, static_argnums=2)
        self._rollout = _rollout
        self._state_to_grouped = _state_to_grouped

    # ------------------------------------------------------------------ api
    def predict(self, obs, actions) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Posterior-mean next global state [B, Σobs] and per-agent rewards
        [B, A]."""
        return self._predict(self._as_batch(obs, actions))

    def sample(self, obs, actions, rng_key, n: int = 1):
        """n posterior draws: ([n, B, Σobs], [n, B, A])."""
        return self._sample(self._as_batch(obs, actions), rng_key, n)

    def encode(self, obs, actions=None):
        """Per-agent latents (mu, logvar), each [B, A, F] grouped order."""
        return self._encode(self._as_batch(obs, actions))

    def rollout(self, obs, action_plan) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Imagine a T-step trajectory from ``obs`` under ``action_plan``.

        ``action_plan``: dict {agent: [T] or [T, B]} or per-group tuple of
        [T, B, A_g].  Returns (states [T, B, Σobs], rewards [T, B, A]) —
        the posterior-mean closed-loop rollout, fully compiled."""
        batch = self._as_batch(obs, None)
        spec = self.model.spec
        if isinstance(action_plan, dict):
            discrete = self.model.discrete_act
            plan_g = []
            for (_, _), idxs in spec.groups:
                names = [spec.agents[i] for i in idxs]
                # unbatched per-agent plans get a B=1 axis: [T] -> [T, 1]
                # (discrete) or [T, act_dim] -> [T, 1, act_dim] (continuous)
                cols = []
                for a in names:
                    c = jnp.asarray(action_plan[a])
                    if discrete and c.ndim == 1:
                        c = c[:, None]
                    elif not discrete and c.ndim == 2:
                        c = c[:, None, :]
                    cols.append(c)
                plan_g.append(jnp.stack(cols, axis=2))  # [T, B, A_g(, act)]
            action_plan = tuple(plan_g)
        return self._rollout(batch.obs, action_plan)

    def _as_batch(self, obs, actions) -> GroupedBatch:
        if isinstance(obs, GroupedBatch):
            return obs
        spec = self.model.spec
        if isinstance(obs, dict):
            from mfvae_tpu.models.mavae import zero_actions_grouped

            discrete = self.model.discrete_act
            obs_g, act_g = [], []
            for (_, ad), idxs in spec.groups:
                names = [spec.agents[i] for i in idxs]
                obs_g.append(jnp.stack([jnp.atleast_2d(obs[a]) for a in names], axis=1))
                if actions is not None:
                    widen = jnp.atleast_1d if discrete else jnp.atleast_2d
                    act_g.append(
                        jnp.stack([widen(jnp.asarray(actions[a])) for a in names], axis=1)
                    )
            if actions is None:
                act_g = list(
                    zero_actions_grouped(spec, obs_g[0].shape[0], discrete)
                )
            return GroupedBatch(obs=tuple(obs_g), actions=tuple(act_g))
        raise TypeError(type(obs))

    # ------------------------------------------------------------- loading
    @classmethod
    def from_checkpoint(
        cls,
        checkpoint_dir: str,
        model_cfg: ModelConfig,
        spec: AgentSpec,
        step: Optional[int] = None,
    ) -> "WorldModel":
        """Restore the params saved by training.experiment (full-carry
        checkpoints) and build a predictor."""
        from mfvae_tpu.training.checkpoint import CheckpointManager

        model = MAVAE.from_config(model_cfg, spec)
        mgr = CheckpointManager(checkpoint_dir)
        payload = mgr.restore(step)
        if payload is None:
            raise FileNotFoundError(f"no checkpoint in {checkpoint_dir}")
        params = payload["carry"]["train_state"]["params"]
        params = jax.tree.map(jnp.asarray, params)
        return cls(model, params)
