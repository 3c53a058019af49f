"""Env wrappers: batched rollouts and episode-return logging.

TPU-native equivalents of the JaxMARL wrappers the reference's VDN baseline
depends on (vdn.py:39-42 LogWrapper, vdn.py:143-144 CTRolloutManager):
``BatchedEnv`` vmaps reset/step over an env-batch axis (one compiled program
stepping B worlds), and ``LogWrapper`` threads episode return/length
accumulators through the state and reports them in ``info`` at episode end.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class LogState(NamedTuple):
    env_state: Any
    episode_return: jnp.ndarray  # [A] running sum of per-agent rewards
    episode_length: jnp.ndarray  # int32
    returned_return: jnp.ndarray  # [A] last completed episode's return
    returned_length: jnp.ndarray  # int32


@dataclass(frozen=True)
class LogWrapper:
    """Tracks per-agent episode returns (vdn.py:416,423-425 reads
    `returned_episode_returns` from info)."""

    env: Any

    def __getattr__(self, name):
        return getattr(self.env, name)

    def reset(self, key):
        obs, env_state = self.env.reset(key)
        a = self.env.num_agents
        state = LogState(
            env_state=env_state,
            episode_return=jnp.zeros((a,)),
            episode_length=jnp.int32(0),
            returned_return=jnp.zeros((a,)),
            returned_length=jnp.int32(0),
        )
        return obs, state

    def step(self, key, state: LogState, actions):
        obs, env_state, rewards, dones, info = self.env.step(
            key, state.env_state, actions
        )
        rew_vec = jnp.stack([rewards[ag] for ag in self.env.agents])
        new_return = state.episode_return + rew_vec
        new_length = state.episode_length + 1
        done_all = dones["__all__"]
        state = LogState(
            env_state=env_state,
            episode_return=jnp.where(done_all, 0.0, new_return),
            episode_length=jnp.where(done_all, 0, new_length),
            returned_return=jnp.where(done_all, new_return, state.returned_return),
            returned_length=jnp.where(done_all, new_length, state.returned_length),
        )
        info = dict(info)
        info["returned_episode_returns"] = state.returned_return
        info["returned_episode_lengths"] = state.returned_length
        info["returned_episode"] = done_all
        return obs, state, rewards, dones, info


@dataclass(frozen=True)
class BatchedEnv:
    """vmap reset/step over a leading env-batch axis; auto-reset on done.

    Replaces the reference's CTRolloutManager usage (vdn.py:143-144,
    247-293): `step` resets finished worlds in-place so an unbounded
    `lax.scan` rollout never leaves the compiled program."""

    env: Any
    batch_size: int

    def __getattr__(self, name):
        return getattr(self.env, name)

    def reset(self, key):
        keys = jax.random.split(key, self.batch_size)
        return jax.vmap(self.env.reset)(keys)

    def step(self, key, states, actions):
        """actions: dict of [B, ...] per agent."""
        step_keys = jax.random.split(key, self.batch_size)
        obs, st, rew, done, info = jax.vmap(self.env.step)(step_keys, states, actions)
        # auto-reset done worlds
        reset_keys = jax.random.split(jax.random.fold_in(key, 1), self.batch_size)
        obs_r, st_r = jax.vmap(self.env.reset)(reset_keys)
        done_all = done["__all__"]

        def pick(new, old):
            bshape = (done_all.shape[0],) + (1,) * (new.ndim - 1)
            return jnp.where(done_all.reshape(bshape), new, old)

        st = jax.tree.map(pick, st_r, st)
        obs = jax.tree.map(pick, obs_r, obs)
        return obs, st, rew, done, info
