"""Recurrent Q-learning building blocks for the VDN baseline.

Capability parity with the reference's vendored JaxMARL agent
(jax_ver/baselines/QLearning/vdn.py:44-123): a GRU scanned over time with
hidden-state reset at episode boundaries, an obs->Dense->GRU->Q-head agent
network, and a linearly-annealed epsilon-greedy explorer.  Written against
the flax nn.scan API with the time axis leading, so one compiled scan
covers a whole trajectory window.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class ScannedGRU(nn.Module):
    """GRU cell scanned over the leading time axis; carries reset to zeros
    where `done` is set (vdn.py:44-72 behavior)."""

    hidden_dim: int

    @staticmethod
    def initialize_carry(batch_size: int, hidden_dim: int) -> jnp.ndarray:
        return jnp.zeros((batch_size, hidden_dim))

    @nn.compact
    def __call__(self, carry, inputs):
        """carry [B, H]; inputs = (x [T, B, D], done [T, B])."""
        x, done = inputs

        cell = nn.GRUCell(features=self.hidden_dim)

        def step(cell, carry, xs):
            x_t, done_t = xs
            carry = jnp.where(done_t[:, None], jnp.zeros_like(carry), carry)
            carry, y = cell(carry, x_t)
            return carry, y

        scan = nn.scan(
            step,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )
        return scan(cell, carry, (x, done))


class AgentRNN(nn.Module):
    """obs -> Dense -> GRU -> Q-head (vdn.py:75-92 structure)."""

    action_dim: int
    hidden_dim: int = 64

    @nn.compact
    def __call__(self, hidden, obs, done):
        """hidden [B, H]; obs [T, B, D]; done [T, B] ->
        (new_hidden [B, H], q [T, B, action_dim])."""
        x = nn.Dense(self.hidden_dim)(obs)
        x = nn.relu(x)
        hidden, x = ScannedGRU(hidden_dim=self.hidden_dim)(hidden, (x, done))
        q = nn.Dense(self.action_dim)(x)
        return hidden, q


def epsilon_by_step(
    step: jnp.ndarray, eps_start: float, eps_finish: float, eps_decay_steps: float
) -> jnp.ndarray:
    """Linear anneal (vdn.py:95-123 EpsilonGreedy schedule)."""
    frac = jnp.clip(step.astype(jnp.float32) / eps_decay_steps, 0.0, 1.0)
    return eps_start + frac * (eps_finish - eps_start)


def eps_greedy(
    rng_key: jax.Array, q_vals: jnp.ndarray, eps: jnp.ndarray
) -> jnp.ndarray:
    """q_vals [..., n_actions] -> actions [...] int32."""
    k_bern, k_rand = jax.random.split(rng_key)
    greedy = jnp.argmax(q_vals, axis=-1).astype(jnp.int32)
    random_a = jax.random.randint(
        k_rand, greedy.shape, 0, q_vals.shape[-1], dtype=jnp.int32
    )
    explore = jax.random.uniform(k_bern, greedy.shape) < eps
    return jnp.where(explore, random_a, greedy)
