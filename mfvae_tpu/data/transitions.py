"""Transition formats and dataset assembly — on-device, jit-friendly.

Two formats:

1. **Grouped tensor format** (the performance path).  One pytree per
   transition with per-group stacked tensors — the buffer stores ~6 arrays
   instead of the reference's 161 per-agent dict entries
   (jax_ver/jax_buffer.py:8-56 creates 4 keys x 40 agents + done), and
   dataset assembly is a few reshapes *inside* the train jit instead of ~160
   eagerly dispatched ops per step (SURVEY §3.2: create_dataset runs outside
   jit in the reference).

2. **Flat keyed format** (API parity).  ``create_joint_transition`` /
   ``create_dataset`` reproduce the reference's public surface
   (jax_ver/jax_buffer.py:8-56, jax_ver/trainer.py:9-39): flat
   ``{agent}_obs/_act/_next_obs/_rew`` keys and the index-prepended
   ``idx_state`` dicts, so reference-style experiment code runs unchanged.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax.numpy as jnp

from mfvae_tpu.models.mavae import AgentSpec, GroupedBatch, agent_order_concat


class GroupedTransition(NamedTuple):
    """One environment transition in grouped tensor form.

    obs[g], next_obs[g]: [A_g, obs_dim_g]; actions[g]: [A_g] int32 (discrete)
    or [A_g, act_dim_g]; rewards: [n_agents] in agent order; done: scalar
    (any agent done — matches the reference's joint `done`,
    jax_buffer.py:39-53)."""

    obs: Tuple[jnp.ndarray, ...]
    actions: Tuple[jnp.ndarray, ...]
    next_obs: Tuple[jnp.ndarray, ...]
    rewards: jnp.ndarray
    done: jnp.ndarray


def group_env_step(
    spec: AgentSpec,
    obs: Dict[str, jnp.ndarray],
    actions: Dict[str, jnp.ndarray],
    rewards: Dict[str, jnp.ndarray],
    next_obs: Dict[str, jnp.ndarray],
    dones: Dict[str, jnp.ndarray],
) -> GroupedTransition:
    """Pack per-agent env dicts into a GroupedTransition (jit-safe; the dict
    iteration happens at trace time)."""
    obs_g, act_g, next_g = [], [], []
    for (_, _), idxs in spec.groups:
        names = [spec.agents[i] for i in idxs]
        obs_g.append(jnp.stack([obs[a] for a in names], axis=0))
        act_g.append(jnp.stack([actions[a] for a in names], axis=0))
        next_g.append(jnp.stack([next_obs[a] for a in names], axis=0))
    rew = jnp.stack([rewards[a] for a in spec.agents], axis=0).astype(jnp.float32)
    done_vals = [dones[a] for a in spec.agents if a in dones]
    if "__all__" in dones:
        done = jnp.asarray(dones["__all__"], jnp.float32)
    else:
        done = jnp.max(jnp.stack([jnp.asarray(d, jnp.float32) for d in done_vals]))
    return GroupedTransition(
        obs=tuple(obs_g),
        actions=tuple(act_g),
        next_obs=tuple(next_g),
        rewards=rew,
        done=done,
    )


class VaeBatch(NamedTuple):
    """Model-ready training batch (all device-resident)."""

    inputs: GroupedBatch  # obs + actions per group, [B, A_g, ...]
    next_state: jnp.ndarray  # [B, sum(obs_dims)] agent-order concat
    rewards: jnp.ndarray  # [B, n_agents]


# shared with the model so the residual-state decoder adds the SAME layout
# it is trained against (models/mavae.agent_order_concat)
_agent_order_state = agent_order_concat


def vae_batch_from_grouped(
    spec: AgentSpec, batch: GroupedTransition
) -> VaeBatch:
    """Assemble a sampled batch (leaves have a leading [B] axis) into model
    inputs.  Pure reshapes/concats — runs inside the train jit."""
    return VaeBatch(
        inputs=GroupedBatch(obs=batch.obs, actions=batch.actions),
        next_state=_agent_order_state(spec, batch.next_obs),
        rewards=batch.rewards,
    )


# ---------------------------------------------------------------------------
# Reference-parity flat keyed API
# ---------------------------------------------------------------------------


def create_joint_transition(
    obs: Dict[str, Any],
    reward: Dict[str, Any],
    action: Dict[str, Any],
    next_obs: Dict[str, Any],
    done: Dict[str, Any],
) -> Optional[Dict[str, jnp.ndarray]]:
    """Flatten per-agent dicts to ``{agent}_obs/_act/_next_obs/_rew`` keys
    plus a joint scalar ``done`` — the reference's buffer schema
    (jax_ver/jax_buffer.py:8-56).  Values keep the reference's (-1, 1)
    reshape.  Returns None (with a message) on missing agents, matching the
    reference's defensive behavior (jax_buffer.py:40-42)."""
    out: Dict[str, jnp.ndarray] = {}
    any_done = jnp.float32(0.0)
    for agent_id in obs:
        if not (agent_id in reward and agent_id in action and agent_id in next_obs and agent_id in done):
            print(f"agent id {agent_id} missing from reward/action/next_obs/done")
            return None
        out[f"{agent_id}_obs"] = jnp.reshape(jnp.asarray(obs[agent_id]), (-1, 1))
        out[f"{agent_id}_act"] = jnp.reshape(jnp.asarray(action[agent_id]), (-1, 1))
        out[f"{agent_id}_next_obs"] = jnp.reshape(
            jnp.asarray(next_obs[agent_id]), (-1, 1)
        )
        out[f"{agent_id}_rew"] = jnp.reshape(jnp.asarray(reward[agent_id]), (-1, 1))
        any_done = jnp.maximum(any_done, jnp.asarray(done[agent_id], jnp.float32))
    out["done"] = jnp.reshape(any_done, (-1, 1))
    return out


def create_dataset(
    transition: Dict[str, jnp.ndarray], codebook: Dict[str, int]
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray], jnp.ndarray, jnp.ndarray]:
    """Reference-parity dataset assembly (jax_ver/trainer.py:9-39):
    per-agent ``idx_state`` with the agent index prepended as column 0,
    squeezed actions, agent-order concatenated rewards [B, A] and next
    states [B, Σobs].  Jit-safe (call it inside your train step — the
    reference dispatched it eagerly, SURVEY §3.2)."""
    idx_state_all, action_all = {}, {}
    rewards_list, next_states_list = [], []
    for agent_id, agent_num in codebook.items():
        obs = transition[f"{agent_id}_obs"]  # [B, D, 1]
        b = obs.shape[0]
        obs2d = obs.reshape(b, -1)
        idx_col = jnp.full((b, 1), float(agent_num), dtype=obs2d.dtype)
        idx_state_all[agent_id] = jnp.concatenate([idx_col, obs2d], axis=1)
        action_all[agent_id] = transition[f"{agent_id}_act"].reshape(b, -1).squeeze(-1)
        rewards_list.append(transition[f"{agent_id}_rew"].reshape(b, 1))
        next_states_list.append(transition[f"{agent_id}_next_obs"].reshape(b, -1))
    rewards = jnp.concatenate(rewards_list, axis=1)
    next_states = jnp.concatenate(next_states_list, axis=1)
    return idx_state_all, action_all, rewards, next_states
