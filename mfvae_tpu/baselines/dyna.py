"""Dyna-style imagination: the world model generates Q-learning data.

The second half of closing the model-based loop (the first is learned-policy
collection, baselines/collect_policy.py).  A trained MAVAE world model
(inference.WorldModel) imagines H-step trajectory windows from start states
drawn out of the agent's REAL replay, acting with the agent's CURRENT
epsilon-greedy policy inside the imagination; the windows feed the exact
same TD loss as real data through vdn.make_train's ``imagine_fn`` hook.
Sample efficiency is the claim: at an equal env-step budget the Dyna agent
sees ``imagine_weight``-weighted extra transitions that cost only compute.

The reference repo contains both halves — a world model
(jax_ver/model.py:100-199) and a Q-learner
(jax_ver/baselines/QLearning/vdn.py) — but no path from one to the other.

Everything here is shape-static and jit-closed: the imagination rollout is a
``lax.scan`` over WorldModel._predict (posterior-mean dynamics), packing and
unpacking between the Q-network's padded [B, N, D_pad+N] observation layout
and the world model's per-group tensors with static slice plans.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from mfvae_tpu.baselines.vdn import Timestep, VdnConfig, VdnNetwork, make_train
from mfvae_tpu.inference import WorldModel
from mfvae_tpu.models.mavae import AgentSpec, GroupedBatch
from mfvae_tpu.models.qlearning import eps_greedy


def _slot_plan(spec: AgentSpec) -> Tuple[Tuple[int, int], ...]:
    """agent index -> (group, position-in-group), agent order."""
    slot = {}
    for g, ((_, _), idxs) in enumerate(spec.groups):
        for pos, i in enumerate(idxs):
            slot[i] = (g, pos)
    return tuple(slot[i] for i in range(spec.n_agents))


def make_imagine_fn(
    wm: WorldModel,
    config: VdnConfig,
    *,
    horizon: int = 8,
    imagine_eps: float = 0.1,
):
    """Build ``imagine(params, real_batch, key) -> Timestep [S, H+1]`` for
    vdn.make_train(imagine_fn=...).

    Start states are the first observation of each sampled real window (one
    imagined window per real one, so the imagined batch matches the real
    batch size S).  Inside the imagination the agent acts epsilon-greedily
    with its CURRENT params (fresh zero hidden state, exactly like a
    sampled-window start in vdn_loss_fn); the world model's posterior-mean
    prediction supplies next observations and rewards; done is False
    throughout (fixed-horizon imagination — the model does not predict
    termination, the standard Dyna/Dreamer convention).

    Reward semantics match env_step's stored reward: ``reward_scale * team
    sum`` of the model's per-agent reward predictions.
    """
    spec = wm.model.spec
    n_agents = spec.n_agents
    slots = _slot_plan(spec)
    d_pad = max(od for (od, _), _ in spec.groups)

    if not wm.model.discrete_act:
        raise ValueError("Dyna imagination needs a discrete-action world model")
    action_dim = spec.groups[0][0][1]  # groups carry (obs_dim, act_dim)
    network = VdnNetwork(
        action_dim=action_dim,
        n_agents=n_agents,
        hidden_dim=config.hidden_dim,
        param_share=config.param_share,
    )

    group_idxs = tuple(tuple(idxs) for (_, _), idxs in spec.groups)
    group_od = tuple(od for (od, _), _ in spec.groups)

    def unpack(obs_packed: jnp.ndarray):
        """[S, N, D_pad+N] -> per-group [S, A_g, od] (drop pad + one-hot)."""
        return tuple(
            jnp.stack([obs_packed[:, i, :od] for i in idxs], axis=1)
            for od, idxs in zip(group_od, group_idxs)
        )

    def pack(obs_g) -> jnp.ndarray:
        """per-group [S, A_g, od] -> [S, N, D_pad+N]."""
        rows = []
        for g, pos in slots:
            o = obs_g[g][:, pos]
            padw = d_pad - o.shape[-1]
            rows.append(jnp.pad(o, ((0, 0), (0, padw))) if padw else o)
        obs = jnp.stack(rows, axis=1)  # [S, N, d_pad]
        onehot = jnp.broadcast_to(
            jnp.eye(n_agents, dtype=obs.dtype), (obs.shape[0], n_agents, n_agents)
        )
        return jnp.concatenate([obs, onehot], axis=-1)

    def group_actions(actions: jnp.ndarray):
        """[S, N] -> per-group [S, A_g]."""
        return tuple(actions[:, list(idxs)] for idxs in group_idxs)

    def imagine(params, real_batch: Timestep, key) -> Timestep:
        obs0 = real_batch.obs[:, 0]  # [S, N, D]
        S = obs0.shape[0]
        h0 = jnp.zeros((S, n_agents, config.hidden_dim))
        # first step of a window starts fresh (matches vdn_loss_fn's
        # right-shifted done convention)
        done_first = jnp.ones((1, S), bool)
        done_rest = jnp.zeros((1, S), bool)

        def step(carry, k):
            obs_p, hidden, first = carry
            done_prev = jnp.where(first, done_first, done_rest)
            hidden, q = network.apply(params, hidden, obs_p[None], done_prev)
            actions = eps_greedy(k, q[0], jnp.float32(imagine_eps))  # [S, N]
            obs_g = unpack(obs_p)
            next_state, rewards = wm._predict(
                GroupedBatch(obs=obs_g, actions=group_actions(actions))
            )
            team_rew = config.reward_scale * rewards.sum(axis=-1)  # [S]
            ts = Timestep(
                obs=obs_p,
                actions=actions,
                rewards=team_rew,
                done=jnp.zeros((S,), bool),
            )
            next_p = pack(wm._state_to_grouped(next_state))
            return (next_p, hidden, jnp.bool_(False)), ts

        keys = jax.random.split(key, horizon + 1)
        _, seq = jax.lax.scan(step, (obs0, h0, jnp.bool_(True)), keys)
        # [H+1, S, ...] time-major -> [S, H+1, ...] batch-major windows,
        # the layout buffer.sample hands to the loss
        return jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), seq)

    return imagine


def make_dyna_train(
    config: VdnConfig,
    wm: WorldModel,
    *,
    horizon: int = 8,
    imagine_weight: float = 1.0,
    imagine_eps: float = 0.1,
    env=None,
    metrics_callback=None,
):
    """vdn.make_train with the world model in the loop."""
    imagine = make_imagine_fn(
        wm, config, horizon=horizon, imagine_eps=imagine_eps
    )
    return make_train(
        config,
        env=env,
        metrics_callback=metrics_callback,
        imagine_fn=imagine,
        imagine_weight=imagine_weight,
    )
