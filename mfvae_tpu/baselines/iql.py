"""IQL (Independent Q-Learning) — per-agent Q baseline (beyond-reference).

The reference vendors only VDN from JaxMARL's QLearning suite
(jax_ver/baselines/QLearning/vdn.py); the suite's simplest member is IQL,
where each agent optimizes its OWN reward with an independent TD target —
no joint factorization at all:

    L = mean_a mean_t ( Q_a(o_a, u_a) - [r_a + gamma * max Qbar_a] )^2

All structural machinery — recurrent agents with parameter sharing,
trajectory replay, eps-greedy annealing, double-Q targets, target nets,
the compiled `lax.scan` update loop, greedy eval, metric streaming, and
the CLI driver — IS baselines/vdn.py's, reused through its variant hooks.
IQL supplies exactly its two deltas: the stored reward is the per-agent
vector [N] (VDN stores the team sum), and targets/TD errors keep the
agent axis instead of summing Q over it.

IQL is the natural fit for simple_tag's mixed cooperative-competitive
rewards (adversaries and good agents optimize OPPOSING objectives, which a
single summed team reward conflates)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from mfvae_tpu.baselines import vdn as _vdn
from mfvae_tpu.baselines.vdn import Timestep, VdnConfig, td_lambda_targets


@dataclass
class IqlConfig(VdnConfig):
    """Same fields as VdnConfig (reward_scale applies per-agent)."""


def make_train(config: IqlConfig, env=None, metrics_callback=None):
    """Compiled IQL training; same surface as baselines.vdn.make_train
    (train(rng) plus .init_runner/.update_chunk for chunked streaming)."""

    def reward_fn(rew, agents):
        # each agent keeps its OWN reward — the whole point of IQL
        return config.reward_scale * jnp.stack([rew[a] for a in agents], axis=-1)

    def example_reward(n_agents):
        return jnp.zeros((n_agents,), jnp.float32)

    def loss_fn_builder(network, init_hidden, q_of_actions, cfg, n_agents):
        def loss_fn(params, target_params, seq: Timestep):
            """Per-agent independent TD; seq leaves [S, L, ...]."""
            obs_t = jnp.swapaxes(seq.obs, 0, 1)  # [L, S, N, D]
            act_t = jnp.swapaxes(seq.actions, 0, 1)  # [L, S, N]
            rew_t = jnp.swapaxes(seq.rewards, 0, 1)  # [L, S, N]
            done_t = jnp.swapaxes(seq.done, 0, 1)  # [L, S]
            s = obs_t.shape[1]
            h0 = init_hidden(s)
            done_prev = jnp.concatenate(
                [jnp.ones((1, s), bool), done_t[:-1]], axis=0
            )
            _, q_online = network.apply(params, h0, obs_t, done_prev)
            _, q_target = network.apply(target_params, h0, obs_t, done_prev)

            chosen = q_of_actions(q_online, act_t)  # [L, S, N]
            best = jnp.argmax(q_online, axis=-1)
            target_next = q_of_actions(q_target, best)
            # [L, S, N] throughout — no summation over the agent axis

            if cfg.td_lambda_loss:
                # the recursion is agnostic to trailing dims once done is
                # broadcast to the agent axis: flatten [S, N] -> rows
                L = rew_t.shape[0]
                done_n = jnp.repeat(done_t[:, :, None], n_agents, 2).reshape(
                    L, -1
                )
                targets = td_lambda_targets(
                    rew_t[:-1].reshape(L - 1, -1),
                    done_n,
                    target_next[1:].reshape(L - 1, -1),
                    cfg.gamma,
                    cfg.td_lambda,
                ).reshape(L - 1, s, n_agents)
            else:
                not_done = 1.0 - done_t[:-1].astype(jnp.float32)
                targets = (
                    rew_t[:-1]
                    + cfg.gamma * not_done[..., None] * target_next[1:]
                )
            td = chosen[:-1] - jax.lax.stop_gradient(targets)
            return jnp.mean(td * td)

        return loss_fn

    return _vdn.make_train(
        config,
        env,
        metrics_callback,
        reward_fn=reward_fn,
        example_reward=example_reward,
        loss_fn_builder=loss_fn_builder,
    )


def main(config_path: Optional[str] = None, **overrides):
    """CLI driver — vdn.main with the IQL config/train variant (inherits
    its logging sinks, host-callback probing, chunked streaming, multi-seed
    vmap, and safetensors save)."""
    return _vdn.main(
        config_path,
        _config_cls=IqlConfig,
        _make_train=make_train,
        _tag="iql",
        **overrides,
    )


if __name__ == "__main__":
    import sys

    main(sys.argv[1] if len(sys.argv) > 1 else None)
