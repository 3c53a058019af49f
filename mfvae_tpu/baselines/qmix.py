"""QMIX — monotonic value-factorization baseline (beyond-reference).

The reference ships only VDN (additive factorization, vdn.py).  QMIX
replaces the sum with a state-conditioned monotonic mixing network:

    Q_tot(s, u) = Mix(Q_1(o_1,u_1), ..., Q_N(o_N,u_N); s)

where Mix is an MLP whose weights are produced by hypernetworks of the
global state with |W| >= 0 (abs), guaranteeing dQ_tot/dQ_a >= 0 so the
argmax decentralizes.  Everything else — recurrent agents, trajectory
replay, eps-greedy, double-Q targets, target nets, compiled lax.scan
training — is shared with the VDN implementation (baselines/vdn.py).

Global state here is the concatenation of all agents' padded observations
(the standard MPE choice when no privileged state is exposed).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import yaml
from flax import linen as nn
from flax.training.train_state import TrainState
import optax

from mfvae_tpu.baselines.vdn import (
    Timestep,
    VdnConfig,
    VdnNetwork,
    _pack_obs,
    _pad_width,
)
from mfvae_tpu.data.buffer import TrajectoryBuffer
from mfvae_tpu.envs.mpe import make as make_env
from mfvae_tpu.envs.wrappers import BatchedEnv, LogWrapper
from mfvae_tpu.models.qlearning import eps_greedy, epsilon_by_step


@dataclass
class QmixConfig(VdnConfig):
    # from_yaml is inherited: VdnConfig.from_yaml builds cls(**data)
    mixing_dim: int = 32
    hypernet_dim: int = 64


class MixingNetwork(nn.Module):
    """Two-layer monotonic mixer with abs-constrained hyper-weights."""

    n_agents: int
    mixing_dim: int = 32
    hypernet_dim: int = 64

    @nn.compact
    def __call__(self, agent_qs, state):
        """agent_qs [..., N]; state [..., S] -> q_tot [...]."""
        n, m = self.n_agents, self.mixing_dim
        w1 = jnp.abs(
            nn.Dense(n * m, name="hyper_w1")(
                nn.relu(nn.Dense(self.hypernet_dim, name="hyper_w1_h")(state))
            )
        ).reshape(state.shape[:-1] + (n, m))
        b1 = nn.Dense(m, name="hyper_b1")(state)
        w2 = jnp.abs(
            nn.Dense(m, name="hyper_w2")(
                nn.relu(nn.Dense(self.hypernet_dim, name="hyper_w2_h")(state))
            )
        )[..., None]  # [..., m, 1]
        b2 = nn.Dense(
            1, name="hyper_b2_out"
        )(nn.relu(nn.Dense(self.hypernet_dim, name="hyper_b2_h")(state)))

        h = jax.nn.elu(jnp.einsum("...n,...nm->...m", agent_qs, w1) + b1)
        q_tot = jnp.einsum("...m,...mo->...o", h, w2) + b2
        return q_tot[..., 0]


class QmixParams(NamedTuple):
    agent: Any
    mixer: Any


def make_train(config: QmixConfig, env=None):
    """Compiled QMIX training: same surface as baselines.vdn.make_train."""
    base_env = env or make_env(
        config.env_name,
        num_good_agents=config.num_good_agents,
        num_adversaries=config.num_adversaries,
        num_obs=config.num_obs,
        max_steps=config.max_env_steps,
    )
    wrapped = LogWrapper(base_env)
    n_agents = base_env.num_agents
    n_actions = base_env.action_space(base_env.agents[0]).n
    rollout = BatchedEnv(wrapped, config.num_envs)
    d_in = _pad_width(base_env) + n_agents
    state_dim = n_agents * d_in  # global state = concat of packed obs

    network = VdnNetwork(
        action_dim=n_actions,
        n_agents=n_agents,
        hidden_dim=config.hidden_dim,
        param_share=config.param_share,
    )
    mixer = MixingNetwork(
        n_agents=n_agents,
        mixing_dim=config.mixing_dim,
        hypernet_dim=config.hypernet_dim,
    )
    buffer = TrajectoryBuffer(
        add_batch_size=config.num_envs,
        time_capacity=config.buffer_size_time,
        min_length_time=config.min_buffer_time,
        sample_batch_size=config.batch_size,
        sample_sequence_length=config.sample_sequence_length,
    )
    eps_decay_updates = config.eps_decay * config.num_updates

    def init_hidden(batch):
        return jnp.zeros((batch, n_agents, config.hidden_dim))

    def train(rng: jax.Array):
        rng, k_reset, k_agent, k_mix = jax.random.split(rng, 4)
        obs_dict, env_states = rollout.reset(k_reset)
        obs = _pack_obs(base_env, obs_dict, n_agents)

        agent_params = network.init(
            k_agent, init_hidden(1), jnp.zeros((1, 1, n_agents, d_in)),
            jnp.zeros((1, 1), bool),
        )
        mixer_params = mixer.init(
            k_mix, jnp.zeros((1, n_agents)), jnp.zeros((1, state_dim))
        )
        params = QmixParams(agent=agent_params, mixer=mixer_params)

        tx = optax.chain(
            optax.clip_by_global_norm(config.max_grad_norm),
            optax.adam(config.lr, eps=1e-5),
        )
        train_state = TrainState.create(
            apply_fn=network.apply, params=params, tx=tx
        ).replace(step=jnp.asarray(0, jnp.int32))

        example = Timestep(
            obs=obs[0],
            actions=jnp.zeros((n_agents,), jnp.int32),
            rewards=jnp.float32(0.0),
            done=jnp.bool_(False),
        )
        buffer_state = buffer.init(example)

        def env_step(carry, step_key):
            params_a, env_states, obs, hidden, eps = carry
            k_act, k_step = jax.random.split(step_key)
            hidden, q = network.apply(
                params_a, hidden, obs[None], jnp.zeros((1, obs.shape[0]), bool)
            )
            actions = eps_greedy(k_act, q[0], eps)
            act_dict = {a: actions[:, i] for i, a in enumerate(base_env.agents)}
            nobs_d, env_states, rew, done, info = rollout.step(
                k_step, env_states, act_dict
            )
            nobs = _pack_obs(base_env, nobs_d, n_agents)
            team_rew = config.reward_scale * sum(rew[a] for a in base_env.agents)
            done_all = done["__all__"]
            hidden = jnp.where(done_all[:, None, None], 0.0, hidden)
            ts = Timestep(obs=obs, actions=actions, rewards=team_rew, done=done_all)
            return (params_a, env_states, nobs, hidden, eps), (ts, info)

        def loss_fn(params: QmixParams, target_params: QmixParams, seq: Timestep):
            obs_t = jnp.swapaxes(seq.obs, 0, 1)  # [L, S, N, D]
            act_t = jnp.swapaxes(seq.actions, 0, 1)
            rew_t = jnp.swapaxes(seq.rewards, 0, 1)
            done_t = jnp.swapaxes(seq.done, 0, 1)
            s = obs_t.shape[1]
            h0 = init_hidden(s)
            done_prev = jnp.concatenate([jnp.ones((1, s), bool), done_t[:-1]], axis=0)
            _, q_online = network.apply(params.agent, h0, obs_t, done_prev)
            _, q_target = network.apply(target_params.agent, h0, obs_t, done_prev)

            chosen = jnp.take_along_axis(q_online, act_t[..., None], axis=-1)[..., 0]
            best = jnp.argmax(q_online, axis=-1)
            t_chosen = jnp.take_along_axis(q_target, best[..., None], axis=-1)[..., 0]

            global_state = obs_t.reshape(obs_t.shape[0], s, -1)  # [L, S, N*D]
            q_tot = mixer.apply(params.mixer, chosen, global_state)  # [L, S]
            q_tot_target = mixer.apply(target_params.mixer, t_chosen, global_state)

            not_done = 1.0 - done_t[:-1].astype(jnp.float32)
            targets = rew_t[:-1] + config.gamma * not_done * q_tot_target[1:]
            td = q_tot[:-1] - jax.lax.stop_gradient(targets)
            return jnp.mean(td * td)

        class Runner(NamedTuple):
            train_state: TrainState
            target_params: QmixParams
            buffer_state: Any
            env_states: Any
            obs: jnp.ndarray
            hidden: jnp.ndarray
            update_i: jnp.ndarray
            rng: jax.Array

        runner = Runner(
            train_state=train_state,
            target_params=params,
            buffer_state=buffer_state,
            env_states=env_states,
            obs=obs,
            hidden=init_hidden(config.num_envs),
            update_i=jnp.int32(0),
            rng=rng,
        )

        def update_step(runner: Runner, _):
            rng, k_roll, k_sample = jax.random.split(runner.rng, 3)
            eps = epsilon_by_step(
                runner.update_i, config.eps_start, config.eps_finish, eps_decay_updates
            )
            carry = (
                runner.train_state.params.agent,
                runner.env_states,
                runner.obs,
                runner.hidden,
                eps,
            )
            keys = jax.random.split(k_roll, config.num_steps)
            carry, (traj, infos) = jax.lax.scan(env_step, carry, keys)
            _, env_states, obs, hidden, _ = carry
            traj_rows = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), traj)
            buffer_state = buffer.add(runner.buffer_state, traj_rows)

            def do_learn(ts):
                batch = buffer.sample(buffer_state, k_sample).experience
                loss, grads = jax.value_and_grad(loss_fn)(
                    ts.params, runner.target_params, batch
                )
                return ts.apply_gradients(grads=grads), loss

            ts, loss = jax.lax.cond(
                buffer.can_sample(buffer_state),
                do_learn,
                lambda t: (t, jnp.float32(0.0)),
                runner.train_state,
            )
            target_params = jax.lax.cond(
                (runner.update_i % config.target_update_interval) == 0,
                lambda: ts.params,
                lambda: runner.target_params,
            )
            metrics = {
                "loss": loss,
                "epsilon": eps,
                "mean_reward": jnp.mean(traj.rewards),
                "returned_episode_returns": jnp.mean(
                    infos["returned_episode_returns"]
                ),
            }
            return (
                Runner(
                    train_state=ts,
                    target_params=target_params,
                    buffer_state=buffer_state,
                    env_states=env_states,
                    obs=obs,
                    hidden=hidden,
                    update_i=runner.update_i + 1,
                    rng=rng,
                ),
                metrics,
            )

        runner, metrics = jax.lax.scan(
            update_step, runner, None, length=config.num_updates
        )
        return {"runner": runner, "metrics": metrics}

    return train


def main(config_path=None, **overrides):
    cfg = QmixConfig.from_yaml(config_path) if config_path else QmixConfig()
    for k, v in overrides.items():
        setattr(cfg, k, v)
    out = jax.jit(make_train(cfg))(jax.random.PRNGKey(cfg.seed))
    m = jax.tree.map(np.asarray, out["metrics"])
    print(
        f"final loss={m['loss'][-1]:.4f} "
        f"mean_return={m['returned_episode_returns'][-1]:.2f}"
    )
    return out


if __name__ == "__main__":
    import sys

    main(sys.argv[1] if len(sys.argv) > 1 else None)
