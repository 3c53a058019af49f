"""IQL (Independent Q-Learning) — per-agent Q baseline (beyond-reference).

The reference vendors only VDN from JaxMARL's QLearning suite
(jax_ver/baselines/QLearning/vdn.py); the suite's simplest member is IQL,
where each agent optimizes its OWN reward with an independent TD target —
no joint factorization at all:

    L = mean_a mean_t ( Q_a(o_a, u_a) - [r_a + gamma * max Qbar_a] )^2

Everything structural — recurrent agents with parameter sharing, trajectory
replay, eps-greedy annealing, double-Q targets, target nets, one compiled
`lax.scan` over updates — is shared with the VDN implementation
(baselines/vdn.py).  The differences: the stored reward is the per-agent
vector [N] (VDN stores the team sum), and targets/TD errors keep the agent
axis instead of summing Q over it.

IQL is the natural fit for simple_tag's mixed cooperative-competitive
rewards (adversaries and good agents optimize OPPOSING objectives, which a
single summed team reward conflates)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
import yaml
from flax.training.train_state import TrainState

from mfvae_tpu.baselines.vdn import (
    Runner,
    Timestep,
    VdnConfig,
    VdnNetwork,
    _pack_obs,
    _pad_width,
    td_lambda_targets,
)
from mfvae_tpu.data.buffer import TrajectoryBuffer
from mfvae_tpu.envs.mpe import make as make_env
from mfvae_tpu.envs.wrappers import BatchedEnv, LogWrapper
from mfvae_tpu.models.qlearning import eps_greedy, epsilon_by_step


@dataclass
class IqlConfig(VdnConfig):
    @classmethod
    def from_yaml(cls, path: str) -> "IqlConfig":
        with open(path) as f:
            return cls(**(yaml.safe_load(f) or {}))


def make_train(config: IqlConfig, env=None, metrics_callback=None):
    """Compiled IQL training; same surface as baselines.vdn.make_train
    (train(rng) plus .init_runner/.update_chunk for chunked streaming)."""
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
    test_rollout = BatchedEnv(wrapped, config.test_num_envs)
    d_in = _pad_width(base_env) + n_agents

    network = VdnNetwork(
        action_dim=n_actions,
        n_agents=n_agents,
        hidden_dim=config.hidden_dim,
        param_share=config.param_share,
    )
    buffer = TrajectoryBuffer(
        add_batch_size=config.num_envs,
        time_capacity=config.buffer_size_time,
        min_length_time=config.min_buffer_time,
        sample_batch_size=config.batch_size,
        sample_sequence_length=config.sample_sequence_length,
    )
    eps_decay_updates = config.eps_decay * config.num_updates

    def init_hidden(batch: int) -> jnp.ndarray:
        return jnp.zeros((batch, n_agents, config.hidden_dim))

    def init_runner(rng: jax.Array) -> Runner:
        rng, k_reset, k_init = jax.random.split(rng, 3)
        obs_dict, env_states = rollout.reset(k_reset)
        obs = _pack_obs(base_env, obs_dict, n_agents)

        params = network.init(
            k_init, init_hidden(1), jnp.zeros((1, 1, n_agents, d_in)),
            jnp.zeros((1, 1), bool),
        )
        lr = (
            optax.linear_schedule(config.lr, 1e-10, config.num_updates)
            if config.lr_linear_decay
            else config.lr
        )
        tx = optax.chain(
            optax.clip_by_global_norm(config.max_grad_norm),
            optax.adam(lr, eps=1e-5),
        )
        train_state = TrainState.create(
            apply_fn=network.apply, params=params, tx=tx
        ).replace(step=jnp.asarray(0, jnp.int32))

        example = Timestep(
            obs=obs[0],
            actions=jnp.zeros((n_agents,), jnp.int32),
            rewards=jnp.zeros((n_agents,), jnp.float32),  # per-agent (vs VDN)
            done=jnp.bool_(False),
        )
        buffer_state = buffer.init(example)

        return Runner(
            train_state=train_state,
            target_params=params,
            buffer_state=buffer_state,
            env_states=env_states,
            obs=obs,
            hidden=init_hidden(config.num_envs),
            update_i=jnp.int32(0),
            rng=rng,
            test_return=jnp.float32(0.0),
        )

    def env_step(carry, step_key):
        (params, env_states, obs, hidden, eps) = carry
        k_act, k_step = jax.random.split(step_key)
        hidden, q = network.apply(
            params, hidden, obs[None], jnp.zeros((1, obs.shape[0]), bool)
        )
        actions = eps_greedy(k_act, q[0], eps)
        act_dict = {a: actions[:, i] for i, a in enumerate(base_env.agents)}
        nobs_d, env_states, rew, done, info = rollout.step(k_step, env_states, act_dict)
        nobs = _pack_obs(base_env, nobs_d, n_agents)
        agent_rew = config.reward_scale * jnp.stack(
            [rew[a] for a in base_env.agents], axis=-1
        )  # [B, N] — each agent keeps its OWN reward
        done_all = done["__all__"]
        hidden = jnp.where(done_all[:, None, None], 0.0, hidden)
        ts = Timestep(obs=obs, actions=actions, rewards=agent_rew, done=done_all)
        return (params, env_states, nobs, hidden, eps), (ts, info)

    def loss_fn(params, target_params, seq: Timestep):
        """Per-agent independent TD; seq leaves [S, L, ...]."""
        obs_t = jnp.swapaxes(seq.obs, 0, 1)  # [L, S, N, D]
        act_t = jnp.swapaxes(seq.actions, 0, 1)  # [L, S, N]
        rew_t = jnp.swapaxes(seq.rewards, 0, 1)  # [L, S, N]
        done_t = jnp.swapaxes(seq.done, 0, 1)  # [L, S]
        s = obs_t.shape[1]
        h0 = init_hidden(s)
        done_prev = jnp.concatenate([jnp.ones((1, s), bool), done_t[:-1]], axis=0)
        _, q_online = network.apply(params, h0, obs_t, done_prev)
        _, q_target = network.apply(target_params, h0, obs_t, done_prev)

        chosen = jnp.take_along_axis(q_online, act_t[..., None], -1)[..., 0]
        best = jnp.argmax(q_online, axis=-1)
        target_next = jnp.take_along_axis(q_target, best[..., None], -1)[..., 0]
        # [L, S, N] throughout — no summation over the agent axis

        if config.td_lambda_loss:
            # the recursion is agnostic to trailing dims once done is
            # broadcast to the agent axis: flatten [S, N] -> rows
            L = rew_t.shape[0]
            done_n = jnp.repeat(done_t[:, :, None], n_agents, 2).reshape(L, -1)
            targets = td_lambda_targets(
                rew_t[:-1].reshape(L - 1, -1),
                done_n,
                target_next[1:].reshape(L - 1, -1),
                config.gamma,
                config.td_lambda,
            ).reshape(L - 1, s, n_agents)
        else:
            not_done = 1.0 - done_t[:-1].astype(jnp.float32)
            targets = rew_t[:-1] + config.gamma * not_done[..., None] * target_next[1:]
        td = chosen[:-1] - jax.lax.stop_gradient(targets)
        return jnp.mean(td * td)

    def update_step(runner: Runner, _):
        rng, k_roll, k_sample = jax.random.split(runner.rng, 3)
        eps = epsilon_by_step(
            runner.update_i, config.eps_start, config.eps_finish, eps_decay_updates
        )
        carry = (
            runner.train_state.params,
            runner.env_states,
            runner.obs,
            runner.hidden,
            eps,
        )
        step_keys = jax.random.split(k_roll, config.num_steps)
        carry, (traj, infos) = jax.lax.scan(env_step, carry, step_keys)
        _, env_states, obs, hidden, _ = carry
        traj_rows = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), traj)
        buffer_state = buffer.add(runner.buffer_state, traj_rows)

        def do_learn(ts):
            batch = buffer.sample(buffer_state, k_sample).experience
            loss, grads = jax.value_and_grad(loss_fn)(
                ts.params, runner.target_params, batch
            )
            return ts.apply_gradients(grads=grads), loss

        train_state, loss = jax.lax.cond(
            buffer.can_sample(buffer_state),
            do_learn,
            lambda ts: (ts, jnp.float32(0.0)),
            runner.train_state,
        )
        target_params = jax.lax.cond(
            (runner.update_i % config.target_update_interval) == 0,
            lambda: train_state.params,
            lambda: runner.target_params,
        )

        def do_test(rng):
            k_r, k_s = jax.random.split(rng)
            tobs_d, tstates = test_rollout.reset(k_r)
            tobs = _pack_obs(base_env, tobs_d, n_agents)
            th = init_hidden(config.test_num_envs)

            def tstep(c, k):
                tstates, tobs, th, ret = c
                th, q = network.apply(
                    train_state.params, th, tobs[None],
                    jnp.zeros((1, tobs.shape[0]), bool),
                )
                acts = jnp.argmax(q[0], axis=-1).astype(jnp.int32)
                act_dict = {a: acts[:, i] for i, a in enumerate(base_env.agents)}
                tobs_d, tstates, rew, done, _ = test_rollout.step(k, tstates, act_dict)
                tobs = _pack_obs(base_env, tobs_d, n_agents)
                ret = ret + sum(rew[a] for a in base_env.agents)
                return (tstates, tobs, th, ret), ()

            keys = jax.random.split(k_s, config.test_num_steps)
            (_, _, _, ret), _ = jax.lax.scan(
                tstep, (tstates, tobs, th, jnp.zeros(config.test_num_envs)), keys
            )
            return jnp.mean(ret)

        if config.test_during_training:
            test_return = jax.lax.cond(
                (runner.update_i % config.test_interval) == 0,
                do_test,
                lambda _: runner.test_return,
                jax.random.fold_in(rng, 7),
            )
        else:
            test_return = runner.test_return

        metrics = {
            "loss": loss,
            "epsilon": eps,
            "mean_reward": jnp.mean(traj.rewards),
            "returned_episode_returns": jnp.mean(infos["returned_episode_returns"]),
            "test_return": test_return,
        }
        if metrics_callback is not None:
            jax.debug.callback(metrics_callback, metrics, runner.update_i)
        return (
            Runner(
                train_state=train_state,
                target_params=target_params,
                buffer_state=buffer_state,
                env_states=env_states,
                obs=obs,
                hidden=hidden,
                update_i=runner.update_i + 1,
                rng=rng,
                test_return=test_return,
            ),
            metrics,
        )

    def update_chunk(runner: Runner, length: int):
        return jax.lax.scan(update_step, runner, None, length=length)

    def train(rng: jax.Array):
        runner = init_runner(rng)
        runner, metrics = update_chunk(runner, config.num_updates)
        return {"runner": runner, "metrics": metrics}

    train.init_runner = init_runner
    train.update_chunk = update_chunk
    return train


def main(config_path: Optional[str] = None, **overrides):
    cfg = IqlConfig.from_yaml(config_path) if config_path else IqlConfig()
    for k, v in overrides.items():
        setattr(cfg, k, v)
    rngs = jax.random.split(jax.random.PRNGKey(cfg.seed), cfg.num_seeds)
    out = jax.jit(jax.vmap(make_train(cfg)))(rngs)
    m = jax.tree.map(np.asarray, out["metrics"])
    print(
        f"final loss={m['loss'][:, -1].mean():.4f} "
        f"mean_return={m['returned_episode_returns'][:, -1].mean():.2f} "
        f"test_return={m['test_return'][:, -1].mean():.2f}"
    )
    return out


if __name__ == "__main__":
    import sys

    main(sys.argv[1] if len(sys.argv) > 1 else None)
