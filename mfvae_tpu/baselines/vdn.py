"""VDN (Value Decomposition Networks) baseline — fully compiled training.

Capability parity with the reference's vendored JaxMARL VDN
(jax_ver/baselines/QLearning/vdn.py): batched env rollouts, a trajectory
replay buffer, recurrent per-agent Q-networks with parameter sharing (or
independent per-agent parameters), epsilon-greedy exploration with linear
annealing, double-DQN targets over the summed (VDN-factorized) joint Q,
periodic hard target-network updates, greedy evaluation episodes, and
metrics reporting — built entirely on this framework's own stack (envs.mpe,
envs.wrappers, data.buffer.TrajectoryBuffer, models.qlearning).

Like the reference (vdn.py:522-524), ALL of training runs inside one jitted
`lax.scan` over updates; unlike the reference the config is complete and
runnable (the checked-in reference config.yaml lacks its env/alg sections —
SURVEY §2.1).

Heterogeneous observation widths are handled by zero-padding every agent's
obs to the max width and appending a one-hot agent id (what the reference
gets from JaxMARL's CTRolloutManager preprocessing).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
import yaml
from flax import linen as nn
from flax.training.train_state import TrainState

from mfvae_tpu.data.buffer import TrajectoryBuffer
from mfvae_tpu.envs.mpe import make as make_env
from mfvae_tpu.envs.wrappers import BatchedEnv, LogWrapper
from mfvae_tpu.models.qlearning import AgentRNN, eps_greedy, epsilon_by_step


@dataclass
class VdnConfig:
    """Complete, runnable config (reference hparam names preserved where they
    exist: vdn.py reads NUM_ENVS/NUM_STEPS/BUFFER_SIZE/... from hydra)."""

    # env
    env_name: str = "MPE_simple_tag_v3"
    num_good_agents: int = 10
    num_adversaries: int = 30
    num_obs: int = 20
    max_env_steps: int = 25
    # training
    num_envs: int = 8
    num_steps: int = 25  # rollout length per update
    num_updates: int = 100
    buffer_size_time: int = 512  # per-env time-ring capacity
    min_buffer_time: int = 64
    batch_size: int = 32  # sampled sequences per update
    sample_sequence_length: int = 16
    hidden_dim: int = 64
    param_share: bool = True
    lr: float = 5e-4
    lr_linear_decay: bool = False
    max_grad_norm: float = 10.0
    gamma: float = 0.99
    # TD(lambda) targets (the reference's TD_LAMBDA_LOSS pymarl2 option,
    # vdn.py:303-340); lambda=0 == the one-step double-DQN loss
    td_lambda_loss: bool = False
    td_lambda: float = 0.6
    num_seeds: int = 1  # vmapped parallel seeds (reference vdn.py:570-573)
    # team-reward scaling before the TD target (simple_tag 40-agent
    # collision sums reach hundreds; squared TD then explodes)
    reward_scale: float = 1.0
    eps_start: float = 1.0
    eps_finish: float = 0.05
    eps_decay: float = 0.1  # fraction of updates over which to anneal
    target_update_interval: int = 10
    # eval
    test_during_training: bool = True
    test_interval: int = 10
    test_num_envs: int = 8
    test_num_steps: int = 25
    seed: int = 0
    # in-loop metrics streaming (TB/JSONL + optional wandb) per update,
    # escaping the compiled scan via jax.debug.callback — capability parity
    # with the reference's wandb logging (vdn.py:420-436).  On backends
    # without host-callback support the driver falls back to dispatching
    # the update scan in chunks of log_chunk and streaming between chunks.
    log_during_training: bool = True
    log_chunk: int = 10
    log_dir: str = "results"
    run_name: str = ""
    wandb_mode: str = "disabled"  # reference config.yaml parity
    wandb_project: str = "mfvae_tpu"
    # if set, save the trained greedy policy (first seed) as a
    # self-contained .npz consumable by the VAE experiment's
    # train.collect_policy="vdn:<path>" (baselines/collect_policy.py)
    save_policy_path: str = ""

    @classmethod
    def from_yaml(cls, path: str) -> "VdnConfig":
        with open(path) as f:
            data = yaml.safe_load(f) or {}
        return cls(**data)


class Timestep(NamedTuple):
    obs: jnp.ndarray  # [B, N, D_pad] padded obs + one-hot id
    actions: jnp.ndarray  # [B, N] int32
    rewards: jnp.ndarray  # [B] team reward
    done: jnp.ndarray  # [B] episode termination


def _pad_width(env) -> int:
    # every in-repo env's obs_dim accepts the agent name (world_comm is
    # name-keyed; tag/spread accept either form)
    return max(env.obs_dim(a) for a in env.agents)


def _pack_obs(env, obs_dict: Dict[str, jnp.ndarray], n_agents: int) -> jnp.ndarray:
    """Stack dict obs -> [B, N, D_pad + N] with zero padding + one-hot id."""
    d_pad = _pad_width(env)
    cols = []
    for i, a in enumerate(env.agents):
        o = obs_dict[a]  # [B, D_a]
        pad = d_pad - o.shape[-1]
        if pad:
            o = jnp.pad(o, ((0, 0), (0, pad)))
        onehot = jnp.zeros((o.shape[0], n_agents)).at[:, i].set(1.0)
        cols.append(jnp.concatenate([o, onehot], axis=-1))
    return jnp.stack(cols, axis=1)


class VdnNetwork(nn.Module):
    """Shared-parameter or independent per-agent recurrent Q-nets.

    Param sharing: one AgentRNN applied to the flattened (batch x agent)
    axis (the id one-hot in the obs disambiguates agents — vdn.py:174-181).
    Independent: nn.vmap over the agent axis (vdn.py:183-188)."""

    action_dim: int
    n_agents: int
    hidden_dim: int = 64
    param_share: bool = True

    @nn.compact
    def __call__(self, hidden, obs, done):
        """hidden [B, N, H]; obs [T, B, N, D]; done [T, B] ->
        (hidden', q [T, B, N, A])."""
        t, b, n, d = obs.shape
        if self.param_share:
            net = AgentRNN(action_dim=self.action_dim, hidden_dim=self.hidden_dim)
            h = hidden.reshape(b * n, self.hidden_dim)
            o = obs.reshape(t, b * n, d)
            dn = jnp.repeat(done[:, :, None], n, axis=2).reshape(t, b * n)
            h, q = net(h, o, dn)
            return h.reshape(b, n, self.hidden_dim), q.reshape(t, b, n, self.action_dim)
        vnet = nn.vmap(
            AgentRNN,
            in_axes=(1, 2, None),
            out_axes=(1, 2),
            variable_axes={"params": 0},
            split_rngs={"params": True},
        )(action_dim=self.action_dim, hidden_dim=self.hidden_dim)
        return vnet(hidden, obs, done)


class Runner(NamedTuple):
    train_state: TrainState
    target_params: Any
    buffer_state: Any
    env_states: Any
    obs: jnp.ndarray  # [B, N, D]
    hidden: jnp.ndarray  # [B, N, H]
    update_i: jnp.ndarray
    rng: jax.Array
    test_return: jnp.ndarray


def td_lambda_targets(
    rewards: jnp.ndarray,  # [L-1, S]  r_t
    done: jnp.ndarray,  # [L, S]    d_t (bool)
    qbar_next: jnp.ndarray,  # [L-1, S]  target-net Qbar_{t+1}
    gamma: float,
    lam: float,
) -> jnp.ndarray:
    """TD(lambda) targets via the pymarl2 backward recursion
    (reference jax_ver/baselines/QLearning/vdn.py:303-340):

        G_{L-1} = Qbar_{L-1} * (1 - d_{L-1})                    (seed)
        G_t     = r_t + gamma*(1-d_t)*[(1-lam)*Qbar_{t+1} + lam*G_{t+1}]

    Returns [L-1, S] targets for steps 0..L-2.  Seeding with the bootstrap
    value only (not a full one-step target) is what keeps the final reward
    from being double-counted into its own target."""
    not_done = 1.0 - done[:-1].astype(jnp.float32)

    def back(g_next, xs):
        r, nd, qb = xs
        g = r + gamma * nd * ((1.0 - lam) * qb + lam * g_next)
        return g, g

    g_last = qbar_next[-1] * (1.0 - done[-1].astype(jnp.float32))
    _, targets = jax.lax.scan(
        back, g_last, (rewards, not_done, qbar_next), reverse=True
    )
    return targets


def make_train(
    config: VdnConfig,
    env=None,
    metrics_callback=None,
    *,
    reward_fn=None,
    example_reward=None,
    loss_fn_builder=None,
    imagine_fn=None,
    imagine_weight: float = 1.0,
):
    """Build the compiled training function (reference surface:
    make_train(config, env) -> train(rng), vdn.py:133-139).

    metrics_callback(metrics_dict, update_i): optional host-side sink called
    every update from inside the compiled loop via jax.debug.callback — the
    reference's wandb streaming escape hatch (vdn.py:420-436).  Values
    arrive as numpy scalars; keep the callback cheap (it rides the async
    dispatch stream).  Some PJRT backends (the axon TPU tunnel) don't
    support host callbacks; there the driver streams via the chunked API
    instead (train.init_runner / train.update_chunk — see main()).

    Variant hooks (how baselines.iql reuses this machinery with a different
    value decomposition):
    - reward_fn(rew_dict, agents) -> stored reward array [B, ...]
      (default: reward_scale * team sum, the VDN objective);
    - example_reward(n_agents) -> zero reward example for the buffer schema
      (default: scalar);
    - loss_fn_builder(network, init_hidden, q_of_actions, config, n_agents)
      -> loss_fn(params, target_params, seq) (default: double-DQN / TD(λ)
      over the summed VDN joint Q);
    - imagine_fn(params, real_batch, key) -> Timestep windows [S, H, ...]:
      Dyna hook (baselines/dyna.py) — model-generated training windows whose
      Q-loss is added with weight ``imagine_weight`` whenever the buffer can
      sample."""
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

    def q_of_actions(q: jnp.ndarray, actions: jnp.ndarray) -> jnp.ndarray:
        """q [T, B, N, A], actions [T, B, N] -> [T, B, N]."""
        return jnp.take_along_axis(q, actions[..., None], axis=-1)[..., 0]

    def init_runner(rng: jax.Array) -> Runner:
        rng, k_reset, k_init = jax.random.split(rng, 3)
        obs_dict, env_states = rollout.reset(k_reset)
        obs = _pack_obs(base_env, obs_dict, n_agents)

        dummy_obs = jnp.zeros((1, 1, n_agents, d_in))
        dummy_done = jnp.zeros((1, 1), bool)
        params = network.init(k_init, init_hidden(1), dummy_obs, dummy_done)

        if config.lr_linear_decay:
            lr = optax.linear_schedule(
                config.lr, 1e-10, config.num_updates
            )
        else:
            lr = config.lr
        tx = optax.chain(
            optax.clip_by_global_norm(config.max_grad_norm),
            optax.adam(lr, eps=1e-5),
        )
        train_state = TrainState.create(
            apply_fn=network.apply, params=params, tx=tx
        ).replace(step=jnp.asarray(0, jnp.int32))  # pin dtype, avoid retrace

        example_step = Timestep(
            obs=obs[0],
            actions=jnp.zeros((n_agents,), jnp.int32),
            rewards=(
                example_reward(n_agents)
                if example_reward is not None
                else jnp.float32(0.0)
            ),
            done=jnp.bool_(False),
        )
        buffer_state = buffer.init(example_step)

        runner = Runner(
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
        return runner

    def env_step(carry, step_key):
        (params, env_states, obs, hidden, eps) = carry
        k_act, k_step = jax.random.split(step_key)
        hidden, q = network.apply(
            params, hidden, obs[None], jnp.zeros((1, obs.shape[0]), bool)
        )
        actions = eps_greedy(k_act, q[0], eps)  # [B, N]
        act_dict = {a: actions[:, i] for i, a in enumerate(base_env.agents)}
        next_obs_d, env_states, rew, done, info = rollout.step(
            k_step, env_states, act_dict
        )
        next_obs = _pack_obs(base_env, next_obs_d, n_agents)
        if reward_fn is not None:
            stored_rew = reward_fn(rew, base_env.agents)
        else:
            stored_rew = config.reward_scale * sum(
                rew[a] for a in base_env.agents
            )
        done_all = done["__all__"]
        hidden = jnp.where(done_all[:, None, None], 0.0, hidden)
        ts = Timestep(obs=obs, actions=actions, rewards=stored_rew, done=done_all)
        return (params, env_states, next_obs, hidden, eps), (ts, info)

    def vdn_loss_fn(params, target_params, seq: Timestep):
        """seq leaves: [S, L, ...] sampled windows (batch-major)."""
        obs_t = jnp.swapaxes(seq.obs, 0, 1)  # [L, S, N, D]
        act_t = jnp.swapaxes(seq.actions, 0, 1)  # [L, S, N]
        rew_t = jnp.swapaxes(seq.rewards, 0, 1)  # [L, S]
        done_t = jnp.swapaxes(seq.done, 0, 1)  # [L, S]
        s = obs_t.shape[1]
        h0 = init_hidden(s)
        # hidden resets happen *after* a done step; shift dones right so
        # the first step of each window starts fresh
        done_prev = jnp.concatenate(
            [jnp.ones((1, s), bool), done_t[:-1]], axis=0
        )
        _, q_online = network.apply(params, h0, obs_t, done_prev)
        _, q_target = network.apply(target_params, h0, obs_t, done_prev)

        chosen = q_of_actions(q_online, act_t)  # [L, S, N]
        vdn_q = jnp.sum(chosen, axis=-1)  # [L, S]

        # double-DQN: online argmax, target evaluation (vdn.py loss)
        best = jnp.argmax(q_online, axis=-1)  # [L, S, N]
        target_chosen = q_of_actions(q_target, best)
        vdn_target_next = jnp.sum(target_chosen, axis=-1)  # [L, S]

        not_done = 1.0 - done_t[:-1].astype(jnp.float32)  # [L-1, S]
        if config.td_lambda_loss:
            targets = td_lambda_targets(
                rew_t[:-1],
                done_t,
                vdn_target_next[1:],
                config.gamma,
                config.td_lambda,
            )
        else:
            targets = rew_t[:-1] + config.gamma * not_done * vdn_target_next[1:]
        td = vdn_q[:-1] - jax.lax.stop_gradient(targets)
        return jnp.mean(td * td)

    loss_fn = (
        loss_fn_builder(network, init_hidden, q_of_actions, config, n_agents)
        if loss_fn_builder is not None
        else vdn_loss_fn
    )

    def update_step(runner: Runner, _):
        if imagine_fn is None:  # split count preserved: plain-VDN rng
            rng, k_roll, k_sample = jax.random.split(runner.rng, 3)
            k_img = None
        else:
            rng, k_roll, k_sample, k_img = jax.random.split(runner.rng, 4)
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

        # [T, B, ...] -> [B, T, ...] rows for the trajectory ring
        traj_rows = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), traj)
        buffer_state = buffer.add(runner.buffer_state, traj_rows)

        def do_learn(train_state):
            batch = buffer.sample(buffer_state, k_sample).experience
            if imagine_fn is None:
                loss, grads = jax.value_and_grad(loss_fn)(
                    train_state.params, runner.target_params, batch
                )
            else:
                # Dyna (baselines/dyna.py): imagined windows generated from
                # the real batch's start states under the CURRENT policy —
                # generation happens outside the grad so only the Q-loss on
                # the imagined data differentiates, not the data itself
                img = imagine_fn(train_state.params, batch, k_img)

                def total(p):
                    return loss_fn(
                        p, runner.target_params, batch
                    ) + imagine_weight * loss_fn(
                        p, runner.target_params, img
                    )

                loss, grads = jax.value_and_grad(total)(train_state.params)
            return train_state.apply_gradients(grads=grads), loss

        can = buffer.can_sample(buffer_state)
        train_state, loss = jax.lax.cond(
            can,
            do_learn,
            lambda ts: (ts, jnp.float32(0.0)),
            runner.train_state,
        )

        target_params = jax.lax.cond(
            (runner.update_i % config.target_update_interval) == 0,
            lambda: train_state.params,
            lambda: runner.target_params,
        )

        # periodic greedy eval
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
                tobs_d, tstates, rew, done, info = test_rollout.step(
                    k, tstates, act_dict
                )
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
            "returned_episode_returns": jnp.mean(
                infos["returned_episode_returns"]
            ),
            "test_return": test_return,
        }
        if metrics_callback is not None:
            jax.debug.callback(metrics_callback, metrics, runner.update_i)
        new_runner = Runner(
            train_state=train_state,
            target_params=target_params,
            buffer_state=buffer_state,
            env_states=env_states,
            obs=obs,
            hidden=hidden,
            update_i=runner.update_i + 1,
            rng=rng,
            test_return=test_return,
        )
        return new_runner, metrics


    def update_chunk(runner: Runner, length: int):
        """Scan `length` updates (static).  Exposed so drivers can stream
        metrics between chunks on backends without host-callback support."""
        return jax.lax.scan(update_step, runner, None, length=length)

    def train(rng: jax.Array):
        runner = init_runner(rng)
        runner, metrics = update_chunk(runner, config.num_updates)
        return {"runner": runner, "metrics": metrics}

    train.init_runner = init_runner
    train.update_chunk = update_chunk
    return train


def _host_callbacks_supported() -> bool:
    """Probe whether the active PJRT backend implements host send/recv
    callbacks (jax.debug.callback).  The axon TPU tunnel reports platform
    'tpu' but raises UNIMPLEMENTED at run time, so this must be a
    functional probe, not a platform-name check."""
    seen = []

    def probe(x):
        jax.debug.callback(lambda v: seen.append(v), x)
        return x

    try:
        jax.block_until_ready(jax.jit(probe)(jnp.float32(0.0)))
        jax.effects_barrier()  # callbacks are async; drain before checking
    except Exception:
        return False
    return len(seen) > 0


def main(
    config_path: Optional[str] = None,
    _config_cls=VdnConfig,
    _make_train=None,
    _tag: str = "vdn",
    **overrides,
):
    """CLI driver (reference surface: hydra main, vdn.py:529-573; here a
    plain YAML + kwargs config).  Saves final params with safetensors like
    the reference (vdn.py:576-587) when available.

    The underscore-prefixed parameters let variant baselines (IQL) reuse
    this driver — logging sinks, host-callback probing, chunked streaming,
    multi-seed vmap, param save — with their own config class and
    make_train."""
    cfg = _config_cls.from_yaml(config_path) if config_path else _config_cls()
    for k, v in overrides.items():
        setattr(cfg, k, v)
    make_train_fn = _make_train or make_train

    callback = None
    logger = wb = None
    if cfg.log_during_training:
        from mfvae_tpu.training.metrics import MetricsLogger, WandbLogger

        logger = MetricsLogger(cfg.log_dir, cfg.run_name or _tag)
        wb = WandbLogger(project=cfg.wandb_project, mode=cfg.wandb_mode)

        def callback(metrics, update_i):
            step = int(update_i)
            for k, v in metrics.items():
                logger.scalar(f"{_tag}/{k}", float(v), step)
            wb.log(
                {f"{_tag}/{k}": float(v) for k, v in metrics.items()}, step=step
            )

    rngs = jax.random.split(jax.random.PRNGKey(cfg.seed), cfg.num_seeds)
    # Host callbacks are unsupported on some PJRT backends (the axon TPU
    # tunnel rejects debug.callback at run time while still reporting
    # platform 'tpu'); feature-probe and stream chunk-wise there instead.
    supports_callback = callback is None or _host_callbacks_supported()
    if callback is not None and not supports_callback:
        train = make_train_fn(cfg)
        init_v = jax.jit(jax.vmap(train.init_runner))
        chunk_jits = {}

        def run_chunk(runner, n):
            if n not in chunk_jits:
                chunk_jits[n] = jax.jit(
                    jax.vmap(lambda r: train.update_chunk(r, n)),
                    donate_argnums=0,
                )
            return chunk_jits[n](runner)

        runner = init_v(rngs)
        chunks = []
        done_updates = 0
        while done_updates < cfg.num_updates:
            n = min(max(cfg.log_chunk, 1), cfg.num_updates - done_updates)
            runner, m = run_chunk(runner, n)
            m = jax.tree.map(np.asarray, m)  # leaves [seeds, n]
            for t in range(n):
                callback(
                    {k: v[:, t].mean() for k, v in m.items()},
                    done_updates + t,
                )
            chunks.append(m)
            done_updates += n
        metrics = {
            k: np.concatenate([m[k] for m in chunks], axis=1) for k in chunks[0]
        }
        out = {"runner": runner, "metrics": metrics}
    else:
        # vmapped multi-seed training in one XLA program (reference
        # vdn.py:570-573: jax.jit(jax.vmap(train))); with num_seeds > 1 the
        # per-update callback fires once per seed at each step, like the
        # reference's wandb callback under its seed vmap
        train = make_train_fn(cfg, metrics_callback=callback)
        out = jax.jit(jax.vmap(train))(rngs)
        metrics = jax.tree.map(np.asarray, out["metrics"])
    if logger is not None:
        # debug.callback effects are async; drain them before closing the
        # sinks or a late callback writes to a closed file
        try:
            jax.effects_barrier()
        except Exception:
            pass
        logger.flush()
        logger.close()
        wb.finish()
    print(
        f"final loss={metrics['loss'][:, -1].mean():.4f} "
        f"mean_return={metrics['returned_episode_returns'][:, -1].mean():.2f} "
        f"test_return={metrics['test_return'][:, -1].mean():.2f}"
    )
    out = jax.tree.map(lambda x: x[0], out)  # first seed for saving
    if getattr(cfg, "save_policy_path", ""):
        from mfvae_tpu.baselines.collect_policy import save_policy

        probe_env = make_env(
            cfg.env_name,
            num_good_agents=cfg.num_good_agents,
            num_adversaries=cfg.num_adversaries,
            num_obs=cfg.num_obs,
            max_steps=cfg.max_env_steps,
        )
        save_policy(
            cfg.save_policy_path,
            out["runner"].train_state.params,
            hidden_dim=cfg.hidden_dim,
            param_share=cfg.param_share,
            action_dim=probe_env.action_space(probe_env.agents[0]).n,
            n_agents=probe_env.num_agents,
        )
        print(f"saved collect policy -> {cfg.save_policy_path}")
    try:
        from flax.traverse_util import flatten_dict
        from safetensors.flax import save_file

        params = jax.tree.map(np.asarray, out["runner"].train_state.params)
        flat = {"/".join(k): v for k, v in flatten_dict(params).items()}
        save_file(flat, f"{_tag}_params.safetensors")
    except ImportError:
        pass
    return out


if __name__ == "__main__":
    import sys

    main(sys.argv[1] if len(sys.argv) > 1 else None)
