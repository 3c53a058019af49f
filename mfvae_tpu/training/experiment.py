"""Experiment driver — the framework's `main.py` equivalent.

Replaces the reference's host-orchestrated epoch loop (jax_ver/main.py:
148-235, torch_ver/main.py:64-108) with: build everything once, then call
ONE jitted epoch program per epoch (collection + training + eval all
on-device, carry donated so buffers update in place in HBM).  Host work per
epoch is four scalar reads for TensorBoard and an optional checkpoint.

Usage:
    python main.py [config.yaml] [a.b=c overrides...]
or programmatically:
    exp = Experiment(cfg); exp.run()
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp

from mfvae_tpu.config import ExperimentConfig, save_config
from mfvae_tpu.data.buffer import ItemBuffer
from mfvae_tpu.data.transitions import GroupedTransition
from mfvae_tpu.envs.mpe import make
from mfvae_tpu.models.mavae import AgentSpec, GroupedBatch, MAVAE
from mfvae_tpu.rng import make_streams
from mfvae_tpu.training.checkpoint import CheckpointManager, NullCheckpointManager
from mfvae_tpu.training.metrics import MetricsLogger
from mfvae_tpu.training.trainer import (
    EnvCarry,
    EpochCarry,
    EpochMetrics,
    create_train_state,
    make_epoch_fn,
    make_phase_fns,
    stacked_to_grouped,
)


def build_spec(env) -> AgentSpec:
    """Derive dims from the live env, as the reference does
    (jax_ver/main.py:101-107): Discrete -> n (embedding table size),
    Box -> flat shape (action-MLP input width), via get_space_size
    (jax_ver/main.py:23-30 semantics)."""
    from mfvae_tpu.envs.spaces import get_space_size

    obs_dim = {a: env.obs_dim(a) for a in env.agents}
    act_dim = {a: get_space_size(env.action_space(a)) for a in env.agents}
    return AgentSpec.from_dicts(env.agents, obs_dim, act_dim)


class Experiment:
    def __init__(self, cfg: ExperimentConfig):
        self.cfg = cfg
        cfg.validate()
        self.env = make(
            cfg.env.name,
            num_good_agents=cfg.env.num_good_agents,
            num_adversaries=cfg.env.num_adversaries,
            num_obs=cfg.env.num_obs,
            max_steps=cfg.env.max_steps,
            discrete_actions=cfg.env.discrete_actions,
        )
        self.spec = build_spec(self.env)
        self.codebook = {a: i for i, a in enumerate(self.env.agents)}
        self.model = MAVAE.from_config(cfg.model, self.spec)
        self.buffer = ItemBuffer(
            max_length=cfg.buffer.max_size,
            min_length=cfg.buffer.min_size,
            sample_batch_size=cfg.buffer.batch_size,
        )
        self.test_buffer = ItemBuffer(
            max_length=cfg.buffer.max_size,
            min_length=cfg.buffer.min_size,
            sample_batch_size=cfg.buffer.batch_size,
        )
        self.streams = make_streams(
            cfg.train.seed, bug_compat=cfg.train.bug_compat_rng
        )
        self.logger: Optional[MetricsLogger] = None
        self.ckpt: Optional[CheckpointManager] = None
        self._epoch_jit = None
        self._multi_epoch_jit = None
        self.carry: Optional[EpochCarry] = None
        self.start_epoch = 0

    # ------------------------------------------------------------ lifecycle
    def setup(self):
        cfg = self.cfg
        if cfg.model.reward_head_mode == "twohot":
            # PopArt rescales a SCALAR output head and the Pallas huber
            # kernel is a scalar-reward program — neither is defined for
            # categorical reward logits.
            if cfg.train.mode != "Adam":
                raise ValueError(
                    "model.reward_head_mode='twohot' requires "
                    "train.mode='Adam' (ART/POPART normalize scalar reward "
                    "targets; the two-hot head is categorical)"
                )
            if cfg.model.use_pallas:
                raise ValueError(
                    "model.reward_head_mode='twohot' is incompatible with "
                    "model.use_pallas (the fused kernel scores scalar huber)"
                )
        if cfg.train.debug_nans:
            jax.config.update("jax_debug_nans", True)
        k_reset, _ = self.streams["reset"].next()
        n_envs = cfg.train.n_envs
        # Jit the entire setup path: eagerly it is ~700 tiny op dispatches,
        # each of which is a full remote XLA compile round-trip on axon
        # (~0.3s each — minutes of setup); as one jitted program it is a
        # single (persistently cached) compile.
        if n_envs > 1:
            # batched epoch: leading [E] axis on env carry + buffer shards
            reset_keys = jax.random.split(k_reset, n_envs)
            obs, env_state = jax.jit(jax.vmap(self.env.reset_stacked))(reset_keys)
            example = jax.jit(
                jax.vmap(self._example_transition)
            )(obs, env_state)
            local_bs = cfg.buffer.batch_size // n_envs
            from mfvae_tpu.data.buffer import ItemBuffer as _IB

            # shards split the global capacity (see make_batched_epoch_fn)
            local_buffer = _IB(
                max_length=max(cfg.buffer.max_size // n_envs, local_bs),
                min_length=max(cfg.buffer.min_size // n_envs, 1),
                sample_batch_size=local_bs,
            )

            def init_buffers(ex):
                # vmapped init over the leading env axis
                one = jax.tree.map(lambda x: x[0], ex)
                st = local_buffer.init(one)
                return jax.tree.map(
                    lambda x: jnp.broadcast_to(x, (n_envs,) + x.shape), st
                )

            buffer_state = jax.jit(init_buffers)(example)
            test_buffer_state = jax.jit(init_buffers)(example)
        else:
            obs, env_state = jax.jit(self.env.reset_stacked)(k_reset)
            example = jax.jit(self._example_transition)(obs, env_state)
            buffer_state, test_buffer_state = jax.jit(
                lambda ex: (self.buffer.init(ex), self.test_buffer.init(ex))
            )(example)

        k_model, _ = self.streams["model"].next()
        fake_batch = self._fake_batch(cfg.train.batch_size)

        def build_state(k, fb):
            variables = self.model.init(k, fb, None, k)
            return create_train_state(self.model, variables, cfg.train)

        train_state = jax.jit(build_state)(k_model, fake_batch)

        from mfvae_tpu.training.trainer import init_policy_carry

        self.carry = EpochCarry(
            train_state=train_state,
            buffer_state=buffer_state,
            test_buffer_state=test_buffer_state,
            env=EnvCarry(
                obs=obs,
                state=env_state,
                # seeded here so the epoch carry structure is constant
                # across epochs (scan-of-epochs requirement)
                policy=init_policy_carry(
                    self.env, self.spec, cfg, cfg.train.n_envs
                ),
            ),
        )

        if cfg.train.n_envs > 1:
            from mfvae_tpu.training.trainer import make_batched_epoch_fn

            epoch_fn = make_batched_epoch_fn(
                self.env, self.spec, self.buffer, self.test_buffer, cfg
            )
            self._epoch_jit = jax.jit(epoch_fn, donate_argnums=0)
            self._build_multi_epoch(epoch_fn)
            if cfg.mesh.enable:
                self._shard_carry_for_dp()
        elif cfg.train.fused_epoch:
            epoch_fn = make_epoch_fn(
                self.env, self.spec, self.buffer, self.test_buffer, cfg
            )
            self._epoch_jit = jax.jit(epoch_fn, donate_argnums=0)
            self._build_multi_epoch(epoch_fn)
        else:
            if cfg.train.epochs_per_dispatch > 1:
                raise ValueError(
                    "train.epochs_per_dispatch > 1 requires the fused epoch "
                    "program (train.fused_epoch=true or train.n_envs > 1); "
                    "the split-phase path dispatches per phase"
                )
            collect, train_phase, test_phase = make_phase_fns(
                self.env, self.spec, self.buffer, self.test_buffer, cfg
            )
            collect_jit = jax.jit(collect, donate_argnums=0, static_argnums=2)
            train_jit = jax.jit(train_phase, donate_argnums=0)
            test_jit = jax.jit(test_phase)

            def split_epoch(carry: EpochCarry, epoch_key):
                k_c, k_t, k_tc, k_e = jax.random.split(epoch_key, 4)
                env_c, buf_state = collect_jit(
                    (carry.env, carry.buffer_state), k_c, self.buffer
                )
                train_state, train_m = train_jit(carry.train_state, buf_state, k_t)
                env_c, test_buf_state = collect_jit(
                    (env_c, carry.test_buffer_state), k_tc, self.test_buffer
                )
                test_m = test_jit(train_state, test_buf_state, k_e)
                new_carry = EpochCarry(
                    train_state=train_state,
                    buffer_state=buf_state,
                    test_buffer_state=test_buf_state,
                    env=env_c,
                )
                return new_carry, EpochMetrics(train=train_m, test=test_m)

            self._epoch_jit = split_epoch

        self.logger = MetricsLogger(cfg.train.log_dir, cfg.train.run_name)
        # reproducibility: snapshot the RESOLVED config (defaults + YAML +
        # overrides) next to the run's metrics; reloading it reproduces the
        # run exactly (python main.py <run_dir>/config.yaml)
        save_config(cfg, str(self.logger.run_dir / "config.yaml"))
        self.ckpt = (
            CheckpointManager(cfg.train.checkpoint_dir)
            if cfg.train.checkpoint_dir
            else NullCheckpointManager()
        )
        if cfg.train.resume:
            self._try_resume()
        return self

    def _build_multi_epoch(self, epoch_fn):
        """lax.scan K epochs into one dispatch (train.epochs_per_dispatch).
        The epoch key is derived in-program (fold_in of the train-stream
        base with the absolute epoch index — exactly what streams['train']
        .at(e) computes on the host), so the whole chunk needs zero host
        involvement; per-epoch metrics come back stacked [K, ...]."""
        if self.cfg.train.epochs_per_dispatch <= 1:
            return
        bug_compat = self.cfg.train.bug_compat_rng

        def multi_epoch(carry, base_key, epoch_idx):
            def body(c, e):
                k = base_key if bug_compat else jax.random.fold_in(base_key, e)
                return epoch_fn(c, k)

            return jax.lax.scan(body, carry, epoch_idx)

        self._multi_epoch_jit = jax.jit(multi_epoch, donate_argnums=0)

    def _shard_carry_for_dp(self):
        """Lay the batched carry out over the ('data','model') mesh: env
        carry and buffer shards split on their leading E axis over 'data';
        the train state is replicated when mesh.model_axis == 1 (pure DP) or
        tensor-parallel over 'model' (Megatron column/row decoder splits +
        agent-axis sharding of the stacked encoders, parallel/sharding.py)
        when model_axis > 1.  The XLA SPMD partitioner turns the epoch
        program into DP(xTP) with collectives over ICI (BASELINE.json
        config 5)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from mfvae_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, make_mesh
        from mfvae_tpu.parallel.sharding import mavae_param_shardings

        mesh = make_mesh(
            n_data=self.cfg.mesh.data_axis, n_model=self.cfg.mesh.model_axis
        )
        assert self.cfg.train.n_envs % mesh.shape[DATA_AXIS] == 0, (
            self.cfg.train.n_envs,
            dict(mesh.shape),
        )
        data = NamedSharding(mesh, P(DATA_AXIS))
        self.mesh = mesh
        if mesh.shape[MODEL_AXIS] > 1:
            ts_sharding = mavae_param_shardings(self.carry.train_state, mesh)
        else:
            ts_sharding = jax.tree.map(
                lambda _: NamedSharding(mesh, P()), self.carry.train_state
            )
        self.carry = EpochCarry(
            train_state=jax.device_put(self.carry.train_state, ts_sharding),
            buffer_state=jax.device_put(self.carry.buffer_state, data),
            test_buffer_state=jax.device_put(self.carry.test_buffer_state, data),
            env=jax.device_put(self.carry.env, data),
        )

    def _example_transition(self, obs, env_state) -> GroupedTransition:
        from mfvae_tpu.models.mavae import zero_actions_grouped

        discrete = self.cfg.env.discrete_actions
        if discrete:
            zero_actions = jnp.zeros((self.spec.n_agents,), jnp.int32)
        else:
            zero_actions = jnp.zeros(
                (self.spec.n_agents, self.spec.act_dims[0]), jnp.float32
            )
        act_g = zero_actions_grouped(self.spec, None, discrete)
        next_obs, _, rewards, done, _ = self.env.step_stacked(
            jax.random.PRNGKey(0), env_state, zero_actions
        )
        obs_g = stacked_to_grouped(self.spec, obs)
        next_g = stacked_to_grouped(self.spec, next_obs)
        return GroupedTransition(
            obs=obs_g,
            actions=act_g,
            next_obs=next_g,
            rewards=rewards,
            done=jnp.float32(0.0),
        )

    def _fake_batch(self, batch_size: int) -> GroupedBatch:
        obs = tuple(
            jnp.zeros((batch_size, len(idxs), od))
            for (od, _), idxs in self.spec.groups
        )
        from mfvae_tpu.models.mavae import zero_actions_grouped

        act = zero_actions_grouped(
            self.spec, batch_size, self.cfg.model.discrete_act
        )
        return GroupedBatch(obs=obs, actions=act)

    def _try_resume(self):
        step = self.ckpt.latest_step()
        if step is None:
            return
        try:
            payload = self.ckpt.restore(
                step,
                like={
                    "carry": self.carry,
                    "epoch": 0,
                },
            )
            self.carry = payload["carry"]
        except ValueError:
            # pre-round-4 checkpoint: EnvCarry had no `policy` field.
            # Restore through a template without it, then reattach the
            # fresh policy carry (stateful policies re-arm their episode
            # state at the next step, which IS the episode-start behavior).
            old_env = {"obs": self.carry.env.obs, "state": self.carry.env.state}
            like = {
                "carry": self.carry._replace(env=old_env),
                "epoch": 0,
            }
            payload = self.ckpt.restore(step, like=like)
            env_d = payload["carry"].env
            self.carry = payload["carry"]._replace(
                env=EnvCarry(
                    obs=env_d["obs"],
                    state=env_d["state"],
                    policy=self.carry.env.policy,
                )
            )
            print("(migrated a pre-policy-carry checkpoint)")
        self.start_epoch = int(payload["epoch"]) + 1
        print(f"resumed from checkpoint step {step} (epoch {self.start_epoch})")

    # ----------------------------------------------------------------- run
    def run(self) -> dict:
        if self.carry is None:
            self.setup()
        cfg = self.cfg
        t0 = time.time()
        # Preemption handling (SURVEY §5.3: TPU pods are preemptible, the
        # reference has no recovery path): SIGTERM/SIGINT set a flag; the
        # epoch loop checkpoints the full carry at the next boundary and
        # returns cleanly with preempted_at set, so a restarted process
        # resumes exactly (train.resume=true).  Installed only on the main
        # thread (signal.signal raises elsewhere, e.g. host-experiment
        # collector threads).
        import signal
        import threading

        preempt = {"flag": False}
        old_handlers = {}
        if threading.current_thread() is threading.main_thread():
            def _on_signal(signum, frame):
                preempt["flag"] = True

            for sig in (signal.SIGTERM, signal.SIGINT):
                old_handlers[sig] = signal.signal(sig, _on_signal)
        # Epochs dispatch without any host sync: metrics stay on device and
        # are fetched in one transfer at the end (each float() read costs a
        # full device round-trip per epoch otherwise — measurable on axon).
        pending = []
        if self._multi_epoch_jit is not None:
            last = self._run_scanned_epochs(pending, preempt)
            for sig, h in old_handlers.items():
                signal.signal(sig, h)
            if preempt["flag"] and "epoch" in last:
                last["preempted_at"] = last["epoch"]
            last["wall_s"] = time.time() - t0
            return last
        prof_from = self.start_epoch + 1 if cfg.train.profile_epochs else None
        BACKPRESSURE = 64  # bound the async dispatch queue: unbounded
        # donated-epoch dispatch exhausts device resources on long runs
        for epoch in range(self.start_epoch, cfg.train.epoch_num):
            if prof_from is not None and epoch == prof_from:
                jax.profiler.start_trace(str(self.logger.run_dir / "profile"))
            k_epoch = self.streams["train"].at(epoch)
            self.carry, metrics = self._epoch_jit(self.carry, k_epoch)
            pending.append((epoch, metrics))
            if (epoch + 1) % BACKPRESSURE == 0:
                # real host transfer, not block_until_ready: the axon PJRT
                # tunnel's block is a no-op, which would leave the dispatch
                # queue unbounded on exactly the backend that needs bounding
                jax.device_get(metrics.train.loss)
            if (
                prof_from is not None
                and epoch == prof_from + cfg.train.profile_epochs - 1
            ):
                jax.device_get(metrics.train.loss)
                jax.profiler.stop_trace()
                prof_from = None
            if (
                cfg.train.checkpoint_every
                and (epoch + 1) % cfg.train.checkpoint_every == 0
            ):
                self._save(epoch)
            if preempt["flag"]:
                jax.device_get(metrics.train.loss)  # settle device work
                print(f"preempted: checkpointing epoch {epoch}, exiting cleanly")
                break
        else:
            epoch = cfg.train.epoch_num - 1
        for sig, h in old_handlers.items():
            signal.signal(sig, h)
        self._save(epoch)
        last = {}
        # Stack pending metrics on-device in chunks and fetch once per chunk:
        # per-scalar device_get would be thousands of round-trips over the
        # (high-latency) device link.
        stack = jax.jit(lambda *ms: jax.tree.map(lambda *xs: jnp.stack(xs), *ms))
        CHUNK = 64
        for i in range(0, len(pending), CHUNK):
            chunk = pending[i : i + CHUNK]
            stacked = jax.device_get(stack(*[m for _, m in chunk]))
            for j, (epoch, _) in enumerate(chunk):
                m = jax.tree.map(lambda x: x[j], stacked)
                self.logger.losses(m.train, epoch, "Train")
                self.logger.losses(m.test, epoch, "Test")
                last = {
                    "epoch": epoch,
                    "loss_train": float(m.train.loss),
                    "loss_test": float(m.test.loss),
                }
        self.ckpt.wait()
        self.logger.flush()
        last["wall_s"] = time.time() - t0
        if preempt["flag"]:
            last["preempted_at"] = epoch
        return last

    def _save(self, epoch: int):
        self.ckpt.save(epoch, {"carry": self.carry, "epoch": epoch})

    def _run_scanned_epochs(self, pending, preempt) -> dict:
        """Chunked whole-training execution: K = train.epochs_per_dispatch
        epochs per XLA dispatch (lax.scan over the fused epoch program).
        Host work for a K-epoch chunk is ONE dispatch; stacked per-epoch
        metrics are fetched lazily after the loop.  Checkpoints land at
        chunk boundaries (the in-program carry is not addressable
        mid-chunk)."""
        import numpy as _np

        cfg = self.cfg
        K = cfg.train.epochs_per_dispatch
        base_key = self.streams["train"].base
        epoch = self.start_epoch
        # matches the per-epoch path's resume-complete behavior: re-save the
        # final real epoch, never a phantom one past epoch_num-1
        last_epoch = min(max(epoch, 1), cfg.train.epoch_num) - 1
        prev_metrics = None
        profiling = bool(cfg.train.profile_epochs) and epoch < cfg.train.epoch_num
        if profiling:
            # trace granularity is the chunk: covers the first dispatched
            # chunk (epochs [start, start+k))
            jax.profiler.start_trace(str(self.logger.run_dir / "profile"))
        while epoch < cfg.train.epoch_num:
            # depth-1 pipelining: sync the PREVIOUS chunk before dispatching
            # the next.  Bounds the donated-dispatch queue (the per-epoch
            # loop's BACKPRESSURE concern) and gives SIGTERM a real
            # observation point per chunk while the device stays busy.
            if prev_metrics is not None:
                jax.device_get(jax.tree.leaves(prev_metrics)[0])
                if preempt["flag"]:
                    print(
                        f"preempted: checkpointing epoch {last_epoch}, "
                        "exiting cleanly"
                    )
                    break
            k = min(K, cfg.train.epoch_num - epoch)
            idx = jnp.arange(epoch, epoch + k)
            self.carry, metrics = self._multi_epoch_jit(self.carry, base_key, idx)
            pending.append((epoch, k, metrics))
            prev_metrics = metrics
            last_epoch = epoch + k - 1
            if profiling:
                jax.device_get(jax.tree.leaves(metrics)[0])
                jax.profiler.stop_trace()
                profiling = False
            if cfg.train.checkpoint_every and (
                (epoch + k) % max(cfg.train.checkpoint_every, K) < k
            ):
                self._save(last_epoch)
            epoch += k
        if self.ckpt.latest_step() != last_epoch:
            self._save(last_epoch)
        last = {}
        for e0, k, metrics in pending:
            m_host = jax.device_get(metrics)  # one transfer per chunk
            for j in range(k):
                m = jax.tree.map(lambda x: x[j], m_host)
                self.logger.losses(m.train, e0 + j, "Train")
                self.logger.losses(m.test, e0 + j, "Test")
                last = {
                    "epoch": e0 + j,
                    "loss_train": float(_np.asarray(m.train.loss)),
                    "loss_test": float(_np.asarray(m.test.loss)),
                }
        self.ckpt.wait()
        self.logger.flush()
        return last


def run_experiment(cfg: ExperimentConfig) -> dict:
    """Dispatch on env.backend: 'jax' -> fully-compiled on-device pipeline;
    'host' -> PettingZoo-API host env + native ring buffer
    (training.host_experiment, the torch_ver-pipeline analog)."""
    if cfg.env.backend == "host":
        from mfvae_tpu.training.host_experiment import HostExperiment

        return HostExperiment(cfg).setup().run()
    return Experiment(cfg).setup().run()


def run_resilient(
    cfg: ExperimentConfig,
    max_restarts: int = 3,
    experiment_factory=Experiment,
) -> dict:
    """Failure-tolerant driver (SURVEY §5.3: the reference has no recovery
    path of any kind).  On any exception the experiment is rebuilt and
    resumed from the latest full-state checkpoint — the idiomatic way to
    survive TPU preemption.  Requires train.checkpoint_every > 0 to make
    progress across restarts."""
    attempt = 0
    while True:
        try:
            if attempt > 0:
                cfg.train.resume = True
            return experiment_factory(cfg).setup().run()
        except Exception as e:  # noqa: BLE001 — deliberate catch-all for elasticity
            attempt += 1
            if attempt > max_restarts:
                raise
            print(
                f"training attempt {attempt} failed ({type(e).__name__}: {e}); "
                f"restarting from last checkpoint"
            )
