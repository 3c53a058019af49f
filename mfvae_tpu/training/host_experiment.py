"""Host-env experiment driver — the torch_ver pipeline, TPU-native.

Capability parity with torch_ver/main.py:64-108: a host (PettingZoo-API)
environment generates transitions into the native C++ ring buffer
(data/host_buffer.py, replacing cpprb), and the device trains with the same
fused MAVAE train step as the on-device path.  TPU-native deltas:

- host collection runs on a background thread (envs/host_adapter.py
  AsyncCollector) so device train steps never wait on host physics — the
  reference interleaves them serially (SURVEY §3.1);
- each sampled host batch is assembled once and shipped to the device as
  grouped tensors (one transfer), not 40 per-agent `.to(device)` calls per
  step (torch_ver/model.py:140-148);
- training itself is the shared jitted train step (single forward, optional
  PopArt) — one compiled program regardless of backend.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mfvae_tpu.config import ExperimentConfig, save_config
from mfvae_tpu.data.transitions import VaeBatch
from mfvae_tpu.envs.host_adapter import (
    AsyncCollector,
    MultiAgentHostBuffer,
    create_env,
)
from mfvae_tpu.models.mavae import AgentSpec, GroupedBatch, MAVAE
from mfvae_tpu.rng import make_streams
from mfvae_tpu.training.metrics import MetricsLogger
from mfvae_tpu.training.trainer import (
    build_s_col_weight,
    create_train_state,
    make_test_step,
    make_train_step,
)


class HostExperiment:
    def __init__(self, cfg: ExperimentConfig):
        self.cfg = cfg
        # map the jax-path env name (MPE_simple_tag_v3) onto the host
        # factory's PettingZoo-style name
        env_name = cfg.env.name.replace("MPE_", "")
        cfg.validate()
        self.env, obs_dims, act_dims, _, _ = create_env(
            env_name,
            num_good=cfg.env.num_good_agents,
            num_adversaries=cfg.env.num_adversaries,
            num_obstacles=cfg.env.num_obs,
            max_cycles=cfg.env.max_steps,
            seed=cfg.train.seed,
            discrete=cfg.env.discrete_actions,
            scripted_policy=cfg.train.collect_policy != "random",
        )
        self.agents = list(self.env.agents)
        self.spec = AgentSpec.from_dicts(self.agents, obs_dims, act_dims)
        self.model = MAVAE.from_config(cfg.model, self.spec)
        self.buffer = MultiAgentHostBuffer(
            self.env,
            max_size=cfg.buffer.max_size,
            batch_size=cfg.buffer.batch_size,
            seed=cfg.train.seed,
        )
        self.collector = None
        if cfg.env.n_host_envs > 1:
            # NOTE: the batched collector always steps the native engine —
            # even when create_env picked PettingZoo above — the two are
            # fidelity-equivalent (tests/test_native_engine.py) and only
            # the native engine steps in batch.
            from mfvae_tpu.envs.host_adapter import NativeBatchedCollector

            try:
                self.collector = NativeBatchedCollector(
                    self.buffer,
                    env=self._make_batched_native_env(env_name),
                    seed=cfg.train.seed,
                    continuous=not cfg.env.discrete_actions,
                    collect_policy=cfg.train.collect_policy,
                    epsilon=cfg.train.collect_epsilon,
                    mix_frac=cfg.train.collect_mix_frac,
                )
            except RuntimeError as e:  # no toolchain: degrade, keep running
                print(f"n_host_envs={cfg.env.n_host_envs} unavailable ({e}); "
                      "falling back to single-env AsyncCollector")
        if self.collector is None:
            self.collector = AsyncCollector(
                self.env, self.buffer, seed=cfg.train.seed,
                policy=cfg.train.collect_policy,
                epsilon=cfg.train.collect_epsilon,
                mix_frac=cfg.train.collect_mix_frac,
            )
        self.streams = make_streams(cfg.train.seed)
        self.logger: Optional[MetricsLogger] = None
        self.train_state = None
        self._train_jit = None
        self._test_jit = None

    def _make_batched_native_env(self, env_name: str):
        """Batched native engine instance for n_host_envs collection,
        matching the scenario create_env resolved."""
        from mfvae_tpu.envs import native_engine as ne

        cfg = self.cfg
        common = dict(
            n_envs=cfg.env.n_host_envs,
            max_steps=cfg.env.max_steps,
            seed=cfg.train.seed,
            auto_reset=False,
        )
        if env_name == "simple_adversary_v3":
            return ne.NativeSimpleAdversaryEnv(
                num_good_agents=cfg.env.num_good_agents, **common
            )
        if env_name == "simple_spread_v3":
            return ne.NativeSimpleSpreadEnv(
                num_agents=cfg.env.num_good_agents, **common
            )
        if env_name == "simple_world_comm_v3":
            return ne.NativeSimpleWorldCommEnv(
                num_good_agents=cfg.env.num_good_agents,
                num_adversaries=cfg.env.num_adversaries,
                num_obs=cfg.env.num_obs,
                **common,
            )
        return ne.NativeSimpleTagEnv(
            num_good_agents=cfg.env.num_good_agents,
            num_adversaries=cfg.env.num_adversaries,
            num_obs=cfg.env.num_obs,
            **common,
        )

    def setup(self):
        cfg = self.cfg
        if cfg.model.reward_head_mode == "twohot" and cfg.train.mode != "Adam":
            raise ValueError(
                "model.reward_head_mode='twohot' requires train.mode='Adam' "
                "(ART/POPART normalize scalar reward targets)"
            )
        k_model, _ = self.streams["model"].next()
        fake = self._fake_batch(cfg.buffer.batch_size)

        def build(k, fb):
            variables = self.model.init(k, fb, None, k)
            return create_train_state(self.model, variables, cfg.train)

        self.train_state = jax.jit(build)(k_model, fake.inputs)
        s_col_w = build_s_col_weight(self.spec, cfg)
        self._train_jit = jax.jit(
            make_train_step(
                cfg.loss,
                cfg.train.mode,
                cfg.train.popart_beta,
                s_col_weight=s_col_w,
            ),
            donate_argnums=0,
        )
        self._test_jit = jax.jit(
            make_test_step(cfg.loss, cfg.train.mode, s_col_weight=s_col_w)
        )
        self.logger = MetricsLogger(cfg.train.log_dir, cfg.train.run_name or "host_run")
        save_config(cfg, str(self.logger.run_dir / "config.yaml"))
        return self

    def _fake_batch(self, batch_size: int) -> VaeBatch:
        obs = tuple(
            jnp.zeros((batch_size, len(idxs), od))
            for (od, _), idxs in self.spec.groups
        )
        from mfvae_tpu.models.mavae import zero_actions_grouped

        act = zero_actions_grouped(
            self.spec, batch_size, self.cfg.model.discrete_act
        )
        return VaeBatch(
            inputs=GroupedBatch(obs=obs, actions=act),
            next_state=jnp.zeros((batch_size, sum(self.spec.obs_dims))),
            rewards=jnp.zeros((batch_size, self.spec.n_agents)),
        )

    def _device_batch(self, sample: Dict[str, np.ndarray]) -> VaeBatch:
        """Assemble the host sample into grouped tensors; ONE host->device
        transfer for the whole batch."""
        spec = self.spec
        obs_g, act_g, next_g = [], [], []
        for (_, _), idxs in spec.groups:
            names = [spec.agents[i] for i in idxs]
            obs_g.append(
                np.stack([sample[f"{a}_observations"] for a in names], axis=1)
            )
            act_g.append(np.stack([sample[f"{a}_actions"] for a in names], axis=1))
            next_g.append(
                np.stack([sample[f"{a}_next_observations"] for a in names], axis=1)
            )
        next_state = np.concatenate(
            [g.reshape(g.shape[0], -1) for g in next_g], axis=-1
        )
        rewards = np.concatenate(
            [sample[f"{a}_rewards"] for a in spec.agents], axis=-1
        )
        act_dtype = np.int32 if self.cfg.model.discrete_act else np.float32
        host = (
            tuple(obs_g),
            tuple(a.astype(act_dtype) for a in act_g),
            next_state.astype(np.float32),
            rewards.astype(np.float32),
        )
        obs_d, act_d, next_d, rew_d = jax.device_put(host)
        return VaeBatch(
            inputs=GroupedBatch(obs=obs_d, actions=act_d),
            next_state=next_d,
            rewards=rew_d,
        )

    def run(self) -> dict:
        cfg = self.cfg
        t0 = time.time()
        # async host collection overlapping device training
        self.collector.collect(max(cfg.buffer.min_size, cfg.buffer.batch_size))
        self.collector.start()
        last = {}
        try:
            for epoch in range(cfg.train.epoch_num):
                target = (epoch + 1) * cfg.train.sample_num
                while self.collector.steps < target:
                    time.sleep(0.001)
                sums = None
                for i in range(cfg.train.train_num):
                    batch = self._device_batch(self.buffer.sample())
                    k = self.streams["train"].at(epoch * cfg.train.train_num + i)
                    self.train_state, outs = self._train_jit(self.train_state, batch, k)
                    sums = outs if sums is None else jax.tree.map(
                        lambda a, b: a + b, sums, outs
                    )
                mean = jax.tree.map(lambda x: x / cfg.train.train_num, sums)
                self.logger.losses(jax.device_get(mean), epoch, "Train")
                last = {"epoch": epoch, "loss_train": float(mean.loss)}
        finally:
            self.collector.stop()
        self.logger.flush()
        last["wall_s"] = time.time() - t0
        last["host_steps"] = self.collector.steps
        return last
