"""Continuous-action training end-to-end.

Reference capability: the `discrete` env switch (torch_ver/src/env.py:27)
and the continuous action-MLP encoder branch (torch_ver/model.py:119-124,
jax_ver/model.py:127-128).  Here the whole pipeline runs with Box actions:
the compiled collection loop samples uniform forces in the Box bounds, the
buffer stores [A, 2] float actions, and MAVAE encodes them with the
per-agent ActionEncoder MLPs — on the device path (fused epoch + batched
DP epoch), the host path (native engine / LocalHostEnv), and through
checkpoint resume.
"""

import numpy as np
import pytest

from tests.test_training import tiny_cfg


def continuous_cfg(tmp_path, **train_kw):
    cfg = tiny_cfg(tmp_path, **train_kw)
    cfg.env.discrete_actions = False
    cfg.model.discrete_act = False
    return cfg


class TestDevicePath:
    def test_fused_epoch_trains_continuous(self, tmp_path):
        from mfvae_tpu.training.experiment import Experiment

        cfg = continuous_cfg(tmp_path)
        exp = Experiment(cfg).setup()
        # Box act_dim (2), not a Discrete table size
        assert set(exp.spec.act_dims) == {2}
        result = exp.run()
        assert np.isfinite(result["loss_train"])
        assert np.isfinite(result["loss_test"])
        assert result["epoch"] == cfg.train.epoch_num - 1
        assert exp._epoch_jit._cache_size() == 1

    def test_batched_dp_epoch_trains_continuous(self, tmp_path):
        from mfvae_tpu.training.experiment import Experiment

        cfg = continuous_cfg(tmp_path, n_envs=2, epoch_num=2)
        exp = Experiment(cfg).setup()
        result = exp.run()
        assert np.isfinite(result["loss_train"])

    def test_spread_continuous(self, tmp_path):
        from mfvae_tpu.training.experiment import Experiment

        cfg = continuous_cfg(tmp_path, epoch_num=2)
        cfg.env.name = "MPE_simple_spread_v3"
        cfg.env.num_good_agents = 3
        exp = Experiment(cfg).setup()
        result = exp.run()
        assert np.isfinite(result["loss_train"])

    def test_adversary_continuous(self, tmp_path):
        from mfvae_tpu.training.experiment import Experiment

        cfg = continuous_cfg(tmp_path, epoch_num=2)
        cfg.env.name = "MPE_simple_adversary_v3"
        cfg.env.num_good_agents = 2
        exp = Experiment(cfg).setup()
        result = exp.run()
        assert np.isfinite(result["loss_train"])

    def test_mismatched_flags_rejected(self, tmp_path):
        from mfvae_tpu.training.experiment import Experiment

        cfg = continuous_cfg(tmp_path)
        cfg.model.discrete_act = True
        with pytest.raises(ValueError, match="must agree"):
            Experiment(cfg)

    def test_world_comm_continuous_rejected(self, tmp_path):
        """simple_world_comm is discrete-only by design (matching the
        reference path); the guard must be a clear error."""
        from mfvae_tpu.training.experiment import Experiment

        cfg = continuous_cfg(tmp_path)
        cfg.env.name = "MPE_simple_world_comm_v3"
        cfg.env.num_good_agents = 2
        cfg.env.num_adversaries = 4
        cfg.env.num_obs = 1
        with pytest.raises((NotImplementedError, ValueError)):
            Experiment(cfg)


class TestHostPath:
    def test_host_experiment_trains_continuous(self, tmp_path):
        """Continuous training through the host path — native engine when
        the toolchain is present, LocalHostEnv otherwise (both backends
        share the Box(-1, 1, (2,)) force contract)."""
        from mfvae_tpu.training.host_experiment import HostExperiment

        cfg = continuous_cfg(tmp_path, epoch_num=2, sample_num=6, train_num=2)
        cfg.buffer.min_size = 4
        cfg.buffer.batch_size = 4
        exp = HostExperiment(cfg).setup()
        assert set(exp.spec.act_dims) == {2}
        result = exp.run()
        assert np.isfinite(result["loss_train"])
        # the assembled device batch must carry REAL float forces — not
        # int-truncated zeros (regression: _device_batch once cast Box
        # actions to int32, silently training on all-zero actions)
        batch = exp._device_batch(exp.buffer.sample())
        for a in batch.inputs.actions:
            assert np.issubdtype(np.asarray(a).dtype, np.floating)
            assert float(np.abs(np.asarray(a)).max()) > 0.05

    def test_native_batched_collector_continuous(self, tmp_path):
        """n_host_envs>1: batched continuous stepping through the C++
        engine's mpe_step_cont."""
        from mfvae_tpu.envs.native_engine import native_engine_available
        from mfvae_tpu.training.host_experiment import HostExperiment

        if not native_engine_available():
            pytest.skip("no native toolchain")
        cfg = continuous_cfg(tmp_path, epoch_num=2, sample_num=8, train_num=2)
        cfg.env.n_host_envs = 4
        cfg.buffer.min_size = 4
        cfg.buffer.batch_size = 4
        exp = HostExperiment(cfg).setup()
        from mfvae_tpu.envs.host_adapter import NativeBatchedCollector

        assert isinstance(exp.collector, NativeBatchedCollector)
        assert exp.collector.continuous
        result = exp.run()
        assert np.isfinite(result["loss_train"])

    def test_host_buffer_stores_float_actions(self):
        """Box action spaces switch the ring schema to float vectors."""
        from mfvae_tpu.envs.host_adapter import MultiAgentHostBuffer, create_env

        env, obs_dims, act_dims, obs, _ = create_env(
            "simple_tag_v3", num_good=1, num_adversaries=2, num_obstacles=1,
            max_cycles=8, discrete=False,
        )
        assert all(d == 2 for d in act_dims.values())
        buf = MultiAgentHostBuffer(env, max_size=16, batch_size=2)
        rng = np.random.default_rng(0)
        actions = {
            a: rng.uniform(-1, 1, size=(2,)).astype(np.float32)
            for a in env.agents
        }
        next_obs, rewards, terms, truncs, _ = env.step(actions)
        buf.add(obs, actions, rewards, next_obs, terms, truncs)
        buf.add(next_obs, actions, rewards, next_obs, terms, truncs)
        sample = buf.sample()
        a0 = env.agents[0]
        assert sample[f"{a0}_actions"].shape == (2, 2)
        assert sample[f"{a0}_actions"].dtype == np.float32


class TestLocalHostEnvFallback:
    """LocalHostEnv covers all four scenario families (VERDICT r2 item 7:
    the host path must degrade gracefully without g++).  Exercised directly
    here because create_env prefers the native engine when the toolchain
    exists — this is the only coverage the fallback gets on such
    machines."""

    @pytest.mark.parametrize(
        "env_name,kwargs,n_agents",
        [
            ("simple_tag_v3", dict(num_good=1, num_adversaries=2, num_obstacles=1), 3),
            ("simple_spread_v3", dict(num_good=3, num_adversaries=0, num_obstacles=0), 3),
            ("simple_world_comm_v3", dict(num_good=2, num_adversaries=4, num_obstacles=1), 6),
            ("simple_adversary_v3", dict(num_good=2, num_adversaries=1, num_obstacles=0), 3),
        ],
    )
    def test_scenarios_step(self, env_name, kwargs, n_agents):
        from mfvae_tpu.envs.host_adapter import LocalHostEnv

        env = LocalHostEnv(env_name, max_cycles=8, **kwargs)
        assert len(env.agents) == n_agents
        obs, _ = env.reset(seed=0)
        rng = np.random.default_rng(0)
        for _ in range(3):
            actions = {
                a: int(rng.integers(0, env.action_space(a).n))
                for a in env.agents
            }
            obs, rewards, terms, truncs, _ = env.step(actions)
        for a in env.agents:
            assert obs[a].shape == env.observation_space(a).shape
            assert np.isfinite(obs[a]).all()
            assert np.isfinite(rewards[a])

    def test_continuous_tag_fallback(self):
        from mfvae_tpu.envs.host_adapter import LocalHostEnv

        env = LocalHostEnv(
            "simple_tag_v3", num_good=1, num_adversaries=2, num_obstacles=1,
            max_cycles=8, discrete=False,
        )
        space = env.action_space(env.agents[0])
        assert space.shape == (2,)
        obs, _ = env.reset(seed=0)
        actions = {
            a: np.zeros((2,), np.float32) for a in env.agents
        }
        obs, rewards, terms, truncs, _ = env.step(actions)
        assert all(np.isfinite(obs[a]).all() for a in env.agents)


class TestContinuousInference:
    """WorldModel serving with a continuous-action model: dict adapter
    widens Box actions correctly, predict/rollout run compiled."""

    def _build(self):
        import jax
        import jax.numpy as jnp

        from mfvae_tpu.config import ModelConfig
        from mfvae_tpu.models.mavae import AgentSpec, GroupedBatch, MAVAE

        agents = ("adversary_0", "adversary_1", "agent_0")
        spec = AgentSpec.from_dicts(
            agents,
            {"adversary_0": 6, "adversary_1": 6, "agent_0": 4},
            {a: 2 for a in agents},
        )
        cfg = ModelConfig(
            idx_features=8, obs_features=8, action_features=8,
            discrete_act=False, encoder_hidden=(16,), decoder_hidden=(32,),
            compute_dtype="float32",
        )
        model = MAVAE.from_config(cfg, spec)
        B = 3
        batch = GroupedBatch(
            obs=(jnp.ones((B, 2, 6)), jnp.ones((B, 1, 4))),
            actions=(jnp.zeros((B, 2, 2)), jnp.zeros((B, 1, 2))),
        )
        variables = model.init(
            jax.random.PRNGKey(0), batch, None, jax.random.PRNGKey(1)
        )
        return spec, model, batch, variables

    def test_predict_and_dict_adapter(self):
        from mfvae_tpu.inference import WorldModel

        spec, model, batch, variables = self._build()
        wm = WorldModel(model, variables)
        s, r = wm.predict(batch, None)
        assert s.shape == (3, 16) and r.shape == (3, 3)

        obs_d = {
            "adversary_0": np.ones((3, 6), np.float32),
            "adversary_1": np.ones((3, 6), np.float32),
            "agent_0": np.ones((3, 4), np.float32),
        }
        act_d = {a: np.zeros((3, 2), np.float32) for a in spec.agents}
        s2, r2 = wm.predict(obs_d, act_d)
        np.testing.assert_allclose(np.asarray(s2), np.asarray(s), atol=1e-6)
        # actions=None fills float zero-vectors of the Box act_dim
        s3, _ = wm.predict(obs_d, None)
        np.testing.assert_allclose(np.asarray(s3), np.asarray(s), atol=1e-6)

    def test_rollout_continuous_plan(self):
        import jax.numpy as jnp

        from mfvae_tpu.inference import WorldModel

        spec, model, batch, variables = self._build()
        wm = WorldModel(model, variables)
        T, B = 4, 3
        plan = (
            jnp.zeros((T, B, 2, 2)),
            jnp.zeros((T, B, 1, 2)),
        )
        states, rewards = wm.rollout(batch, plan)
        assert states.shape == (T, B, 16) and rewards.shape == (T, B, 3)
        assert np.isfinite(np.asarray(states)).all()


    def test_rollout_dict_plan_unbatched(self):
        """Dict action plans with natural unbatched continuous shapes
        [T, act_dim] per agent must widen to [T, 1, A, act_dim]
        (regression: the dict path once misparsed [T, 2] as [T, B])."""
        import jax.numpy as jnp

        from mfvae_tpu.inference import WorldModel

        spec, model, batch, variables = self._build()
        wm = WorldModel(model, variables)
        obs_d = {
            "adversary_0": np.ones((6,), np.float32),
            "adversary_1": np.ones((6,), np.float32),
            "agent_0": np.ones((4,), np.float32),
        }
        T = 3
        plan = {a: np.zeros((T, 2), np.float32) for a in spec.agents}
        states, rewards = wm.rollout(obs_d, plan)
        assert states.shape == (T, 1, 16) and rewards.shape == (T, 1, 3)
        assert np.isfinite(np.asarray(states)).all()


class TestContinuousResume:
    def test_checkpoint_resume_continuous(self, tmp_path):
        """Exact resume of a continuous-action run: restored params equal
        saved params, training continues to the target epoch."""
        import jax

        from mfvae_tpu.training.experiment import Experiment

        cfg = continuous_cfg(tmp_path, checkpoint_every=1, epoch_num=2)
        exp = Experiment(cfg).setup()
        exp.run()
        exp.ckpt.wait()

        cfg2 = continuous_cfg(
            tmp_path, checkpoint_every=1, epoch_num=4, resume=True
        )
        exp2 = Experiment(cfg2).setup()
        assert exp2.start_epoch == 2
        saved = exp.carry.train_state.params
        restored = exp2.carry.train_state.params
        for a, b in zip(jax.tree.leaves(saved), jax.tree.leaves(restored)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        result = exp2.run()
        assert result["epoch"] == 3
