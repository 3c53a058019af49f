"""Host-backend experiment: async host env -> C++ ring -> device training."""

import numpy as np

from tests.test_training import tiny_cfg


class TestHostExperiment:
    def test_end_to_end(self, tmp_path):
        from mfvae_tpu.training.host_experiment import HostExperiment

        cfg = tiny_cfg(tmp_path, epoch_num=2, sample_num=6, train_num=2)
        cfg.buffer.min_size = 4
        cfg.buffer.batch_size = 4
        exp = HostExperiment(cfg).setup()
        assert exp.buffer.buffer.backend in ("native", "numpy")
        result = exp.run()
        assert np.isfinite(result["loss_train"])
        assert result["host_steps"] >= cfg.train.epoch_num * cfg.train.sample_num
        assert result["epoch"] == 1

    def test_simple_spread_host_backend(self, tmp_path):
        """Host pipeline on the second scenario family (native spread
        engine through create_env)."""
        import pytest

        from mfvae_tpu.envs.native_engine import native_engine_available
        from mfvae_tpu.training.host_experiment import HostExperiment

        if not native_engine_available():
            pytest.skip("no native toolchain")
        cfg = tiny_cfg(tmp_path, epoch_num=2, sample_num=6, train_num=2)
        cfg.env.name = "MPE_simple_spread_v3"
        cfg.env.num_good_agents = 3
        cfg.buffer.min_size = 4
        cfg.buffer.batch_size = 4
        exp = HostExperiment(cfg).setup()
        assert len(exp.agents) == 3
        result = exp.run()
        assert np.isfinite(result["loss_train"])

    def test_simple_world_comm_host_backend(self, tmp_path):
        """Host pipeline on the third scenario family, exercising
        HETEROGENEOUS action spaces (leader Discrete(20)) through the
        collector and the MAVAE act-dim groups."""
        import pytest

        from mfvae_tpu.envs.native_engine import native_engine_available
        from mfvae_tpu.training.host_experiment import HostExperiment

        if not native_engine_available():
            pytest.skip("no native toolchain")
        cfg = tiny_cfg(tmp_path, epoch_num=2, sample_num=6, train_num=2)
        cfg.env.name = "MPE_simple_world_comm_v3"
        cfg.env.num_good_agents = 2
        cfg.env.num_adversaries = 4
        cfg.env.num_obs = 1
        cfg.buffer.min_size = 4
        cfg.buffer.batch_size = 4
        exp = HostExperiment(cfg).setup()
        assert len(exp.agents) == 6
        assert exp.spec.act_dims[0] == 20  # the leader's composite space
        result = exp.run()
        assert np.isfinite(result["loss_train"])

    def test_simple_adversary_batched_host_backend(self, tmp_path):
        """Batched native collection on the fourth scenario family."""
        import pytest

        from mfvae_tpu.envs.native_engine import native_engine_available
        from mfvae_tpu.training.host_experiment import HostExperiment

        if not native_engine_available():
            pytest.skip("no native toolchain")
        cfg = tiny_cfg(tmp_path, epoch_num=2, sample_num=8, train_num=2)
        cfg.env.name = "MPE_simple_adversary_v3"
        cfg.env.num_good_agents = 2
        cfg.env.n_host_envs = 4
        cfg.buffer.min_size = 4
        cfg.buffer.batch_size = 4
        exp = HostExperiment(cfg).setup()
        from mfvae_tpu.envs.host_adapter import NativeBatchedCollector

        assert isinstance(exp.collector, NativeBatchedCollector)
        result = exp.run()
        assert np.isfinite(result["loss_train"])
