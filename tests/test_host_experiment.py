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
