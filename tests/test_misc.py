"""Small-surface coverage: metrics sinks, profiling timers, rng split,
backend dispatch."""

import time

import jax
import numpy as np
import pytest

from mfvae_tpu.rng import make_streams
from mfvae_tpu.training.metrics import MetricsLogger, WandbLogger
from mfvae_tpu.utils.profiling import StepTimer, annotate


class TestMetrics:
    def test_jsonl_sink(self, tmp_path):
        lg = MetricsLogger(str(tmp_path), "r1")
        lg.scalar("X/Y", 1.5, 0)
        lg.flush()
        import json

        rows = [
            json.loads(l)
            for l in (tmp_path / "r1" / "metrics.jsonl").read_text().splitlines()
        ]
        assert rows[0]["tag"] == "X/Y" and rows[0]["value"] == 1.5
        lg.close()

    def test_wandb_disabled_noop(self):
        w = WandbLogger(mode="disabled")
        w.log({"a": 1})  # must not raise
        w.finish()


class TestProfiling:
    def test_step_timer(self):
        t = StepTimer(ema=0.5)
        for _ in range(3):
            with t:
                time.sleep(0.01)
        assert t.avg is not None and t.avg > 0.005
        assert t.rate(10) > 0

    def test_annotate_context(self):
        with annotate("span"):
            pass


class TestRngSplit:
    def test_split_shape_and_determinism(self):
        s = make_streams(0)["act"]
        ks1 = s.split(5)
        ks2 = make_streams(0)["act"].split(5)
        assert ks1.shape[0] == 5
        np.testing.assert_array_equal(np.asarray(ks1), np.asarray(ks2))


class TestBackendDispatch:
    def test_host_backend_dispatch(self, tmp_path):
        from tests.test_training import tiny_cfg
        from mfvae_tpu.training.experiment import run_experiment

        cfg = tiny_cfg(tmp_path, epoch_num=1, sample_num=4, train_num=1)
        cfg.buffer.min_size = 2
        cfg.buffer.batch_size = 2
        cfg.env.backend = "host"
        result = run_experiment(cfg)
        assert "host_steps" in result
