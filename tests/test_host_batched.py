"""Batched native host collection: NativeBatchedCollector -> ring -> device."""

import numpy as np
import pytest

from mfvae_tpu.envs.native_engine import native_engine_available
from tests.test_training import tiny_cfg

pytestmark = pytest.mark.skipif(
    not native_engine_available(), reason="no native toolchain"
)


def make_buffer_and_collector(n_envs=4, max_cycles=16):
    from mfvae_tpu.envs.host_adapter import (
        MultiAgentHostBuffer,
        NativeBatchedCollector,
    )
    from mfvae_tpu.envs.native_engine import NativeHostEnv

    env = NativeHostEnv(
        num_good=1, num_adversaries=2, num_obstacles=1, max_cycles=max_cycles
    )
    buf = MultiAgentHostBuffer(env, max_size=256, batch_size=8)
    col = NativeBatchedCollector(
        buf, n_envs=n_envs, num_good=1, num_adversaries=2, num_obstacles=1,
        max_cycles=max_cycles, n_threads=1,
    )
    return buf, col


class TestNativeBatchedCollector:
    def test_collect_counts_transitions(self):
        buf, col = make_buffer_and_collector(n_envs=4)
        col.collect(10)  # rounds up to a whole batched step
        assert col.steps >= 10
        assert col.steps % 4 == 0
        assert len(buf) == col.steps

    def test_sample_shapes_and_ranges(self):
        buf, col = make_buffer_and_collector(n_envs=4)
        col.collect(32)
        batch = buf.sample()
        assert batch["adversary_0_observations"].shape[0] == 8
        assert batch["adversary_0_actions"].dtype == np.int64
        assert set(np.unique(batch["adversary_0_actions"])) <= set(range(5))
        assert np.isfinite(batch["agent_0_observations"]).all()
        np.testing.assert_array_equal(batch["mask"], np.ones((8, 1)))

    def test_episode_boundary_truncation_recorded(self):
        """At max_cycles the transition is stored with truncation=1 and the
        terminal obs as next_obs (not the reset obs)."""
        buf, col = make_buffer_and_collector(n_envs=2, max_cycles=3)
        col.collect(2 * 3)  # exactly one full episode in each env
        n = len(buf)
        idx = np.arange(n)
        rows = buf.buffer.gather(idx)
        truncs = rows["adversary_0_truncations"].ravel()
        # the 3rd step of each env is truncated
        assert truncs.sum() == 2
        # terminal next_obs must be the TERMINAL observation, not the
        # post-reset obs the collector continues from: the collector's
        # current _obs is the reset state (velocities zeroed, positions
        # redrawn), so the stored terminal row must differ from it
        term = np.where(truncs > 0)[0][0]
        terminal_next = rows["adversary_0_next_observations"][term]
        post_reset = col.env.named_obs(col._obs)["adversary_0"][term % 2]
        assert not np.allclose(terminal_next, post_reset)
        # and after two moves the terminal velocity is non-zero, while a
        # reset obs would carry exactly-zero self velocity
        assert np.abs(terminal_next[:2]).max() > 0
        assert np.abs(post_reset[:2]).max() == 0
        # after the reset the engine's state step counter restarted
        assert col.env.get_state(0)[3] < 3

    def test_batched_collection_on_spread_and_world_comm(self, tmp_path):
        """n_host_envs > 1 now batches every scenario family; world_comm's
        leader samples its composite Discrete(20) space."""
        from mfvae_tpu.envs.host_adapter import NativeBatchedCollector
        from mfvae_tpu.training.host_experiment import HostExperiment

        for name, n_agents in (
            ("MPE_simple_spread_v3", 3),
            ("MPE_simple_world_comm_v3", 6),
        ):
            cfg = tiny_cfg(tmp_path, epoch_num=1, sample_num=8, train_num=1)
            cfg.env.name = name
            cfg.env.num_good_agents = 3 if "spread" in name else 2
            cfg.env.num_adversaries = 4
            cfg.env.num_obs = 1
            cfg.env.n_host_envs = 4
            cfg.buffer.min_size = 4
            cfg.buffer.batch_size = 4
            exp = HostExperiment(cfg).setup()
            assert isinstance(exp.collector, NativeBatchedCollector)
            assert len(exp.agents) == n_agents
            result = exp.run()
            assert np.isfinite(result["loss_train"])
            if "world_comm" in name:
                # the leader actually explored its composite space
                acts = exp.buffer.buffer.gather(
                    np.arange(len(exp.buffer))
                )["leadadversary_0_actions"]
                assert acts.max() >= 5

    def test_host_experiment_with_batched_collector(self, tmp_path):
        from mfvae_tpu.training.host_experiment import HostExperiment

        cfg = tiny_cfg(tmp_path, epoch_num=2, sample_num=8, train_num=2)
        cfg.buffer.min_size = 4
        cfg.buffer.batch_size = 4
        cfg.env.backend = "host"
        cfg.env.n_host_envs = 4
        exp = HostExperiment(cfg).setup()
        from mfvae_tpu.envs.host_adapter import NativeBatchedCollector

        assert isinstance(exp.collector, NativeBatchedCollector)
        result = exp.run()
        assert np.isfinite(result["loss_train"])
        assert result["host_steps"] >= cfg.train.epoch_num * cfg.train.sample_num
