"""IQL baseline: per-agent independent TD + compiled training."""

import jax
import jax.numpy as jnp
import numpy as np

from mfvae_tpu.baselines.iql import IqlConfig, make_train


def tiny_config(**kw):
    d = dict(
        num_good_agents=1,
        num_adversaries=2,
        num_obs=1,
        max_env_steps=8,
        num_envs=2,
        num_steps=8,
        num_updates=4,
        buffer_size_time=64,
        min_buffer_time=8,
        batch_size=4,
        sample_sequence_length=4,
        hidden_dim=16,
        test_during_training=False,
        reward_scale=0.05,
    )
    d.update(kw)
    return IqlConfig(**d)


class TestIqlTrain:
    def test_end_to_end_compiled_training(self):
        cfg = tiny_config()
        out = jax.jit(make_train(cfg))(jax.random.PRNGKey(0))
        m = jax.tree.map(np.asarray, out["metrics"])
        assert m["loss"].shape == (cfg.num_updates,)
        assert np.isfinite(m["loss"]).all()
        assert int(out["runner"].update_i) == cfg.num_updates

    def test_per_agent_rewards_stored(self):
        """The trajectory ring must carry the [N] per-agent reward vector,
        not VDN's scalar team sum."""
        cfg = tiny_config()
        train = make_train(cfg)
        runner = jax.jit(train.init_runner)(jax.random.PRNGKey(1))
        runner, _ = jax.jit(lambda r: train.update_chunk(r, 1))(runner)
        rew = runner.buffer_state.data.rewards
        n_agents = cfg.num_good_agents + cfg.num_adversaries
        assert rew.shape[-1] == n_agents
        rew_np = np.asarray(rew)
        # adversary and good rewards diverge whenever a collision happened
        # (opposing signs); at minimum the field is populated per-agent
        assert np.isfinite(rew_np).all()

    def test_opposing_rewards_not_conflated(self):
        """When adversaries collide with prey, stored adversary rewards are
        positive while the touched good agent's is negative — the signal
        VDN's team sum destroys."""
        # dense population so tagging events are certain within the rollout
        cfg = tiny_config(
            num_updates=8,
            num_steps=25,
            num_adversaries=8,
            num_good_agents=4,
            num_envs=4,
            reward_scale=1.0,
        )
        train = make_train(cfg)
        runner = jax.jit(train.init_runner)(jax.random.PRNGKey(2))
        runner, _ = jax.jit(lambda r: train.update_chunk(r, 8))(runner)
        rew = np.asarray(runner.buffer_state.data.rewards)  # [B, T, N]
        adv = rew[..., :8]
        good = rew[..., 8:]
        # fail LOUDLY if no collision happened — a silent guard here once
        # let the property pass unverified
        assert (adv > 0).any(), "no adversary collision reward in rollout"
        # wherever the adversary team scored, at least one prey lost
        mask = adv[..., 0] > 0
        assert (good[mask] < 0).any(axis=-1).all()

    def test_td_lambda_variant_runs(self):
        cfg = tiny_config(td_lambda_loss=True, td_lambda=0.6)
        out = jax.jit(make_train(cfg))(jax.random.PRNGKey(3))
        m = jax.tree.map(np.asarray, out["metrics"])
        assert np.isfinite(m["loss"]).all()

    def test_yaml_config_runs(self):
        cfg = IqlConfig.from_yaml("mfvae_tpu/baselines/config/iql.yaml")
        assert cfg.env_name == "MPE_simple_tag_v3"
        assert cfg.reward_scale == 0.1
