"""Q-learning baselines generalize beyond simple_tag: compiled training on
the cooperative simple_spread family (the same env registry the VAE path
uses; the reference's VDN is wired to its env zoo via CTRolloutManager —
here the registry name is the only thing that changes)."""

import jax
import numpy as np
import pytest

SPREAD = dict(
    env_name="MPE_simple_spread_v3",
    num_good_agents=3,  # mapped to num_agents by envs.mpe.make
    max_env_steps=8,
    num_envs=2,
    num_steps=8,
    num_updates=3,
    buffer_size_time=64,
    min_buffer_time=8,
    batch_size=4,
    sample_sequence_length=4,
    hidden_dim=16,
    test_during_training=False,
)


@pytest.mark.parametrize("algo", ["vdn", "iql", "qmix"])
def test_compiled_training_on_spread(algo):
    if algo == "vdn":
        from mfvae_tpu.baselines.vdn import VdnConfig as Cfg, make_train
        cfg = Cfg(**SPREAD)
    elif algo == "iql":
        from mfvae_tpu.baselines.iql import IqlConfig as Cfg, make_train
        cfg = Cfg(**SPREAD)
    else:
        from mfvae_tpu.baselines.qmix import QmixConfig as Cfg, make_train
        cfg = Cfg(mixing_dim=8, hypernet_dim=16, **SPREAD)
    out = jax.jit(make_train(cfg))(jax.random.PRNGKey(0))
    m = jax.tree.map(np.asarray, out["metrics"])
    assert m["loss"].shape == (cfg.num_updates,)
    assert np.isfinite(m["loss"]).all()
    # spread rewards are shared negative coverage; stored rewards must be
    # strictly negative (tag would have zeros/positives)
    assert float(m["mean_reward"][-1]) < 0.0


def test_vdn_on_world_comm():
    """The leader's composite Discrete(20) space flows through the shared
    Q-head (movement = a % 5 for every agent, per the published splitter)."""
    from mfvae_tpu.baselines.vdn import VdnConfig, make_train

    cfg = VdnConfig(
        env_name="MPE_simple_world_comm_v3",
        num_good_agents=2,
        num_adversaries=4,
        num_obs=1,
        max_env_steps=8,
        num_envs=2,
        num_steps=8,
        num_updates=3,
        buffer_size_time=64,
        min_buffer_time=8,
        batch_size=4,
        sample_sequence_length=4,
        hidden_dim=16,
        test_during_training=False,
        reward_scale=0.05,
    )
    out = jax.jit(make_train(cfg))(jax.random.PRNGKey(0))
    m = jax.tree.map(np.asarray, out["metrics"])
    assert np.isfinite(m["loss"]).all()


def test_vdn_on_simple_adversary():
    """The mixed-motive fourth family: heterogeneous obs (adversary has no
    goal channel) through the shared-parameter Q stack."""
    from mfvae_tpu.baselines.vdn import VdnConfig, make_train

    cfg = VdnConfig(
        env_name="MPE_simple_adversary_v3",
        num_good_agents=2,
        max_env_steps=8,
        num_envs=2,
        num_steps=8,
        num_updates=3,
        buffer_size_time=64,
        min_buffer_time=8,
        batch_size=4,
        sample_sequence_length=4,
        hidden_dim=16,
        test_during_training=False,
    )
    out = jax.jit(make_train(cfg))(jax.random.PRNGKey(0))
    m = jax.tree.map(np.asarray, out["metrics"])
    assert np.isfinite(m["loss"]).all()
