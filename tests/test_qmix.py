"""QMIX baseline: mixing-network monotonicity + compiled training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfvae_tpu.baselines.qmix import MixingNetwork, QmixConfig, make_train


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
        mixing_dim=8,
        hypernet_dim=16,
        test_during_training=False,
        reward_scale=0.05,
    )
    d.update(kw)
    return QmixConfig(**d)


class TestMixingNetwork:
    def test_monotonic_in_agent_qs(self):
        """dQ_tot/dQ_a >= 0 for every agent — the QMIX constraint."""
        mixer = MixingNetwork(n_agents=4, mixing_dim=8, hypernet_dim=16)
        rng = np.random.default_rng(0)
        state = jnp.asarray(rng.normal(size=(6, 20)), jnp.float32)
        qs = jnp.asarray(rng.normal(size=(6, 4)), jnp.float32)
        params = mixer.init(jax.random.PRNGKey(0), qs, state)

        grads = jax.vmap(
            jax.grad(lambda q, s: mixer.apply(params, q[None], s[None])[0])
        )(qs, state)
        assert float(jnp.min(grads)) >= 0.0

    def test_state_conditioning_matters(self):
        mixer = MixingNetwork(n_agents=2, mixing_dim=4, hypernet_dim=8)
        qs = jnp.ones((1, 2))
        s1 = jnp.zeros((1, 10))
        s2 = jnp.ones((1, 10))
        params = mixer.init(jax.random.PRNGKey(1), qs, s1)
        out1 = float(mixer.apply(params, qs, s1)[0])
        out2 = float(mixer.apply(params, qs, s2)[0])
        assert out1 != out2


class TestQmixTrain:
    def test_end_to_end_compiled_training(self):
        cfg = tiny_config()
        out = jax.jit(make_train(cfg))(jax.random.PRNGKey(0))
        m = jax.tree.map(np.asarray, out["metrics"])
        assert m["loss"].shape == (cfg.num_updates,)
        assert np.isfinite(m["loss"]).all()
        assert int(out["runner"].update_i) == cfg.num_updates
        # mixer params actually updated once learning starts
        p0 = jax.tree.leaves(out["runner"].train_state.params.mixer)[0]
        assert np.isfinite(np.asarray(p0)).all()
