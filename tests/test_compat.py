"""Reference-surface compatibility: TransitionBuffer class API, dummy
transitions, legacy loss."""

import jax
import jax.numpy as jnp
import numpy as np

from mfvae_tpu.data.compat import (
    TransitionBuffer,
    generate_dummy_transition,
    print_transition_shape,
)
from mfvae_tpu.data.transitions import create_dataset
from mfvae_tpu.envs.mpe import SimpleTagEnv
from mfvae_tpu.models.losses import kl_gaussian, legacy_vae_loss, mse


def rollout_bits():
    env = SimpleTagEnv(num_good_agents=1, num_adversaries=2, num_obs=1, max_steps=50)
    obs, state = env.reset(jax.random.PRNGKey(0))
    actions = {a: jnp.int32(1) for a in env.agents}
    nobs, state, rew, done, _ = env.step(jax.random.PRNGKey(1), state, actions)
    return env, obs, actions, rew, nobs, done, state


class TestTransitionBuffer:
    def test_reference_surface_end_to_end(self, capsys):
        env, obs, actions, rew, nobs, done, state = rollout_bits()
        buf = TransitionBuffer(max_length=32, min_length=4, batch_size=8)
        # sample/add before init -> message + None (jax_buffer.py:115-117)
        assert buf.sample(jax.random.PRNGKey(0)) is None
        buf.add_trans(obs, rew, actions, nobs, done)
        assert "not init" in capsys.readouterr().out

        buf.init_buffer(obs, rew, actions, nobs, done)
        assert buf.can_sample() is False
        for _ in range(6):
            buf.add_trans(obs, rew, actions, nobs, done)
        assert buf.can_sample() is True
        batch = buf.sample(jax.random.PRNGKey(2))
        # flashbax-like .experience access (jax_buffer.py:186-188)
        assert batch.experience["adversary_1_obs"].shape[0] == 8

        # feeds create_dataset exactly like the reference main loop
        codebook = {a: i for i, a in enumerate(env.agents)}
        idx_state, acts, rewards, next_states = create_dataset(
            batch.experience, codebook
        )
        assert rewards.shape == (8, 3)

    def test_dummy_and_print(self, capsys):
        env, obs, actions, rew, nobs, done, state = rollout_bits()
        from mfvae_tpu.data.transitions import create_joint_transition

        tr = create_joint_transition(obs, rew, actions, nobs, done)
        dummy = generate_dummy_transition(tr)
        assert all(float(jnp.sum(jnp.abs(v))) == 0.0 for v in dummy.values())
        print_transition_shape(dummy)
        out = capsys.readouterr().out
        assert "adversary_0_obs" in out and "shape" in out


class TestLegacyLoss:
    def test_mse_plus_weighted_kl(self):
        rng = np.random.default_rng(0)
        y = jnp.asarray(rng.normal(size=(4, 6)), jnp.float32)
        y_hat = jnp.asarray(rng.normal(size=(4, 6)), jnp.float32)
        mu = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
        lv = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
        got = float(legacy_vae_loss(y, y_hat, mu, lv))
        want = float(mse(y, y_hat)) + 0.0025 * float(kl_gaussian(mu, lv))
        assert np.isclose(got, want, rtol=1e-6)
