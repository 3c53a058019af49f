"""Transition packing + dataset assembly, both formats, plus the
end-to-end env->buffer->dataset->model wiring."""

import jax
import jax.numpy as jnp
import numpy as np

from mfvae_tpu.data.buffer import ItemBuffer
from mfvae_tpu.data.transitions import (
    create_dataset,
    create_joint_transition,
    group_env_step,
    vae_batch_from_grouped,
)
from mfvae_tpu.envs.mpe import SimpleTagEnv
from mfvae_tpu.models.mavae import AgentSpec


def small_env():
    return SimpleTagEnv(num_good_agents=2, num_adversaries=3, num_obs=2, max_steps=50)


def env_spec(env):
    obs_dim = {a: env.obs_dim(a.startswith("adversary")) for a in env.agents}
    act_dim = {a: 5 for a in env.agents}
    return AgentSpec.from_dicts(env.agents, obs_dim, act_dim)


class TestFlatFormat:
    def test_create_joint_transition_schema(self):
        env = small_env()
        obs, state = env.reset(jax.random.PRNGKey(0))
        actions = {a: jnp.int32(1) for a in env.agents}
        nobs, state, rew, done, _ = env.step(jax.random.PRNGKey(1), state, actions)
        flat = create_joint_transition(obs, rew, actions, nobs, done)
        assert set(k.rsplit("_", 1)[-1] for k in flat) >= {"obs", "act", "rew", "done"}
        assert flat["adversary_0_obs"].shape == (env.obs_dim(True), 1)
        assert flat["done"].shape == (1, 1)

    def test_missing_agent_returns_none(self):
        env = small_env()
        obs, state = env.reset(jax.random.PRNGKey(0))
        actions = {a: jnp.int32(1) for a in env.agents}
        nobs, state, rew, done, _ = env.step(jax.random.PRNGKey(1), state, actions)
        del rew["agent_0"]
        assert create_joint_transition(obs, rew, actions, nobs, done) is None

    def test_create_dataset_contract(self):
        """idx_state has the agent index in column 0 (jax_ver/trainer.py:23)."""
        env = small_env()
        codebook = {a: i for i, a in enumerate(env.agents)}
        obs, state = env.reset(jax.random.PRNGKey(0))
        actions = {a: jnp.int32(2) for a in env.agents}
        nobs, state, rew, done, _ = env.step(jax.random.PRNGKey(1), state, actions)
        flat = create_joint_transition(obs, rew, actions, nobs, done)
        # make a "batch" of 3 identical transitions
        batch = {k: jnp.stack([v] * 3) for k, v in flat.items()}
        idx_state, acts, rewards, next_states = create_dataset(batch, codebook)
        assert idx_state["adversary_2"].shape == (3, 1 + env.obs_dim(True))
        assert float(idx_state["adversary_2"][0, 0]) == 2.0
        assert acts["agent_0"].shape == (3,)
        assert rewards.shape == (3, env.num_agents)
        total_obs = sum(env.obs_dim(a.startswith("adversary")) for a in env.agents)
        assert next_states.shape == (3, total_obs)


class TestGroupedFormat:
    def test_group_env_step_and_batch(self):
        env = small_env()
        spec = env_spec(env)
        obs, state = env.reset(jax.random.PRNGKey(0))
        actions = {a: jnp.int32(i % 5) for i, a in enumerate(env.agents)}
        nobs, state, rew, done, _ = env.step(jax.random.PRNGKey(1), state, actions)
        tr = group_env_step(spec, obs, actions, rew, nobs, done)
        assert tr.obs[0].shape == (3, env.obs_dim(True))
        assert tr.obs[1].shape == (2, env.obs_dim(False))
        assert tr.rewards.shape == (5,)

        buf = ItemBuffer(max_length=16, min_length=1, sample_batch_size=4)
        st = buf.init(tr)
        for _ in range(3):
            st = buf.add(st, tr)
        sample = buf.sample(st, jax.random.PRNGKey(2))
        vb = vae_batch_from_grouped(spec, sample.experience)
        assert vb.inputs.obs[0].shape == (4, 3, env.obs_dim(True))
        assert vb.next_state.shape == (4, sum(spec.obs_dims))
        assert vb.rewards.shape == (4, 5)

    def test_grouped_matches_flat_dataset(self):
        """Grouped fast path and reference-parity flat path produce the same
        next_state / rewards tensors."""
        env = small_env()
        spec = env_spec(env)
        codebook = {a: i for i, a in enumerate(env.agents)}
        obs, state = env.reset(jax.random.PRNGKey(0))
        actions = {a: jnp.int32(i % 5) for i, a in enumerate(env.agents)}
        nobs, state, rew, done, _ = env.step(jax.random.PRNGKey(1), state, actions)

        tr = group_env_step(spec, obs, actions, rew, nobs, done)
        batched = jax.tree.map(lambda x: jnp.stack([x, x]), tr)
        vb = vae_batch_from_grouped(spec, batched)

        flat = create_joint_transition(obs, rew, actions, nobs, done)
        flat_b = {k: jnp.stack([v, v]) for k, v in flat.items()}
        _, _, rewards, next_states = create_dataset(flat_b, codebook)

        np.testing.assert_allclose(np.asarray(vb.next_state), np.asarray(next_states), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(vb.rewards), np.asarray(rewards), rtol=1e-6)
