"""Pure-JAX MPE simple_tag tests: shapes, physics sanity, rewards, wrappers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfvae_tpu.envs.mpe import MPEState, SimpleTagEnv, make
from mfvae_tpu.envs.spaces import Discrete, get_space_size
from mfvae_tpu.envs.wrappers import BatchedEnv, LogWrapper


@pytest.fixture(scope="module")
def env():
    return SimpleTagEnv(num_good_agents=2, num_adversaries=3, num_obs=2, max_steps=25)


class TestSimpleTag:
    def test_factory_and_metadata(self):
        e = make("MPE_simple_tag_v3", num_good_agents=2, num_adversaries=3, num_obs=2)
        assert e.agents[:3] == ("adversary_0", "adversary_1", "adversary_2")
        assert e.agents[3:] == ("agent_0", "agent_1")
        assert isinstance(e.action_space("agent_0"), Discrete)
        assert get_space_size(e.action_space("agent_0")) == 5
        with pytest.raises(ValueError):
            make("nope")

    def test_obs_dims_formula(self, env):
        # adv: 2+2+2*2+2*4+2*2 = 20 ; good: 2+2+4+8+2 = 18
        obs, state = env.reset(jax.random.PRNGKey(0))
        assert obs["adversary_0"].shape == (env.obs_dim(True),)
        assert obs["agent_0"].shape == (env.obs_dim(False),)
        assert env.obs_dim(True) == 20 and env.obs_dim(False) == 18

    def test_reference_population_dims(self):
        # 10 good / 30 adv / 20 obstacles: adversary sees 142 dims, good 140
        # (derived at runtime in the reference, jax_ver/main.py:101-107)
        e = SimpleTagEnv()
        assert e.obs_dim(True) == 142
        assert e.obs_dim(False) == 140

    def test_step_shapes_and_done(self, env):
        obs, state = env.reset(jax.random.PRNGKey(0))
        actions = {a: jnp.int32(0) for a in env.agents}
        obs2, state2, rew, done, info = env.step(jax.random.PRNGKey(1), state, actions)
        assert set(rew) == set(env.agents)
        assert not bool(done["__all__"])
        assert int(state2.step) == 1

    def test_truncation_at_max_steps(self, env):
        obs, state = env.reset(jax.random.PRNGKey(0))
        actions = {a: jnp.int32(0) for a in env.agents}

        def body(carry, _):
            st = carry
            _, st, _, done, _ = env.step(jax.random.PRNGKey(0), st, actions)
            return st, done["__all__"]

        st, dones = jax.lax.scan(body, state, None, length=25)
        d = np.asarray(dones)
        assert not d[:-1].any() and d[-1]

    def test_action_moves_agent(self, env):
        # Put one good agent far from everything, push +x, check x increases.
        state = MPEState(
            agent_pos=jnp.array([[5.0, 5.0], [6.0, 6.0], [7.0, 7.0], [0.0, 0.0], [-5.0, -5.0]]),
            agent_vel=jnp.zeros((5, 2)),
            landmark_pos=jnp.full((2, 2), 10.0),
            step=jnp.int32(0),
        )
        actions = jnp.array([0, 0, 0, 2, 0])  # agent_0 pushes +x
        obs, st, rew, done, _ = env.step_stacked(jax.random.PRNGKey(0), state, actions)
        assert float(st.agent_pos[3, 0]) > 0.0
        assert float(st.agent_pos[3, 1]) == 0.0
        # velocity capped at good max speed eventually
        for _ in range(50):
            _, st, _, _, _ = env.step_stacked(jax.random.PRNGKey(0), st, actions)
        assert float(jnp.linalg.norm(st.agent_vel[3])) <= 1.3 + 1e-5

    def test_collision_rewards(self, env):
        # adversary_0 on top of agent_0 -> all advs get +10, agent_0 gets -10
        state = MPEState(
            agent_pos=jnp.array([[0.0, 0.0], [5.0, 5.0], [6.0, 6.0], [0.05, 0.0], [0.5, -0.5]]),
            agent_vel=jnp.zeros((5, 2)),
            landmark_pos=jnp.full((2, 2), 10.0),
            step=jnp.int32(0),
        )
        r = np.asarray(env._rewards(state))
        assert r[0] == r[1] == r[2]  # team reward shared
        assert r[0] >= 10.0 - 1e-5
        assert r[3] <= -10.0 + 1e-5
        assert abs(r[4]) < 1e-5  # uncontacted good agent, inside bounds
        # step rewards are the post-integration state's rewards (MPE order:
        # integrate, then reward) — contact forces may separate the pair
        actions = jnp.zeros((5,), jnp.int32)
        _, st, rew, _, _ = env.step_stacked(jax.random.PRNGKey(0), state, actions)
        np.testing.assert_allclose(np.asarray(rew), np.asarray(env._rewards(st)), rtol=1e-6)

    def test_boundary_penalty(self, env):
        state = MPEState(
            agent_pos=jnp.array([[9.0, 9.0], [9.5, 9.0], [9.0, 9.5], [1.5, 0.0], [0.0, 0.0]]),
            agent_vel=jnp.zeros((5, 2)),
            landmark_pos=jnp.full((2, 2), -10.0),
            step=jnp.int32(0),
        )
        r = np.asarray(env._rewards(state))
        # bound(1.5) = exp(2*1.5-2) = e  (public MPE boundary formula)
        np.testing.assert_allclose(r[3], -np.exp(1.0), rtol=1e-4)
        assert r[4] == 0.0

    def test_obs_self_consistency(self, env):
        obs, state = env.reset(jax.random.PRNGKey(3))
        o = np.asarray(obs["adversary_1"])
        np.testing.assert_allclose(o[0:2], np.asarray(state.agent_vel[1]), rtol=1e-6)
        np.testing.assert_allclose(o[2:4], np.asarray(state.agent_pos[1]), rtol=1e-6)
        # first landmark relative position
        np.testing.assert_allclose(
            o[4:6],
            np.asarray(state.landmark_pos[0] - state.agent_pos[1]),
            rtol=1e-5,
        )

    def test_jit_rollout(self, env):
        @jax.jit
        def rollout(key):
            obs, state = env.reset_stacked(key)

            def body(carry, k):
                st = carry
                acts = jax.random.randint(k, (env.num_agents,), 0, 5)
                o, st, r, d, _ = env.step_stacked(k, st, acts)
                return st, r

            keys = jax.random.split(key, 10)
            st, rews = jax.lax.scan(body, state, keys)
            return rews

        rews = rollout(jax.random.PRNGKey(0))
        assert rews.shape == (10, env.num_agents)
        assert np.isfinite(np.asarray(rews)).all()


class TestSimpleSpread:
    def test_metadata_and_obs(self):
        env = make("MPE_simple_spread_v3", num_good_agents=3)
        assert env.agents == ("agent_0", "agent_1", "agent_2")
        assert env.obs_dim() == 18  # 2+2+6+4+4
        obs, st = env.reset(jax.random.PRNGKey(0))
        assert obs["agent_1"].shape == (18,)

    def test_shared_coverage_reward(self):
        env = make("MPE_simple_spread_v3", num_good_agents=3)
        obs, st = env.reset(jax.random.PRNGKey(0))
        acts = {a: jnp.int32(0) for a in env.agents}
        _, st2, rew, done, _ = env.step(jax.random.PRNGKey(1), st, acts)
        r = np.asarray([rew[a] for a in env.agents])
        # no collisions at reset-distance positions (usually) -> rewards all
        # contain the same shared coverage term; differences only via -1
        # collision penalties which are integers
        diffs = r - r.min()
        assert np.allclose(diffs, np.round(diffs), atol=1e-5)

    def test_perfect_coverage_is_zero(self):
        env = make("MPE_simple_spread_v3", num_good_agents=2)
        st = MPEState(
            agent_pos=jnp.array([[0.5, 0.5], [-0.5, -0.5]]),
            agent_vel=jnp.zeros((2, 2)),
            landmark_pos=jnp.array([[0.5, 0.5], [-0.5, -0.5]]),
            step=jnp.int32(0),
        )
        r = np.asarray(env._rewards(st))
        np.testing.assert_allclose(r, 0.0, atol=1e-6)

    def test_scan_rollout(self):
        env = make("MPE_simple_spread_v3", num_good_agents=3, max_steps=10)

        @jax.jit
        def rollout(key):
            obs, st = env.reset_stacked(key)

            def body(c, k):
                acts = jax.random.randint(k, (3,), 0, 5)
                o, c, r, d, _ = env.step_stacked(k, c, acts)
                return c, r

            return jax.lax.scan(body, st, jax.random.split(key, 10))[1]

        rews = rollout(jax.random.PRNGKey(0))
        assert rews.shape == (10, 3) and np.isfinite(np.asarray(rews)).all()


class TestContinuousActions:
    def test_tag_continuous_step(self):
        from dataclasses import replace

        env = replace(
            SimpleTagEnv(num_good_agents=1, num_adversaries=2, num_obs=1),
            discrete_actions=False,
        )
        assert env.action_space("agent_0").shape == (2,)
        obs, st = env.reset(jax.random.PRNGKey(0))
        acts = jnp.full((3, 2), 0.5)
        _, st2, rew, done, _ = env.step_stacked(jax.random.PRNGKey(1), st, acts)
        assert float(jnp.linalg.norm(st2.agent_vel)) > 0.0


class TestWrappers:
    def test_log_wrapper_accumulates(self):
        env = SimpleTagEnv(num_good_agents=1, num_adversaries=1, num_obs=1, max_steps=3)
        w = LogWrapper(env)
        obs, state = w.reset(jax.random.PRNGKey(0))
        actions = {a: jnp.int32(0) for a in env.agents}
        total = np.zeros(2)
        for i in range(3):
            obs, state, rew, done, info = w.step(jax.random.PRNGKey(i), state, actions)
            total += np.asarray([rew[a] for a in env.agents])
        assert bool(info["returned_episode"])
        np.testing.assert_allclose(np.asarray(info["returned_episode_returns"]), total, rtol=1e-5)
        assert int(info["returned_episode_lengths"]) == 3

    def test_batched_env_auto_reset(self):
        env = SimpleTagEnv(num_good_agents=1, num_adversaries=1, num_obs=1, max_steps=2)
        b = BatchedEnv(env, batch_size=4)
        obs, states = b.reset(jax.random.PRNGKey(0))
        assert obs["agent_0"].shape == (4, env.obs_dim(False))
        actions = {a: jnp.zeros((4,), jnp.int32) for a in env.agents}
        for i in range(2):
            obs, states, rew, done, info = b.step(jax.random.PRNGKey(i), states, actions)
        assert np.asarray(done["__all__"]).all()
        # auto-reset: step counters back to 0
        assert np.asarray(states.step == 0).all()
