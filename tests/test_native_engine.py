"""Native C++ MPE engine: build, batched stepping, and state-injection
equivalence against the (oracle-verified) JAX env.

The JAX env's physics are themselves checked step-for-step against an
independent per-entity-loop oracle of the published MPE dynamics
(tests/test_env_fidelity.py); proving the native engine equal to the JAX
env from identical states transitively grounds it in the same spec."""

import ctypes

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfvae_tpu.envs.mpe import MPEState, SimpleTagEnv
from mfvae_tpu.envs.native_engine import (
    NativeHostEnv,
    NativeSimpleTagEnv,
    native_engine_available,
)

pytestmark = pytest.mark.skipif(
    not native_engine_available(), reason="no native toolchain"
)

POP = dict(num_good_agents=2, num_adversaries=3, num_obs=3)


def make_pair(n_envs=1, max_steps=50, seed=3):
    jenv = SimpleTagEnv(max_steps=max_steps, **POP)
    nenv = NativeSimpleTagEnv(
        n_envs=n_envs, max_steps=max_steps, seed=seed, n_threads=1,
        auto_reset=False, **POP,
    )
    return jenv, nenv


def random_state(jenv, seed):
    rng = np.random.default_rng(seed)
    return MPEState(
        agent_pos=jnp.asarray(
            rng.uniform(-1, 1, (jenv.num_agents, 2)), jnp.float32
        ),
        agent_vel=jnp.asarray(
            rng.uniform(-0.5, 0.5, (jenv.num_agents, 2)), jnp.float32
        ),
        landmark_pos=jnp.asarray(
            rng.uniform(-0.9, 0.9, (jenv.num_obs, 2)), jnp.float32
        ),
        step=jnp.int32(0),
    )


class TestEquivalence:
    def test_trajectory_matches_jax_env(self):
        """20 steps from an injected state: obs, rewards, and state must
        track the JAX env within float32 tolerance."""
        jenv, nenv = make_pair()
        state = random_state(jenv, seed=0)
        nenv.set_state(0, state.agent_pos, state.agent_vel, state.landmark_pos, 0)

        step_j = jax.jit(jenv.step_stacked)
        rng = np.random.default_rng(1)
        key = jax.random.PRNGKey(0)
        for t in range(20):
            acts = rng.integers(0, 5, size=(jenv.num_agents,))
            jobs, state, jrew, jdone, _ = step_j(key, state, jnp.asarray(acts))
            nobs, nrew, ndone = nenv.step(np.asarray([acts], np.int32))
            adv, good = nenv.split_obs(nobs)
            np.testing.assert_allclose(
                adv[0], np.asarray(jobs.adversary), rtol=2e-4, atol=2e-5,
                err_msg=f"adversary obs diverged at step {t}",
            )
            np.testing.assert_allclose(
                good[0], np.asarray(jobs.good), rtol=2e-4, atol=2e-5,
                err_msg=f"good obs diverged at step {t}",
            )
            np.testing.assert_allclose(
                nrew[0], np.asarray(jrew), rtol=1e-5, atol=1e-5,
                err_msg=f"rewards diverged at step {t}",
            )
            assert bool(ndone[0]) == bool(np.asarray(jdone)[0])
            pos, vel, _, stp = nenv.get_state(0)
            np.testing.assert_allclose(
                pos, np.asarray(state.agent_pos), rtol=2e-4, atol=2e-5
            )
            np.testing.assert_allclose(
                vel, np.asarray(state.agent_vel), rtol=2e-4, atol=2e-5
            )
            assert stp == int(state.step)

    def test_contact_regime_matches(self):
        """Overlapping entities (deep penetration) exercise the softplus
        contact branch; forces must still agree."""
        jenv, nenv = make_pair()
        state = random_state(jenv, seed=2)
        # put adversary 0 on top of good agent 0, and agent 1 on a landmark
        pos = np.asarray(state.agent_pos).copy()
        pos[0] = pos[3] + np.float32(0.01)
        lmk = np.asarray(state.landmark_pos).copy()
        pos[4] = lmk[0] + np.float32(0.05)
        state = state._replace(agent_pos=jnp.asarray(pos))
        nenv.set_state(0, pos, state.agent_vel, lmk, 0)
        state = state._replace(landmark_pos=jnp.asarray(lmk))

        acts = np.zeros((jenv.num_agents,), np.int64)
        _, jstate, jrew, _, _ = jenv.step_stacked(
            jax.random.PRNGKey(0), state, jnp.asarray(acts)
        )
        _, nrew, _ = nenv.step(np.asarray([acts], np.int32))
        npos, nvel, _, _ = nenv.get_state(0)
        np.testing.assert_allclose(
            npos, np.asarray(jstate.agent_pos), rtol=1e-3, atol=1e-4
        )
        np.testing.assert_allclose(nrew[0], np.asarray(jrew), rtol=1e-5, atol=1e-5)

    def test_reference_population_one_step(self):
        """Full 40-agent reference population (10 good + 30 adv + 20
        landmarks, jax_ver/main.py:59-62)."""
        jenv = SimpleTagEnv()
        nenv = NativeSimpleTagEnv(
            n_envs=1, max_steps=1000, auto_reset=False, n_threads=1
        )
        state = random_state(jenv, seed=4)
        nenv.set_state(0, state.agent_pos, state.agent_vel, state.landmark_pos, 0)
        acts = np.random.default_rng(5).integers(0, 5, size=(jenv.num_agents,))
        jobs, jstate, jrew, _, _ = jax.jit(jenv.step_stacked)(
            jax.random.PRNGKey(0), state, jnp.asarray(acts)
        )
        nobs, nrew, _ = nenv.step(np.asarray([acts], np.int32))
        adv, good = nenv.split_obs(nobs)
        assert adv.shape == (1, 30, jenv.obs_dim(True))
        assert good.shape == (1, 10, jenv.obs_dim(False))
        np.testing.assert_allclose(
            adv[0], np.asarray(jobs.adversary), rtol=2e-4, atol=2e-5
        )
        np.testing.assert_allclose(
            good[0], np.asarray(jobs.good), rtol=2e-4, atol=2e-5
        )
        np.testing.assert_allclose(nrew[0], np.asarray(jrew), rtol=1e-5, atol=1e-5)


class TestBatching:
    def test_envs_are_independent(self):
        """Stepping env 1 must not perturb env 0's state."""
        _, nenv = make_pair(n_envs=2)
        jenv = SimpleTagEnv(max_steps=50, **POP)
        s0, s1 = random_state(jenv, 10), random_state(jenv, 11)
        nenv.set_state(0, s0.agent_pos, s0.agent_vel, s0.landmark_pos, 0)
        nenv.set_state(1, s1.agent_pos, s1.agent_vel, s1.landmark_pos, 0)
        before = nenv.get_state(0)
        # act only in env 1 (env 0 gets no-ops, but physics still runs —
        # so compare env0 against a single-env run instead)
        acts = np.stack([
            np.zeros((jenv.num_agents,), np.int32),
            np.full((jenv.num_agents,), 2, np.int32),
        ])
        nenv.step(acts)
        solo = NativeSimpleTagEnv(
            n_envs=1, max_steps=50, auto_reset=False, n_threads=1, **POP
        )
        solo.set_state(0, *before[:3], before[3])
        solo.step(np.zeros((1, jenv.num_agents), np.int32))
        np.testing.assert_array_equal(nenv.get_state(0)[0], solo.get_state(0)[0])

    def test_threaded_matches_single_threaded(self):
        jenv = SimpleTagEnv(max_steps=50, **POP)
        a = NativeSimpleTagEnv(n_envs=8, max_steps=50, n_threads=1,
                               auto_reset=False, **POP)
        b = NativeSimpleTagEnv(n_envs=8, max_steps=50, n_threads=4,
                               auto_reset=False, **POP)
        for k in range(8):
            s = random_state(jenv, 20 + k)
            for env in (a, b):
                env.set_state(k, s.agent_pos, s.agent_vel, s.landmark_pos, 0)
        acts = np.random.default_rng(6).integers(0, 5, size=(8, jenv.num_agents))
        oa, ra, da = a.step(acts)
        ob, rb, db = b.step(acts)
        np.testing.assert_array_equal(oa, ob)
        np.testing.assert_array_equal(ra, rb)
        np.testing.assert_array_equal(da, db)

    def test_auto_reset(self):
        nenv = NativeSimpleTagEnv(
            n_envs=2, max_steps=3, auto_reset=True, n_threads=1, **POP
        )
        nenv.reset()
        acts = np.ones((2, nenv.num_agents), np.int32)
        for _ in range(2):
            _, _, done = nenv.step(acts)
            assert not done.any()
        _, _, done = nenv.step(acts)
        assert done.all()
        # after auto-reset the state is a fresh episode
        assert nenv.get_state(0)[3] == 0
        assert np.allclose(nenv.get_state(0)[1], 0.0)  # velocities zeroed


class TestContinuousActions:
    def test_tag_continuous_matches_jax(self):
        """discrete_actions=False path: float [A, 2] forces, same
        trajectory as the JAX env."""
        jenv = SimpleTagEnv(max_steps=50, discrete_actions=False, **POP)
        nenv = NativeSimpleTagEnv(
            n_envs=1, max_steps=50, n_threads=1, auto_reset=False, **POP
        )
        state = random_state(jenv, seed=30)
        nenv.set_state(0, state.agent_pos, state.agent_vel, state.landmark_pos, 0)
        step_j = jax.jit(jenv.step_stacked)
        rng = np.random.default_rng(31)
        for t in range(10):
            acts = rng.uniform(-1, 1, size=(jenv.num_agents, 2)).astype(np.float32)
            jobs, state, jrew, _, _ = step_j(
                jax.random.PRNGKey(0), state, jnp.asarray(acts)
            )
            nobs, nrew, _ = nenv.step_continuous(acts[None])
            adv, good = nenv.split_obs(nobs)
            np.testing.assert_allclose(
                adv[0], np.asarray(jobs.adversary), rtol=2e-4, atol=2e-5,
                err_msg=f"obs diverged at step {t}",
            )
            np.testing.assert_allclose(nrew[0], np.asarray(jrew), rtol=1e-5, atol=1e-5)

    def test_spread_continuous_matches_jax(self):
        from mfvae_tpu.envs.mpe import SimpleSpreadEnv
        from mfvae_tpu.envs.native_engine import NativeSimpleSpreadEnv

        jenv = SimpleSpreadEnv(num_agents=3, max_steps=50, discrete_actions=False)
        nenv = NativeSimpleSpreadEnv(
            n_envs=1, num_agents=3, max_steps=50, n_threads=1, auto_reset=False
        )
        rng = np.random.default_rng(32)
        state = MPEState(
            agent_pos=jnp.asarray(rng.uniform(-1, 1, (3, 2)), jnp.float32),
            agent_vel=jnp.zeros((3, 2), jnp.float32),
            landmark_pos=jnp.asarray(rng.uniform(-0.9, 0.9, (3, 2)), jnp.float32),
            step=jnp.int32(0),
        )
        nenv.set_state(0, state.agent_pos, state.agent_vel, state.landmark_pos, 0)
        step_j = jax.jit(jenv.step_stacked)
        for t in range(10):
            acts = rng.uniform(-1, 1, size=(3, 2)).astype(np.float32)
            jobs, state, jrew, _, _ = step_j(
                jax.random.PRNGKey(0), state, jnp.asarray(acts)
            )
            nobs, nrew, _ = nenv.step_continuous(acts[None])
            np.testing.assert_allclose(
                nenv.split_obs(nobs)[0], np.asarray(jobs.agent),
                rtol=2e-4, atol=2e-5,
            )
            np.testing.assert_allclose(nrew[0], np.asarray(jrew), rtol=1e-4, atol=1e-5)

    def test_world_comm_rejects_continuous(self):
        from mfvae_tpu.envs.native_engine import NativeSimpleWorldCommEnv

        nenv = NativeSimpleWorldCommEnv(n_envs=1, n_threads=1)
        with pytest.raises(ValueError, match="unsupported"):
            NativeSimpleTagEnv.step_continuous(
                nenv, np.zeros((1, nenv.num_agents, 2), np.float32)
            )


class TestSpreadEquivalence:
    def test_trajectory_matches_jax_env(self):
        from mfvae_tpu.envs.mpe import SimpleSpreadEnv
        from mfvae_tpu.envs.native_engine import NativeSimpleSpreadEnv

        jenv = SimpleSpreadEnv(num_agents=3, max_steps=25)
        nenv = NativeSimpleSpreadEnv(
            n_envs=1, num_agents=3, max_steps=25, n_threads=1, auto_reset=False
        )
        rng = np.random.default_rng(0)
        state = MPEState(
            agent_pos=jnp.asarray(rng.uniform(-1, 1, (3, 2)), jnp.float32),
            agent_vel=jnp.asarray(rng.uniform(-0.5, 0.5, (3, 2)), jnp.float32),
            landmark_pos=jnp.asarray(rng.uniform(-0.9, 0.9, (3, 2)), jnp.float32),
            step=jnp.int32(0),
        )
        nenv.set_state(0, state.agent_pos, state.agent_vel, state.landmark_pos, 0)
        step_j = jax.jit(jenv.step_stacked)
        for t in range(15):
            acts = rng.integers(0, 5, size=(3,))
            jobs, state, jrew, jdone, _ = step_j(
                jax.random.PRNGKey(0), state, jnp.asarray(acts)
            )
            nobs, nrew, ndone = nenv.step(np.asarray([acts], np.int32))
            np.testing.assert_allclose(
                nenv.split_obs(nobs)[0], np.asarray(jobs.agent),
                rtol=2e-4, atol=2e-5, err_msg=f"obs diverged at step {t}",
            )
            np.testing.assert_allclose(
                nrew[0], np.asarray(jrew), rtol=1e-4, atol=1e-5,
                err_msg=f"rewards diverged at step {t}",
            )
            assert bool(ndone[0]) == bool(np.asarray(jdone)[0])

    def test_shared_coverage_reward_closed_form(self):
        """With well-separated agents (no contact, no collisions) every
        agent receives exactly -sum_l min_a dist(l, a) from the post-step
        state."""
        from mfvae_tpu.envs.native_engine import NativeSimpleSpreadEnv

        nenv = NativeSimpleSpreadEnv(
            n_envs=1, num_agents=3, max_steps=25, n_threads=1, auto_reset=False
        )
        pos = np.array([[-0.8, -0.8], [0.0, 0.0], [0.8, 0.8]], np.float32)
        vel = np.zeros((3, 2), np.float32)
        lmk = np.array([[0.0, 0.1], [0.5, 0.5], [-0.5, -0.5]], np.float32)
        nenv.set_state(0, pos, vel, lmk, 0)
        _, rew, _ = nenv.step(np.zeros((1, 3), np.int32))
        npos = nenv.get_state(0)[0]
        d = np.linalg.norm(lmk[:, None, :] - npos[None, :, :], axis=-1)
        expected = -d.min(axis=1).sum()
        np.testing.assert_allclose(rew[0], np.full(3, expected), rtol=1e-5)


class TestWorldCommEquivalence:
    def test_trajectory_matches_jax_env(self):
        """Default published population (4 adversaries incl. leader, 2 good,
        1 obstacle + 2 food + 2 forests): 15 steps from an injected state
        must match the JAX env — including forest-visibility masking and
        the leader channel."""
        from mfvae_tpu.envs.mpe import SimpleWorldCommEnv, WorldCommState
        from mfvae_tpu.envs.native_engine import NativeSimpleWorldCommEnv

        jenv = SimpleWorldCommEnv()
        nenv = NativeSimpleWorldCommEnv(
            n_envs=1, max_steps=25, n_threads=1, auto_reset=False
        )
        assert nenv.obs_dim_lead == jenv.obs_dim("leadadversary_0") == 34
        assert nenv.obs_dim_adv == jenv.obs_dim("adversary_0") == 34
        assert nenv.obs_dim_good == jenv.obs_dim("agent_0") == 28

        rng = np.random.default_rng(0)
        state = WorldCommState(
            agent_pos=jnp.asarray(rng.uniform(-1, 1, (6, 2)), jnp.float32),
            agent_vel=jnp.asarray(rng.uniform(-0.5, 0.5, (6, 2)), jnp.float32),
            landmark_pos=jnp.asarray(rng.uniform(-0.9, 0.9, (5, 2)), jnp.float32),
            leader_comm=jnp.zeros((4,), jnp.float32),
            step=jnp.int32(0),
        )
        nenv.set_state(
            0, state.agent_pos, state.agent_vel, state.landmark_pos,
            comm=state.leader_comm, step=0,
        )
        step_j = jax.jit(jenv.step_stacked)
        for t in range(15):
            acts = np.concatenate(
                [rng.integers(0, 20, size=(1,)), rng.integers(0, 5, size=(5,))]
            )
            jobs, state, jrew, jdone, _ = step_j(
                jax.random.PRNGKey(0), state, jnp.asarray(acts)
            )
            nobs, nrew, ndone = nenv.step(np.asarray([acts], np.int32))
            lead, adv, good = nenv.split_obs(nobs)
            np.testing.assert_allclose(
                lead[0], np.asarray(jobs.lead), rtol=2e-4, atol=2e-5,
                err_msg=f"leader obs diverged at step {t}",
            )
            np.testing.assert_allclose(
                adv[0], np.asarray(jobs.adversary), rtol=2e-4, atol=2e-5,
                err_msg=f"adversary obs diverged at step {t}",
            )
            np.testing.assert_allclose(
                good[0], np.asarray(jobs.good), rtol=2e-4, atol=2e-5,
                err_msg=f"good obs diverged at step {t}",
            )
            np.testing.assert_allclose(
                nrew[0], np.asarray(jrew), rtol=1e-4, atol=1e-5,
                err_msg=f"rewards diverged at step {t}",
            )
            assert bool(ndone[0]) == bool(np.asarray(jdone)[0])
            # the leader channel follows action0 // 5 in both
            comm = nenv.get_state(0)[4]
            np.testing.assert_array_equal(comm, np.asarray(state.leader_comm))

    def test_forest_hides_prey(self):
        """A prey inside a forest is invisible to a non-leader adversary
        outside it (masked zeros in other_rel), but the leader still sees
        it — the scenario's defining mechanic."""
        from mfvae_tpu.envs.native_engine import NativeSimpleWorldCommEnv

        nenv = NativeSimpleWorldCommEnv(
            n_envs=1, max_steps=50, n_threads=1, auto_reset=False
        )
        # landmarks: [obstacle, food, food, forest, forest]
        lmk = np.array(
            [[0.9, 0.9], [-0.9, 0.9], [0.9, -0.9], [0.0, 0.0], [-0.9, -0.9]],
            np.float32,
        )
        # prey agent_0 (index 4) sits in forest 0 at origin; all others
        # far outside any forest
        pos = np.array(
            [[0.8, 0.8], [0.7, -0.7], [-0.7, 0.7], [0.8, -0.8],
             [0.0, 0.0], [-0.6, 0.6]],
            np.float32,
        )
        vel = np.zeros((6, 2), np.float32)
        nenv.set_state(0, pos, vel, lmk, comm=np.zeros(4, np.float32), step=0)
        obs = nenv.observe()
        lead, adv, good = nenv.split_obs(obs)
        # other_rel block starts after [vel(2), pos(2), entity_rel(10)]
        # and runs over the 5 other agents in order; prey agent_0 is the
        # 5th agent overall -> for observers with smaller index its slot
        # is index 3 of the "others" (skip self among 0..3? adversary_0 is
        # agent 1: others = [0,2,3,4,5] -> prey at slot 3)
        o_adv0 = adv[0, 0]
        prey_slot = 14 + 2 * 3
        assert np.allclose(o_adv0[prey_slot:prey_slot + 2], 0.0)  # hidden
        o_lead = lead[0, 0]
        lead_prey = o_lead[14 + 2 * 3:14 + 2 * 3 + 2]
        np.testing.assert_allclose(
            lead_prey, pos[4] - pos[0], rtol=1e-5
        )  # leader sees through


class TestGuards:
    def test_out_of_range_actions_rejected(self):
        _, nenv = make_pair()
        bad = np.full((1, nenv.num_agents), 5, np.int32)
        with pytest.raises(ValueError, match=r"\[0, 5\)"):
            nenv.step(bad)
        with pytest.raises(ValueError, match=r"\[0, 5\)"):
            nenv.step(-np.ones((1, nenv.num_agents), np.int32))

    def test_returned_buffers_are_reused(self):
        """The documented zero-copy contract: step output aliases internal
        storage overwritten by the next call."""
        _, nenv = make_pair()
        obs1, _, _ = nenv.step(np.ones((1, nenv.num_agents), np.int32))
        snapshot = obs1.copy()
        nenv.step(np.full((1, nenv.num_agents), 2, np.int32))
        assert not np.array_equal(obs1, snapshot)  # view moved under us


class TestHostSurface:
    def test_reset_seed_reproduces_episode(self):
        env = NativeHostEnv(
            num_good=2, num_adversaries=3, num_obstacles=3, max_cycles=50
        )
        obs_a, _ = env.reset(seed=7)
        acts = {a: 2 for a in env.agents}
        step_a, _, _, _, _ = env.step(acts)
        obs_b, _ = env.reset(seed=7)
        step_b, _, _, _, _ = env.step(acts)
        for a in env.agents:
            np.testing.assert_array_equal(obs_a[a], obs_b[a])
            np.testing.assert_array_equal(step_a[a], step_b[a])

    def test_pettingzoo_parallel_surface(self):
        env = NativeHostEnv(
            num_good=2, num_adversaries=3, num_obstacles=3, max_cycles=5
        )
        obs, infos = env.reset(seed=0)
        assert set(obs) == set(env.agents)
        assert obs["adversary_0"].shape == (env.observation_space("adversary_0").shape[0],)
        acts = {a: 1 for a in env.agents}
        for t in range(5):
            obs, rew, terms, truncs, infos = env.step(acts)
        assert all(truncs.values())  # max_cycles reached
        assert not any(terms.values())
        assert isinstance(rew["agent_0"], float)

    def test_host_buffer_round_trip(self):
        from mfvae_tpu.envs.host_adapter import MultiAgentHostBuffer

        env = NativeHostEnv(
            num_good=2, num_adversaries=3, num_obstacles=3, max_cycles=100
        )
        buf = MultiAgentHostBuffer(env, max_size=64, batch_size=4)
        obs, _ = env.reset()
        rng = np.random.default_rng(0)
        for _ in range(8):
            acts = {a: int(rng.integers(0, 5)) for a in env.agents}
            nobs, rew, terms, truncs, _ = env.step(acts)
            buf.add(obs, acts, rew, nobs, terms, truncs)
            obs = nobs
        batch = buf.sample()
        assert batch["adversary_0_observations"].shape == (4, env._env.obs_dim_adv)
        assert batch["mask"].shape == (4, 1)


class TestAdversaryEquivalence:
    """Native simple_adversary vs the oracle-verified JAX env:
    state-injection (incl. the goal index) trajectory equivalence for both
    action modes, plus the host adapter surface."""

    def _pair(self, n_good=3, discrete=True):
        from mfvae_tpu.envs.mpe import AdversaryState, SimpleAdversaryEnv
        from mfvae_tpu.envs.native_engine import NativeSimpleAdversaryEnv

        jenv = SimpleAdversaryEnv(
            num_good_agents=n_good, max_steps=50, discrete_actions=discrete
        )
        nenv = NativeSimpleAdversaryEnv(
            n_envs=1, num_good_agents=n_good, max_steps=50, n_threads=1,
            auto_reset=False,
        )
        rng = np.random.default_rng(9)
        goal = 1
        state = AdversaryState(
            agent_pos=jnp.asarray(
                rng.uniform(-1, 1, (n_good + 1, 2)), jnp.float32
            ),
            agent_vel=jnp.asarray(
                rng.uniform(-0.5, 0.5, (n_good + 1, 2)), jnp.float32
            ),
            landmark_pos=jnp.asarray(
                rng.uniform(-0.9, 0.9, (n_good, 2)), jnp.float32
            ),
            goal=jnp.int32(goal),
            step=jnp.int32(0),
        )
        nenv.set_state(0, state.agent_pos, state.agent_vel, state.landmark_pos, 0)
        nenv.set_goal(goal, env=0)
        assert nenv.get_goal(0) == goal
        return jenv, nenv, state, rng

    def test_trajectory_matches_jax_env(self):
        jenv, nenv, state, rng = self._pair()
        step_j = jax.jit(jenv.step_stacked)
        for t in range(15):
            acts = rng.integers(0, 5, size=(4,))
            jobs, state, jrew, jdone, _ = step_j(
                jax.random.PRNGKey(0), state, jnp.asarray(acts)
            )
            nobs, nrew, ndone = nenv.step(acts[None].astype(np.int32))
            adv, good = nenv.split_obs(nobs)
            np.testing.assert_allclose(
                adv[0], np.asarray(jobs.adversary), rtol=2e-4, atol=2e-5
            )
            np.testing.assert_allclose(
                good[0], np.asarray(jobs.good), rtol=2e-4, atol=2e-5
            )
            np.testing.assert_allclose(
                nrew[0], np.asarray(jrew), rtol=1e-4, atol=1e-5
            )
            assert bool(ndone[0]) == bool(np.asarray(jdone)[0])

    def test_continuous_matches_jax_env(self):
        jenv, nenv, state, rng = self._pair(discrete=False)
        step_j = jax.jit(jenv.step_stacked)
        for t in range(10):
            acts = rng.uniform(-1, 1, size=(4, 2)).astype(np.float32)
            jobs, state, jrew, _, _ = step_j(
                jax.random.PRNGKey(0), state, jnp.asarray(acts)
            )
            nobs, nrew, _ = nenv.step_continuous(acts[None])
            adv, good = nenv.split_obs(nobs)
            np.testing.assert_allclose(
                adv[0], np.asarray(jobs.adversary), rtol=2e-4, atol=2e-5
            )
            np.testing.assert_allclose(
                good[0], np.asarray(jobs.good), rtol=2e-4, atol=2e-5
            )
            np.testing.assert_allclose(
                nrew[0], np.asarray(jrew), rtol=1e-4, atol=1e-5
            )

    def test_host_adapter_surface(self):
        from mfvae_tpu.envs.native_engine import NativeAdversaryHostEnv

        env = NativeAdversaryHostEnv(num_good=2, max_cycles=8)
        assert env.agents == ["adversary_0", "agent_0", "agent_1"]
        obs, _ = env.reset(seed=0)
        assert obs["adversary_0"].shape == (8,)
        assert obs["agent_0"].shape == (10,)
        acts = {a: 1 for a in env.agents}
        obs2, rew, terms, truncs, _ = env.step(acts)
        assert all(np.isfinite(v) for v in rew.values())
        # the shared good reward is identical across good agents
        assert rew["agent_0"] == rew["agent_1"]

    def test_goal_bounds_checked_and_state_roundtrip(self):
        from mfvae_tpu.envs.native_engine import NativeSimpleAdversaryEnv

        env = NativeSimpleAdversaryEnv(n_envs=1, num_good_agents=2, n_threads=1)
        with pytest.raises(ValueError, match="goal"):
            env.set_goal(2)
        with pytest.raises(ValueError, match="goal"):
            env.set_goal(-1)
        env.reset()
        pos, vel, lmk, step, goal = env.get_state(0)
        assert 0 <= goal < 2
        # full state round-trip INCLUDING the goal
        env.set_state(0, pos + 0.1, vel, lmk, step, goal=1 - goal)
        assert env.get_goal(0) == 1 - goal
