"""Scripted collection policies (envs/policies.py): the data lever beyond
the reference's uniform-random rollouts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfvae_tpu.envs.mpe import AdversaryState, MPEState, SimpleAdversaryEnv, SimpleTagEnv
from mfvae_tpu.envs.policies import make_collect_policy as _raw_make_policy
from mfvae_tpu.models.mavae import AgentSpec
from mfvae_tpu.training.trainer import make_action_sampler


def make_collect_policy(env, spec, name, epsilon):
    sample_fn, _ = make_action_sampler(env, spec)
    return _raw_make_policy(env, spec, name, epsilon, sample_fn)

from tests.test_training import tiny_cfg


def tag_spec(env):
    return AgentSpec.from_dicts(
        env.agents,
        {a: env.obs_dim(a) for a in env.agents},
        {a: 5 for a in env.agents},
    )


class TestPursuitPolicy:
    def test_chase_and_evade_directions(self):
        """Hand-placed state: the adversary at origin must move +x toward
        the prey at (1, 0.2); the prey must move +x away from it."""
        env = SimpleTagEnv(num_adversaries=1, num_good_agents=1, num_obs=1,
                           max_steps=8)
        policy = make_collect_policy(env, tag_spec(env), "pursuit", epsilon=0.0)
        state = MPEState(
            agent_pos=jnp.asarray([[0.0, 0.0], [1.0, 0.2]]),
            agent_vel=jnp.zeros((2, 2)),
            landmark_pos=jnp.asarray([[5.0, 5.0]]),
            step=jnp.int32(0),
        )
        actions = policy(state, jax.random.PRNGKey(0))
        assert int(actions[0]) == 2  # adversary: +x toward prey
        assert int(actions[1]) == 2  # prey: +x away from adversary

    def test_continuous_points_at_prey(self):
        env = SimpleTagEnv(num_adversaries=1, num_good_agents=1, num_obs=1,
                           max_steps=8, discrete_actions=False)
        spec = AgentSpec.from_dicts(
            env.agents, {a: env.obs_dim(a) for a in env.agents},
            {a: 2 for a in env.agents},
        )
        policy = make_collect_policy(env, spec, "pursuit", epsilon=0.0)
        state = MPEState(
            agent_pos=jnp.asarray([[0.0, 0.0], [0.6, 0.8]]),
            agent_vel=jnp.zeros((2, 2)),
            landmark_pos=jnp.asarray([[5.0, 5.0]]),
            step=jnp.int32(0),
        )
        actions = policy(state, jax.random.PRNGKey(0))
        np.testing.assert_allclose(
            np.asarray(actions[0]), [0.6, 0.8], atol=1e-5
        )  # unit vector toward prey
        np.testing.assert_allclose(
            np.asarray(actions[1]), [0.6, 0.8], atol=1e-5
        )  # fleeing along the same ray

    def test_adversary_scenario_goal_seek(self):
        """Good agents head for the goal; the adversary (goal-blind)
        chases the nearest good agent."""
        env = SimpleAdversaryEnv(num_good_agents=2, max_steps=8)
        spec = AgentSpec.from_dicts(
            env.agents, {a: env.obs_dim(a) for a in env.agents},
            {a: 5 for a in env.agents},
        )
        policy = make_collect_policy(env, spec, "pursuit", epsilon=0.0)
        state = AdversaryState(
            agent_pos=jnp.asarray([[0.0, 0.0], [0.5, 0.0], [-0.5, 0.0]]),
            agent_vel=jnp.zeros((3, 2)),
            landmark_pos=jnp.asarray([[9.0, 9.0], [0.5, 1.0]]),
            goal=jnp.int32(1),
            step=jnp.int32(0),
        )
        actions = policy(state, jax.random.PRNGKey(0))
        assert int(actions[0]) == 2  # adversary: +x toward agent_0 (nearest)
        assert int(actions[1]) == 4  # agent_0: +y toward the goal (0.5, 1.0)
        assert int(actions[2]) == 2  # agent_1: +x (goal is at dx=1.0, dy=1.0 -> x ties broken by argmax=first... )

    def test_pursuit_produces_more_contacts_than_random(self):
        """The point of the lever: rolled out, pursuit yields contact
        events (nonzero tag rewards) far more often than random."""
        env = SimpleTagEnv(num_adversaries=3, num_good_agents=1, num_obs=1,
                           max_steps=200)
        spec = tag_spec(env)
        policy = make_collect_policy(env, spec, "pursuit", epsilon=0.05)

        def rollout(policy_fn, key):
            obs, state = env.reset_stacked(key)

            def body(c, k):
                s = c
                acts = policy_fn(s, k)
                _, s, rew, _, _ = env.step_stacked(k, s, acts)
                # adversary reward is positive ONLY on a tag (contact);
                # good-agent rewards also carry boundary penalties, so
                # they are not a contact proxy
                return s, jnp.any(rew[:3] > 0.0)

            _, hits = jax.lax.scan(
                body, state, jax.random.split(key, 200)
            )
            return jnp.mean(hits.astype(jnp.float32))

        def random_policy(s, k):
            return jax.random.randint(k, (4,), 0, 5)

        p_jit = jax.jit(lambda k: rollout(policy, k))
        r_jit = jax.jit(lambda k: rollout(random_policy, k))
        hit_pursuit = float(np.mean(
            [float(p_jit(jax.random.PRNGKey(s))) for s in range(4)]
        ))
        hit_random = float(np.mean(
            [float(r_jit(jax.random.PRNGKey(s))) for s in range(4)]
        ))
        assert hit_pursuit > max(2 * hit_random, 0.01), (
            hit_pursuit, hit_random,
        )

    def test_unknown_policy_and_unsupported_env_rejected(self):
        env = SimpleTagEnv(num_adversaries=1, num_good_agents=1, num_obs=1)
        with pytest.raises(ValueError, match="unknown collect_policy"):
            make_collect_policy(env, tag_spec(env), "nonsense", 0.1)
        from mfvae_tpu.envs.mpe import SimpleSpreadEnv

        senv = SimpleSpreadEnv(num_agents=2)
        sspec = AgentSpec.from_dicts(
            senv.agents, {a: senv.obs_dim() for a in senv.agents},
            {a: 5 for a in senv.agents},
        )
        with pytest.raises(ValueError, match="not defined"):
            make_collect_policy(senv, sspec, "pursuit", 0.1)


class TestPolicyDrivenTraining:
    def test_fused_epoch_trains_with_pursuit(self, tmp_path):
        from mfvae_tpu.training.experiment import Experiment

        cfg = tiny_cfg(tmp_path, epoch_num=2)
        cfg.train.collect_policy = "pursuit"
        cfg.train.collect_epsilon = 0.2
        exp = Experiment(cfg).setup()
        result = exp.run()
        assert np.isfinite(result["loss_train"])

    def test_batched_epoch_trains_with_pursuit(self, tmp_path):
        from mfvae_tpu.training.experiment import Experiment

        cfg = tiny_cfg(tmp_path, n_envs=2, epoch_num=2)
        cfg.train.collect_policy = "pursuit"
        exp = Experiment(cfg).setup()
        result = exp.run()
        assert np.isfinite(result["loss_train"])

    def test_continuous_pursuit_trains(self, tmp_path):
        from mfvae_tpu.training.experiment import Experiment

        cfg = tiny_cfg(tmp_path, epoch_num=2)
        cfg.env.discrete_actions = False
        cfg.model.discrete_act = False
        cfg.train.collect_policy = "pursuit"
        exp = Experiment(cfg).setup()
        result = exp.run()
        assert np.isfinite(result["loss_train"])

    def test_host_experiment_trains_with_pursuit(self, tmp_path):
        """The host collectors run the numpy pursuit mirror: end-to-end
        host training with collect_policy=pursuit."""
        from mfvae_tpu.training.host_experiment import HostExperiment

        cfg = tiny_cfg(tmp_path, epoch_num=2, sample_num=6, train_num=2)
        cfg.buffer.min_size = 4
        cfg.buffer.batch_size = 4
        cfg.train.collect_policy = "pursuit"
        cfg.train.collect_epsilon = 0.2
        exp = HostExperiment(cfg).setup()
        result = exp.run()
        assert np.isfinite(result["loss_train"])

    def test_host_batched_pursuit(self, tmp_path):
        from mfvae_tpu.envs.native_engine import native_engine_available
        from mfvae_tpu.training.host_experiment import HostExperiment

        if not native_engine_available():
            pytest.skip("no native toolchain")
        cfg = tiny_cfg(tmp_path, epoch_num=2, sample_num=8, train_num=2)
        cfg.env.n_host_envs = 4
        cfg.buffer.min_size = 4
        cfg.buffer.batch_size = 4
        cfg.train.collect_policy = "pursuit"
        exp = HostExperiment(cfg).setup()
        from mfvae_tpu.envs.host_adapter import NativeBatchedCollector

        assert isinstance(exp.collector, NativeBatchedCollector)
        assert exp.collector._pursuit_kind == "tag"
        result = exp.run()
        assert np.isfinite(result["loss_train"])

    def test_host_pursuit_unsupported_env_rejected(self, tmp_path):
        """Scenarios without a scripted policy raise a clear error at
        collector construction instead of silently collecting random."""
        from mfvae_tpu.training.host_experiment import HostExperiment

        cfg = tiny_cfg(tmp_path, epoch_num=1, sample_num=4, train_num=1)
        cfg.env.name = "MPE_simple_spread_v3"
        cfg.env.num_good_agents = 3
        cfg.buffer.min_size = 2
        cfg.buffer.batch_size = 2
        cfg.train.collect_policy = "pursuit"
        with pytest.raises(ValueError, match="no host pursuit policy"):
            HostExperiment(cfg)

    def test_host_policy_matches_jit_policy(self):
        """The numpy mirror must agree with the compiled policy at
        epsilon=0 on a shared state (both backends collect the same
        distribution)."""
        from mfvae_tpu.envs.policies import host_pursuit_actions

        env = SimpleTagEnv(num_adversaries=3, num_good_agents=2, num_obs=1,
                           max_steps=8)
        spec = tag_spec(env)
        jit_policy = make_collect_policy(env, spec, "pursuit", epsilon=0.0)
        rng = np.random.default_rng(4)
        pos = rng.uniform(-1.2, 1.2, size=(5, 2)).astype(np.float32)
        state = MPEState(
            agent_pos=jnp.asarray(pos),
            agent_vel=jnp.zeros((5, 2)),
            landmark_pos=jnp.asarray(rng.uniform(-0.9, 0.9, (1, 2)),
                                     jnp.float32),
            step=jnp.int32(0),
        )
        want = np.asarray(jit_policy(state, jax.random.PRNGKey(0)))
        got = host_pursuit_actions(
            "tag", pos, 3, np.random.default_rng(0), epsilon=0.0,
            discrete=True,
        )
        np.testing.assert_array_equal(got, want)

    def test_epsilon_range_validated(self):
        from mfvae_tpu.config import ExperimentConfig

        cfg = ExperimentConfig()
        cfg.train.collect_epsilon = 10.0
        with pytest.raises(ValueError, match="collect_epsilon"):
            cfg.validate()

    def test_host_policy_matches_jit_policy_adversary(self):
        """Same agreement check for the adversary kind (goal-seek +
        goal-blind chase), including the batched [K, A, 2] form."""
        from mfvae_tpu.envs.policies import host_pursuit_actions

        env = SimpleAdversaryEnv(num_good_agents=3, max_steps=8)
        spec = AgentSpec.from_dicts(
            env.agents, {a: env.obs_dim(a) for a in env.agents},
            {a: 5 for a in env.agents},
        )
        jit_policy = make_collect_policy(env, spec, "pursuit", epsilon=0.0)
        rng = np.random.default_rng(11)
        K = 3
        pos = rng.uniform(-1.0, 1.0, size=(K, 4, 2)).astype(np.float32)
        lmk = rng.uniform(-0.9, 0.9, size=(K, 3, 2)).astype(np.float32)
        goals = np.array([0, 2, 1])
        want = []
        for k in range(K):
            state = AdversaryState(
                agent_pos=jnp.asarray(pos[k]),
                agent_vel=jnp.zeros((4, 2)),
                landmark_pos=jnp.asarray(lmk[k]),
                goal=jnp.int32(goals[k]),
                step=jnp.int32(0),
            )
            want.append(np.asarray(jit_policy(state, jax.random.PRNGKey(k))))
        got = host_pursuit_actions(
            "adversary", pos, 1, np.random.default_rng(0), epsilon=0.0,
            discrete=True, goal_pos=lmk[np.arange(K), goals],
        )
        np.testing.assert_array_equal(got, np.stack(want))


class TestEpisodeMixPolicy:
    """Trajectory-level mixing (collect_policy='episode_mix'): whole
    episodes alternate between scripted pursuit and uniform random —
    measured motivation in PARITY.md round 4 (action-level epsilon mixing
    never recovers the random state distribution)."""

    def _env_spec(self):
        env = SimpleTagEnv(num_adversaries=2, num_good_agents=1, num_obs=1,
                           max_steps=8)
        spec = AgentSpec.from_dicts(
            env.agents, {a: env.obs_dim(a) for a in env.agents},
            {a: 5 for a in env.agents},
        )
        return env, spec

    def _state(self):
        return MPEState(
            agent_pos=jnp.asarray([[0.0, 0.0], [0.5, -0.3], [1.0, 0.2]]),
            agent_vel=jnp.zeros((3, 2)),
            landmark_pos=jnp.asarray([[5.0, 5.0]]),
            step=jnp.int32(0),
        )

    def test_extreme_fracs_select_the_right_policy(self):
        env, spec = self._env_spec()
        sample_fn, _ = make_action_sampler(env, spec)
        scripted = _raw_make_policy(env, spec, "pursuit", 0.0, sample_fn)
        state, key = self._state(), jax.random.PRNGKey(3)
        _, k_s, k_r = jax.random.split(key, 3)

        for frac, want in (
            (1.0, scripted(state, k_s)),
            (0.0, sample_fn(k_r)),
        ):
            pol = _raw_make_policy(
                env, spec, "episode_mix", 0.0, sample_fn, mix_frac=frac
            )
            carry, act = pol.step(pol.init_carry(), None, state, key)
            np.testing.assert_array_equal(np.asarray(act), np.asarray(want))
            assert not bool(carry[0])  # fresh consumed

    def test_choice_persists_within_episode(self):
        """After the first step, the drawn policy sticks for every later
        step (until the trainer resets the carry at episode end), no matter
        what later keys would draw."""
        env, spec = self._env_spec()
        sample_fn, _ = make_action_sampler(env, spec)
        pol = _raw_make_policy(
            env, spec, "episode_mix", 0.0, sample_fn, mix_frac=0.5
        )
        state = self._state()
        carry = pol.init_carry()
        carry, _ = pol.step(carry, None, state, jax.random.PRNGKey(0))
        chosen = bool(carry[1])
        for i in range(1, 20):
            carry, _ = pol.step(carry, None, state, jax.random.PRNGKey(i))
            assert bool(carry[1]) == chosen
        # a fresh carry with a different key CAN choose differently
        draws = {
            bool(pol.step(pol.init_carry(), None, state,
                          jax.random.PRNGKey(i))[0][1])
            for i in range(20)
        }
        assert draws == {True, False}

    def test_trains_end_to_end(self, tmp_path):
        from mfvae_tpu.training.experiment import Experiment

        cfg = tiny_cfg(tmp_path, epoch_num=2)
        cfg.train.collect_policy = "episode_mix"
        cfg.train.collect_mix_frac = 0.5
        exp = Experiment(cfg).setup()
        result = exp.run()
        assert np.isfinite(result["loss_train"])

    def test_batched_epoch_trains(self, tmp_path):
        from mfvae_tpu.training.experiment import Experiment

        cfg = tiny_cfg(tmp_path, n_envs=2, epoch_num=2)
        cfg.train.collect_policy = "episode_mix"
        exp = Experiment(cfg).setup()
        result = exp.run()
        assert np.isfinite(result["loss_train"])

    def test_mix_frac_validated(self, tmp_path):
        cfg = tiny_cfg(tmp_path, epoch_num=1)
        cfg.train.collect_policy = "episode_mix"
        cfg.train.collect_mix_frac = 1.5
        with pytest.raises(ValueError, match="collect_mix_frac"):
            cfg.validate()


class TestStickyRandomPolicy:
    """Per-agent sticky random actions (collect_policy='sticky'):
    action-sensitivity motivation in PARITY.md round 4."""

    def _env_spec(self):
        env = SimpleTagEnv(num_adversaries=2, num_good_agents=1, num_obs=1,
                           max_steps=8)
        spec = AgentSpec.from_dicts(
            env.agents, {a: env.obs_dim(a) for a in env.agents},
            {a: 5 for a in env.agents},
        )
        return env, spec

    def test_fresh_step_resamples_everything(self):
        """fresh=True must force a full resample (the zero init carry must
        never leak noop actions into the data with probability p)."""
        env, spec = self._env_spec()
        sample_fn, _ = make_action_sampler(env, spec)
        pol = _raw_make_policy(env, spec, "sticky", 0.0, sample_fn,
                               mix_frac=1.0)  # hold prob 1: only fresh resamples
        key = jax.random.PRNGKey(0)
        _, k_rand = jax.random.split(key)
        carry, act = pol.step(pol.init_carry(), None, None, key)
        np.testing.assert_array_equal(
            np.asarray(act), np.asarray(sample_fn(k_rand))
        )
        # from then on, hold prob 1.0 repeats forever
        for i in range(1, 5):
            carry, act2 = pol.step(carry, None, None, jax.random.PRNGKey(i))
            np.testing.assert_array_equal(np.asarray(act2), np.asarray(act))

    def test_hold_probability_is_per_agent(self):
        env, spec = self._env_spec()
        sample_fn, _ = make_action_sampler(env, spec)
        pol = _raw_make_policy(env, spec, "sticky", 0.0, sample_fn,
                               mix_frac=0.5)
        carry, prev = pol.step(pol.init_carry(), None, None, jax.random.PRNGKey(0))
        held = changed = 0
        for i in range(1, 200):
            carry, act = pol.step(carry, None, None, jax.random.PRNGKey(i))
            held += int((np.asarray(act) == np.asarray(prev)).sum())
            changed += int((np.asarray(act) != np.asarray(prev)).sum())
            prev = act
        frac_held = held / (held + changed)
        # hold prob 0.5 plus 1/5 chance a resample repeats: ~0.6
        assert 0.5 < frac_held < 0.7

    def test_trains_end_to_end(self, tmp_path):
        from mfvae_tpu.training.experiment import Experiment

        cfg = tiny_cfg(tmp_path, epoch_num=2)
        cfg.train.collect_policy = "sticky"
        cfg.train.collect_mix_frac = 0.75
        exp = Experiment(cfg).setup()
        result = exp.run()
        assert np.isfinite(result["loss_train"])

    def test_host_experiment_trains_with_episode_mix(self, tmp_path):
        """Both host collectors mirror EpisodeMixPolicy (per-episode
        scripted/random flags redrawn at reset)."""
        from mfvae_tpu.training.host_experiment import HostExperiment

        cfg = tiny_cfg(tmp_path, epoch_num=2, sample_num=6, train_num=2)
        cfg.buffer.min_size = 4
        cfg.buffer.batch_size = 4
        cfg.train.collect_policy = "episode_mix"
        cfg.train.collect_mix_frac = 0.5
        exp = HostExperiment(cfg).setup()
        result = exp.run()
        assert np.isfinite(result["loss_train"])

    def test_host_batched_episode_mix_flags(self, tmp_path):
        from mfvae_tpu.envs.native_engine import native_engine_available
        from mfvae_tpu.training.host_experiment import HostExperiment

        if not native_engine_available():
            pytest.skip("no native toolchain")
        cfg = tiny_cfg(tmp_path, epoch_num=2, sample_num=8, train_num=2)
        cfg.env.n_host_envs = 4
        cfg.buffer.min_size = 4
        cfg.buffer.batch_size = 4
        cfg.train.collect_policy = "episode_mix"
        exp = HostExperiment(cfg).setup()
        col = exp.collector
        assert col._pursuit_kind == "tag"
        assert col._ep_scripted.shape == (4,)
        result = exp.run()
        assert np.isfinite(result["loss_train"])

    def test_choice_persists_across_collect_phases(self, tmp_path):
        """The policy carry rides in EnvCarry.policy across phase/epoch
        boundaries: an episode spanning multiple collect dispatches keeps
        ONE policy (regression: the carry used to be rebuilt per phase,
        degrading episode mixing to sample_num-step segment mixing)."""
        from mfvae_tpu.training.experiment import Experiment
        from mfvae_tpu.training.trainer import make_phase_fns

        cfg = tiny_cfg(tmp_path, epoch_num=1, sample_num=4)
        cfg.env.max_steps = 10_000  # the episode outlives every phase
        cfg.train.collect_policy = "episode_mix"
        exp = Experiment(cfg).setup()
        collect, _, _ = make_phase_fns(
            exp.env, exp.spec, exp.buffer, exp.test_buffer, cfg
        )
        env_c, buf = exp.carry.env, exp.carry.buffer_state
        flags = []
        for i in range(8):
            env_c, buf = collect((env_c, buf), jax.random.PRNGKey(i), exp.buffer)
            fresh, flag = env_c.policy
            assert not bool(fresh)  # consumed on the first in-episode step
            flags.append(bool(flag))
        # one episode -> one draw; if the carry were re-armed per phase the
        # 8 flags would be independent Bernoulli(0.5) draws (P[all equal]
        # = 2^-7)
        assert all(f == flags[0] for f in flags)

    def test_scanned_epochs_with_episode_mix(self, tmp_path):
        """The policy carry is seeded at setup so the epoch carry structure
        is constant — required by the scan-of-epochs dispatch (regression:
        lazily initializing it inside collect changed the carry structure
        between scan iterations)."""
        from mfvae_tpu.training.experiment import Experiment

        cfg = tiny_cfg(tmp_path, epoch_num=4, epochs_per_dispatch=2)
        cfg.train.collect_policy = "episode_mix"
        exp = Experiment(cfg).setup()
        result = exp.run()
        assert np.isfinite(result["loss_train"])
