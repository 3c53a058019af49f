"""MPC planning (mfvae_tpu/planning.py): actor mechanics + eval harness."""

import jax
import jax.numpy as jnp
import numpy as np

from mfvae_tpu.config import ExperimentConfig
from mfvae_tpu.inference import WorldModel
from mfvae_tpu.models.mavae import MAVAE
from mfvae_tpu.planning import eval_joint_policy, make_mpc_actor
from mfvae_tpu.training.experiment import Experiment
from mfvae_tpu.training.trainer import make_action_sampler


def tiny_env_model():
    cfg = ExperimentConfig()
    cfg.env.num_good_agents = 1
    cfg.env.num_adversaries = 2
    cfg.env.num_obs = 1
    cfg.env.max_steps = 16
    cfg.model.idx_features = 8
    cfg.model.obs_features = 8
    cfg.model.action_features = 8
    cfg.model.encoder_hidden = (16,)
    cfg.model.decoder_hidden = (32,)
    cfg.model.compute_dtype = "float32"
    exp = Experiment(cfg)
    env, spec, model = exp.env, exp.spec, exp.model
    obs, _ = env.reset_stacked(jax.random.PRNGKey(0))
    from mfvae_tpu.models.mavae import GroupedBatch, zero_actions_grouped
    from mfvae_tpu.training.trainer import stacked_to_grouped

    obs_g = tuple(o[None] for o in stacked_to_grouped(spec, obs))
    batch = GroupedBatch(obs=obs_g, actions=zero_actions_grouped(spec, 1, True))
    variables = model.init(
        jax.random.PRNGKey(0), batch, None, jax.random.PRNGKey(1)
    )
    return env, spec, WorldModel(model, variables)


class TestMPC:
    def test_actor_returns_valid_joint_action(self):
        env, spec, wm = tiny_env_model()
        act = make_mpc_actor(wm, env, spec, horizon=3, n_candidates=8,
                             plan_agents=(0, 1))
        obs, _ = env.reset_stacked(jax.random.PRNGKey(2))
        a = act(obs, jax.random.PRNGKey(3))
        assert a.shape == (spec.n_agents,)
        assert (np.asarray(a) >= 0).all()
        assert (np.asarray(a) < np.asarray(spec.act_dims)).all()

    def test_actor_picks_highest_scoring_candidate(self):
        """With n_candidates=1 the 'plan' is forced; with many, the chosen
        first action must be the argmax candidate's — checked by replaying
        the same key through the sampler and rollout."""
        env, spec, wm = tiny_env_model()
        H, N = 3, 8
        act = make_mpc_actor(wm, env, spec, horizon=H, n_candidates=N)
        obs, _ = env.reset_stacked(jax.random.PRNGKey(4))
        key = jax.random.PRNGKey(5)
        a = act(obs, key)
        sample_actions, group_actions = make_action_sampler(env, spec)
        from mfvae_tpu.training.trainer import stacked_to_grouped

        plans = sample_actions(key, (H, N))
        obs_g = tuple(
            jnp.broadcast_to(o[None], (N,) + o.shape)
            for o in stacked_to_grouped(spec, obs)
        )
        _, rewards = wm._rollout(obs_g, group_actions(plans))
        best = int(jnp.argmax(jnp.sum(rewards, axis=(0, 2))))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(plans[0, best]))

    def test_custom_score_fn_drives_selection(self):
        """score_fn replaces the reward objective: scoring by NEGATIVE
        predicted reward must select the argmin-reward candidate."""
        env, spec, wm = tiny_env_model()
        H, N = 3, 8

        def neg_reward(states, rewards):
            return -jnp.sum(rewards, axis=(0, 2))

        act = make_mpc_actor(wm, env, spec, horizon=H, n_candidates=N,
                             score_fn=neg_reward)
        obs, _ = env.reset_stacked(jax.random.PRNGKey(7))
        key = jax.random.PRNGKey(8)
        a = act(obs, key)
        sample_actions, group_actions = make_action_sampler(env, spec)
        from mfvae_tpu.training.trainer import stacked_to_grouped

        plans = sample_actions(key, (H, N))
        obs_g = tuple(
            jnp.broadcast_to(o[None], (N,) + o.shape)
            for o in stacked_to_grouped(spec, obs)
        )
        _, rewards = wm._rollout(obs_g, group_actions(plans))
        worst = int(jnp.argmin(jnp.sum(rewards, axis=(0, 2))))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(plans[0, worst]))

    def test_factorized_selection_stitches_per_agent_winners(self):
        """Each plan agent must execute the first action of the candidate
        maximizing ITS OWN score column — replayed by hand."""
        env, spec, wm = tiny_env_model()
        H, N = 2, 8

        def per_agent_neg_dist(states, rewards):
            # arbitrary deterministic per-agent score: per-agent reward sums
            return jnp.sum(rewards[..., :2], axis=0)  # [N, 2]

        act = make_mpc_actor(
            wm, env, spec, horizon=H, n_candidates=N, plan_agents=(0, 1),
            score_fn=per_agent_neg_dist, factorized=True,
        )
        obs, _ = env.reset_stacked(jax.random.PRNGKey(9))
        key = jax.random.PRNGKey(10)
        a = act(obs, key)
        sample_actions, group_actions = make_action_sampler(env, spec)
        from mfvae_tpu.training.trainer import stacked_to_grouped

        plans = sample_actions(key, (H, N))
        obs_g = tuple(
            jnp.broadcast_to(o[None], (N,) + o.shape)
            for o in stacked_to_grouped(spec, obs)
        )
        _, rewards = wm._rollout(obs_g, group_actions(plans))
        score = np.asarray(jnp.sum(rewards[..., :2], axis=0))  # [N, 2]
        for j in (0, 1):
            assert int(a[j]) == int(plans[0, int(score[:, j].argmax()), j])
        # non-plan agent takes candidate 0
        assert int(a[2]) == int(plans[0, 0, 2])

    def test_repeat_candidates_hold_one_action(self):
        """candidate_mode='repeat': selection still works and the actor
        returns a valid action (constant-action plans internally)."""
        env, spec, wm = tiny_env_model()
        act = make_mpc_actor(
            wm, env, spec, horizon=4, n_candidates=8, factorized=True,
            candidate_mode="repeat",
        )
        obs, _ = env.reset_stacked(jax.random.PRNGKey(11))
        a = act(obs, jax.random.PRNGKey(12))
        assert a.shape == (spec.n_agents,)
        assert (np.asarray(a) >= 0).all()
        assert (np.asarray(a) < np.asarray(spec.act_dims)).all()

    def test_cem_actor_valid_and_deterministic(self):
        from mfvae_tpu.planning import make_cem_actor

        env, spec, wm = tiny_env_model()
        act = make_cem_actor(wm, env, spec, horizon=3, n_candidates=8,
                             plan_agents=(0, 1), iters=2)
        obs, _ = env.reset_stacked(jax.random.PRNGKey(13))
        a1 = jax.jit(act)(obs, jax.random.PRNGKey(14))
        a2 = jax.jit(act)(obs, jax.random.PRNGKey(14))
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        assert a1.shape == (spec.n_agents,)
        assert (np.asarray(a1) >= 0).all()
        assert (np.asarray(a1) < np.asarray(spec.act_dims)).all()

    def test_cem_proposal_warm_start(self):
        """proposal_fn seeds the categoricals: an (effectively) one-hot
        proposal on action 2 with iters=1 forces every candidate — hence
        the executed first action — to 2 for the plan agents."""
        from mfvae_tpu.planning import make_cem_actor

        env, spec, wm = tiny_env_model()

        def proposal_fn(stacked_obs):
            return jnp.tile(
                jnp.array([0.0, 0.0, 50.0, 0.0, 0.0]), (2, 1)
            )  # [P, K]

        act = make_cem_actor(wm, env, spec, horizon=3, n_candidates=8,
                             plan_agents=(0, 1), iters=1,
                             proposal_fn=proposal_fn)
        obs, _ = env.reset_stacked(jax.random.PRNGKey(21))
        a = jax.jit(act)(obs, jax.random.PRNGKey(22))
        np.testing.assert_array_equal(np.asarray(a[:2]), 2)

    def test_cem_in_the_eval_loop(self):
        from mfvae_tpu.planning import make_cem_actor

        env, spec, wm = tiny_env_model()
        cem = make_cem_actor(wm, env, spec, horizon=2, n_candidates=4,
                             plan_agents=(0, 1), iters=2)
        sample_actions, _ = make_action_sampler(env, spec)
        is_adv = jnp.arange(spec.n_agents) < 2

        def joint(obs, state, key):
            k1, k2 = jax.random.split(key)
            return jnp.where(is_adv, cem(obs, k1), sample_actions(k2))

        rewards = eval_joint_policy(env, spec, joint, n_episodes=2, ep_len=3,
                                    key=jax.random.PRNGKey(15))
        assert np.isfinite(np.asarray(rewards)).all()

    def test_true_dynamics_rollout_matches_manual_env_stepping(self):
        """EnvDynamicsModel._rollout must reproduce stepping the real env
        by hand, candidate by candidate, in WorldModel._rollout's output
        layout (flat obs in grouped agent order)."""
        from mfvae_tpu.models.mavae import agent_order_concat
        from mfvae_tpu.planning import EnvDynamicsModel
        from mfvae_tpu.training.trainer import stacked_to_grouped

        env, spec, _ = tiny_env_model()
        tdm = EnvDynamicsModel(env, spec)
        _, state0 = env.reset_stacked(jax.random.PRNGKey(30))
        sample_actions, _ = make_action_sampler(env, spec)
        H, N = 3, 4
        plans = sample_actions(jax.random.PRNGKey(31), (H, N))
        states, rewards = tdm._rollout(state0, plans)
        assert states.shape[:2] == (H, N) and rewards.shape == (H, N, spec.n_agents)
        for n in range(N):
            s = state0
            for t in range(H):
                nobs, s, rew, _, _ = env.step_stacked(
                    jax.random.PRNGKey(0), s, plans[t, n]
                )
                flat = agent_order_concat(
                    spec, tuple(g[None] for g in stacked_to_grouped(spec, nobs))
                )[0]
                np.testing.assert_allclose(
                    np.asarray(states[t, n]), np.asarray(flat),
                    rtol=1e-5, atol=1e-6,
                )
                np.testing.assert_allclose(
                    np.asarray(rewards[t, n]), np.asarray(rew),
                    rtol=1e-5, atol=1e-6,
                )

    def test_true_dynamics_planner_beats_random(self):
        """The planning smoke regression (VERDICT r4 #6b): distance-scored
        factorized MPC through a PERFECTLY conditioned model (the true
        dynamics) must beat random actions on real return — if planner
        selection silently breaks, this fails no matter how good the
        model is."""
        from mfvae_tpu.planning import EnvDynamicsModel

        env, spec, _ = tiny_env_model()
        tdm = EnvDynamicsModel(env, spec)
        n_adv = 2
        od_adv = spec.obs_dims[0]
        # tiny tag obs layout: [vel(2), pos(2), obs rel(2), other adv rel(2),
        # prey rel(2), prey vel(2)] — prey offset 4 + 2*1 + 2*(n_adv-1)
        prey_off = 4 + 2 * 1 + 2 * (n_adv - 1)

        def dist_fact(states, rewards):
            h, n = states.shape[:2]
            adv = states[:, :, : n_adv * od_adv].reshape(h, n, n_adv, od_adv)
            rel = adv[..., prey_off : prey_off + 2]
            d = jnp.sqrt(jnp.sum(rel * rel, axis=-1) + 1e-12)
            return -jnp.sum(d, axis=0)  # [N, n_adv]

        mpc = make_mpc_actor(
            tdm, env, spec, horizon=4, n_candidates=16, plan_agents=(0, 1),
            score_fn=dist_fact, factorized=True, candidate_mode="repeat",
        )
        sample_actions, _ = make_action_sampler(env, spec)
        is_adv = jnp.arange(spec.n_agents) < n_adv

        def joint_mpc(obs, state, key):
            k1, k2 = jax.random.split(key)
            return jnp.where(is_adv, mpc(obs, k1, state), sample_actions(k2))

        def joint_rand(obs, state, key):
            return sample_actions(key)

        key = jax.random.PRNGKey(42)
        r_mpc = eval_joint_policy(env, spec, joint_mpc, n_episodes=8,
                                  ep_len=16, key=key)
        r_rand = eval_joint_policy(env, spec, joint_rand, n_episodes=8,
                                   ep_len=16, key=key)
        adv_mpc = float(jnp.mean(jnp.sum(r_mpc[:, :, :n_adv], axis=(1, 2))))
        adv_rand = float(jnp.mean(jnp.sum(r_rand[:, :, :n_adv], axis=(1, 2))))
        assert adv_mpc > adv_rand, (adv_mpc, adv_rand)

    def test_true_dynamics_cem_valid(self):
        from mfvae_tpu.planning import EnvDynamicsModel, make_cem_actor

        env, spec, _ = tiny_env_model()
        tdm = EnvDynamicsModel(env, spec)
        act = make_cem_actor(tdm, env, spec, horizon=3, n_candidates=8,
                             plan_agents=(0, 1), iters=2)
        obs, state = env.reset_stacked(jax.random.PRNGKey(33))
        a1 = jax.jit(act)(obs, jax.random.PRNGKey(34), state)
        a2 = jax.jit(act)(obs, jax.random.PRNGKey(34), state)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        assert (np.asarray(a1) >= 0).all()
        assert (np.asarray(a1) < np.asarray(spec.act_dims)).all()

    def test_eval_harness_runs_mpc_in_the_loop(self):
        env, spec, wm = tiny_env_model()
        mpc = make_mpc_actor(wm, env, spec, horizon=2, n_candidates=4,
                             plan_agents=(0, 1))
        sample_actions, _ = make_action_sampler(env, spec)
        is_adv = jnp.arange(spec.n_agents) < 2

        def joint(obs, state, key):
            k1, k2 = jax.random.split(key)
            return jnp.where(is_adv, mpc(obs, k1), sample_actions(k2))

        rewards = eval_joint_policy(env, spec, joint, n_episodes=2, ep_len=4,
                                    key=jax.random.PRNGKey(6))
        assert rewards.shape == (2, 4, spec.n_agents)
        assert np.isfinite(np.asarray(rewards)).all()
