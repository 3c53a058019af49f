"""Imagination-trained policies (mfvae_tpu/imagination.py).

A stub world model with KNOWN controllable dynamics (reward 1 iff a plan
agent plays action 3; state frozen) isolates the REINFORCE machinery: the
policy must discover the rewarded action purely from imagined rollouts.
The real-WM integration is exercised by scripts/imagination_policy_study.py
on TPU and by the shape/serving tests here.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mfvae_tpu.imagination import (
    PolicyMLP,
    make_imagination_rollout,
    make_imagination_trainer,
    make_policy_actor,
)
from mfvae_tpu.models.mavae import AgentSpec, agent_order_concat, state_to_grouped


class StubEnv:
    discrete_actions = True


def tag_like_spec():
    agents = ("adversary_0", "adversary_1", "adversary_2", "agent_0")
    return AgentSpec.from_dicts(
        agents,
        {a: 6 for a in agents[:3]} | {"agent_0": 4},
        {a: 5 for a in agents},
    )


class StubWM:
    """Frozen-state world model whose reward pays plan agents for action 3."""

    def __init__(self, spec):
        self.spec = spec

        def _predict(batch):
            acts0 = batch.actions[0]  # [B, 3]
            rew_adv = jnp.where(acts0 == 3, 1.0, 0.0)
            rew = jnp.concatenate(
                [rew_adv, jnp.zeros((acts0.shape[0], 1))], axis=1
            )
            return agent_order_concat(spec, batch.obs), rew

        self._predict = _predict
        self._state_to_grouped = lambda s: state_to_grouped(spec, s)


def starts(spec, S, key):
    ks = jax.random.split(key, 2)
    return (
        jax.random.normal(ks[0], (S, 3, 6)),
        jax.random.normal(ks[1], (S, 1, 4)),
    )


class TestRollout:
    def test_shapes_and_gradient_path(self):
        spec = tag_like_spec()
        wm = StubWM(spec)
        rollout = make_imagination_rollout(wm, StubEnv(), spec, (0, 1, 2), horizon=4)
        policy = PolicyMLP(hidden=(16,), act_dim=5)
        obs_g = starts(spec, 8, jax.random.PRNGKey(0))
        params = policy.init(jax.random.PRNGKey(1), obs_g[0][:, :1])
        states, rewards, logp, ent = rollout(
            params, policy.apply, obs_g, jax.random.PRNGKey(2)
        )
        assert states.shape == (4, 8, 22)
        assert rewards.shape == (4, 8, 4)
        assert logp.shape == (4, 8, 3) and ent.shape == (4, 8, 3)

        def loss(p):
            _, _, lp, _ = rollout(p, policy.apply, obs_g, jax.random.PRNGKey(2))
            return jnp.sum(lp)

        g = jax.grad(loss)(params)
        norms = [float(jnp.abs(x).sum()) for x in jax.tree.leaves(g)]
        assert sum(norms) > 0.0

    def test_reinforce_learns_rewarded_action(self):
        spec = tag_like_spec()
        wm = StubWM(spec)
        policy, init_fn, update_fn = make_imagination_trainer(
            wm, StubEnv(), spec, (0, 1, 2), horizon=4, n_rollouts=8,
            learning_rate=3e-3, entropy_coef=1e-3, hidden=(32,),
        )
        obs_g = starts(spec, 16, jax.random.PRNGKey(0))
        params, opt = init_fn(jax.random.PRNGKey(1), obs_g[0][0, 0])
        key = jax.random.PRNGKey(2)
        first = None
        for i in range(150):
            params, opt, m = update_fn(params, opt, obs_g, jax.random.fold_in(key, i))
            if first is None:
                first = float(m["score_mean"])
        # max imagined score = horizon (1/step); random ~ horizon/5
        assert float(m["score_mean"]) > 0.9 * 4.0, (first, float(m["score_mean"]))
        logits = policy.apply(params, obs_g[0][:, :3])
        assert bool(jnp.all(jnp.argmax(logits, axis=-1) == 3))


class TestLambdaReturns:
    def test_lam1_is_monte_carlo_and_lam0_is_td(self):
        from mfvae_tpu.imagination import lambda_returns

        rng = np.random.default_rng(0)
        H, B = 5, 3
        r = jnp.asarray(rng.normal(size=(H, B)))
        v = jnp.asarray(rng.normal(size=(H, B)))
        gamma = 0.9
        # lam=1: G_t = sum_k gamma^k r_{t+k} + gamma^{H-t} v_H
        g1 = np.asarray(lambda_returns(r, v, gamma, 1.0))
        want = np.zeros((H, B))
        acc = np.asarray(v[-1])
        for t in reversed(range(H)):
            acc = np.asarray(r[t]) + gamma * acc
            want[t] = acc
        np.testing.assert_allclose(g1, want, rtol=1e-5)
        # lam=0: G_t = r_t + gamma v_{t+1}
        g0 = np.asarray(lambda_returns(r, v, gamma, 0.0))
        np.testing.assert_allclose(g0, np.asarray(r) + gamma * np.asarray(v),
                                   rtol=1e-5)

    def test_horizon_one(self):
        from mfvae_tpu.imagination import lambda_returns

        r = jnp.ones((1, 2))
        v = jnp.full((1, 2), 3.0)
        g = np.asarray(lambda_returns(r, v, 0.5, 0.7))
        np.testing.assert_allclose(g, 1.0 + 0.5 * 3.0)


class TestActorCritic:
    def test_learns_rewarded_action_and_value(self):
        from mfvae_tpu.imagination import make_actor_critic_trainer

        spec = tag_like_spec()
        wm = StubWM(spec)
        policy, value, init_fn, update_fn = make_actor_critic_trainer(
            wm, StubEnv(), spec, (0, 1, 2), horizon=4, n_rollouts=8,
            learning_rate=3e-3, entropy_coef=1e-3, gamma=0.9, lam=0.95,
            hidden=(32,),
        )
        obs_g = starts(spec, 16, jax.random.PRNGKey(0))
        params, opt = init_fn(jax.random.PRNGKey(1), obs_g[0][0, 0])
        key = jax.random.PRNGKey(2)
        for i in range(200):
            params, opt, m = update_fn(
                params, opt, obs_g, jax.random.fold_in(key, i)
            )
        # policy: rewarded action discovered (per-step reward -> 1)
        assert float(m["score_mean"]) > 0.9, float(m["score_mean"])
        logits = policy.apply(params["pi"], obs_g[0][:, :3])
        assert bool(jnp.all(jnp.argmax(logits, axis=-1) == 3))
        # critic: bootstrapped value exceeds the 4-step Monte-Carlo sum —
        # the lambda-target sees past the horizon (sum_{k<4} 0.9^k = 3.44)
        v = value.apply(params["v"], obs_g[0][:, :3])
        assert float(jnp.mean(v)) > 3.44, float(jnp.mean(v))

    def test_finite_horizon_objective_no_tail_bootstrap(self):
        # bootstrap_tail=False + lam=1: targets are pure H-step
        # Monte-Carlo sums.  The stub freezes state, so the critic sees
        # the SAME state with the per-timestep finite targets
        # {3.44, 2.71, 1.9, 1.0} and converges to their mean ~2.26 —
        # strictly BELOW the bootstrapped fixed point (> 3.44 in
        # test_learns_rewarded_action_and_value): the value no longer
        # sees past the horizon
        from mfvae_tpu.imagination import make_actor_critic_trainer

        spec = tag_like_spec()
        wm = StubWM(spec)
        policy, value, init_fn, update_fn = make_actor_critic_trainer(
            wm, StubEnv(), spec, (0, 1, 2), horizon=4, n_rollouts=8,
            learning_rate=3e-3, entropy_coef=1e-3, gamma=0.9, lam=1.0,
            hidden=(32,), bootstrap_tail=False,
        )
        obs_g = starts(spec, 16, jax.random.PRNGKey(0))
        params, opt = init_fn(jax.random.PRNGKey(1), obs_g[0][0, 0])
        key = jax.random.PRNGKey(2)
        for i in range(200):
            params, opt, m = update_fn(
                params, opt, obs_g, jax.random.fold_in(key, i)
            )
        assert float(m["score_mean"]) > 0.9, float(m["score_mean"])
        logits = policy.apply(params["pi"], obs_g[0][:, :3])
        assert bool(jnp.all(jnp.argmax(logits, axis=-1) == 3))
        v = value.apply(params["v"], obs_g[0][:, :3])
        assert 1.8 < float(jnp.mean(v)) < 2.8, float(jnp.mean(v))

    def test_critic_time_feature_fits_finite_horizon_exactly(self):
        # ADVICE r4: under bootstrap_tail=False a time-independent critic
        # can only fit the per-state MEAN over horizon positions (~2.26
        # in the test above).  critic_time_feature appends (H-t)/H to its
        # input, so the same frozen-state stub now admits the exact
        # finite-horizon values {3.44, 2.71, 1.90, 1.00} at time-remaining
        # {1, .75, .5, .25}
        from mfvae_tpu.imagination import make_actor_critic_trainer

        spec = tag_like_spec()
        wm = StubWM(spec)
        policy, value, init_fn, update_fn = make_actor_critic_trainer(
            wm, StubEnv(), spec, (0, 1, 2), horizon=4, n_rollouts=8,
            learning_rate=3e-3, entropy_coef=1e-3, value_coef=2.0,
            gamma=0.9, lam=1.0,
            hidden=(32,), bootstrap_tail=False, critic_time_feature=True,
        )
        obs_g = starts(spec, 16, jax.random.PRNGKey(0))
        params, opt = init_fn(jax.random.PRNGKey(1), obs_g[0][0, 0])
        key = jax.random.PRNGKey(2)
        for i in range(500):
            params, opt, m = update_fn(
                params, opt, obs_g, jax.random.fold_in(key, i)
            )
        assert float(m["score_mean"]) > 0.9, float(m["score_mean"])
        obs = obs_g[0][:, :3]
        want = {1.0: 3.439, 0.75: 2.71, 0.5: 1.9, 0.25: 1.0}
        got = {}
        for tr, target in want.items():
            x = jnp.concatenate(
                [obs, jnp.full(obs.shape[:-1] + (1,), tr)], axis=-1
            )
            got[tr] = float(jnp.mean(value.apply(params["v"], x)))
            assert abs(got[tr] - target) < 0.35, (tr, got[tr], target)
        # and the fit is genuinely time-dependent (monotone in remaining)
        assert got[1.0] > got[0.75] > got[0.5] > got[0.25], got

    def test_finite_horizon_lam_warning(self):
        # ADVICE r4: bootstrap_tail=False with lam<1 still bootstraps the
        # intermediate (1-lam)*V terms — warn so callers don't mistake the
        # flag alone for the pure finite-horizon objective
        import pytest

        from mfvae_tpu.imagination import make_actor_critic_trainer

        spec = tag_like_spec()
        wm = StubWM(spec)
        with pytest.warns(UserWarning, match="finite"):
            make_actor_critic_trainer(
                wm, StubEnv(), spec, (0, 1, 2), horizon=4,
                bootstrap_tail=False, lam=0.95,
            )

    def test_symlog_roundtrip_and_learning(self):
        from mfvae_tpu.imagination import (
            make_actor_critic_trainer,
            symexp,
            symlog,
        )

        x = jnp.array([-250.0, -1.5, 0.0, 3.0, 1e4])
        np.testing.assert_allclose(np.asarray(symexp(symlog(x))),
                                   np.asarray(x), rtol=1e-5)
        spec = tag_like_spec()
        wm = StubWM(spec)
        policy, value, init_fn, update_fn = make_actor_critic_trainer(
            wm, StubEnv(), spec, (0, 1, 2), horizon=4, n_rollouts=8,
            learning_rate=3e-3, entropy_coef=1e-3, gamma=0.9,
            hidden=(32,), critic_symlog=True,
        )
        obs_g = starts(spec, 16, jax.random.PRNGKey(0))
        params, opt = init_fn(jax.random.PRNGKey(1), obs_g[0][0, 0])
        for i in range(200):
            params, opt, m = update_fn(
                params, opt, obs_g,
                jax.random.fold_in(jax.random.PRNGKey(2), i),
            )
        logits = policy.apply(params["pi"], obs_g[0][:, :3])
        assert bool(jnp.all(jnp.argmax(logits, axis=-1) == 3))
        # decoded value (symexp of the net output) still sees past horizon
        from mfvae_tpu.imagination import symexp as se

        v = se(value.apply(params["v"], obs_g[0][:, :3]))
        assert float(jnp.mean(v)) > 3.0, float(jnp.mean(v))

    def test_target_critic_ema(self):
        from mfvae_tpu.imagination import make_actor_critic_trainer

        spec = tag_like_spec()
        wm = StubWM(spec)
        policy, value, init_fn, update_fn = make_actor_critic_trainer(
            wm, StubEnv(), spec, (0, 1, 2), horizon=3, n_rollouts=4,
            learning_rate=3e-3, hidden=(16,), target_ema=0.05,
        )
        obs_g = starts(spec, 8, jax.random.PRNGKey(0))
        params, opt = init_fn(jax.random.PRNGKey(1), obs_g[0][0, 0])
        assert "v_target" in params
        # at init the target equals the online critic
        for a, b in zip(jax.tree.leaves(params["v"]),
                        jax.tree.leaves(params["v_target"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        v0 = jax.tree.leaves(params["v_target"])
        for i in range(20):
            params, opt, m = update_fn(params, opt, obs_g,
                                       jax.random.fold_in(jax.random.PRNGKey(2), i))
        # the target moved, but lags the online critic (EMA)
        moved = sum(
            float(jnp.abs(a - b).sum())
            for a, b in zip(v0, jax.tree.leaves(params["v_target"]))
        )
        lag = sum(
            float(jnp.abs(a - b).sum())
            for a, b in zip(jax.tree.leaves(params["v"]),
                            jax.tree.leaves(params["v_target"]))
        )
        assert moved > 0.0 and lag > 0.0
        assert np.isfinite(list(
            {k: float(v) for k, v in m.items()}.values()
        )).all()
        # still learns the rewarded action with the slow bootstrap
        policy2, _, init2, update2 = make_actor_critic_trainer(
            wm, StubEnv(), spec, (0, 1, 2), horizon=4, n_rollouts=8,
            learning_rate=3e-3, entropy_coef=1e-3, gamma=0.9,
            hidden=(32,), target_ema=0.05,
        )
        p2, o2 = init2(jax.random.PRNGKey(3), obs_g[0][0, 0])
        for i in range(200):
            p2, o2, m2 = update2(p2, o2, obs_g,
                                 jax.random.fold_in(jax.random.PRNGKey(4), i))
        logits = policy2.apply(p2["pi"], obs_g[0][:, :3])
        assert bool(jnp.all(jnp.argmax(logits, axis=-1) == 3))

    def test_policy_params_serve_through_actor(self):
        from mfvae_tpu.imagination import make_actor_critic_trainer

        spec = tag_like_spec()
        wm = StubWM(spec)
        policy, value, init_fn, update_fn = make_actor_critic_trainer(
            wm, StubEnv(), spec, (0, 1, 2), horizon=2, n_rollouts=4,
            hidden=(16,),
        )
        obs_g = starts(spec, 4, jax.random.PRNGKey(0))
        params, opt = init_fn(jax.random.PRNGKey(1), obs_g[0][0, 0])
        params, opt, _ = update_fn(params, opt, obs_g, jax.random.PRNGKey(2))
        actor = make_policy_actor(policy, params["pi"], StubEnv(), spec,
                                  (0, 1, 2))
        acts = actor((jnp.ones((3, 6)), jnp.ones((1, 4))), jax.random.PRNGKey(3))
        assert acts.shape == (4,)
        assert bool(jnp.all((acts >= 0) & (acts < 5)))


class _Box:
    low = 0.0
    high = 1.0


class ContStubEnv:
    discrete_actions = False
    agents = ("adversary_0", "adversary_1", "adversary_2", "agent_0")

    def action_space(self, agent):
        return _Box()


def cont_spec():
    agents = ContStubEnv.agents
    return AgentSpec.from_dicts(
        agents,
        {a: 6 for a in agents[:3]} | {"agent_0": 4},
        {a: 2 for a in agents},
    )


class ContStubWM:
    """Frozen-state continuous world model: reward pays each plan agent
    for putting action dim 0 near 0.7 (quadratic)."""

    def __init__(self, spec):
        self.spec = spec

        def _predict(batch):
            acts0 = batch.actions[0]  # [B, 3, 2]
            rew_adv = 1.0 - (acts0[..., 0] - 0.7) ** 2
            rew = jnp.concatenate(
                [rew_adv, jnp.zeros((acts0.shape[0], 1))], axis=1
            )
            return agent_order_concat(spec, batch.obs), rew

        self._predict = _predict
        self._state_to_grouped = lambda s: state_to_grouped(spec, s)


class TestContinuousImagination:
    def test_tanh_gaussian_sample_bounds_and_logp(self):
        from mfvae_tpu.imagination import tanh_gaussian_sample

        mu = jnp.zeros((100, 3, 2))
        log_std = jnp.zeros((100, 3, 2))
        a, logp = tanh_gaussian_sample(mu, log_std, jax.random.PRNGKey(0),
                                       0.0, 1.0)
        assert a.shape == (100, 3, 2) and logp.shape == (100, 3)
        assert bool(jnp.all((a >= 0.0) & (a <= 1.0)))
        assert np.isfinite(np.asarray(logp)).all()

    def test_reinforce_learns_continuous_target(self):
        spec = cont_spec()
        wm = ContStubWM(spec)
        policy, init_fn, update_fn = make_imagination_trainer(
            wm, ContStubEnv(), spec, (0, 1, 2), horizon=4, n_rollouts=8,
            learning_rate=3e-3, entropy_coef=1e-3, hidden=(32,),
        )
        obs_g = starts(spec, 16, jax.random.PRNGKey(0))
        params, opt = init_fn(jax.random.PRNGKey(1), obs_g[0][0, 0])
        key = jax.random.PRNGKey(2)
        for i in range(300):
            params, opt, m = update_fn(params, opt, obs_g,
                                       jax.random.fold_in(key, i))
        # max per-step reward 1.0 at a0=0.7; random uniform averages ~0.87
        assert float(m["score_mean"]) > 4 * 0.96, float(m["score_mean"])
        from mfvae_tpu.imagination import _tanh_affine

        mu, _ = policy.apply(params, obs_g[0][:, :3])
        a_greedy = np.asarray(_tanh_affine(mu[..., 0], 0.0, 1.0))
        # converged means cluster at the rewarded 0.7 (random init sits at
        # ~0.5); per-entry spread varies with XLA recompilation noise
        # amplified over 300 updates, so assert the population
        assert abs(a_greedy.mean() - 0.7) < 0.06, a_greedy
        assert np.abs(a_greedy - 0.7).mean() < 0.1, a_greedy

    def test_actor_serves_continuous(self):
        from mfvae_tpu.imagination import GaussianPolicyMLP

        spec = cont_spec()
        policy = GaussianPolicyMLP(hidden=(16,), act_dim=2)
        params = policy.init(jax.random.PRNGKey(0), jnp.ones((1, 1, 6)))
        env = ContStubEnv()
        actor = make_policy_actor(policy, params, env, spec, (0, 1, 2),
                                  greedy=False)
        acts = actor((jnp.ones((3, 6)), jnp.ones((1, 4))),
                     jax.random.PRNGKey(1))
        assert acts.shape == (4, 2)
        assert bool(jnp.all((acts >= 0.0) & (acts <= 1.0)))

    def test_teachers_reject_continuous(self):
        from mfvae_tpu.imagination import (
            make_cem_teacher,
            make_enumerated_teacher,
        )

        spec = cont_spec()
        wm = ContStubWM(spec)
        with np.testing.assert_raises(AssertionError):
            make_cem_teacher(wm, ContStubEnv(), spec, (0, 1, 2))
        with np.testing.assert_raises(AssertionError):
            make_enumerated_teacher(wm, ContStubEnv(), spec, (0, 1, 2))


class TestActor:
    def test_actor_contract(self):
        spec = tag_like_spec()
        policy = PolicyMLP(hidden=(16,), act_dim=5)
        obs_row = jnp.ones((6,))
        params = policy.init(jax.random.PRNGKey(0), obs_row[None, None])
        actor = make_policy_actor(policy, params, StubEnv(), spec, (0, 1, 2))
        # StackedObs: one tensor per agent class (adversaries, good)
        stacked = (jnp.ones((3, 6)), jnp.ones((1, 4)))
        from mfvae_tpu.training.trainer import stacked_to_grouped  # noqa

        acts = actor(stacked, jax.random.PRNGKey(1))
        assert acts.shape == (4,)
        assert bool(jnp.all((acts >= 0) & (acts < 5)))
        # greedy: plan-agent actions equal the argmax of the policy logits
        obs_g = stacked_to_grouped(spec, stacked)
        logits = policy.apply(params, obs_g[0][:3][None])[0]
        np.testing.assert_array_equal(
            np.asarray(acts[:3]), np.asarray(jnp.argmax(logits, axis=-1))
        )
