"""Planner distillation (imagination.make_cem_teacher / make_distillation_trainer).

Same isolation trick as test_imagination.py: a stub world model with KNOWN
controllable dynamics (reward 1 iff a plan agent plays action 3; state
frozen) lets the tests assert the teacher FINDS the rewarded action and
the student LEARNS it, with no trained model in the loop.  The real-WM
integration runs in scripts/distill_study.py on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mfvae_tpu.imagination import (
    PolicyMLP,
    make_cem_teacher,
    make_distillation_trainer,
    make_obs_builder,
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


class TestCEMTeacher:
    def test_shapes_and_range(self):
        spec = tag_like_spec()
        teacher = make_cem_teacher(
            StubWM(spec), StubEnv(), spec, (0, 1, 2),
            horizon=3, n_candidates=16, iters=2,
        )
        obs_g = starts(spec, 5, jax.random.PRNGKey(0))
        acts = jax.jit(teacher)(obs_g, jax.random.PRNGKey(1))
        assert acts.shape == (5, 3) and acts.dtype == jnp.int32
        assert bool(jnp.all((acts >= 0) & (acts < 5)))

    def test_finds_rewarded_action(self):
        spec = tag_like_spec()
        teacher = make_cem_teacher(
            StubWM(spec), StubEnv(), spec, (0, 1, 2),
            horizon=4, n_candidates=64, iters=3,
        )
        obs_g = starts(spec, 8, jax.random.PRNGKey(0))
        acts = jax.jit(teacher)(obs_g, jax.random.PRNGKey(1))
        # by iter 2-3 the per-(state, agent) categoricals concentrate on 3
        np.testing.assert_array_equal(np.asarray(acts), 3)

    def test_first_step_score_fn(self):
        # custom score over the imagined tensors: only step-0 reward counts
        spec = tag_like_spec()

        def first_step_score(states, rewards):
            return rewards[0][..., :3]  # [B, P]

        teacher = make_cem_teacher(
            StubWM(spec), StubEnv(), spec, (0, 1, 2),
            score_fn=first_step_score, horizon=4, n_candidates=64, iters=1,
        )
        obs_g = starts(spec, 4, jax.random.PRNGKey(3))
        acts = jax.jit(teacher)(obs_g, jax.random.PRNGKey(4))
        np.testing.assert_array_equal(np.asarray(acts), 3)


class TestSoftTeacher:
    def test_soft_targets_are_distributions_tilted_to_reward(self):
        spec = tag_like_spec()
        teacher = make_cem_teacher(
            StubWM(spec), StubEnv(), spec, (0, 1, 2),
            horizon=4, n_candidates=128, soft_temperature=0.5,
        )
        obs_g = starts(spec, 6, jax.random.PRNGKey(0))
        t = jax.jit(teacher)(obs_g, jax.random.PRNGKey(1))
        assert t.shape == (6, 3, 5)
        np.testing.assert_allclose(np.asarray(t.sum(-1)), 1.0, rtol=1e-5)
        # advantage weighting must TILT the mass to the rewarded action —
        # the soft teacher is a noisy estimator per key by design (its
        # noise averages out across distillation updates), so assert the
        # population tilt, not a per-entry argmax
        t = np.asarray(t)
        assert (t.argmax(-1) == 3).mean() >= 0.85
        assert t[..., 3].mean() > 2 * max(
            t[..., k].mean() for k in (0, 1, 2, 4)
        )

    def test_soft_distillation_learns_the_tilt(self):
        spec = tag_like_spec()
        policy, init_fn, update_fn = make_distillation_trainer(
            StubWM(spec), StubEnv(), spec, (0, 1, 2),
            horizon=4, n_candidates=64, visit_steps=2,
            learning_rate=3e-3, hidden=(32,),
            target_mode="soft", temperature=0.5,
        )
        obs_g = starts(spec, 16, jax.random.PRNGKey(0))
        params, opt = init_fn(jax.random.PRNGKey(1), obs_g[0][0, 0])
        key = jax.random.PRNGKey(2)
        for i in range(120):
            params, opt, m = update_fn(
                params, opt, obs_g, jax.random.fold_in(key, i)
            )
        # agree is vs the PER-KEY teacher argmax, itself noisy by design
        assert float(m["teacher_agree"]) > 0.8
        logits = policy.apply(params, obs_g[0][:, :3])
        assert bool(jnp.all(jnp.argmax(logits, axis=-1) == 3))


class TestEnumeratedTeacher:
    def test_crn_isolates_the_first_action_exactly(self):
        """StubWM is deterministic: with hold continuation Q[3]-Q[a!=3]
        must be EXACTLY horizon (every held step rewarded); with random
        shared continuation EXACTLY 1 (first step only — the common
        random numbers cancel everything else)."""
        from mfvae_tpu.imagination import make_enumerated_teacher

        spec = tag_like_spec()
        obs_g = starts(spec, 4, jax.random.PRNGKey(0))
        for cont, gap in (("hold", 4.0), ("random", 1.0)):
            teacher = make_enumerated_teacher(
                StubWM(spec), StubEnv(), spec, (0, 1, 2),
                horizon=4, m_rollouts=8, continuation=cont, return_q=True,
            )
            t, q = jax.jit(teacher)(obs_g, jax.random.PRNGKey(1))
            assert t.shape == (4, 3, 5) and q.shape == (4, 3, 5)
            np.testing.assert_allclose(np.asarray(t.sum(-1)), 1.0, rtol=1e-5)
            q = np.asarray(q)
            for a in (0, 1, 2, 4):
                np.testing.assert_allclose(q[..., 3] - q[..., a], gap,
                                           rtol=1e-5, err_msg=cont)
            np.testing.assert_array_equal(np.asarray(t.argmax(-1)), 3)

    def test_self_consistent_across_keys(self):
        from mfvae_tpu.imagination import make_enumerated_teacher

        spec = tag_like_spec()
        teacher = jax.jit(make_enumerated_teacher(
            StubWM(spec), StubEnv(), spec, (0, 1, 2),
            horizon=3, m_rollouts=8,
        ))
        obs_g = starts(spec, 6, jax.random.PRNGKey(5))
        t1 = teacher(obs_g, jax.random.PRNGKey(10))
        t2 = teacher(obs_g, jax.random.PRNGKey(20))
        np.testing.assert_array_equal(
            np.asarray(t1.argmax(-1)), np.asarray(t2.argmax(-1))
        )

    def test_enumerated_distillation_learns(self):
        spec = tag_like_spec()
        policy, init_fn, update_fn = make_distillation_trainer(
            StubWM(spec), StubEnv(), spec, (0, 1, 2),
            horizon=4, visit_steps=2, learning_rate=3e-3, hidden=(32,),
            teacher_mode="enumerated", m_rollouts=8, temperature=0.5,
        )
        obs_g = starts(spec, 16, jax.random.PRNGKey(0))
        params, opt = init_fn(jax.random.PRNGKey(1), obs_g[0][0, 0])
        key = jax.random.PRNGKey(2)
        for i in range(120):
            params, opt, m = update_fn(
                params, opt, obs_g, jax.random.fold_in(key, i)
            )
        logits = policy.apply(params, obs_g[0][:, :3])
        assert bool(jnp.all(jnp.argmax(logits, axis=-1) == 3))


class TestDistillation:
    def test_student_learns_teacher_action(self):
        spec = tag_like_spec()
        wm = StubWM(spec)
        policy, init_fn, update_fn = make_distillation_trainer(
            wm, StubEnv(), spec, (0, 1, 2),
            horizon=4, n_candidates=32, cem_iters=2, visit_steps=2,
            learning_rate=3e-3, hidden=(32,),
        )
        obs_g = starts(spec, 16, jax.random.PRNGKey(0))
        params, opt = init_fn(jax.random.PRNGKey(1), obs_g[0][0, 0])
        key = jax.random.PRNGKey(2)
        first_agree = None
        for i in range(120):
            params, opt, m = update_fn(
                params, opt, obs_g, jax.random.fold_in(key, i)
            )
            if first_agree is None:
                first_agree = float(m["teacher_agree"])
        assert float(m["teacher_agree"]) > 0.9, (
            first_agree, float(m["teacher_agree"]),
        )
        logits = policy.apply(params, obs_g[0][:, :3])
        assert bool(jnp.all(jnp.argmax(logits, axis=-1) == 3))

    def test_centralized_student_learns_and_serves(self):
        """centralized=True: the student input carries the full joint obs;
        the stub task is still learnable, the actor builds the same rows
        at serving time (the causal probe for the amortization wall,
        PARITY.md last-mile chapter)."""
        spec = tag_like_spec()
        wm = StubWM(spec)
        policy, init_fn, update_fn = make_distillation_trainer(
            wm, StubEnv(), spec, (0, 1, 2),
            horizon=4, visit_steps=2, learning_rate=3e-3, hidden=(32,),
            teacher_mode="enumerated", m_rollouts=8, temperature=0.5,
            centralized=True,
        )
        obs_g = starts(spec, 16, jax.random.PRNGKey(0))
        # init_fn ignores the (decentralized-width) example row and sizes
        # the input from the centralized obs dim
        params, opt = init_fn(jax.random.PRNGKey(1), obs_g[0][0, 0])
        d_cen = 6 + (3 * 6 + 1 * 4)  # own row + flattened joint obs
        assert params["params"]["LayerNorm_0"]["scale"].shape == (d_cen,)
        key = jax.random.PRNGKey(2)
        for i in range(120):
            params, opt, m = update_fn(
                params, opt, obs_g, jax.random.fold_in(key, i)
            )
        obs_fn, obs_dim = make_obs_builder(spec, (0, 1, 2), centralized=True)
        assert obs_dim == d_cen
        logits = policy.apply(params, obs_fn(obs_g))
        assert bool(jnp.all(jnp.argmax(logits, axis=-1) == 3))
        # serving builds identical rows from the joint stacked obs
        actor = make_policy_actor(policy, params, StubEnv(), spec, (0, 1, 2),
                                  centralized=True)
        stacked = (obs_g[0][0], obs_g[1][0])
        acts = actor(stacked, jax.random.PRNGKey(3))
        assert acts.shape == (4,)
        np.testing.assert_array_equal(np.asarray(acts[:3]), 3)

    def test_obs_builder_centralized_rows(self):
        spec = tag_like_spec()
        obs_g = starts(spec, 2, jax.random.PRNGKey(7))
        obs_fn, obs_dim = make_obs_builder(spec, (0, 1, 2), centralized=True)
        rows = obs_fn(obs_g)
        assert rows.shape == (2, 3, obs_dim)
        joint = np.concatenate(
            [np.asarray(obs_g[0]).reshape(2, -1),
             np.asarray(obs_g[1]).reshape(2, -1)], axis=-1
        )
        for p in range(3):
            np.testing.assert_allclose(
                np.asarray(rows[:, p, :6]), np.asarray(obs_g[0][:, p])
            )
            np.testing.assert_allclose(np.asarray(rows[:, p, 6:]), joint)
        # decentralized default: own rows only
        dec_fn, dec_dim = make_obs_builder(spec, (0, 1, 2))
        assert dec_dim == 6
        np.testing.assert_allclose(
            np.asarray(dec_fn(obs_g)), np.asarray(obs_g[0][:, :3])
        )

    def test_serves_through_policy_actor(self):
        spec = tag_like_spec()
        wm = StubWM(spec)
        policy, init_fn, update_fn = make_distillation_trainer(
            wm, StubEnv(), spec, (0, 1, 2),
            horizon=2, n_candidates=8, cem_iters=1, visit_steps=1,
            hidden=(16,),
        )
        obs_g = starts(spec, 4, jax.random.PRNGKey(0))
        params, opt = init_fn(jax.random.PRNGKey(1), obs_g[0][0, 0])
        params, opt, _ = update_fn(params, opt, obs_g, jax.random.PRNGKey(2))
        actor = make_policy_actor(policy, params, StubEnv(), spec, (0, 1, 2))
        acts = actor((jnp.ones((3, 6)), jnp.ones((1, 4))), jax.random.PRNGKey(3))
        assert acts.shape == (4,)
        assert bool(jnp.all((acts >= 0) & (acts < 5)))
