"""Open-loop imagination-accuracy metric (mfvae_tpu/rollout_eval.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from mfvae_tpu.inference import WorldModel
from mfvae_tpu.models.mavae import GroupedBatch
from mfvae_tpu.rollout_eval import (
    flatten_global_state,
    make_rollout_accuracy_fn,
    rollout_accuracy,
)
from mfvae_tpu.training.experiment import Experiment
from tests.test_training import tiny_cfg


def build_wm(policy="random"):
    cfg = tiny_cfg()
    exp = Experiment(cfg)
    variables = exp.model.init(
        jax.random.PRNGKey(0),
        exp._fake_batch(4),
        None,
        jax.random.PRNGKey(1),
    )
    return exp, WorldModel(exp.model, variables)


class TestFlattenGlobalState:
    def test_agent_order_roundtrip_through_worldmodel_split(self):
        """flatten_global_state must be the exact inverse of
        WorldModel._state_to_grouped (same offsets, agent order)."""
        exp, wm = build_wm()
        spec = exp.spec
        rng = np.random.default_rng(0)
        groups = tuple(
            jnp.asarray(rng.normal(size=(3, len(idxs), od)), jnp.float32)
            for (od, _), idxs in spec.groups
        )
        state = flatten_global_state(spec, groups)
        assert state.shape == (3, sum(spec.obs_dims))
        back = wm._state_to_grouped(state)
        for a, b in zip(back, groups):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestRolloutAccuracy:
    def test_metric_runs_and_is_finite(self):
        exp, wm = build_wm()
        out = rollout_accuracy(
            wm, exp.env, exp.spec, jax.random.PRNGKey(0),
            horizons=(1, 3), n_starts=8, burn_in=2,
        )
        for k in (1, 3):
            for name in (
                f"state_huber/{k}", f"reward_huber/{k}",
                f"state_huber_frozen/{k}", f"reward_huber_zero/{k}",
                f"state_huber_persist/{k}",
            ):
                assert name in out and np.isfinite(out[name]), name
        # an untrained model should NOT beat the frozen-world baseline by
        # accident at k=1 being exactly equal; just sanity: all positive
        assert out["state_huber_frozen/1"] > 0

    def test_k1_matches_one_step_predict(self):
        """Horizon-1 state error must equal Huber(predict(s0, a0), s1)
        computed by hand from the same trajectories."""
        exp, wm = build_wm()
        spec = exp.spec
        horizons = (1, 2)
        fn = make_rollout_accuracy_fn(
            wm, exp.env, exp.spec, horizons, n_starts=6, burn_in=1,
        )
        out = jax.device_get(fn(jax.random.PRNGKey(7)))

        # hand recomputation: replay the same collection program
        from mfvae_tpu.models.losses import huber
        from mfvae_tpu.training.trainer import make_action_sampler

        sample_actions, group_actions = make_action_sampler(exp.env, spec)

        def one_traj(key):
            k_reset, k_burn, k_roll = jax.random.split(key, 3)
            obs, state = exp.env.reset_stacked(k_reset)

            def step(c, k):
                obs_c, state_c = c
                k_act, k_step = jax.random.split(k)
                actions = sample_actions(k_act)
                next_obs, next_state, rewards, done, _ = exp.env.step_stacked(
                    k_step, state_c, actions
                )
                return (next_obs, next_state), (actions, rewards, next_obs)

            (obs, state), _ = jax.lax.scan(
                step, (obs, state), jax.random.split(k_burn, 1)
            )
            start_obs = obs
            _, (actions, rewards, next_obs_seq) = jax.lax.scan(
                step, (obs, state), jax.random.split(k_roll, 2)
            )
            return start_obs, actions, rewards, next_obs_seq

        start_obs, actions, rewards, next_obs_seq = jax.vmap(one_traj)(
            jax.random.split(jax.random.PRNGKey(7), 6)
        )
        actions = jnp.moveaxis(actions, 0, 1)
        obs0_g = tuple(start_obs)
        gt1 = flatten_global_state(
            spec, tuple(t[:, 0] for t in next_obs_seq)
        )
        acts0_g = group_actions(actions[0])
        pred1, rew1 = wm.predict(
            GroupedBatch(obs=obs0_g, actions=acts0_g), None
        )
        want = float(huber(pred1, gt1))
        np.testing.assert_allclose(out["state_huber/1"], want, rtol=1e-5)
        want_r = float(huber(rew1, jnp.moveaxis(rewards, 0, 1)[0]))
        np.testing.assert_allclose(out["reward_huber/1"], want_r, rtol=1e-5)

    def test_pursuit_policy_plans(self):
        exp, wm = build_wm()
        out = rollout_accuracy(
            wm, exp.env, exp.spec, jax.random.PRNGKey(1),
            horizons=(1, 2), n_starts=4, burn_in=1, policy="pursuit",
        )
        assert np.isfinite(out["state_huber/2"])

    def test_stateful_policy_threads_carry(self):
        """Stateful collection policies (sticky) now drive the ground-truth
        scan: the carry threads through burn-in into the eval rollout."""
        exp, wm = build_wm()
        out = rollout_accuracy(
            wm, exp.env, exp.spec, jax.random.PRNGKey(5),
            horizons=(1, 2), n_starts=4, burn_in=2, policy="sticky",
        )
        assert np.isfinite(out["state_huber/2"])

    def test_persist_beats_frozen_or_equal_at_k1(self):
        """At k=1 persistence and frozen are the same predictor (both s0)."""
        exp, wm = build_wm()
        out = rollout_accuracy(
            wm, exp.env, exp.spec, jax.random.PRNGKey(2),
            horizons=(1, 3), n_starts=8, burn_in=2,
        )
        np.testing.assert_allclose(
            out["state_huber_persist/1"], out["state_huber_frozen/1"], rtol=1e-6
        )
