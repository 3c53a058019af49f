"""Regression pins for round 4's central mechanism: action-conditioning.

The action-blindness discovery (PARITY.md round 4): a world model trained
on uniform random rollouts ignores actions (action_effect_ratio ≈ 0.01 at
production scale) because the per-step action effect is ~1% of the step
delta — and every MPC arm through such a model measures exactly AT the
random baseline.  The measured fix chain is sticky collection
(collect_policy='sticky', per-agent action hold) + open-loop unroll
training (train.unroll_steps>1), which makes action-attributable error
accumulate inside training windows.

These tests pin that mechanism at toy scale with a fixed seed so a silent
regression in any link (sticky collection, sample_window seam handling,
unroll BPTT, WorldModel.rollout action plumbing, factorized MPC selection)
fails the suite:

  1. the sticky+unroll model's action_effect_ratio must beat the
     random-data model's by a wide margin (measured at this scale/seed:
     1.04 vs 0.36);
  2. distance-scored factorized MPC through the conditioned toy model must
     beat random actions on REAL env return (measured: 33.8 vs 11.3 tag
     contacts — the toy version of results/r4/mpc_sticky90.json's +42%).

The ratio measurement mirrors scripts/action_sensitivity_probe.py
(measure_action_sensitivity) in compact form: roll H steps with every
adversary holding one constant direction through (a) the true env and
(b) WorldModel.rollout, and compare cross-direction separation of final
adversary positions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfvae_tpu.config import ExperimentConfig
from mfvae_tpu.inference import WorldModel
from mfvae_tpu.planning import eval_joint_policy, make_mpc_actor
from mfvae_tpu.training.experiment import Experiment
from mfvae_tpu.training.trainer import make_action_sampler, stacked_to_grouped

H = 6  # probe/plan horizon
B = 32  # burn-in states for the ratio probe
DIRS = {"left": 1, "right": 2, "down": 3, "up": 4}  # envs/mpe.py:53


def tiny_wm_cfg(**train_kw):
    """The dynamics-recipe levers (examples/world_model.yaml) at toy scale:
    2 adversaries, 1 prey, 64 epochs — small enough for the CPU suite,
    big enough that the sticky+unroll vs random-data separation is wide."""
    cfg = ExperimentConfig()
    cfg.env.num_good_agents = 1
    cfg.env.num_adversaries = 2
    cfg.env.num_obs = 1
    cfg.env.max_steps = 16
    cfg.model.det_features = 32
    cfg.model.residual_state = True
    cfg.model.state_skip = True
    cfg.model.decoder_layernorm = True
    cfg.model.fused_decoders = False
    cfg.model.idx_features = 8
    cfg.model.obs_features = 16
    cfg.model.action_features = 16
    cfg.model.encoder_hidden = (32,)
    cfg.model.action_encoder_hidden = (16,)
    cfg.model.decoder_hidden = (64, 64)
    cfg.model.compute_dtype = "float32"
    cfg.loss.s_weight = 300.0
    cfg.buffer.max_size = 2048
    cfg.buffer.min_size = 64
    cfg.buffer.batch_size = 64
    cfg.train.batch_size = 64
    cfg.train.sample_num = 64
    cfg.train.train_num = 6
    cfg.train.test_num = 2
    cfg.train.epoch_num = 64
    cfg.train.epochs_per_dispatch = 16
    cfg.train.checkpoint_dir = ""
    for k, v in train_kw.items():
        setattr(cfg.train, k, v)
    return cfg


def train_arm(tmp_path_factory, name, **train_kw):
    log = tmp_path_factory.mktemp(f"wm_{name}")
    cfg = tiny_wm_cfg(run_name=name, log_dir=str(log), **train_kw)
    exp = Experiment(cfg).setup()
    exp.run()
    return exp, WorldModel(exp.model, exp.carry.train_state.params)


@pytest.fixture(scope="module")
def blind_arm(tmp_path_factory):
    """Reference-style collection: uniform random actions, one-step loss."""
    return train_arm(
        tmp_path_factory, "blind", collect_policy="random", unroll_steps=1
    )


@pytest.fixture(scope="module")
def conditioned_arm(tmp_path_factory):
    """The measured fix chain: sticky(0.9) collection + unroll W=4 BPTT."""
    return train_arm(
        tmp_path_factory,
        "cond",
        collect_policy="sticky",
        collect_mix_frac=0.9,
        unroll_steps=4,
        grad_clip=10.0,
    )


def action_effect_ratio(exp, wm):
    env, spec = exp.env, exp.spec
    n_adv = exp.cfg.env.num_adversaries
    n_agents = spec.n_agents
    od_adv = spec.obs_dims[0]
    sample_actions, group_actions = make_action_sampler(env, spec)

    @jax.jit
    def burn_in(key):
        def one(k):
            k0, kr = jax.random.split(k)
            obs, state = env.reset_stacked(k0)

            def step(c, kk):
                o, s = c
                ka, ks = jax.random.split(kk)
                no, ns, *_ = env.step_stacked(ks, s, sample_actions(ka))
                return (no, ns), ()

            (obs, state), _ = jax.lax.scan(
                step, (obs, state), jax.random.split(kr, 16)
            )
            return obs, state

        return jax.vmap(one)(jax.random.split(key, B))

    obs0, state0 = burn_in(jax.random.PRNGKey(77))

    @jax.jit
    def true_roll(state, plan):
        def one(s, acts):
            def step(s_c, a_t):
                no, ns, *_ = env.step_stacked(jax.random.PRNGKey(0), s_c, a_t)
                return ns, no

            _, obs_seq = jax.lax.scan(step, s, acts)
            return obs_seq

        return jax.vmap(one)(state, jnp.moveaxis(plan, 1, 0))

    finals_true, finals_pred = {}, {}
    for dname, aid in DIRS.items():
        plan = (
            jnp.zeros((H, B, n_agents), jnp.int32).at[:, :, :n_adv].set(aid)
        )
        obs_seq = true_roll(state0, plan)
        finals_true[dname] = np.asarray(tuple(obs_seq)[0][:, -1, :, 2:4])
        states, _ = wm._rollout(
            tuple(stacked_to_grouped(spec, obs0)), group_actions(plan)
        )
        adv_obs = np.asarray(states[-1][:, : n_adv * od_adv]).reshape(
            B, n_adv, od_adv
        )
        finals_pred[dname] = adv_obs[:, :, 2:4]
    names = list(DIRS)
    sep_t, sep_p = [], []
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            sep_t.append(
                float(
                    np.linalg.norm(
                        finals_true[names[i]] - finals_true[names[j]], axis=-1
                    ).mean()
                )
            )
            sep_p.append(
                float(
                    np.linalg.norm(
                        finals_pred[names[i]] - finals_pred[names[j]], axis=-1
                    ).mean()
                )
            )
    return float(np.mean(sep_p) / np.mean(sep_t))


class TestActionEffectRatio:
    def test_sticky_unroll_model_beats_random_data_model(
        self, blind_arm, conditioned_arm
    ):
        r_blind = action_effect_ratio(*blind_arm)
        r_cond = action_effect_ratio(*conditioned_arm)
        # measured at this scale/seed: blind 0.36, conditioned 1.04.
        # Wide slack on the absolutes; the MARGIN is the regression pin.
        assert r_blind < 0.6, f"random-data model too conditioned: {r_blind}"
        assert r_cond > 0.7, f"sticky+unroll model action-blind: {r_cond}"
        assert r_cond > 1.6 * r_blind, (r_cond, r_blind)


class TestPlanningThroughLearnedModel:
    def test_distance_mpc_beats_random_on_real_return(self, conditioned_arm):
        """Factorized distance-scored MPC (the shipped planning signal,
        scripts/mpc_study.py) through the CONDITIONED toy model must beat
        random actions on real tag return (measured: ~3x)."""
        exp, wm = conditioned_arm
        env, spec = exp.env, exp.spec
        n_adv = exp.cfg.env.num_adversaries
        n_good = exp.cfg.env.num_good_agents
        od_adv = spec.obs_dims[0]
        prey_off = 4 + 2 * exp.cfg.env.num_obs + 2 * (n_adv - 1)

        def min_prey_dist(states):
            h, n = states.shape[:2]
            adv_obs = states[:, :, : n_adv * od_adv].reshape(
                h, n, n_adv, od_adv
            )
            rel = adv_obs[..., prey_off : prey_off + 2 * n_good].reshape(
                h, n, n_adv, n_good, 2
            )
            return jnp.min(
                jnp.sqrt(jnp.sum(rel * rel, -1) + 1e-12), -1
            )  # [H, N, adv]

        def dist_score_fact(states, rewards):
            return -jnp.sum(min_prey_dist(states), axis=0)  # [N, adv]

        act = make_mpc_actor(
            wm,
            env,
            spec,
            horizon=H,
            n_candidates=32,
            plan_agents=list(range(n_adv)),
            score_fn=dist_score_fact,
            factorized=True,
            candidate_mode="repeat",
        )
        sample_actions, _ = make_action_sampler(env, spec)
        key = jax.random.PRNGKey(5)
        r_mpc = eval_joint_policy(
            env, spec, lambda o, s, k: act(o, k), n_episodes=16, ep_len=16,
            key=key,
        )
        r_rand = eval_joint_policy(
            env, spec, lambda o, s, k: sample_actions(k), n_episodes=16,
            ep_len=16, key=key,
        )
        adv_mpc = float(r_mpc[..., :n_adv].sum((-1, -2)).mean())
        adv_rand = float(r_rand[..., :n_adv].sum((-1, -2)).mean())
        # measured: mpc 33.8 vs random 11.3 contacts
        assert adv_mpc > 1.5 * adv_rand, (adv_mpc, adv_rand)
