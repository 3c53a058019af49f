#!/usr/bin/env python
"""Dreamer iterations 2-3: does the loop COMPOUND? (VERDICT r4 item 3)

Round 4 closed ONE lap of the model-based RL iteration (collect with the
distilled policy -> retrain the world model -> re-distill) and found it
stable but not significant (+3.9%, t~0.8).  A single iteration cannot
distinguish "the loop converged after iteration 0" from "improvement per
iteration is small but compounding".  This study runs the loop through
iteration 3 with an exploration schedule and reports the full iteration
curve:

  per iteration i: policy_i real return (sampled), policy_i-warmed CEM
  return, enumerated-teacher self-agreement through WM_i, and
  action_effect_ratio of WM_i — the conditioning health checks that
  detect an action-blindness relapse under on-policy data.

Protocol: iteration 0-1 are bit-compatible with round 4's
scripts/dreamer_iteration_study.py (same checkpoints under
/tmp/dreamer_iter, same keys, eps 0.05) so their results regenerate from
cache; iterations 2-3 decay collection epsilon 0.05 -> 0.03 -> 0.02
(exploration declines as the policy improves) while the per-agent
action-hold stays 0.9 (the conditioning guard is never scheduled away —
round 4 measured hold as what prevents relapse).

Plateau diagnosis uses the oracle-decomposition control arm
(results/r5/oracle_decomposition.json): if the iteration curve is flat
while true-dynamics CEM is far above, the learned model binds; if
true-dynamics CEM is also flat at this level, the planner/behavior side
binds.

Run on the TPU env: python scripts/dreamer_loop_study.py
    [n_iters] [n_episodes] [ep_len] [chunks] [epochs] [updates]
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from mfvae_tpu.behavior import save_policy, train_behavior  # noqa: E402
from mfvae_tpu.config import ExperimentConfig  # noqa: E402
from mfvae_tpu.imagination import make_policy_actor  # noqa: E402
from mfvae_tpu.inference import WorldModel  # noqa: E402
from mfvae_tpu.planning import eval_joint_policy, make_cem_actor  # noqa: E402
from mfvae_tpu.training.experiment import Experiment  # noqa: E402
from mfvae_tpu.training.trainer import (  # noqa: E402
    make_action_sampler,
    stacked_to_grouped,
)
from mfvae_tpu.envs.policies import make_collect_policy  # noqa: E402

from action_sensitivity_probe import measure_action_sensitivity  # noqa: E402
from dreamer_iteration_study import (  # noqa: E402
    HOLD,
    HORIZON,
    _retry,
    behavior_cfg,
    teacher_consistency,
)
from sticky_study import train_sticky  # noqa: E402

# collection epsilon per iteration (iteration 0 is sticky-random, no eps);
# iterations past the scheduled ones hold the final value
EPS_SCHEDULE = {1: 0.05, 2: 0.03, 3: 0.02}


def eps_for(i: int) -> float:
    return EPS_SCHEDULE.get(i, EPS_SCHEDULE[max(EPS_SCHEDULE)])


def train_wm_on_policy(i: int, policy_path: str, epochs: int,
                       updates: int) -> Experiment:
    """WM_i trained on policy_{i-1} collection (recipe + unroll W=8).
    Iteration 1 reuses round 4's checkpoint directory so the r4 protocol
    regenerates from cache; later iterations get their own."""
    cfg = ExperimentConfig()
    cfg.model.det_features = 128
    cfg.model.residual_state = True
    cfg.model.state_skip = True
    cfg.model.decoder_layernorm = True
    cfg.model.fused_decoders = False
    cfg.loss.s_weight = 300.0
    cfg.buffer.max_size = 10240
    cfg.train.unroll_steps = 8
    cfg.train.grad_clip = 10.0
    cfg.train.epoch_num = epochs
    cfg.train.collect_policy = f"imagination:{policy_path}"
    cfg.train.collect_epsilon = eps_for(i)
    cfg.train.collect_mix_frac = HOLD
    cfg.train.epochs_per_dispatch = 32
    cfg.train.run_name = f"dreamer_loop_wm{i}"
    cfg.train.log_dir = "/tmp/dreamer_iter"
    cfg.train.checkpoint_dir = (
        "/tmp/dreamer_iter/ck_wm1" if i == 1 else f"/tmp/dreamer_iter/ck_wm{i}"
    )
    cfg.train.resume = True
    behavior_cfg(cfg, updates)
    exp = Experiment(cfg).setup()
    exp.run()
    return exp


def main(n_iters: int = 3, n_episodes: int = 32, ep_len: int = 128,
         chunks: int = 4, epochs: int = 256, updates: int = 1500):
    t0 = time.time()

    def log(msg):
        print(f"[{time.time()-t0:.0f}s] {msg}", flush=True)

    # ---------------- iteration 0: sticky-random collection (round 4 base)
    exp0 = train_sticky(8, epochs, hold=HOLD, grad_clip=10.0,
                        tag="_sticky90_w8_clip10")
    behavior_cfg(exp0.cfg, updates)
    log("WM0 ready")

    iters = []  # per-iteration record
    exps = [exp0]
    policies = []

    exp_i = exp0
    for i in range(0, n_iters + 1):
        rec = {"iter": i,
               "collect": "sticky_random" if i == 0
               else f"imagination:policy{i-1} eps={eps_for(i)}"}
        rec["teacher_agree"] = _retry(
            lambda: teacher_consistency(exp_i), label=f"teacher_wm{i}")
        wm_i = WorldModel(exp_i.model, exp_i.carry.train_state.params)
        rec["action_effect_ratio"] = _retry(
            lambda: measure_action_sensitivity(exp_i, wm_i),
            label=f"ratio_wm{i}")["action_effect_ratio"]
        log(f"WM{i}: teacher_agree={rec['teacher_agree']:.3f} "
            f"ratio={rec['action_effect_ratio']:.3f}")
        res_i = _retry(lambda: train_behavior(
            exp_i, key=jax.random.PRNGKey(7)), label=f"policy{i}")
        pol_path = f"/tmp/dreamer_iter/policy{i}.msgpack"
        save_policy(pol_path, res_i, exp_i.cfg.behavior,
                    obs_dim=int(exp_i.spec.obs_dims[0]),
                    act_dim=int(exp_i.spec.act_dims[0]))
        policies.append((pol_path, res_i))
        log(f"policy{i} distilled")
        iters.append(rec)
        if i < n_iters:
            exp_i = train_wm_on_policy(i + 1, pol_path, epochs, updates)
            exps.append(exp_i)
            log(f"WM{i+1} trained on policy{i} data "
                f"(eps={eps_for(i + 1)})")

    # ---------------- eval every iteration's policy + warm CEM on the
    # common anchors/keys (one pass so all arms share the eval distribution)
    env, spec = exp0.env, exp0.spec
    n_adv = exp0.cfg.env.num_adversaries
    n_good = exp0.cfg.env.num_good_agents
    adv_idx = tuple(range(n_adv))
    is_adv = jnp.arange(spec.n_agents) < n_adv
    od_adv = spec.obs_dims[0]
    prey_off = 4 + 2 * exp0.cfg.env.num_obs + 2 * (n_adv - 1)
    sample_actions, _ = make_action_sampler(env, spec)
    scripted = make_collect_policy(env, spec, "pursuit", 0.0, sample_actions)

    def dist_fact(states, rewards):
        h, n = states.shape[:2]
        adv_obs = states[:, :, : n_adv * od_adv].reshape(h, n, n_adv, od_adv)
        rel = adv_obs[..., prey_off : prey_off + 2 * n_good].reshape(
            h, n, n_adv, n_good, 2
        )
        d = jnp.min(jnp.sqrt(jnp.sum(rel * rel, axis=-1) + 1e-12), axis=-1)
        return -jnp.sum(d, axis=0)

    def arm_random(obs, state, k):
        return sample_actions(k)

    def arm_pursuit(obs, state, k):
        k1, k2 = jax.random.split(k)
        return jnp.where(is_adv, scripted(state, k1), sample_actions(k2))

    arms = {"random": arm_random, "oracle:pursuit": arm_pursuit}
    for i, (pol_path, res_i) in enumerate(policies):
        actor = make_policy_actor(res_i.policy, res_i.params, env, spec,
                                  adv_idx, greedy=False)

        def arm_pol(obs, state, k, actor=actor):
            k1, k2 = jax.random.split(k)
            return jnp.where(is_adv, actor(obs, k1), sample_actions(k2))

        arms[f"policy{i}:sample"] = arm_pol

        wm_i = WorldModel(exps[i].model, exps[i].carry.train_state.params)

        def proposal(stacked, res_i=res_i):
            return res_i.policy.apply(
                res_i.params,
                stacked_to_grouped(spec, stacked)[0][:n_adv][None],
            )[0]

        cem_i = make_cem_actor(
            wm_i, env, spec, horizon=HORIZON, n_candidates=256,
            plan_agents=adv_idx, score_fn=dist_fact, iters=2,
            proposal_fn=proposal,
        )

        def arm_cem(obs, state, k, cem_i=cem_i):
            k1, k2 = jax.random.split(k)
            return jnp.where(is_adv, cem_i(obs, k1), sample_actions(k2))

        arms[f"cem{i}_warm:i2"] = arm_cem

    results = {}
    for name, pol in arms.items():
        rets = []
        for c in range(chunks):
            rewards = _retry(lambda: eval_joint_policy(
                env, spec, pol, n_episodes=n_episodes, ep_len=ep_len,
                key=jax.random.PRNGKey(1234 + c),
            ), label=f"eval_{name}_{c}")
            rets.append(np.asarray(jnp.sum(rewards[:, :, :n_adv], axis=(1, 2))))
        adv_ret = np.concatenate(rets)
        results[name] = {
            "adv_return_mean": float(adv_ret.mean()),
            "adv_return_sem": float(adv_ret.std(ddof=1) / np.sqrt(len(adv_ret))),
            "n_episodes": int(len(adv_ret)),
        }
        log(f"{name}: {json.dumps(results[name])}")

    for i, rec in enumerate(iters):
        rec["policy_return"] = results[f"policy{i}:sample"]["adv_return_mean"]
        rec["policy_sem"] = results[f"policy{i}:sample"]["adv_return_sem"]
        rec["cem_warm_return"] = results[f"cem{i}_warm:i2"]["adv_return_mean"]
        rec["cem_warm_sem"] = results[f"cem{i}_warm:i2"]["adv_return_sem"]

    print(json.dumps({
        "study": "Dreamer loop iterations 0..N: does it compound?",
        "hold": HOLD, "eps_schedule": EPS_SCHEDULE, "epochs": epochs,
        "updates": updates, "horizon": HORIZON,
        "iterations": iters,
        "anchors": {k: results[k] for k in ("random", "oracle:pursuit")},
        "all_arms": results,
    }))


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:7]])
