#!/usr/bin/env python
"""The Dreamer iteration: does re-collecting with the learned policy and
retraining the world model improve the next policy?

Iteration 0 (measured, results/r4/distill_policy.json): sticky(0.9)
random collection -> WM0 -> distilled policy0 (51.8k sampled real return,
+41% over random).  This study runs the loop ONCE more:

  collect WITH policy0 (collect_policy='imagination:<pol0>', hold 0.9 for
  action-conditioning, eps 0.05 exploration)  ->  WM1 (same recipe)  ->
  distill policy1 through WM1  ->  eval on the same anchors/keys.

Questions:
  1. does on-policy data improve the policy the model can teach
     (policy1 vs policy0 real return)?
  2. does the policy-warmed CEM planner improve through WM1?
  3. does the enumerated teacher stay consistent on WM1 (self-agreement
     as the action-conditioning check)?

Run on the TPU env: python scripts/dreamer_iteration_study.py
    [n_episodes] [ep_len] [chunks] [epochs] [updates]
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
from mfvae_tpu.imagination import (  # noqa: E402
    make_cem_teacher,
    make_enumerated_teacher,
    make_policy_actor,
)
from mfvae_tpu.inference import WorldModel  # noqa: E402
from mfvae_tpu.planning import eval_joint_policy, make_cem_actor  # noqa: E402
from mfvae_tpu.training.experiment import Experiment  # noqa: E402
from mfvae_tpu.training.trainer import (  # noqa: E402
    make_action_sampler,
    stacked_to_grouped,
)
from mfvae_tpu.envs.policies import make_collect_policy  # noqa: E402

from imagination_policy_study import collect_starts  # noqa: E402
from sticky_study import train_sticky  # noqa: E402

HORIZON = 8
HOLD = 0.9
EPSILON = 0.05


def _retry(fn, tries=3, label=""):
    for i in range(tries):
        try:
            return fn()
        except Exception as e:  # transient remote-compile tunnel flakes
            if i == tries - 1:
                raise
            print(f"retry {label} after: {e}", flush=True)
            time.sleep(20)


def behavior_cfg(cfg, updates):
    cfg.behavior.algo = "distill"
    cfg.behavior.score = "prey_distance"
    cfg.behavior.horizon = HORIZON
    cfg.behavior.updates = updates
    cfg.behavior.n_starts = 32
    cfg.behavior.m_rollouts = 24
    cfg.behavior.continuation = "hold"
    cfg.behavior.temperature = 0.5
    cfg.behavior.visit_steps = 3
    cfg.behavior.start_pool = 4096


def teacher_consistency(exp, n_states=64):
    """Self-agreement of the enumerated teacher through exp's WM — the
    action-conditioning health check (0.90 on WM0)."""
    wm = WorldModel(exp.model, exp.carry.train_state.params)
    n_adv = exp.cfg.env.num_adversaries
    n_good = exp.cfg.env.num_good_agents
    od_adv = exp.spec.obs_dims[0]
    prey_off = 4 + 2 * exp.cfg.env.num_obs + 2 * (n_adv - 1)

    def dist_fact(states, rewards):
        h, n = states.shape[:2]
        adv_obs = states[:, :, : n_adv * od_adv].reshape(h, n, n_adv, od_adv)
        rel = adv_obs[..., prey_off : prey_off + 2 * n_good].reshape(
            h, n, n_adv, n_good, 2
        )
        d = jnp.min(jnp.sqrt(jnp.sum(rel * rel, axis=-1) + 1e-12), axis=-1)
        return -jnp.sum(d, axis=0)

    from mfvae_tpu.behavior import collect_start_states

    bcfg = exp.cfg.behavior
    old_pool = bcfg.start_pool
    bcfg.start_pool = n_states
    pool = collect_start_states(exp, bcfg, jax.random.PRNGKey(99))
    bcfg.start_pool = old_pool
    teacher = jax.jit(make_enumerated_teacher(
        wm, exp.env, exp.spec, tuple(range(n_adv)), score_fn=dist_fact,
        horizon=HORIZON, m_rollouts=24, continuation="hold",
    ))
    a1 = jnp.argmax(teacher(pool, jax.random.PRNGKey(100)), -1)
    a2 = jnp.argmax(teacher(pool, jax.random.PRNGKey(200)), -1)
    return float(jnp.mean((a1 == a2).astype(jnp.float32)))


def main(n_episodes: int = 32, ep_len: int = 128, chunks: int = 4,
         epochs: int = 256, updates: int = 1500):
    t0 = time.time()
    out = {"hold": HOLD, "epsilon": EPSILON, "epochs": epochs,
           "updates": updates}

    # ---------------- iteration 0: the measured baseline, re-built
    exp0 = train_sticky(8, epochs, hold=HOLD, grad_clip=10.0,
                        tag="_sticky90_w8_clip10")
    behavior_cfg(exp0.cfg, updates)
    print(f"[{time.time()-t0:.0f}s] WM0 ready", flush=True)
    def prog(i, m):
        print(f"[{time.time()-t0:.0f}s] distill update {i}: {m}", flush=True)

    res0 = _retry(lambda: train_behavior(exp0, key=jax.random.PRNGKey(7),
                                         progress=prog), label="policy0")
    pol0_path = "/tmp/dreamer_iter/policy0.msgpack"
    save_policy(pol0_path, res0, exp0.cfg.behavior,
                obs_dim=int(exp0.spec.obs_dims[0]),
                act_dim=int(exp0.spec.act_dims[0]))
    out["teacher_agree_wm0"] = _retry(
        lambda: teacher_consistency(exp0), label="teacher_wm0")
    print(f"[{time.time()-t0:.0f}s] policy0 distilled; "
          f"teacher_agree(WM0)={out['teacher_agree_wm0']:.3f}", flush=True)

    # ---------------- iteration 1: collect WITH policy0, retrain, re-distill
    cfg1 = ExperimentConfig()
    cfg1.model.det_features = 128
    cfg1.model.residual_state = True
    cfg1.model.state_skip = True
    cfg1.model.decoder_layernorm = True
    cfg1.model.fused_decoders = False
    cfg1.loss.s_weight = 300.0
    cfg1.buffer.max_size = 10240
    cfg1.train.unroll_steps = 8
    cfg1.train.grad_clip = 10.0
    cfg1.train.epoch_num = epochs
    cfg1.train.collect_policy = f"imagination:{pol0_path}"
    cfg1.train.collect_epsilon = EPSILON
    cfg1.train.collect_mix_frac = HOLD  # action-hold for conditioning
    cfg1.train.epochs_per_dispatch = 32
    cfg1.train.run_name = "dreamer_iter1"
    cfg1.train.log_dir = "/tmp/dreamer_iter"
    cfg1.train.checkpoint_dir = "/tmp/dreamer_iter/ck_wm1"
    cfg1.train.resume = True
    behavior_cfg(cfg1, updates)
    exp1 = Experiment(cfg1).setup()
    exp1.run()
    print(f"[{time.time()-t0:.0f}s] WM1 trained on policy0 data", flush=True)
    out["teacher_agree_wm1"] = _retry(
        lambda: teacher_consistency(exp1), label="teacher_wm1")
    res1 = _retry(lambda: train_behavior(exp1, key=jax.random.PRNGKey(7),
                                         progress=prog), label="policy1")
    print(f"[{time.time()-t0:.0f}s] policy1 distilled; "
          f"teacher_agree(WM1)={out['teacher_agree_wm1']:.3f}", flush=True)

    # ---------------- eval on the common anchors/keys
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

    arms = {"random": arm_random, "pursuit": arm_pursuit}
    for name, res in (("policy0:sample", res0), ("policy1:sample", res1)):
        actor = make_policy_actor(res.policy, res.params, env, spec,
                                  adv_idx, greedy=False)

        def arm_pol(obs, state, k, actor=actor):
            k1, k2 = jax.random.split(k)
            return jnp.where(is_adv, actor(obs, k1), sample_actions(k2))

        arms[name] = arm_pol

    # policy1-warmed CEM through WM1 (the planner leg of iteration 1)
    wm1 = WorldModel(exp1.model, exp1.carry.train_state.params)

    def proposal1(stacked):
        return res1.policy.apply(
            res1.params, stacked_to_grouped(spec, stacked)[0][:n_adv][None]
        )[0]

    cem1 = make_cem_actor(wm1, env, spec, horizon=HORIZON, n_candidates=256,
                          plan_agents=adv_idx, score_fn=dist_fact, iters=2,
                          proposal_fn=proposal1)

    def arm_cem1(obs, state, k):
        k1, k2 = jax.random.split(k)
        return jnp.where(is_adv, cem1(obs, k1), sample_actions(k2))

    arms["cem1_warm:i2"] = arm_cem1

    results = {}
    for name, pol in arms.items():
        rets = []
        for c in range(chunks):
            rewards = eval_joint_policy(
                env, spec, pol, n_episodes=n_episodes, ep_len=ep_len,
                key=jax.random.PRNGKey(1234 + c),
            )
            rets.append(np.asarray(jnp.sum(rewards[:, :, :n_adv], axis=(1, 2))))
        adv_ret = np.concatenate(rets)
        results[name] = {
            "adv_return_mean": float(adv_ret.mean()),
            "adv_return_sem": float(adv_ret.std(ddof=1) / np.sqrt(len(adv_ret))),
            "n_episodes": int(len(adv_ret)),
        }
        print(f"[{time.time()-t0:.0f}s] {name}: {json.dumps(results[name])}",
              flush=True)

    out.update({
        "study": "Dreamer iteration: collect with policy0 -> WM1 -> policy1",
        "arms": results,
        "comparison_anchors": {
            "distill:sample iter0 (distill_policy.json)": 51782.8,
            "cem_warm:i2 iter0 (distill_policy.json)": 68711.7,
        },
    })
    path = Path(__file__).resolve().parents[1] / "results/r4/dreamer_iteration.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:6]])
