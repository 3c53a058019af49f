#!/usr/bin/env python
"""Planner distillation: does imitating CEM close the amortization gap?

The measured ladder through the SAME world model (sticky(0.9) + unroll
W=8 recipe), same anchors, same eval keys:

  random 36.8k  <  REINFORCE policy 45.6k/46.2k  <  shooting-MPC 52.3k
  <  CEM 62.1k  (results/r4/{imagination_policy,mpc_sticky90}.json)

CEM pays 3x256 imagined rollouts per REAL env step; the REINFORCE policy
serves at ONE forward pass but leaves ~26% of CEM's return on the table.
This study trains a policy by DAgger-style distillation of the planner
inside imagination (mfvae_tpu/imagination.py: make_distillation_trainer)
and asks, on real simple_tag return:

  1. does the distilled policy beat the REINFORCE policy at equal serving
     cost (one forward pass)?
  2. how much of the CEM teacher's return survives amortization?
  3. does warm-starting CEM's categoricals from the distilled policy
     (planning.make_cem_actor proposal_fn) buy back the planner's return
     at fewer refit iterations (256 vs 768 imagined rollouts/step)?

The teacher is the ENUMERATED + common-random-numbers labeler
(imagination.make_enumerated_teacher).  Two cheaper teachers measured
dead on arrival through this world model (results/r4/
teacher_consistency.json + the stalled bc curves): CEM argmax labels
self-agree at chance (0.21-0.32 vs 0.20), and soft advantage-weighted
histograms of random candidate plans converge the student to uniform
(bc -> ln 5) — in both, 8 steps of 30 random-acting agents' continuation
noise swamps the first action being scored.  Enumeration + CRN cancels
the continuation across the K arms instead of averaging over it.

Run on the TPU env: python scripts/distill_study.py
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

from mfvae_tpu.imagination import (  # noqa: E402
    make_distillation_trainer,
    make_policy_actor,
)
from mfvae_tpu.inference import WorldModel  # noqa: E402
from mfvae_tpu.planning import eval_joint_policy, make_cem_actor  # noqa: E402
from mfvae_tpu.training.trainer import (  # noqa: E402
    make_action_sampler,
    stacked_to_grouped,
)
from mfvae_tpu.envs.policies import make_collect_policy  # noqa: E402

from imagination_policy_study import collect_starts  # noqa: E402
from sticky_study import train_sticky  # noqa: E402

HORIZON = 8
HOLD = 0.9
M_ROLLOUTS = 24
CONTINUATION = "hold"
TEMPERATURE = 0.5
VISIT_STEPS = 3
S_STARTS = 32  # B = S*(1+VISIT_STEPS) = 128 states/update; x(5*M) rollouts


def main(n_episodes: int = 32, ep_len: int = 128, chunks: int = 4,
         epochs: int = 256, updates: int = 1000, width: int = 128,
         control_wm: int = 0):
    t0 = time.time()
    # control_wm=1 (round 5): distill through the CONTROL-grade world
    # model (action_delta_head + hold 0.95, examples/world_model_control
    # .yaml) — the teacher then ranks actions through a model whose CEM
    # reaches 92% of the scripted oracle (results/r5/action_delta.json)
    if control_wm:
        exp = train_sticky(8, epochs, hold=0.95, grad_clip=10.0,
                           tag="_adh95_w8_clip10", action_delta_head=True)
    else:
        exp = train_sticky(8, epochs, hold=HOLD, grad_clip=10.0,
                           tag="_sticky90_w8_clip10")
    wm = WorldModel(exp.model, exp.carry.train_state.params)
    env, spec = exp.env, exp.spec
    n_adv = exp.cfg.env.num_adversaries
    n_good = exp.cfg.env.num_good_agents
    adv_idx = tuple(range(n_adv))
    is_adv = jnp.arange(spec.n_agents) < n_adv
    od_adv = spec.obs_dims[0]
    prey_off = 4 + 2 * exp.cfg.env.num_obs + 2 * (n_adv - 1)
    sample_actions, _ = make_action_sampler(env, spec)
    scripted = make_collect_policy(env, spec, "pursuit", 0.0, sample_actions)
    print(f"[{time.time()-t0:.0f}s] WM ready", flush=True)

    def _min_prey_dist(states):
        h, n = states.shape[:2]
        adv_obs = states[:, :, : n_adv * od_adv].reshape(h, n, n_adv, od_adv)
        rel = adv_obs[..., prey_off : prey_off + 2 * n_good].reshape(
            h, n, n_adv, n_good, 2
        )
        return jnp.min(jnp.sqrt(jnp.sum(rel * rel, axis=-1) + 1e-12), axis=-1)

    def dist_fact(states, rewards):
        return -jnp.sum(_min_prey_dist(states), axis=0)  # [B, adv]

    # ---- distill the CEM teacher into the policy, inside imagination
    policy, init_fn, update_fn = make_distillation_trainer(
        wm, env, spec, adv_idx, score_fn=dist_fact, horizon=HORIZON,
        visit_steps=VISIT_STEPS, learning_rate=3e-4,
        teacher_mode="enumerated", m_rollouts=M_ROLLOUTS,
        continuation=CONTINUATION, temperature=TEMPERATURE,
        hidden=(width, width),
    )
    pool = collect_starts(exp, 4096)
    params, opt = init_fn(jax.random.PRNGKey(0), pool[0][0, 0])
    key = jax.random.PRNGKey(7)
    curve = []
    for i in range(updates):
        k_i = jax.random.fold_in(key, i)
        rows = jax.random.choice(
            jax.random.fold_in(k_i, 1), pool[0].shape[0], (S_STARTS,),
            replace=False,
        )
        obs_starts = tuple(o[rows] for o in pool)
        params, opt, m = update_fn(params, opt, obs_starts, k_i)
        if i % 100 == 0 or i == updates - 1:
            m = jax.device_get(m)
            curve.append({"update": i, **{k: float(v) for k, v in m.items()}})
            print(f"[{time.time()-t0:.0f}s] update {i}: "
                  f"bc={curve[-1]['bc_loss']:.4f} "
                  f"agree={curve[-1]['teacher_agree']:.3f} "
                  f"ent={curve[-1]['entropy']:.3f}", flush=True)

    # ---- real-env eval, identical protocol/keys to the planning studies
    def arm_random(obs, state, k):
        return sample_actions(k)

    def arm_pursuit(obs, state, k):
        k1, k2 = jax.random.split(k)
        return jnp.where(is_adv, scripted(state, k1), sample_actions(k2))

    arms = {"random": arm_random, "pursuit": arm_pursuit}
    for name, greedy in (("distill:greedy", True), ("distill:sample", False)):
        actor = make_policy_actor(policy, params, env, spec, adv_idx,
                                  greedy=greedy)

        def arm_pol(obs, state, k, actor=actor):
            k1, k2 = jax.random.split(k)
            return jnp.where(is_adv, actor(obs, k1), sample_actions(k2))

        arms[name] = arm_pol

    # warm-started CEM: distilled policy as the proposal, fewer iters
    def proposal_fn(stacked):
        return policy.apply(
            params, stacked_to_grouped(spec, stacked)[0][:n_adv][None]
        )[0]

    for cem_name, it in (("cem_warm:i1", 1), ("cem_warm:i2", 2)):
        cem = make_cem_actor(
            wm, env, spec, horizon=HORIZON, n_candidates=256,
            plan_agents=adv_idx, score_fn=dist_fact, iters=it,
            proposal_fn=proposal_fn,
        )

        def arm_cem(obs, state, k, cem=cem):
            k1, k2 = jax.random.split(k)
            return jnp.where(is_adv, cem(obs, k1), sample_actions(k2))

        arms[cem_name] = arm_cem

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

    out = {
        "study": "planner distillation (enumerated+CRN teacher) vs REINFORCE at one-forward-pass serving",
        "teacher_mode": "enumerated", "m_rollouts": M_ROLLOUTS,
        "continuation": CONTINUATION, "temperature": TEMPERATURE,
        "horizon": HORIZON, "visit_steps": VISIT_STEPS,
        "updates": updates, "ep_len": ep_len, "hold": HOLD,
        "hidden": [width, width],
        "dead_teachers_note": "CEM argmax labels: chance self-agreement; "
        "soft candidate histograms: student converges to uniform "
        "(teacher_consistency.json)",
        "comparison_anchors": {
            "policy:greedy (REINFORCE, imagination_policy.json)": 45555.5,
            "cem:sticky_w8_dist_i3 (mpc_sticky90.json)": 62088.3,
        },
        "arms": results, "distill_curve": curve,
    }
    name = "distill_policy.json" if width == 128 else f"distill_policy_w{width}.json"
    path = Path(__file__).resolve().parents[1] / "results/r4" / name
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:8]])
