#!/usr/bin/env python
"""model.action_delta_head: does the direct action->delta pathway sharpen
action response and move real planning return? (round 5)

The oracle decomposition (results/r5/oracle_decomposition.json) proved
the planner already extracts everything the model gives it — true-
dynamics CEM EQUALS the scripted oracle — so the 62.1k -> 209k headroom
is pure model error.  This study trains the sticky(0.9)+W8 recipe with
the zero-init per-agent action->own-obs-delta linear head and measures
the chain the lever targets:

  action_effect_ratio  ->  rollout accuracy  ->  real MPC/CEM return

against the round-4 baseline model (checkpoint-cached; shooting 52.3k /
CEM-i3 62.1k under the same protocol and keys).  A hold=0.95 composition
arm rides along (the two levers attack the same signal from the data and
the architecture sides).

Run on the TPU env: python scripts/action_delta_study.py
    [n_episodes] [ep_len] [chunks] [epochs]
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

from mfvae_tpu.inference import WorldModel  # noqa: E402
from mfvae_tpu.planning import (  # noqa: E402
    eval_joint_policy,
    make_cem_actor,
    make_mpc_actor,
)
from mfvae_tpu.rollout_eval import rollout_accuracy  # noqa: E402
from mfvae_tpu.training.trainer import make_action_sampler  # noqa: E402

from action_sensitivity_probe import measure_action_sensitivity  # noqa: E402
from sticky_study import train_sticky  # noqa: E402

HORIZON = 8
N_CANDIDATES = 256

ARMS = (
    {"name": "baseline", "adh": False, "hold": 0.9,
     "tag": "_sticky90_w8_clip10"},
    {"name": "action_delta", "adh": True, "hold": 0.9,
     "tag": "_adh90_w8_clip10"},
    {"name": "action_delta_hold95", "adh": True, "hold": 0.95,
     "tag": "_adh95_w8_clip10"},
)


def main(n_episodes: int = 32, ep_len: int = 128, chunks: int = 4,
         epochs: int = 256):
    t0 = time.time()
    out = {}
    eval_arms = {}
    exp0 = None
    for arm in ARMS:
        exp = train_sticky(8, epochs, hold=arm["hold"], grad_clip=10.0,
                           tag=arm["tag"], action_delta_head=arm["adh"])
        if exp0 is None:
            exp0 = exp
        wm = WorldModel(exp.model, exp.carry.train_state.params)
        print(f"[{time.time()-t0:.0f}s] {arm['name']} trained", flush=True)
        cell = {
            "action_effect_ratio": measure_action_sensitivity(exp, wm)[
                "action_effect_ratio"
            ]
        }
        roll = {}
        for pol in ("random", "pursuit"):
            r = rollout_accuracy(
                wm, exp.env, exp.spec, jax.random.PRNGKey(123),
                horizons=(1, 5, 25), n_starts=256, burn_in=32,
                policy=pol, collect_epsilon=0.1,
            )
            roll[pol] = {k: r[k] for k in sorted(r)
                         if k.startswith("state_huber/")}
        cell["state_error"] = roll
        out[arm["name"]] = cell
        eval_arms[arm["name"]] = (exp, wm)
        print(f"[{time.time()-t0:.0f}s] {arm['name']}: "
              f"ratio={cell['action_effect_ratio']:.4f}", flush=True)

    # ---------------- real-env planning eval (protocol + keys of
    # scripts/mpc_sticky_study.py, so returns are comparable to round 4)
    env, spec = exp0.env, exp0.spec
    n_adv = exp0.cfg.env.num_adversaries
    n_good = exp0.cfg.env.num_good_agents
    adv_idx = tuple(range(n_adv))
    is_adv = jnp.arange(spec.n_agents) < n_adv
    od_adv = spec.obs_dims[0]
    prey_off = 4 + 2 * exp0.cfg.env.num_obs + 2 * (n_adv - 1)
    sample_actions, _ = make_action_sampler(env, spec)

    def dist_fact(states, rewards):
        h, n = states.shape[:2]
        adv_obs = states[:, :, : n_adv * od_adv].reshape(h, n, n_adv, od_adv)
        rel = adv_obs[..., prey_off : prey_off + 2 * n_good].reshape(
            h, n, n_adv, n_good, 2
        )
        d = jnp.min(jnp.sqrt(jnp.sum(rel * rel, axis=-1) + 1e-12), axis=-1)
        return -jnp.sum(d, axis=0)

    planner_arms = {}
    for name, (exp, wm) in eval_arms.items():
        planner_arms[f"{name}:shoot"] = make_mpc_actor(
            wm, env, spec, horizon=HORIZON, n_candidates=N_CANDIDATES,
            plan_agents=adv_idx, score_fn=dist_fact, factorized=True,
            candidate_mode="random",
        )
        planner_arms[f"{name}:cem_i3"] = make_cem_actor(
            wm, env, spec, horizon=HORIZON, n_candidates=N_CANDIDATES,
            plan_agents=adv_idx, score_fn=dist_fact, iters=3,
        )

    results = {}
    for name, actor in planner_arms.items():
        def arm_pol(obs, state, k, actor=actor):
            k1, k2 = jax.random.split(k)
            return jnp.where(is_adv, actor(obs, k1), sample_actions(k2))

        rets = []
        for c in range(chunks):
            rewards = eval_joint_policy(
                env, spec, arm_pol, n_episodes=n_episodes, ep_len=ep_len,
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

    for name in out:
        out[name]["planning"] = {
            k.split(":", 1)[1]: v for k, v in results.items()
            if k.startswith(f"{name}:")
        }

    print(json.dumps({
        "study": "action_delta_head: action->delta pathway vs planning return",
        "epochs": epochs, "horizon": HORIZON, "n_candidates": N_CANDIDATES,
        "round4_anchors": {"shoot": 52284.4, "cem_i3": 62088.3,
                           "true_cem_i3": 208748.4, "oracle": 209132.8,
                           "random": 36843.75},
        "arms": out,
    }))


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:5]])
