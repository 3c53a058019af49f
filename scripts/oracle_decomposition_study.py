#!/usr/bin/env python
"""Decompose the 3x planning gap to the scripted oracle (VERDICT r4 #1).

Round 4 ended with best planner 68.7k vs scripted-pursuit oracle ~209k and
an unproven attribution ("still-blurry action response and the coarse
reward head").  This study separates model error from planner limitation
with a TRUE-DYNAMICS control arm: the identical shooting/CEM actors run
with the REAL env step as the imagination (planning.EnvDynamicsModel —
same horizon, candidate budget, score, eval keys).

  - true-model planner ~ oracle  -> the learned model binds: spend the
    round on action-response sharpness (hold, on-policy sticky, action
    paths into the decoder skip).
  - true-model planner ~ 70-90k  -> the planner binds: sweep horizon /
    candidates / score shaping.

Two planner levers (horizon 16, candidates 1024) and a true-reward-scored
arm ride along, so one run yields the decomposition AND the planner-side
sensitivity.  Protocol identical to scripts/mpc_sticky_study.py: 128
episodes pooled over 4 chunks x 128 steps, eval keys PRNGKey(1234+c).

Run on the TPU env: python scripts/oracle_decomposition_study.py [n_episodes] [ep_len] [chunks]
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
    EnvDynamicsModel,
    eval_joint_policy,
    make_cem_actor,
    make_mpc_actor,
)
from mfvae_tpu.training.trainer import make_action_sampler  # noqa: E402
from mfvae_tpu.envs.policies import make_collect_policy  # noqa: E402

from sticky_study import train_sticky  # noqa: E402

HORIZON = 8
N_CANDIDATES = 256


def main(n_episodes: int = 32, ep_len: int = 128, chunks: int = 4,
         epochs: int = 256, levers: int = 0):
    t0 = time.time()
    exp = train_sticky(8, epochs, hold=0.9, grad_clip=10.0,
                       tag="_sticky90_w8_clip10")
    env, spec = exp.env, exp.spec
    wm = WorldModel(exp.model, exp.carry.train_state.params)
    tdm = EnvDynamicsModel(env, spec)
    n_adv = exp.cfg.env.num_adversaries
    n_good = exp.cfg.env.num_good_agents
    adv_idx = tuple(range(n_adv))
    is_adv = jnp.arange(spec.n_agents) < n_adv
    od_adv = spec.obs_dims[0]
    prey_off = 4 + 2 * exp.cfg.env.num_obs + 2 * (n_adv - 1)
    sample_actions, _ = make_action_sampler(env, spec)
    scripted = make_collect_policy(env, spec, "pursuit", 0.0, sample_actions)

    def _min_prey_dist(states):
        h, n = states.shape[:2]
        adv_obs = states[:, :, : n_adv * od_adv].reshape(h, n, n_adv, od_adv)
        rel = adv_obs[..., prey_off : prey_off + 2 * n_good].reshape(
            h, n, n_adv, n_good, 2
        )
        return jnp.min(jnp.sqrt(jnp.sum(rel * rel, axis=-1) + 1e-12), axis=-1)

    def dist_fact(states, rewards):
        return -jnp.sum(_min_prey_dist(states), axis=0)  # [N, adv]

    def arm_random(obs, state, key):
        return sample_actions(key)

    def arm_pursuit(obs, state, key):
        k1, k2 = jax.random.split(key)
        return jnp.where(is_adv, scripted(state, k1), sample_actions(k2))

    arms = {"random": arm_random, "oracle:pursuit": arm_pursuit}

    def add_actor(name, actor):
        def arm(obs, state, key, actor=actor):
            k1, k2 = jax.random.split(key)
            return jnp.where(is_adv, actor(obs, k1, state), sample_actions(k2))

        arms[name] = arm

    # learned-model anchors (sticky90 WM): the best shooting and CEM arms
    add_actor("learned:shoot_dist", make_mpc_actor(
        wm, env, spec, horizon=HORIZON, n_candidates=N_CANDIDATES,
        plan_agents=adv_idx, score_fn=dist_fact, factorized=True,
        candidate_mode="random",
    ))
    add_actor("learned:cem_dist_i3", make_cem_actor(
        wm, env, spec, horizon=HORIZON, n_candidates=N_CANDIDATES,
        plan_agents=adv_idx, score_fn=dist_fact, iters=3,
    ))
    # true-dynamics control arms: identical planners, real env imagination
    add_actor("true:shoot_dist", make_mpc_actor(
        tdm, env, spec, horizon=HORIZON, n_candidates=N_CANDIDATES,
        plan_agents=adv_idx, score_fn=dist_fact, factorized=True,
        candidate_mode="random",
    ))
    add_actor("true:cem_dist_i3", make_cem_actor(
        tdm, env, spec, horizon=HORIZON, n_candidates=N_CANDIDATES,
        plan_agents=adv_idx, score_fn=dist_fact, iters=3,
    ))
    # planner SCORE lever through TRUE dynamics: the exact reward signal
    add_actor("true:cem_rew_i3", make_cem_actor(
        tdm, env, spec, horizon=HORIZON, n_candidates=N_CANDIDATES,
        plan_agents=adv_idx, score_fn=None, iters=3,
    ))
    # horizon/budget levers (H16, N1024): the first run measured
    # true:cem_dist_i3 = 208,748 = the scripted oracle (209,133), so the
    # planner has NO remaining headroom and these arms are moot; they also
    # crashed the axon TPU worker (1024 candidates x 41-agent env state
    # through a 128-step planning-in-the-loop scan).  Gated off.
    if levers:
        add_actor("true:cem_dist_i3_H16", make_cem_actor(
            tdm, env, spec, horizon=16, n_candidates=N_CANDIDATES,
            plan_agents=adv_idx, score_fn=dist_fact, iters=3,
        ))
        add_actor("true:cem_dist_i3_N1024", make_cem_actor(
            tdm, env, spec, horizon=HORIZON, n_candidates=1024,
            plan_agents=adv_idx, score_fn=dist_fact, iters=3,
        ))

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

    print(json.dumps({
        "study": "oracle-gap decomposition: true-dynamics planner control arm",
        "horizon": HORIZON, "n_candidates": N_CANDIDATES, "ep_len": ep_len,
        "arms": results,
    }))


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:6]])
