#!/usr/bin/env python
"""MPC through the action-CONDITIONED world model (sticky + unroll).

Closes the action-blindness chain (PARITY.md round 4): every MPC arm
through action-blind models measured at the random baseline
(results/r4/mpc_study.json); sticky-action collection + the W=8 unroll
objective raised action_effect_ratio 0.012 -> ~0.35
(results/r4/sticky_study.json).  This study asks whether that is enough
imagined controllability to plan with: factorized distance- and
reward-scored MPC through the sticky_w8_clip10 model, same protocol and
anchors as scripts/mpc_study.py.

Run on the TPU env AFTER scripts/sticky_study.py:
    python scripts/mpc_sticky_study.py [n_episodes] [ep_len]
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
from mfvae_tpu.training.trainer import make_action_sampler  # noqa: E402
from mfvae_tpu.envs.policies import make_collect_policy  # noqa: E402

from sticky_study import train_sticky  # noqa: E402

HORIZON = 8
N_CANDIDATES = 256


def main(n_episodes: int = 32, ep_len: int = 128, chunks: int = 1,
         hold_pct: int = 75, epochs: int = 256):
    t0 = time.time()
    hold = hold_pct / 100.0
    tag = "_sticky_w8_clip10" if hold_pct == 75 else (
        f"_sticky{hold_pct}_w8_clip10"
    )
    exp = train_sticky(8, epochs, hold=hold, grad_clip=10.0, tag=tag)
    env, spec = exp.env, exp.spec
    wm = WorldModel(exp.model, exp.carry.train_state.params)
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

    arms = {"random": arm_random, "pursuit": arm_pursuit}
    actors = {}
    for name, (score, fact, cmode) in {
        "mpc:sticky_w8_dist_fact_rep": (dist_fact, True, "repeat"),
        "mpc:sticky_w8_rew_fact_rep": (None, True, "repeat"),
        "mpc:sticky_w8_dist_fact_rand": (dist_fact, True, "random"),
    }.items():
        actors[name] = make_mpc_actor(
            wm, env, spec, horizon=HORIZON, n_candidates=N_CANDIDATES,
            plan_agents=adv_idx, score_fn=score, factorized=fact,
            candidate_mode=cmode,
        )
    # CEM: same per-iteration candidate budget; 3 refit rounds (3x rollout
    # cost per env step vs shooting)
    actors["cem:sticky_w8_dist_i3"] = make_cem_actor(
        wm, env, spec, horizon=HORIZON, n_candidates=N_CANDIDATES,
        plan_agents=adv_idx, score_fn=dist_fact, iters=3,
    )
    for name, actor in actors.items():
        def arm_mpc(obs, state, key, actor=actor):
            k1, k2 = jax.random.split(key)
            return jnp.where(is_adv, actor(obs, k1), sample_actions(k2))

        arms[name] = arm_mpc

    results = {}
    for name, pol in arms.items():
        # chunked episode batches: E x N_CANDIDATES rollouts at E=128 in one
        # program overflowed HBM and crashed the TPU worker — pool chunks
        # of n_episodes instead (identical statistics, bounded memory)
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
        "study": "MPC through the action-conditioned (sticky+unroll) world model",
        "horizon": HORIZON, "n_candidates": N_CANDIDATES, "ep_len": ep_len,
        "arms": results,
    }))


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:5]])
