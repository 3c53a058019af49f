#!/usr/bin/env python
"""Behavior learned in imagination: amortized policy vs the planners.

The CEM planner buys +69% real return over random at 3x256 imagined
rollouts PER REAL ENV STEP (results/r4/mpc_sticky90.json).  This study
trains a decentralized policy network entirely inside the same
action-conditioned world model (mfvae_tpu/imagination.py: REINFORCE over
policy-in-the-loop imagined futures, distance-potential score — the same
objective the planners optimize) and serves it as ONE forward pass per
step.  Questions, each measured on REAL simple_tag return against the
identical anchors/keys as every planning study:

  1. does imagination-learned behavior transfer to the real env at all
     (policy > random)?
  2. how close does an amortized policy get to the planners that search
     at serving time (policy vs shooting/CEM)?
  3. does the policy exploit model error (imagined score up, real return
     flat/down)?  The imagined-score curve is logged for exactly this.

Run on the TPU env: python scripts/imagination_policy_study.py
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
    make_imagination_trainer,
    make_policy_actor,
)
from mfvae_tpu.inference import WorldModel  # noqa: E402
from mfvae_tpu.planning import eval_joint_policy  # noqa: E402
from mfvae_tpu.training.trainer import make_action_sampler  # noqa: E402
from mfvae_tpu.envs.policies import make_collect_policy  # noqa: E402

from sticky_study import train_sticky  # noqa: E402

HORIZON = 8
HOLD = 0.9
N_ROLLOUTS = 16
S_STARTS = 256


def collect_starts(exp, n_starts, burn_in=32, key=None):
    """Real start observations from the world model's own training process
    (sticky(HOLD) rollouts after burn-in) — no NEW data regime."""
    env, spec = exp.env, exp.spec
    key = jax.random.PRNGKey(4242) if key is None else key
    sample_actions, _ = make_action_sampler(env, spec)
    pol = make_collect_policy(env, spec, "sticky", 0.1, sample_actions,
                              mix_frac=HOLD)

    def one(k):
        k_reset, k_run = jax.random.split(k)
        obs, state = env.reset_stacked(k_reset)
        pc = pol.init_carry()

        def step(c, kt):
            obs_c, state_c, pc_c = c
            k_act, k_step = jax.random.split(kt)
            pc_c, actions = pol.step(pc_c, obs_c, state_c, k_act)
            nobs, nstate, *_ = env.step_stacked(k_step, state_c, actions)
            return (nobs, nstate, pc_c), None

        (obs, state, _), _ = jax.lax.scan(
            step, (obs, state, pc), jax.random.split(k_run, burn_in)
        )
        return obs

    return jax.jit(jax.vmap(one))(jax.random.split(key, n_starts))


def main(n_episodes: int = 32, ep_len: int = 128, chunks: int = 4,
         epochs: int = 256, updates: int = 1500):
    t0 = time.time()
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

    # ---- train the policy in imagination
    policy, init_fn, update_fn = make_imagination_trainer(
        wm, env, spec, adv_idx, score_fn=dist_fact, horizon=HORIZON,
        n_rollouts=N_ROLLOUTS, learning_rate=3e-4, entropy_coef=1e-2,
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
                  f"score={curve[-1]['score_mean']:.4f} "
                  f"ent={curve[-1]['entropy']:.3f}", flush=True)

    # ---- real-env eval, identical protocol/keys to the planning studies
    def arm_random(obs, state, k):
        return sample_actions(k)

    def arm_pursuit(obs, state, k):
        k1, k2 = jax.random.split(k)
        return jnp.where(is_adv, scripted(state, k1), sample_actions(k2))

    arms = {"random": arm_random, "pursuit": arm_pursuit}
    for name, greedy in (("policy:greedy", True), ("policy:sample", False)):
        actor = make_policy_actor(policy, params, env, spec, adv_idx,
                                  greedy=greedy)

        def arm_pol(obs, state, k, actor=actor):
            k1, k2 = jax.random.split(k)
            return jnp.where(is_adv, actor(obs, k1), sample_actions(k2))

        arms[name] = arm_pol

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
        "study": "imagination-trained policy vs the planners",
        "horizon": HORIZON, "n_rollouts": N_ROLLOUTS, "updates": updates,
        "ep_len": ep_len, "hold": HOLD,
        "arms": results, "imagined_score_curve": curve,
    }
    path = Path(__file__).resolve().parents[1] / "results/r4/imagination_policy.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:6]])
