#!/usr/bin/env python
"""Actor-critic in imagination: does value bootstrapping beat REINFORCE?

The REINFORCE imagination policy (46.2k real return) and every planner
are capped at the H=8 imagination horizon — nothing optimizes beyond the
error-compounding limit of the world model's open-loop rollouts.  The
Dreamer move (imagination.make_actor_critic_trainer): learn a critic on
TD(lambda) targets whose last entry bootstraps V(s_H), so the H=8
imagined rollout trains the policy against an effectively infinite
discounted objective.  Dense per-step reward = the same distance
potential every planning study optimizes (r_t = -min prey distance after
step t, per adversary).

Measured questions, same anchors/keys as every planning study:
  1. actor-critic vs REINFORCE at equal serving cost (one forward pass);
  2. actor-critic vs the planners (CEM 62.1k at 768 rollouts/step);
  3. does the longer effective horizon show up as behavior (higher
     return per entropy than the myopic trainers)?

Run on the TPU env: python scripts/actor_critic_study.py
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
    make_actor_critic_trainer,
    make_policy_actor,
)
from mfvae_tpu.inference import WorldModel  # noqa: E402
from mfvae_tpu.planning import eval_joint_policy  # noqa: E402
from mfvae_tpu.training.trainer import make_action_sampler  # noqa: E402
from mfvae_tpu.envs.policies import make_collect_policy  # noqa: E402

from imagination_policy_study import collect_starts  # noqa: E402
from sticky_study import train_sticky  # noqa: E402

HORIZON = 8
HOLD = 0.9
N_ROLLOUTS = 16
S_STARTS = 256
GAMMA = 0.95
LAM = 0.95


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

    def dense_dist(states, rewards):
        return -_min_prey_dist(states)  # [H, B, adv] per-step potential

    policy, value, init_fn, update_fn = make_actor_critic_trainer(
        wm, env, spec, adv_idx, step_score_fn=dense_dist, horizon=HORIZON,
        n_rollouts=N_ROLLOUTS, learning_rate=3e-4, entropy_coef=1e-2,
        gamma=GAMMA, lam=LAM,
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
                  f"ret={curve[-1]['return_mean']:.3f} "
                  f"vloss={curve[-1]['value_loss']:.4f} "
                  f"ent={curve[-1]['entropy']:.3f}", flush=True)

    # ---- real-env eval, identical protocol/keys to the planning studies
    def arm_random(obs, state, k):
        return sample_actions(k)

    def arm_pursuit(obs, state, k):
        k1, k2 = jax.random.split(k)
        return jnp.where(is_adv, scripted(state, k1), sample_actions(k2))

    arms = {"random": arm_random, "pursuit": arm_pursuit}
    for name, greedy in (("ac:greedy", True), ("ac:sample", False)):
        actor = make_policy_actor(policy, params["pi"], env, spec, adv_idx,
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
        "study": "actor-critic (TD-lambda bootstrapped) imagination policy",
        "horizon": HORIZON, "n_rollouts": N_ROLLOUTS, "updates": updates,
        "gamma": GAMMA, "lam": LAM, "ep_len": ep_len, "hold": HOLD,
        "comparison_anchors": {
            "policy:sample (REINFORCE, imagination_policy.json)": 46176.6,
            "cem:sticky_w8_dist_i3 (mpc_sticky90.json)": 62088.3,
        },
        "arms": results, "curve": curve,
    }
    path = Path(__file__).resolve().parents[1] / "results/r4/actor_critic.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:6]])
