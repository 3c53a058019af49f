#!/usr/bin/env python
"""MPC planning study: can the world model CONTROL, not just predict?

The third consumer of the model-based loop (planning.py): random-shooting
MPC maximizes the adversaries' imagined return through WorldModel.rollout
and is scored on REAL simple_tag return at canonical 40-agent scale,
against two model-free anchors under identical opponents (good agents
uniform-random — which also makes the planner's implicit uniform opponent
model exact):

  - random:   adversaries act uniformly (the floor)
  - pursuit:  the scripted chase heuristic (envs/policies.py — a strong
              hand-coded upper anchor that knows the true dynamics)
  - mpc:*     MPC through two world models: the one-step recipe (w1) and
              the best long-horizon configuration (w8+clip10, from the
              rescue study; resume=True makes retraining a no-op)

Hypothesis arms (after the first run measured reward-scored MPC AT the
random baseline — the reward head under random collection is too coarse
to rank candidate plans):

  - mpc:pursuitWM      reward-scored, but through the PURSUIT-trained
                       recipe model whose reward head actually saw
                       contacts (loads /tmp/ck_recipe_pursuit)
  - mpc:*_dist         state-scored: a distance-to-prey potential computed
                       from the PREDICTED states (the accurate head) via
                       planning.py's score_fn hook — each adversary's
                       imagined observation carries the relative prey
                       positions (envs/mpe.py _observe layout)

Run on the TPU env AFTER scripts/unroll_study.py:
    python scripts/mpc_study.py [n_episodes] [ep_len]
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
from mfvae_tpu.planning import eval_joint_policy, make_mpc_actor  # noqa: E402
from mfvae_tpu.training.trainer import make_action_sampler  # noqa: E402
from mfvae_tpu.envs.policies import make_collect_policy  # noqa: E402

from unroll_study import train  # noqa: E402

HORIZON = 8
N_CANDIDATES = 256


def main(n_episodes: int = 32, ep_len: int = 128, epochs: int = 256):
    t0 = time.time()
    exp = train(1, epochs)  # resume=True: loads /tmp/ck_unroll1_random
    env, spec = exp.env, exp.spec
    n_adv = exp.cfg.env.num_adversaries
    adv_idx = tuple(range(n_adv))
    is_adv = jnp.arange(spec.n_agents) < n_adv
    sample_actions, _ = make_action_sampler(env, spec)
    scripted = make_collect_policy(env, spec, "pursuit", 0.0, sample_actions)

    def arm_random(obs, state, key):
        return sample_actions(key)

    def arm_pursuit(obs, state, key):
        k1, k2 = jax.random.split(key)
        return jnp.where(is_adv, scripted(state, k1), sample_actions(k2))

    arms = {"random": arm_random, "pursuit": arm_pursuit}

    # distance-to-prey potential over PREDICTED states: adversary i's obs
    # slice carries the relative positions of every good agent at offset
    # 4 + 2L + 2*(n_adv-1) (self_vel, self_pos, landmark_rel, other_rel
    # with the good agents last — envs/mpe.py SimpleTagEnv._observe);
    # score = -sum over adversaries and horizon of min prey distance.
    n_good = exp.cfg.env.num_good_agents
    od_adv = spec.obs_dims[0]
    prey_off = 4 + 2 * exp.cfg.env.num_obs + 2 * (n_adv - 1)

    def _min_prey_dist(states):
        # states [H, N, Σobs]; adversaries are agents 0..n_adv-1 in the
        # agent-order concat, each of width od_adv
        h, n = states.shape[:2]
        adv_obs = states[:, :, : n_adv * od_adv].reshape(h, n, n_adv, od_adv)
        rel = adv_obs[..., prey_off : prey_off + 2 * n_good].reshape(
            h, n, n_adv, n_good, 2
        )
        dist = jnp.sqrt(jnp.sum(rel * rel, axis=-1) + 1e-12)  # [H,N,adv,good]
        return jnp.min(dist, axis=-1)  # [H, N, adv]

    def distance_score(states, rewards):
        return -jnp.sum(_min_prey_dist(states), axis=(0, 2))  # [N]

    def distance_score_fact(states, rewards):
        return -jnp.sum(_min_prey_dist(states), axis=0)  # [N, adv]

    from dynamics_recipe_study import train as train_recipe

    exp_w8 = train(8, epochs, grad_clip=10.0, tag="_w8_clip10")
    exp_pursuit = train_recipe("pursuit", epochs)
    # (exp, score_fn, factorized, candidate_mode)
    wm_arms = {
        # joint argmax round (measured AT the random baseline — kept as the
        # honest anchors for the factorized fix)
        "mpc:w1": (exp, None, False, "random"),
        "mpc:w8_clip10": (exp_w8, None, False, "random"),
        "mpc:pursuitWM": (exp_pursuit, None, False, "random"),
        "mpc:w1_dist": (exp, distance_score, False, "random"),
        "mpc:w8_clip10_dist": (exp_w8, distance_score, False, "random"),
        # factorized per-agent selection (+ constant-action candidates)
        "mpc:w1_fact_rep": (exp, None, True, "repeat"),
        "mpc:w1_dist_fact": (exp, distance_score_fact, True, "random"),
        "mpc:w1_dist_fact_rep": (exp, distance_score_fact, True, "repeat"),
        "mpc:w8_dist_fact_rep": (exp_w8, distance_score_fact, True, "repeat"),
        "mpc:pursuitWM_fact_rep": (exp_pursuit, None, True, "repeat"),
    }
    for name, (exp_w, score, fact, cmode) in wm_arms.items():
        wm = WorldModel(exp_w.model, exp_w.carry.train_state.params)
        mpc = make_mpc_actor(
            wm, env, spec, horizon=HORIZON, n_candidates=N_CANDIDATES,
            plan_agents=adv_idx, score_fn=score, factorized=fact,
            candidate_mode=cmode,
        )

        def arm_mpc(obs, state, key, mpc=mpc):
            k1, k2 = jax.random.split(key)
            return jnp.where(is_adv, mpc(obs, k1), sample_actions(k2))

        arms[name] = arm_mpc
    print(f"[{time.time()-t0:.0f}s] world models ready", flush=True)

    results = {}
    for name, pol in arms.items():
        rewards = eval_joint_policy(
            env, spec, pol, n_episodes=n_episodes, ep_len=ep_len,
            key=jax.random.PRNGKey(1234),
        )
        adv_ret = np.asarray(jnp.sum(rewards[:, :, :n_adv], axis=(1, 2)))  # [E]
        results[name] = {
            "adv_return_mean": float(adv_ret.mean()),
            "adv_return_sem": float(adv_ret.std(ddof=1) / np.sqrt(len(adv_ret))),
            "n_episodes": int(len(adv_ret)),
        }
        print(f"[{time.time()-t0:.0f}s] {name}: {json.dumps(results[name])}",
              flush=True)

    print(json.dumps({
        "study": "MPC planning vs model-free anchors (real env return)",
        "horizon": HORIZON, "n_candidates": N_CANDIDATES,
        "ep_len": ep_len, "arms": results,
    }))


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:3]])
