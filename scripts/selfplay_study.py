#!/usr/bin/env python
"""Self-play imagination on simple_tag (round 5 stretch, VERDICT r4 #8).

Both teams trained as imagination policies against each other inside the
SAME world model: adversaries minimize predicted prey distance, the prey
team maximizes its predicted distance from the nearest adversary —
alternating best-response REINFORCE (imagination.make_selfplay_trainer).
The question: does an adversary policy trained against a LEARNED prey
still beat the scripted anchors when served against real opponents — and
does the learned prey actually evade better than random?

Eval grid on the real env (common keys, 128 episodes/arm):
  adversary in {random, selfplay, vs-random-trained} x
  prey in {random, selfplay, scripted-evade}
where 'vs-random-trained' is the round-4 style one-sided imagination
policy (prey random in imagination) — the control that isolates what
training AGAINST a learning opponent adds.

Run on the TPU env: python scripts/selfplay_study.py
    [n_episodes] [ep_len] [chunks] [epochs] [rounds] [updates_each]
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

from mfvae_tpu.behavior import collect_start_states  # noqa: E402
from mfvae_tpu.imagination import (  # noqa: E402
    make_imagination_trainer,
    make_selfplay_trainer,
)
from mfvae_tpu.inference import WorldModel  # noqa: E402
from mfvae_tpu.planning import eval_joint_policy  # noqa: E402
from mfvae_tpu.training.trainer import make_action_sampler  # noqa: E402
from mfvae_tpu.envs.policies import make_collect_policy  # noqa: E402

from sticky_study import train_sticky  # noqa: E402

HORIZON = 8


def main(n_episodes: int = 32, ep_len: int = 128, chunks: int = 4,
         epochs: int = 256, rounds: int = 4, updates_each: int = 400,
         n_rollouts: int = 16, n_starts: int = 256):
    t0 = time.time()
    exp = train_sticky(8, epochs, hold=0.9, grad_clip=10.0,
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

    def log(msg):
        print(f"[{time.time()-t0:.0f}s] {msg}", flush=True)

    def _pair_dists(states):
        """[H, B, Σobs] -> [H, B, adv, good] adversary-prey distances."""
        h, b = states.shape[:2]
        adv_obs = states[:, :, : n_adv * od_adv].reshape(h, b, n_adv, od_adv)
        rel = adv_obs[..., prey_off : prey_off + 2 * n_good].reshape(
            h, b, n_adv, n_good, 2
        )
        return jnp.sqrt(jnp.sum(rel * rel, axis=-1) + 1e-12)

    def score_adv(states, rewards):
        # each adversary minimizes its min prey distance  [B, n_adv]
        return -jnp.sum(jnp.min(_pair_dists(states), axis=-1), axis=0)

    def score_prey(states, rewards):
        # each prey maximizes its min ADVERSARY distance  [B, n_good]
        return jnp.sum(jnp.min(_pair_dists(states), axis=-2), axis=0)

    # start-state pool from the WM's own collection process
    bcfg = exp.cfg.behavior
    bcfg.start_pool = 4096
    pool = collect_start_states(exp, bcfg, jax.random.PRNGKey(99))
    pool_size = pool[0].shape[0]
    log(f"start pool ready ({pool_size})")

    def sample_starts(key, n):
        idx = jax.random.randint(key, (n,), 0, pool_size)
        return tuple(o[idx] for o in pool)

    # ---------------- self-play training (alternating best response)
    pa, pb, init_fn, upd_a, upd_b = make_selfplay_trainer(
        wm, env, spec, score_adv, score_prey,
        horizon=HORIZON, n_rollouts=n_rollouts,
    )
    (params_a, opt_a), (params_b, opt_b) = init_fn(
        jax.random.PRNGKey(11), pool[0][0, 0], pool[1][0, 0]
    )
    key = jax.random.PRNGKey(12)
    curve = []
    for r in range(rounds):
        for u in range(updates_each):
            key, k1, k2 = jax.random.split(key, 3)
            params_a, opt_a, m_a = upd_a(
                params_a, opt_a, params_b,
                sample_starts(k1, n_starts // n_rollouts), k2,
            )
        for u in range(updates_each):
            key, k1, k2 = jax.random.split(key, 3)
            params_b, opt_b, m_b = upd_b(
                params_b, opt_b, params_a,
                sample_starts(k1, n_starts // n_rollouts), k2,
            )
        curve.append({
            "round": r,
            "adv_score": float(m_a["score_mean"]),
            "prey_score": float(m_b["score_mean"]),
        })
        log(f"selfplay round {r}: {json.dumps(curve[-1])}")

    # ---------------- control: one-sided adversary policy (prey random in
    # imagination) with the same update budget
    pol_c, init_c, upd_c = make_imagination_trainer(
        wm, env, spec, adv_idx, score_fn=score_adv,
        horizon=HORIZON, n_rollouts=n_rollouts,
    )
    params_c, opt_c = init_c(jax.random.PRNGKey(21), pool[0][0, 0])
    keyc = jax.random.PRNGKey(22)
    for u in range(rounds * updates_each):
        keyc, k1, k2 = jax.random.split(keyc, 3)
        params_c, opt_c, m_c = upd_c(
            params_c, opt_c, sample_starts(k1, n_starts // n_rollouts), k2,
        )
    log(f"one-sided control trained (score {float(m_c['score_mean']):.3f})")

    # ---------------- real-env eval grid
    scripted_evade = make_collect_policy(env, spec, "pursuit", 0.0,
                                         sample_actions)

    from mfvae_tpu.imagination import make_team_actor

    adv_arms = {
        "adv=random": None,
        "adv=selfplay": make_team_actor(pa, params_a, spec, 0),
        "adv=onesided": make_team_actor(pol_c, params_c, spec, 0),
    }
    prey_arms = {
        "prey=random": None,
        "prey=selfplay": make_team_actor(pb, params_b, spec, 1),
        "prey=scripted_evade": "scripted",
    }

    results = {}
    for an, a_act in adv_arms.items():
        for pn, p_act in prey_arms.items():
            def joint(obs, state, k, a_act=a_act, p_act=p_act):
                k1, k2, k3 = jax.random.split(k, 3)
                acts = sample_actions(k1)
                if a_act is not None:
                    acts = acts.at[:n_adv].set(a_act(obs, k2))
                if p_act == "scripted":
                    # pursuit policy's good agents EVADE (envs/policies.py)
                    acts = jnp.where(is_adv, acts, scripted_evade(state, k3))
                elif p_act is not None:
                    acts = acts.at[n_adv:].set(p_act(obs, k3))
                return acts

            rets = []
            for c in range(chunks):
                rewards = eval_joint_policy(
                    env, spec, joint, n_episodes=n_episodes, ep_len=ep_len,
                    key=jax.random.PRNGKey(1234 + c),
                )
                rets.append(np.asarray(
                    jnp.sum(rewards[:, :, :n_adv], axis=(1, 2))))
            adv_ret = np.concatenate(rets)
            results[f"{an}|{pn}"] = {
                "adv_return_mean": float(adv_ret.mean()),
                "adv_return_sem": float(
                    adv_ret.std(ddof=1) / np.sqrt(len(adv_ret))),
                "n_episodes": int(len(adv_ret)),
            }
            log(f"{an}|{pn}: {json.dumps(results[f'{an}|{pn}'])}")

    print(json.dumps({
        "study": "self-play imagination: both teams learned in one WM",
        "horizon": HORIZON, "rounds": rounds, "updates_each": updates_each,
        "selfplay_curve": curve,
        "grid": results,
    }))


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:9]])
