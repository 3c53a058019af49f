#!/usr/bin/env python
"""Seed CI for the distillation headline: re-distill policy0 through the
SAME world model under independent keys and eval the sampled arm — does
51.8k (+41% over random) survive distillation-seed variance?  (The WM
itself is one training seed; its quality band is already seed-CI'd in
det128_seed_ci.py.  Here the question is the BEHAVIOR pipeline's
variance: start-pool draw, teacher keys, policy init, update keys.)

Run on the TPU env: python scripts/distill_seed_ci.py [seeds] [updates]
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

from mfvae_tpu.behavior import train_behavior  # noqa: E402
from mfvae_tpu.imagination import make_policy_actor  # noqa: E402
from mfvae_tpu.planning import eval_joint_policy  # noqa: E402
from mfvae_tpu.training.trainer import make_action_sampler  # noqa: E402

from dreamer_iteration_study import behavior_cfg, _retry  # noqa: E402
from sticky_study import train_sticky  # noqa: E402

HOLD = 0.9


def main(seeds: int = 4, updates: int = 1500, n_episodes: int = 32,
         ep_len: int = 128, chunks: int = 4):
    t0 = time.time()
    exp = train_sticky(8, 256, hold=HOLD, grad_clip=10.0,
                       tag="_sticky90_w8_clip10")
    behavior_cfg(exp.cfg, updates)
    env, spec = exp.env, exp.spec
    n_adv = exp.cfg.env.num_adversaries
    adv_idx = tuple(range(n_adv))
    is_adv = jnp.arange(spec.n_agents) < n_adv
    sample_actions, _ = make_action_sampler(env, spec)
    print(f"[{time.time()-t0:.0f}s] WM ready", flush=True)

    def arm_random(obs, state, k):
        return sample_actions(k)

    def eval_arm(pol):
        rets = []
        for c in range(chunks):
            rewards = eval_joint_policy(
                env, spec, pol, n_episodes=n_episodes, ep_len=ep_len,
                key=jax.random.PRNGKey(1234 + c),
            )
            rets.append(np.asarray(jnp.sum(rewards[:, :, :n_adv], axis=(1, 2))))
        r = np.concatenate(rets)
        return float(r.mean()), float(r.std(ddof=1) / np.sqrt(len(r)))

    rand_mean, rand_sem = eval_arm(arm_random)
    print(f"[{time.time()-t0:.0f}s] random: {rand_mean:.0f}±{rand_sem:.0f}",
          flush=True)

    per_seed = []
    for s in range(seeds):
        res = _retry(
            lambda s=s: train_behavior(exp, key=jax.random.PRNGKey(1000 + s)),
            label=f"seed{s}",
        )
        actor = make_policy_actor(res.policy, res.params, env, spec,
                                  adv_idx, greedy=False)

        def arm_pol(obs, state, k, actor=actor):
            k1, k2 = jax.random.split(k)
            return jnp.where(is_adv, actor(obs, k1), sample_actions(k2))

        mean, sem = eval_arm(arm_pol)
        per_seed.append({"seed": s, "return_mean": mean, "return_sem": sem})
        print(f"[{time.time()-t0:.0f}s] seed {s}: {mean:.0f}±{sem:.0f}",
              flush=True)

    means = np.array([r["return_mean"] for r in per_seed])
    out = {
        "study": "distillation seed CI (same WM, independent behavior keys)",
        "updates": updates, "hold": HOLD, "seeds": seeds,
        "random_anchor": {"mean": rand_mean, "sem": rand_sem},
        "per_seed": per_seed,
        "across_seeds": {
            "mean": float(means.mean()),
            "std": float(means.std(ddof=1)) if seeds > 1 else 0.0,
            "sem": float(means.std(ddof=1) / np.sqrt(seeds)) if seeds > 1 else 0.0,
        },
        "headline_anchor": 51782.8,
    }
    path = Path(__file__).resolve().parents[1] / "results/r4/distill_seed_ci.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:6]])
