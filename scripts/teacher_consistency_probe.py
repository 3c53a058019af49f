#!/usr/bin/env python
"""Probe: is the batched CEM teacher a CONSISTENT labeler?

Distillation needs targets that are a function of the state; a planner
whose argmax flips with the sampling key is a uniform-marginal labeler
and cross-entropy converges to uniform (measured: bc_loss -> ln 5,
teacher_agree -> 0.2 at N=64/iters=2, /tmp/distill_study.log).  This
probe quantifies teacher self-agreement — the SAME states planned twice
under different keys — across (n_candidates, iters) and two scores
(distance-potential; per-step GREEDY one-step distance), setting the
teacher config the distillation study can actually learn from.

Run on the TPU env: python scripts/teacher_consistency_probe.py [n_states]
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
    make_cem_teacher,
    make_enumerated_teacher,
)
from mfvae_tpu.inference import WorldModel  # noqa: E402

from imagination_policy_study import collect_starts  # noqa: E402
from sticky_study import train_sticky  # noqa: E402

HOLD = 0.9


def main(n_states: int = 64):
    t0 = time.time()
    exp = train_sticky(8, 256, hold=HOLD, grad_clip=10.0,
                       tag="_sticky90_w8_clip10")
    wm = WorldModel(exp.model, exp.carry.train_state.params)
    env, spec = exp.env, exp.spec
    n_adv = exp.cfg.env.num_adversaries
    n_good = exp.cfg.env.num_good_agents
    adv_idx = tuple(range(n_adv))
    od_adv = spec.obs_dims[0]
    prey_off = 4 + 2 * exp.cfg.env.num_obs + 2 * (n_adv - 1)

    def _min_prey_dist(states):
        h, n = states.shape[:2]
        adv_obs = states[:, :, : n_adv * od_adv].reshape(h, n, n_adv, od_adv)
        rel = adv_obs[..., prey_off : prey_off + 2 * n_good].reshape(
            h, n, n_adv, n_good, 2
        )
        return jnp.min(jnp.sqrt(jnp.sum(rel * rel, axis=-1) + 1e-12), axis=-1)

    def dist_fact(states, rewards):
        return -jnp.sum(_min_prey_dist(states), axis=0)  # [B, adv]

    def dist_first(states, rewards):
        # one-step greedy: only the FIRST imagined step's distance counts —
        # shorter credit path, less rollout noise in the tournament
        return -_min_prey_dist(states[:1])[0]

    pool = collect_starts(exp, n_states)
    obs_g = tuple(o for o in pool)
    print(f"[{time.time()-t0:.0f}s] {n_states} probe states ready", flush=True)

    out = {}
    for score_name, score in (("dist_sum", dist_fact), ("dist_first", dist_first)):
        for N, iters, H in ((64, 2, 8), (256, 3, 8), (256, 3, 4), (256, 6, 2)):
            teacher = jax.jit(make_cem_teacher(
                wm, env, spec, adv_idx, score_fn=score,
                horizon=H, n_candidates=N, iters=iters,
            ))
            a1 = teacher(obs_g, jax.random.PRNGKey(100))
            a2 = teacher(obs_g, jax.random.PRNGKey(200))
            agree = float(jnp.mean((a1 == a2).astype(jnp.float32)))
            # marginal action distribution (uniform -> entropy ln 5)
            counts = np.bincount(np.asarray(a1).ravel(), minlength=5)
            p = counts / counts.sum()
            ent = float(-(p[p > 0] * np.log(p[p > 0])).sum())
            key = f"{score_name}_N{N}_i{iters}_H{H}"
            out[key] = {"self_agree": agree, "marginal_entropy": ent,
                        "marginal": p.round(3).tolist()}
            print(f"[{time.time()-t0:.0f}s] {key}: agree={agree:.3f} "
                  f"marg_ent={ent:.3f}", flush=True)

    # ---- enumerated + CRN teacher: the variance-killed labeler
    for cont in ("hold", "random"):
        for M, H in ((24, 8), (8, 8), (24, 4)):
            teacher = jax.jit(make_enumerated_teacher(
                wm, env, spec, adv_idx, score_fn=dist_fact,
                horizon=H, m_rollouts=M, continuation=cont, return_q=True,
            ))
            t1, q1 = teacher(obs_g, jax.random.PRNGKey(100))
            t2, q2 = teacher(obs_g, jax.random.PRNGKey(200))
            a1, a2 = jnp.argmax(t1, -1), jnp.argmax(t2, -1)
            agree = float(jnp.mean((a1 == a2).astype(jnp.float32)))
            counts = np.bincount(np.asarray(a1).ravel(), minlength=5)
            p = counts / counts.sum()
            ent = float(-(p[p > 0] * np.log(p[p > 0])).sum())
            # target sharpness: mean per-(state,agent) entropy of the
            # soft target distribution (ln5=1.609 means nothing to learn)
            tent = float(jnp.mean(-jnp.sum(t1 * jnp.log(t1 + 1e-9), -1)))
            # Q-gap: best-vs-mean advantage in raw score units
            qgap = float(jnp.mean(jnp.max(q1, -1) - jnp.mean(q1, -1)))
            key = f"enum_{cont}_M{M}_H{H}"
            out[key] = {"self_agree": agree, "marginal_entropy": ent,
                        "target_entropy": tent, "q_gap": qgap,
                        "marginal": p.round(3).tolist()}
            print(f"[{time.time()-t0:.0f}s] {key}: agree={agree:.3f} "
                  f"marg_ent={ent:.3f} tgt_ent={tent:.3f} qgap={qgap:.4f}",
                  flush=True)

    path = Path(__file__).resolve().parents[1] / "results/r4/teacher_consistency.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:2]])
