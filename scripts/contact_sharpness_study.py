#!/usr/bin/env python
"""Attack the contact-sharpness ceiling (VERDICT r4 item 5).

Round 4's reward-oracle probe bounded ANY reward head at AUC 0.804: even
the TRUE reward function applied to the model's predicted geometry barely
beats persistence (0.79), because predicted relative-prey positions are
blurry at the contact radius (0.125).  This study trains the sticky(0.9)
+ unroll-W8 recipe with the two new state-loss levers aimed at exactly
that subspace and re-runs the oracle probe per arm:

  baseline        contact_weight=0, prey_dist_weight=0 (the round-4 model,
                  checkpoint-cached)
  contact10       contact transitions count 11x in the state branch
  preyw9          relative-prey columns count 10x in the column mean
  both            the two combined

Success metric: oracle-on-predicted-geometry AUC above 0.804 on the
sticky eval (and the pursuit eval as the contact-rich check).  Each arm
also reports one-step state error on the standard evals (did sharpness
cost anything globally?) and the action_effect_ratio (did conditioning
survive?).  If an arm moves the AUC, re-test reward-scored MPC through it
(scripts/mpc_sticky_study.py arm) — the chain this ceiling blocks.

Run on the TPU env: python scripts/contact_sharpness_study.py [epochs]
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from mfvae_tpu.inference import WorldModel  # noqa: E402
from mfvae_tpu.rollout_eval import rollout_accuracy  # noqa: E402

from action_sensitivity_probe import measure_action_sensitivity  # noqa: E402
from reward_oracle_probe import oracle_auc_cells  # noqa: E402
from sticky_study import train_sticky  # noqa: E402

ARMS = (
    {"name": "baseline", "contact_weight": 0.0, "prey_dist_weight": 0.0},
    {"name": "contact10", "contact_weight": 10.0, "prey_dist_weight": 0.0},
    {"name": "preyw9", "contact_weight": 0.0, "prey_dist_weight": 9.0},
    {"name": "both", "contact_weight": 10.0, "prey_dist_weight": 9.0},
    # the other model-side lever VERDICT names: hold past 0.9
    {"name": "hold95", "contact_weight": 0.0, "prey_dist_weight": 0.0,
     "hold": 0.95},
)


def main(epochs: int = 256):
    t0 = time.time()
    out = {}
    for arm in ARMS:
        name = arm["name"]
        tag = ("_sticky90_w8_clip10" if name == "baseline"
               else f"_sharp_{name}")
        exp = train_sticky(
            8, epochs, hold=arm.get("hold", 0.9), grad_clip=10.0, tag=tag,
            contact_weight=arm["contact_weight"],
            prey_dist_weight=arm["prey_dist_weight"],
        )
        wm = WorldModel(exp.model, exp.carry.train_state.params)
        print(f"[{time.time()-t0:.0f}s] {name} trained", flush=True)
        cell = {"auc": oracle_auc_cells(exp, wm)}
        print(f"[{time.time()-t0:.0f}s] {name} auc: "
              f"{json.dumps(cell['auc'])}", flush=True)
        cell["action_effect_ratio"] = measure_action_sensitivity(exp, wm)[
            "action_effect_ratio"
        ]
        roll = {}
        for pol in ("random", "pursuit"):
            r = rollout_accuracy(
                wm, exp.env, exp.spec, jax.random.PRNGKey(123),
                horizons=(1, 5, 25), n_starts=256, burn_in=32,
                policy=pol, collect_epsilon=0.1,
            )
            roll[pol] = {k: r[k] for k in sorted(r) if k.startswith("state_huber/")}
        cell["state_error"] = roll
        out[name] = cell
        print(f"[{time.time()-t0:.0f}s] {name}: ratio="
              f"{cell['action_effect_ratio']:.3f} "
              f"state@1={roll['random']['state_huber/1']:.5f}", flush=True)

    print(json.dumps({
        "study": "contact-sharpness levers vs the oracle AUC ceiling",
        "epochs": epochs,
        "arms": out,
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
