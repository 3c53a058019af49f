#!/usr/bin/env python
"""Second unroll round: serving-aligned feedback + a longer horizon.

results/r4/unroll_rescue.json measured w8_clip10 as the best long-horizon
configuration (k=25 state error -18% vs one-step training, below
frozen-world on pursuit data).  Two follow-ups on top of it:

  - w8_clip10_mf: train.unroll_mean_feedback=true — feed back the
    posterior-MEAN prediction (the exact serving path) instead of the
    sampled reconstruction, testing whether the train/serve feedback
    mismatch costs accuracy;
  - w16_clip10: double the training horizon toward the k=25 eval.

Run on the TPU env: python scripts/unroll_push_study.py [epochs]
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from mfvae_tpu.inference import WorldModel  # noqa: E402
from mfvae_tpu.rollout_eval import rollout_accuracy  # noqa: E402

from residual_sweight_study import delta_diagnostics  # noqa: E402
from unroll_study import HORIZONS, train  # noqa: E402

ARMS = (
    {"name": "w8_clip10_mf", "unroll": 8, "grad_clip": 10.0, "mean_feedback": True},
    {"name": "w16_clip10", "unroll": 16, "grad_clip": 10.0, "mean_feedback": False},
)


def main(epochs: int = 256, n_starts: int = 256):
    t0 = time.time()
    out_all = {}
    for arm in ARMS:
        exp = train(
            arm["unroll"], epochs, grad_clip=arm["grad_clip"],
            mean_feedback=arm["mean_feedback"], tag="_" + arm["name"],
        )
        wm = WorldModel(exp.model, exp.carry.train_state.params)
        print(f"[{time.time()-t0:.0f}s] trained {arm['name']}", flush=True)
        diag = delta_diagnostics(exp, wm)
        print(f"[{time.time()-t0:.0f}s] {arm['name']} diag: {diag}", flush=True)
        cells = {}
        for eval_policy in ("random", "pursuit"):
            out = rollout_accuracy(
                wm, exp.env, exp.spec, jax.random.PRNGKey(123),
                horizons=HORIZONS, n_starts=n_starts, burn_in=32,
                policy=eval_policy, collect_epsilon=0.1,
            )
            cells[f"eval={eval_policy}"] = out
            print(f"[{time.time()-t0:.0f}s] {arm['name']} eval={eval_policy}: "
                  f"{json.dumps(out)}", flush=True)
        out_all[arm["name"]] = {"diag": diag, "rollout": cells}

    print(json.dumps({
        "study": "unroll push: mean feedback + W=16 horizon (on clip10)",
        "epochs": epochs,
        "cells": out_all,
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
