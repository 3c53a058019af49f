#!/usr/bin/env python
"""Open-loop imagination accuracy: error vs horizon, architecture x data.

VERDICT r3 item 1: the world model's defining capability — multi-step
prediction — was never measured.  This study trains the reference
architecture (det_features=0) and the flagship det128 under BOTH collection
policies (random / scripted pursuit) at the canonical 40-agent scale, then
scores each model's open-loop k-step rollouts (k in {1, 5, 25}) against
ground-truth env trajectories drawn from BOTH distributions, alongside the
frozen-world and previous-step-persistence baselines
(mfvae_tpu/rollout_eval.py).

Reference anchor: the model exists to predict the next global state
(/root/reference/jax_ver/model.py:184-192); the reference only ever scores
k=1 reconstruction on held-out batches (jax_ver/main.py:209-227).

Run on the TPU env:
  python scripts/rollout_accuracy_study.py [epochs] [n_starts]
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from mfvae_tpu.config import ExperimentConfig  # noqa: E402
from mfvae_tpu.inference import WorldModel  # noqa: E402
from mfvae_tpu.rollout_eval import rollout_accuracy  # noqa: E402
from mfvae_tpu.training.experiment import Experiment  # noqa: E402

HORIZONS = (1, 5, 25)


def train(det: int, policy: str, epochs: int) -> Experiment:
    cfg = ExperimentConfig()
    cfg.model.det_features = det
    cfg.train.epoch_num = epochs
    cfg.train.collect_policy = policy
    cfg.train.collect_epsilon = 0.1
    cfg.train.epochs_per_dispatch = 32
    cfg.train.run_name = f"rollacc_det{det}_{policy}"
    cfg.train.log_dir = "/tmp/rollacc_results"
    cfg.train.checkpoint_dir = f"/tmp/ck_rollacc_det{det}_{policy}"
    cfg.train.resume = True  # restartable: reuse a prior run's checkpoints
    exp = Experiment(cfg).setup()
    exp.run()
    return exp


def main(epochs: int = 256, n_starts: int = 256):
    import time

    t0 = time.time()
    models = {}
    for det in (0, 128):
        for policy in ("random", "pursuit"):
            name = f"det{det}|{policy}"
            exp = train(det, policy, epochs)
            models[name] = (exp, WorldModel(exp.model, exp.carry.train_state.params))
            print(f"[{time.time()-t0:.0f}s] trained {name}", flush=True)

    results = {}
    baselines = {}
    any_exp = next(iter(models.values()))[0]
    for eval_policy in ("random", "pursuit"):
        key = jax.random.PRNGKey(123)  # same trajectories for every model
        for name, (exp, wm) in models.items():
            out = rollout_accuracy(
                wm, exp.env, exp.spec, key,
                horizons=HORIZONS, n_starts=n_starts, burn_in=32,
                policy=eval_policy, collect_epsilon=0.1,
            )
            cell = {
                k: out[k]
                for k in out
                if not ("frozen" in k or "zero" in k or "persist" in k)
            }
            results[f"model={name}|eval={eval_policy}"] = cell
            print(
                f"[{time.time()-t0:.0f}s] model={name} eval={eval_policy}: "
                f"{json.dumps(cell)}",
                flush=True,
            )
            if eval_policy not in baselines:  # model-independent, same key
                baselines[eval_policy] = {
                    k: out[k]
                    for k in out
                    if "frozen" in k or "zero" in k or "persist" in k
                }

    print(json.dumps({
        "study": "open-loop rollout accuracy (error vs horizon)",
        "epochs": epochs,
        "n_starts": n_starts,
        "horizons": list(HORIZONS),
        "cells": results,
        "baselines": baselines,
    }))


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 256,
        int(sys.argv[2]) if len(sys.argv) > 2 else 256,
    )
