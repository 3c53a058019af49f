#!/usr/bin/env python
"""Residual-state decoder study: does predicting the DELTA fix the world model?

The round-4 rollout-accuracy study (results/r4/rollout_accuracy.json) showed
the absolute state decoder never beats the frozen-world baseline: it pays a
~0.4-0.6 Huber reconstruction floor through the latent bottleneck while MPE
states move ~0.01 Huber/step.  model.residual_state=true re-zeroes the
decoder at identity.  This trains residual variants of both architectures
(det0 = reference structure, det128 = flagship) under both collection
policies and scores open-loop k-step rollouts with the SAME eval
trajectories (PRNGKey(123), n_starts=256, burn_in=32) as the absolute-model
study, so the two result files are directly comparable cell by cell.

Run on the TPU env: python scripts/residual_study.py [epochs] [n_starts]
"""

import json
import sys
import time
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
    cfg.model.residual_state = True
    cfg.train.epoch_num = epochs
    cfg.train.collect_policy = policy
    cfg.train.collect_epsilon = 0.1
    cfg.train.epochs_per_dispatch = 32
    cfg.train.run_name = f"resid_det{det}_{policy}"
    cfg.train.log_dir = "/tmp/resid_results"
    cfg.train.checkpoint_dir = f"/tmp/ck_resid_det{det}_{policy}"
    cfg.train.resume = True
    exp = Experiment(cfg).setup()
    exp.run()
    return exp


def main(epochs: int = 256, n_starts: int = 256):
    t0 = time.time()
    models = {}
    heldout = {}
    for det in (0, 128):
        for policy in ("random", "pursuit"):
            name = f"resid{det}|{policy}"
            exp = train(det, policy, epochs)
            models[name] = (exp, WorldModel(exp.model, exp.carry.train_state.params))
            print(f"[{time.time()-t0:.0f}s] trained {name}", flush=True)

    results = {}
    for eval_policy in ("random", "pursuit"):
        key = jax.random.PRNGKey(123)  # SAME trajectories as the abs study
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

    print(json.dumps({
        "study": "residual-state decoder: open-loop rollout accuracy",
        "epochs": epochs,
        "n_starts": n_starts,
        "horizons": list(HORIZONS),
        "cells": results,
        "comparable_to": "results/r4/rollout_accuracy.json (same eval key)",
    }))


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 256,
        int(sys.argv[2]) if len(sys.argv) > 2 else 256,
    )
