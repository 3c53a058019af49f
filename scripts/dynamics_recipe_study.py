#!/usr/bin/env python
"""The dynamics recipe, end-to-end: a world model that beats persistence.

Round 4's measurement chain (PARITY.md) isolated four independent blockers
between the reference architecture and actual state-dynamics learning:

  1. absolute reconstruction pays a latent-bottleneck floor
     -> model.residual_state (predict the delta)
  2. the delta huber is ~300x smaller than the reward branch
     -> loss.s_weight
  3. the decoder can't cancel a base it only sees through a lossy code
     -> model.state_skip (condition on the current state directly)
  4. the raw canonical-width inputs are too ill-conditioned for Adam, and
     the fused decoder trunk blocks the signal even with normalization
     -> model.decoder_layernorm + model.fused_decoders=false

This trains the full recipe through the REAL pipeline (replay buffer,
fused epoch program) under both collection policies at canonical scale and
scores open-loop rollout accuracy on the SAME eval trajectories
(PRNGKey(123)) as every other round-4 rollout study — the win condition is
state error BELOW the persistence baseline at k=1 and far below
frozen-world at k=25.

Run on the TPU env: python scripts/dynamics_recipe_study.py [epochs]
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

from residual_sweight_study import delta_diagnostics  # noqa: E402

HORIZONS = (1, 5, 25)


def train(policy: str, epochs: int) -> Experiment:
    cfg = ExperimentConfig()
    cfg.model.det_features = 128
    cfg.model.residual_state = True
    cfg.model.state_skip = True
    cfg.model.decoder_layernorm = True
    cfg.model.fused_decoders = False
    cfg.loss.s_weight = 300.0
    cfg.train.epoch_num = epochs
    cfg.train.collect_policy = policy
    cfg.train.collect_epsilon = 0.1
    cfg.train.epochs_per_dispatch = 32
    cfg.train.run_name = f"recipe_{policy}"
    cfg.train.log_dir = "/tmp/recipe_results"
    cfg.train.checkpoint_dir = f"/tmp/ck_recipe_{policy}"
    cfg.train.resume = True
    exp = Experiment(cfg).setup()
    exp.run()
    return exp


def main(epochs: int = 256, n_starts: int = 256):
    t0 = time.time()
    out_all = {}
    for policy in ("random", "pursuit"):
        exp = train(policy, epochs)
        wm = WorldModel(exp.model, exp.carry.train_state.params)
        name = f"recipe|{policy}"
        print(f"[{time.time()-t0:.0f}s] trained {name}", flush=True)
        diag = delta_diagnostics(exp, wm)
        print(f"[{time.time()-t0:.0f}s] {name} diag: {diag}", flush=True)
        cells = {}
        for eval_policy in ("random", "pursuit"):
            key = jax.random.PRNGKey(123)
            out = rollout_accuracy(
                wm, exp.env, exp.spec, key,
                horizons=HORIZONS, n_starts=n_starts, burn_in=32,
                policy=eval_policy, collect_epsilon=0.1,
            )
            # keep the baselines this time — the claim is BEATING them
            cells[f"eval={eval_policy}"] = out
            print(f"[{time.time()-t0:.0f}s] {name} eval={eval_policy}: "
                  f"{json.dumps(out)}", flush=True)
        out_all[name] = {"diag": diag, "rollout": cells}

    print(json.dumps({
        "study": "dynamics recipe: residual+skip+layernorm+unfused+s_weight",
        "epochs": epochs,
        "cells": out_all,
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
