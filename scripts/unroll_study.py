#!/usr/bin/env python
"""Open-loop unroll training: does optimizing the compounding error fix k=25?

PARITY.md's rollout-accuracy table shows the dynamics recipe beats the
frozen-world baseline through k=5 but only MATCHES it at k=25 — one-step
training never penalizes error compounding.  train.unroll_steps rolls the
model open-loop over W consecutive stored transitions inside the train step
(training/unroll.py, BPTT through the feedback) so the optimizer sees the
exact serving-time objective.

Arms: the recipe at unroll ∈ {1, 4, 8}, random collection, identical
everything else (same buffer capacity 10240 across arms — unroll needs
max_size % sample_num == 0, so the unroll=1 arm re-trains at that capacity
rather than inheriting the 10k-capacity numbers from
results/r4/dynamics_recipe.json).  Scored on the SAME eval trajectories
(PRNGKey(123)) as every other round-4 rollout study, both eval policies.

Run on the TPU env: python scripts/unroll_study.py [epochs]
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


def train(
    unroll: int,
    epochs: int,
    policy: str = "random",
    grad_clip: float = 0.0,
    stop_gradient: bool = False,
    mean_feedback: bool = False,
    tag: str = "",
) -> Experiment:
    cfg = ExperimentConfig()
    cfg.model.det_features = 128
    cfg.model.residual_state = True
    cfg.model.state_skip = True
    cfg.model.decoder_layernorm = True
    cfg.model.fused_decoders = False
    cfg.loss.s_weight = 300.0
    cfg.buffer.max_size = 10240  # 80 * sample_num: windows never straddle phases
    cfg.train.unroll_steps = unroll
    cfg.train.unroll_stop_gradient = stop_gradient
    cfg.train.unroll_mean_feedback = mean_feedback
    cfg.train.grad_clip = grad_clip
    cfg.train.epoch_num = epochs
    cfg.train.collect_policy = policy
    cfg.train.collect_epsilon = 0.1
    cfg.train.epochs_per_dispatch = 32
    cfg.train.run_name = f"unroll{unroll}{tag}_{policy}"
    cfg.train.log_dir = "/tmp/unroll_results"
    cfg.train.checkpoint_dir = f"/tmp/ck_unroll{unroll}{tag}_{policy}"
    cfg.train.resume = True
    exp = Experiment(cfg).setup()
    exp.run()
    return exp


def main(epochs: int = 256, n_starts: int = 256):
    t0 = time.time()
    out_all = {}
    for unroll in (1, 4, 8):
        exp = train(unroll, epochs)
        wm = WorldModel(exp.model, exp.carry.train_state.params)
        name = f"unroll{unroll}|random"
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
            cells[f"eval={eval_policy}"] = out
            print(f"[{time.time()-t0:.0f}s] {name} eval={eval_policy}: "
                  f"{json.dumps(out)}", flush=True)
        out_all[name] = {"diag": diag, "rollout": cells}

    print(json.dumps({
        "study": "open-loop unroll training (recipe model, W in {1,4,8})",
        "epochs": epochs,
        "cells": out_all,
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
