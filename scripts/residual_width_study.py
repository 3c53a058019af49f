#!/usr/bin/env python
"""Residual dynamics vs the decoder bottleneck: the decisive experiment.

Chain of measurements (PARITY.md round 4): residual_state removes the
reconstruction floor but the delta head collapses to zero; rebalancing with
s_weight ∈ {300, 1000} changes the total loss exactly as specified yet the
state curve is bit-identical at both weights — the state branch is inert,
not under-weighted.  Remaining hypothesis: the reference decoder's 64-wide
bottleneck layer (decoder_hidden = 1024/256/64/256/1024 — the same layer
that caps MFU, scripts/mfu_ceiling.py) cannot carry the ~120 dims of
per-agent velocity information a 40-agent delta prediction needs.

Arms (all det128 + residual + s_weight=300, random collection, same eval
key as every other rollout study):
  - bottleneck: reference decoder widths (the measured-inert baseline)
  - wide:       decoder_hidden=(1024, 1024) — bottleneck removed

If `wide` learns (delta_corr >> 0, state_huber/1 below the persistence
baseline), the story closes: the reference ARCHITECTURE, not the loss or
the data, prevents the world model from learning dynamics.

Run on the TPU env: python scripts/residual_width_study.py [epochs]
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
# (tag, decoder widths, state_skip): both width arms measured inert ->
# the `skip` arm conditions the decoder on the current state directly
# (model.state_skip), the dynamics-capable configuration
ARMS = (
    ("bottleneck", (1024, 256, 64, 256, 1024), False),
    ("wide", (1024, 1024), False),
    ("skip", (1024, 256, 64, 256, 1024), True),
    # the completing cell: skip gives the decoder the INFORMATION, width
    # gives it the CHANNEL — each alone measured inert (small-scale
    # pipeline runs with a bottleneck-free decoder learn delta to corr
    # 0.998, so both levers must be present at canonical scale)
    ("skip_wide", (1024, 1024), True),
)


def train(tag: str, widths, epochs: int, state_skip: bool = False) -> Experiment:
    cfg = ExperimentConfig()
    cfg.model.det_features = 128
    cfg.model.residual_state = True
    cfg.model.state_skip = state_skip
    cfg.model.decoder_hidden = widths
    cfg.loss.s_weight = 300.0
    cfg.train.epoch_num = epochs
    cfg.train.collect_policy = "random"
    cfg.train.collect_epsilon = 0.1
    cfg.train.epochs_per_dispatch = 32
    cfg.train.run_name = f"residwidth_{tag}"
    cfg.train.log_dir = "/tmp/residwidth_results"
    # the bottleneck arm IS the sweight study's sw300 config — share its
    # checkpoint dir so it resumes instead of retraining
    cfg.train.checkpoint_dir = (
        "/tmp/ck_residsw300_random"
        if tag == "bottleneck"
        else f"/tmp/ck_residwidth_{tag}"
    )
    cfg.train.resume = True
    exp = Experiment(cfg).setup()
    exp.run()
    return exp


def main(epochs: int = 256, n_starts: int = 256):
    t0 = time.time()
    out_all = {}
    for tag, widths, skip in ARMS:
        exp = train(tag, widths, epochs, skip)
        wm = WorldModel(exp.model, exp.carry.train_state.params)
        print(f"[{time.time()-t0:.0f}s] trained {tag}", flush=True)
        diag = delta_diagnostics(exp, wm)
        print(f"[{time.time()-t0:.0f}s] {tag} diag: {diag}", flush=True)
        cells = {}
        for eval_policy in ("random", "pursuit"):
            key = jax.random.PRNGKey(123)
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
            cells[f"eval={eval_policy}"] = cell
            print(f"[{time.time()-t0:.0f}s] {tag} eval={eval_policy}: "
                  f"{json.dumps(cell)}", flush=True)
        out_all[tag] = {"decoder_hidden": list(widths), "state_skip": skip,
                        "diag": diag, "rollout": cells}

    print(json.dumps({
        "study": "residual dynamics vs decoder bottleneck width",
        "epochs": epochs,
        "s_weight": 300.0,
        "cells": out_all,
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
