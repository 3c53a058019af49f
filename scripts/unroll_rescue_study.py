#!/usr/bin/env python
"""Rescue arms for the W=8 unroll divergence (results/r4/unroll_study.json).

The first unroll study measured W=4 as a small consistent win at every
horizon and W=8 as a collapse (delta_corr 0.85 -> 0.27) — the signature of
BPTT gradient blowup through an 8-step feedback chain.  Two standard
rescues, both now config levers:

  - w8_clip10: train.grad_clip=10 (global-norm clipping, the same value
    the reference's own vdn.py uses for its recurrent Q-network)
  - w8_sg:     train.unroll_stop_gradient=true (scheduled-sampling-style —
    every horizon still trains on own-prediction inputs, but gradients
    stop at step boundaries)
  - w4_clip10: does clipping also lift the stable W=4 arm?

Scored identically to scripts/unroll_study.py (same eval keys).

Run on the TPU env: python scripts/unroll_rescue_study.py [epochs]
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
    {"name": "w8_clip10", "unroll": 8, "grad_clip": 10.0, "stop_gradient": False},
    {"name": "w8_sg", "unroll": 8, "grad_clip": 0.0, "stop_gradient": True},
    {"name": "w4_clip10", "unroll": 4, "grad_clip": 10.0, "stop_gradient": False},
)


def main(epochs: int = 256, n_starts: int = 256):
    t0 = time.time()
    out_all = {}
    for arm in ARMS:
        exp = train(
            arm["unroll"], epochs, grad_clip=arm["grad_clip"],
            stop_gradient=arm["stop_gradient"], tag="_" + arm["name"],
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
        "study": "unroll W=8 rescue: grad_clip / stop_gradient",
        "epochs": epochs,
        "cells": out_all,
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
