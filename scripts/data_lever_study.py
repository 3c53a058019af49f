#!/usr/bin/env python
"""The data lever, measured: train the same world model under random vs
pursuit collection and CROSS-EVALUATE — each model on each distribution's
held-out data (2x2).  Absolute losses across data distributions are not
comparable (contact-rich rewards are a higher-variance target); the
comparable cells are the columns: on contact-rich evaluation data, which
training data produced the better model?

Run on the TPU env: python scripts/data_lever_study.py [epochs]
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import numpy as np  # noqa: E402

from mfvae_tpu.config import ExperimentConfig  # noqa: E402
from mfvae_tpu.data.transitions import vae_batch_from_grouped  # noqa: E402
from mfvae_tpu.training.experiment import Experiment  # noqa: E402
from mfvae_tpu.training.trainer import make_test_step  # noqa: E402


def build(policy: str, epochs: int) -> Experiment:
    cfg = ExperimentConfig()
    cfg.model.det_features = 128
    cfg.train.epoch_num = epochs
    cfg.train.collect_policy = policy
    cfg.train.collect_epsilon = 0.1
    cfg.train.epochs_per_dispatch = 32
    cfg.train.run_name = f"data_lever_{policy}"
    cfg.train.log_dir = "/tmp/data_lever_results"
    cfg.train.checkpoint_dir = f"/tmp/ck_data_lever_{policy}"
    exp = Experiment(cfg).setup()
    return exp


def main(epochs: int = 256, n_eval_batches: int = 64):
    exps = {}
    for policy in ("random", "pursuit"):
        exp = build(policy, epochs)
        exp.run()
        exps[policy] = exp
        print(f"trained under {policy} collection", flush=True)

    # cross-eval: model params x eval distribution (the shared test_step
    # works for any state/batch pairing — same model architecture)
    any_exp = exps["random"]
    test_step = jax.jit(make_test_step(any_exp.cfg.loss, any_exp.cfg.train.mode))

    results = {}
    for eval_policy, data_exp in exps.items():
        # draw eval batches from THIS experiment's held-out test buffer
        batches = []
        for i in range(n_eval_batches):
            k = jax.random.fold_in(jax.random.PRNGKey(777), i)
            sampled = data_exp.test_buffer.sample(
                data_exp.carry.test_buffer_state, k
            )
            batches.append(
                vae_batch_from_grouped(data_exp.spec, sampled.experience)
            )
        for model_policy, model_exp in exps.items():
            losses = [
                test_step(model_exp.carry.train_state, b,
                          jax.random.fold_in(jax.random.PRNGKey(9), j))
                for j, b in enumerate(batches)
            ]
            # ONE host transfer per cell (per-scalar float() would cost
            # ~1k serial round-trips on the remote link — bench.py header)
            host = jax.device_get(losses)
            mean = {
                "loss": float(np.mean([o.loss for o in host])),
                "s_loss": float(np.mean([o.s_loss for o in host])),
                "r_loss": float(np.mean([o.r_loss for o in host])),
                "kl": float(np.mean([o.kl_loss for o in host])),
            }
            results[f"model={model_policy}|eval={eval_policy}"] = mean
            print(f"model={model_policy} eval={eval_policy}: {mean}", flush=True)

    out = {
        "study": "data lever 2x2 cross-evaluation",
        "epochs": epochs,
        "eval_batches": n_eval_batches,
        "cells": results,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
