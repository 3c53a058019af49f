#!/usr/bin/env python
"""Close the model-based loop: a LEARNED policy collects the world model's
training data (VERDICT r3 item 2a).

The reference repo holds a world model (jax_ver/model.py:100-199) and a
Q-learning policy (jax_ver/baselines/QLearning/vdn.py:133-527) that never
touch.  This study connects them end-to-end through the framework:

  1. train VDN at the canonical 40-agent tag scale (tuned config,
     baselines/config/vdn_tuned.yaml) and save its greedy policy as the
     self-contained .npz artifact (baselines/collect_policy.save_policy);
  2. train the flagship det128 world model under THREE collection policies
     — uniform random (the reference's only data path), scripted pursuit,
     and the learned VDN policy (train.collect_policy="vdn:<path>") — at
     identical env-step budgets;
  3. cross-evaluate 3x3: every model on every distribution's held-out data.

Comparable cells are the columns (same eval data, different training data).
Run on the TPU env: python scripts/policy_collection_study.py [epochs]
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import numpy as np  # noqa: E402

from mfvae_tpu.baselines import vdn  # noqa: E402
from mfvae_tpu.config import ExperimentConfig  # noqa: E402
from mfvae_tpu.data.transitions import vae_batch_from_grouped  # noqa: E402
from mfvae_tpu.training.experiment import Experiment  # noqa: E402
from mfvae_tpu.training.trainer import make_test_step  # noqa: E402

POLICY_PATH = "/tmp/policy_study_vdn.npz"


def train_policy() -> str:
    cfg_path = (
        Path(__file__).resolve().parents[1]
        / "mfvae_tpu/baselines/config/vdn_tuned.yaml"
    )
    vdn.main(
        str(cfg_path),
        save_policy_path=POLICY_PATH,
        log_during_training=False,
        run_name="policy_study_vdn",
    )
    return POLICY_PATH


def train_world_model(policy: str, epochs: int, tag: str) -> Experiment:
    cfg = ExperimentConfig()
    cfg.model.det_features = 128
    cfg.train.epoch_num = epochs
    cfg.train.collect_policy = policy
    cfg.train.collect_epsilon = 0.1
    cfg.train.epochs_per_dispatch = 32
    cfg.train.run_name = f"policy_study_{tag}"
    cfg.train.log_dir = "/tmp/policy_study_results"
    cfg.train.checkpoint_dir = f"/tmp/ck_policy_study_{tag}"
    cfg.train.resume = True  # restartable: reuse a prior run's checkpoints
    exp = Experiment(cfg).setup()
    exp.run()
    return exp


def main(epochs: int = 256, n_eval_batches: int = 64):
    import time

    t0 = time.time()
    path = train_policy()
    print(f"[{time.time()-t0:.0f}s] trained + saved VDN policy", flush=True)

    policies = {
        "random": "random",
        "pursuit": "pursuit",
        "vdn": f"vdn:{path}",
    }
    exps = {}
    for tag, policy in policies.items():
        exps[tag] = train_world_model(policy, epochs, tag)
        print(f"[{time.time()-t0:.0f}s] world model trained under {tag}",
              flush=True)

    any_exp = exps["random"]
    test_step = jax.jit(make_test_step(any_exp.cfg.loss, any_exp.cfg.train.mode))

    results = {}
    for eval_tag, data_exp in exps.items():
        batches = []
        for i in range(n_eval_batches):
            k = jax.random.fold_in(jax.random.PRNGKey(777), i)
            sampled = data_exp.test_buffer.sample(
                data_exp.carry.test_buffer_state, k
            )
            batches.append(
                vae_batch_from_grouped(data_exp.spec, sampled.experience)
            )
        for model_tag, model_exp in exps.items():
            losses = [
                test_step(model_exp.carry.train_state, b,
                          jax.random.fold_in(jax.random.PRNGKey(9), j))
                for j, b in enumerate(batches)
            ]
            host = jax.device_get(losses)  # ONE transfer per cell
            mean = {
                "loss": float(np.mean([o.loss for o in host])),
                "s_loss": float(np.mean([o.s_loss for o in host])),
                "r_loss": float(np.mean([o.r_loss for o in host])),
                "kl": float(np.mean([o.kl_loss for o in host])),
            }
            results[f"model={model_tag}|eval={eval_tag}"] = mean
            print(
                f"[{time.time()-t0:.0f}s] model={model_tag} "
                f"eval={eval_tag}: {mean}",
                flush=True,
            )

    print(json.dumps({
        "study": "learned-policy collection 3x3 cross-evaluation",
        "epochs": epochs,
        "eval_batches": n_eval_batches,
        "cells": results,
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
