#!/usr/bin/env python
"""Residual decoder + state-loss rebalance: make the delta head LEARN.

The first residual study (results/r4/residual_rollout.json) measured that
residual_state alone collapses the delta head to ~zero: the per-step delta
huber (~0.0065) is ~300x smaller than the reward branch, so with the
reference weighting the state branch gets no gradient pull (predicted-delta
vs true-delta correlation -0.008, mean |pred delta| 0.0016 vs true 0.064).
loss.s_weight rebalances.  This trains det128 residual models at s_weight
in {300, 1000} (300 ~ equalizes the branch magnitudes on random data) and
scores open-loop rollout accuracy with the SAME eval trajectories
(PRNGKey(123)) as the absolute and plain-residual studies, plus the direct
delta diagnostics (mean |pred delta|, corr with true delta).

Run on the TPU env: python scripts/residual_sweight_study.py [epochs]
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mfvae_tpu.config import ExperimentConfig  # noqa: E402
from mfvae_tpu.inference import WorldModel  # noqa: E402
from mfvae_tpu.models.mavae import GroupedBatch, agent_order_concat  # noqa: E402
from mfvae_tpu.rollout_eval import rollout_accuracy  # noqa: E402
from mfvae_tpu.training.experiment import Experiment  # noqa: E402
from mfvae_tpu.training.trainer import (  # noqa: E402
    make_action_sampler,
    stacked_to_grouped,
)

HORIZONS = (1, 5, 25)
SWEEPS = (300.0, 1000.0)


def train(s_weight: float, policy: str, epochs: int) -> Experiment:
    cfg = ExperimentConfig()
    cfg.model.det_features = 128
    cfg.model.residual_state = True
    cfg.loss.s_weight = s_weight
    cfg.train.epoch_num = epochs
    cfg.train.collect_policy = policy
    cfg.train.collect_epsilon = 0.1
    cfg.train.epochs_per_dispatch = 32
    cfg.train.run_name = f"residsw{int(s_weight)}_{policy}"
    cfg.train.log_dir = "/tmp/residsw_results"
    cfg.train.checkpoint_dir = f"/tmp/ck_residsw{int(s_weight)}_{policy}"
    cfg.train.resume = True
    exp = Experiment(cfg).setup()
    exp.run()
    return exp


def delta_diagnostics(exp: Experiment, wm: WorldModel, n: int = 64) -> dict:
    """Direct check that the delta head learned: predicted vs true deltas
    over a burn-in-decorrelated batch of real transitions."""
    key = jax.random.PRNGKey(0)
    sample_fn, group_actions = make_action_sampler(exp.env, exp.spec)

    obs, state = exp.env.reset_stacked(key)
    for i in range(32):
        k = jax.random.fold_in(key, i)
        obs, state, *_ = exp.env.step_stacked(k, state, sample_fn(k))

    preds, bases, gts = [], [], []
    for i in range(n):
        k = jax.random.fold_in(jax.random.PRNGKey(1), i)
        acts = sample_fn(k)
        next_obs, state2, *_ = exp.env.step_stacked(k, state, acts)
        obs_g = tuple(g[None] for g in stacked_to_grouped(exp.spec, obs))
        act_g = tuple(a[None] for a in group_actions(acts))
        batch = GroupedBatch(obs=obs_g, actions=act_g)
        pred, _ = wm._predict(batch)
        preds.append(np.asarray(pred[0]))
        bases.append(np.asarray(agent_order_concat(exp.spec, batch.obs)[0]))
        gts.append(
            np.asarray(
                agent_order_concat(
                    exp.spec,
                    tuple(g[None] for g in stacked_to_grouped(exp.spec, next_obs)),
                )[0]
            )
        )
        obs, state = next_obs, state2
    pred_d = np.stack(preds) - np.stack(bases)
    true_d = np.stack(gts) - np.stack(bases)
    return {
        "mean_abs_pred_delta": round(float(np.abs(pred_d).mean()), 5),
        "mean_abs_true_delta": round(float(np.abs(true_d).mean()), 5),
        "delta_corr": round(
            float(np.corrcoef(pred_d.ravel(), true_d.ravel())[0, 1]), 4
        ),
    }


def main(epochs: int = 256, n_starts: int = 256):
    t0 = time.time()
    out_all = {}
    for sw in SWEEPS:
        exp = train(sw, "random", epochs)
        wm = WorldModel(exp.model, exp.carry.train_state.params)
        name = f"residsw{int(sw)}|random"
        print(f"[{time.time()-t0:.0f}s] trained {name}", flush=True)
        diag = delta_diagnostics(exp, wm)
        print(f"[{time.time()-t0:.0f}s] {name} diag: {diag}", flush=True)
        cells = {}
        for eval_policy in ("random", "pursuit"):
            key = jax.random.PRNGKey(123)  # SAME eval as the prior studies
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
            print(f"[{time.time()-t0:.0f}s] {name} eval={eval_policy}: "
                  f"{json.dumps(cell)}", flush=True)
        out_all[name] = {"diag": diag, "rollout": cells}

    print(json.dumps({
        "study": "residual + s_weight rebalance: rollout accuracy + delta diag",
        "epochs": epochs,
        "cells": out_all,
        "comparable_to": [
            "results/r4/rollout_accuracy.json",
            "results/r4/residual_rollout.json",
        ],
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
