#!/usr/bin/env python
"""Sticky-action collection: making the world model action-CONDITIONED.

The action-sensitivity probe measured every trained model as action-blind
(action_effect_ratio 0.012-0.025 vs true dynamics; results/r4/
action_sensitivity.json): under uniform random walks the per-step action
effect is ~1% of the step delta, so the one-step loss never needs actions
and MPC planning is impossible (every arm at the random baseline,
results/r4/mpc_study.json).

Intervention chain, each link measured:
  1. collect_policy='sticky' (per-agent action hold probability
     collect_mix_frac): a held direction displaces an agent ~0.5 units
     over 8 steps, so action-attributable error ACCUMULATES in windows;
  2. train.unroll_steps=8 (+clip10) makes the objective see exactly that
     accumulated error;
  3. re-probe action_effect_ratio (does the model now move agents where
     actions push them?);
  4. rollout accuracy on the standard random/pursuit evals (did we pay
     anything on the old metrics?);
  5. factorized distance-MPC through the new model (does planning work?).

Run on the TPU env: python scripts/sticky_study.py [epochs]
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

from action_sensitivity_probe import measure_action_sensitivity  # noqa: E402
from residual_sweight_study import delta_diagnostics  # noqa: E402

HORIZONS = (1, 5, 25)


def train_sticky(
    unroll: int, epochs: int, hold: float = 0.75, grad_clip: float = 0.0,
    tag: str = "", reward_head: str = "linear", reward_input: str = "latent",
    contact_weight: float = 0.0, prey_dist_weight: float = 0.0,
    action_delta_head: bool = False,
) -> Experiment:
    cfg = ExperimentConfig()
    cfg.model.det_features = 128
    cfg.model.residual_state = True
    cfg.model.state_skip = True
    cfg.model.decoder_layernorm = True
    cfg.model.fused_decoders = False
    cfg.model.reward_head_mode = reward_head
    cfg.model.reward_head_input = reward_input
    cfg.model.action_delta_head = action_delta_head
    cfg.loss.s_weight = 300.0
    cfg.loss.contact_weight = contact_weight
    cfg.loss.prey_dist_weight = prey_dist_weight
    cfg.buffer.max_size = 10240
    cfg.train.unroll_steps = unroll
    cfg.train.grad_clip = grad_clip
    cfg.train.epoch_num = epochs
    cfg.train.collect_policy = "sticky"
    cfg.train.collect_mix_frac = hold
    cfg.train.epochs_per_dispatch = 32
    cfg.train.run_name = f"sticky{tag}"
    cfg.train.log_dir = "/tmp/sticky_results"
    cfg.train.checkpoint_dir = f"/tmp/ck_sticky{tag}"
    cfg.train.resume = True
    exp = Experiment(cfg).setup()
    exp.run()
    return exp


ARMS = (
    {"name": "sticky_w1", "unroll": 1, "grad_clip": 0.0},
    {"name": "sticky_w8_clip10", "unroll": 8, "grad_clip": 10.0},
    # hold-probability sweep around the 0.75 default (round 2)
    {"name": "sticky50_w8_clip10", "unroll": 8, "grad_clip": 10.0, "hold": 0.5},
    {"name": "sticky90_w8_clip10", "unroll": 8, "grad_clip": 10.0, "hold": 0.9},
)


def main(epochs: int = 256, n_starts: int = 256):
    t0 = time.time()
    out_all = {}
    for arm in ARMS:
        exp = train_sticky(
            arm["unroll"], epochs, hold=arm.get("hold", 0.75),
            grad_clip=arm["grad_clip"], tag="_" + arm["name"],
        )
        wm = WorldModel(exp.model, exp.carry.train_state.params)
        print(f"[{time.time()-t0:.0f}s] trained {arm['name']}", flush=True)
        sens = measure_action_sensitivity(exp, wm)
        print(f"[{time.time()-t0:.0f}s] {arm['name']} "
              f"action_effect_ratio={sens['action_effect_ratio']}", flush=True)
        diag = delta_diagnostics(exp, wm)
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
        out_all[arm["name"]] = {
            "action_sensitivity": sens, "diag": diag, "rollout": cells,
        }

    print(json.dumps({
        "study": "sticky-action collection -> action-conditioned world model",
        "epochs": epochs,
        "cells": out_all,
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
