#!/usr/bin/env python
"""Mixture collection sweep: one config strong on BOTH data distributions
(VERDICT r3 item 3).

The 2x2 cross-eval (PARITY.md, scripts/data_lever_study.py) showed each
specialist wins only its own column: pursuit-trained beats random-trained by
28% on contact-rich data but is ~6.6x worse on random-rollout data.  The
collection mixture knob already exists — ``train.collect_epsilon`` mixes
uniform-random actions into the scripted policy per agent per step — so this
sweeps it at det128 canonical scale: eps in {0.3, 0.5, 0.7} between the two
specialists (pursuit\@0.1 and pure random), trains each point, and evaluates
EVERY model on BOTH specialists' held-out distributions.

Ship criterion: a mixture point whose held-out loss in each column is within
10% of that column's specialist wins a place in examples/.

Run on the TPU env: python scripts/mixture_collection_study.py [epochs]
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

# (tag, collect_policy, collect_epsilon, collect_mix_frac); the endpoints
# are the specialists.  ep_mix mixes EPISODES (trajectory-level,
# envs/policies.EpisodeMixPolicy) — added after the action-level sweep
# measured an honest negative (every eps point loses the random column).
POINTS = (
    ("random", "random", 0.1, 0.5),
    ("mix_eps0.7", "pursuit", 0.7, 0.5),
    ("mix_eps0.5", "pursuit", 0.5, 0.5),
    ("mix_eps0.3", "pursuit", 0.3, 0.5),
    ("pursuit", "pursuit", 0.1, 0.5),
    ("ep_mix0.5", "episode_mix", 0.1, 0.5),
)
EVAL_TAGS = ("random", "pursuit")  # the two specialist distributions


def train_point(
    tag: str, policy: str, eps: float, epochs: int, mix_frac: float = 0.5
) -> Experiment:
    cfg = ExperimentConfig()
    cfg.model.det_features = 128
    cfg.train.collect_mix_frac = mix_frac
    cfg.train.epoch_num = epochs
    cfg.train.collect_policy = policy
    cfg.train.collect_epsilon = eps
    cfg.train.epochs_per_dispatch = 32
    cfg.train.run_name = f"mixture_{tag}"
    cfg.train.log_dir = "/tmp/mixture_results"
    cfg.train.checkpoint_dir = f"/tmp/ck_mixture_{tag}"
    cfg.train.resume = True  # restartable: reuse a prior run's checkpoints
    exp = Experiment(cfg).setup()
    exp.run()
    return exp


def main(epochs: int = 256, n_eval_batches: int = 64):
    import time

    t0 = time.time()
    exps = {}
    for tag, policy, eps, mix_frac in POINTS:
        exps[tag] = train_point(tag, policy, eps, epochs, mix_frac)
        print(f"[{time.time()-t0:.0f}s] trained {tag}", flush=True)

    any_exp = exps["random"]
    test_step = jax.jit(make_test_step(any_exp.cfg.loss, any_exp.cfg.train.mode))

    results = {}
    for eval_tag in EVAL_TAGS:
        data_exp = exps[eval_tag]
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

    # dominance check against the specialists' diagonal
    verdicts = {}
    for tag, _, _, _ in POINTS:
        ok = all(
            results[f"model={tag}|eval={e}"]["loss"]
            <= 1.10 * results[f"model={e}|eval={e}"]["loss"]
            for e in EVAL_TAGS
        )
        verdicts[tag] = bool(ok)

    print(json.dumps({
        "study": "mixture-collection sweep (epsilon between specialists)",
        "epochs": epochs,
        "eval_batches": n_eval_batches,
        "cells": results,
        "within_10pct_of_both_specialists": verdicts,
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
