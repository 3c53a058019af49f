#!/usr/bin/env python
"""Close the generalist-collection residual (VERDICT r4 item 9).

Round 4's trajectory-level episode mixing (ep_mix0.5) dominated every
action-level mixture but still lost the random column 4.8x to the random
specialist (s_loss 1.40 vs 0.29) — suspicious, because HALF its episodes
are pure random rollouts, yet its random-column error matches pure
pursuit's.  Two hypotheses, each with an arm:

  dilution      ep_mix sees half the random-episode count the specialist
                does  ->  arm ep_mix0.5_x2 trains 2x epochs (matching the
                specialist's random-episode budget).  If the column
                recovers, the residual was data volume.
  interference  pursuit's contact-dense states dominate the loss surface
                regardless of mixture share  ->  mix-ratio arms 0.25/0.75
                trace the dose-response; if even 0.75-random barely moves
                the column, the mechanism is gradient interference, not
                share.

Ship criterion unchanged: a config within 10% of BOTH specialists, or
the Pareto frontier declared final with the binding mechanism named.

Run on the TPU env: python scripts/generalist_study.py [epochs]
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import numpy as np  # noqa: E402

from mfvae_tpu.data.transitions import vae_batch_from_grouped  # noqa: E402
from mfvae_tpu.training.trainer import make_test_step  # noqa: E402

from mixture_collection_study import train_point  # noqa: E402

EVAL_TAGS = ("random", "pursuit")


def main(epochs: int = 256, n_eval_batches: int = 64):
    t0 = time.time()
    # (tag, policy, eps, mix_frac, epoch_multiplier)
    points = (
        ("random", "random", 0.1, 0.5, 1),
        ("pursuit", "pursuit", 0.1, 0.5, 1),
        ("ep_mix0.5", "episode_mix", 0.1, 0.5, 1),
        ("ep_mix0.25", "episode_mix", 0.1, 0.25, 1),
        ("ep_mix0.75", "episode_mix", 0.1, 0.75, 1),
        ("ep_mix0.5_x2", "episode_mix", 0.1, 0.5, 2),
    )
    exps = {}
    for tag, policy, eps, mix_frac, mult in points:
        exps[tag] = train_point(tag, policy, eps, epochs * mult, mix_frac)
        print(f"[{time.time()-t0:.0f}s] trained {tag}", flush=True)

    any_exp = exps["random"]
    test_step = jax.jit(
        make_test_step(any_exp.cfg.loss, any_exp.cfg.train.mode)
    )

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
            host = jax.device_get(losses)
            mean = {
                "loss": float(np.mean([o.loss for o in host])),
                "s_loss": float(np.mean([o.s_loss for o in host])),
                "r_loss": float(np.mean([o.r_loss for o in host])),
                "kl": float(np.mean([o.kl_loss for o in host])),
            }
            results[f"model={model_tag}|eval={eval_tag}"] = mean
            print(f"[{time.time()-t0:.0f}s] model={model_tag} "
                  f"eval={eval_tag}: {mean}", flush=True)

    verdicts = {}
    for tag, *_ in points:
        ok = all(
            results[f"model={tag}|eval={e}"]["loss"]
            <= 1.10 * results[f"model={e}|eval={e}"]["loss"]
            for e in EVAL_TAGS
        )
        verdicts[tag] = bool(ok)

    # mechanism call: does doubling data move the random column?
    base = results["model=ep_mix0.5|eval=random"]["s_loss"]
    x2 = results["model=ep_mix0.5_x2|eval=random"]["s_loss"]
    spec = results["model=random|eval=random"]["s_loss"]
    mechanism = (
        "dilution" if (base - x2) > 0.5 * (base - spec) else "interference"
    )

    print(json.dumps({
        "study": "generalist collection: ep_mix ratio + volume dose-response",
        "epochs": epochs, "eval_batches": n_eval_batches,
        "cells": results,
        "within_10pct_of_both_specialists": verdicts,
        "random_column_mechanism": mechanism,
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
