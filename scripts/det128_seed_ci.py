#!/usr/bin/env python
"""Seed CI for the flagship quality number (VERDICT r3 item 4).

The shipped recommendation (examples/det_quality.yaml: det_features=128,
wide eval test_num=256) carries the quality headline — held-out Loss/Test
1.19 ± 0.03 — but that ± was EVAL-sampling noise from a single training
seed.  This puts a seed confidence interval on it: N independent seeds
train through the vmapped multiseed runner (training/multiseed.py), each
scored by the same statistic as the headline (mean of the last-50 epochs'
wide-eval Loss/Test), and the study reports mean ± 95% CI across seeds.

Run on the TPU env:
  python scripts/det128_seed_ci.py [n_seeds] [epochs] [replica_batch]
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import numpy as np  # noqa: E402

from mfvae_tpu.config import ExperimentConfig  # noqa: E402
from mfvae_tpu.training.multiseed import run_multiseed  # noqa: E402

LAST_K = 50


def main(n_seeds: int = 8, epochs: int = 1024, replica_batch: int = 2):
    # replica_batch=2: det128 + wide eval at 4 vmapped replicas needs
    # ~19.7G HBM (measured OOM on v5e-1's 16G); 2 fits with headroom
    cfg = ExperimentConfig()
    cfg.model.det_features = 128
    cfg.loss.family = "jax"
    cfg.train.epoch_num = epochs
    cfg.train.test_num = 256  # wide eval, like examples/det_quality.yaml
    cfg.train.run_name = "det128_seed_ci"
    cfg.train.checkpoint_dir = "/tmp/ck_det128_seed_ci"

    # last dispatch chunk must cover the last-K window the headline uses
    out = run_multiseed(
        cfg,
        seeds=range(n_seeds),
        epochs_per_dispatch=max(64, LAST_K),
        replica_batch=replica_batch,
        tail_metrics=True,
    )
    tail = np.asarray(out["test_loss_tail"])  # [N, k]
    per_seed = tail[:, -LAST_K:].mean(axis=1)
    mean = float(per_seed.mean())
    std = float(per_seed.std(ddof=1))
    ci95 = 1.96 * std / np.sqrt(len(per_seed))
    summary = {
        "study": "det128 flagship quality, seed CI (last-50 wide-eval mean)",
        "n_seeds": n_seeds,
        "epochs": epochs,
        "per_seed_last50_test": [round(float(x), 4) for x in per_seed],
        "mean": round(mean, 4),
        "std": round(std, 4),
        "ci95": round(float(ci95), 4),
        "single_run_headline": 1.19,
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:]]
    main(*(a or [8]))
