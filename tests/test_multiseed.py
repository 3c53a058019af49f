"""Vmapped multi-seed training (training/multiseed.py) must reproduce the
single-seed Experiment bit-for-bit per replica, and actually vary by seed."""

import numpy as np

from mfvae_tpu.training.experiment import Experiment
from mfvae_tpu.training.multiseed import run_multiseed

from tests.test_training import tiny_cfg


def test_multiseed_matches_single_seed(tmp_path):
    cfg = tiny_cfg(tmp_path)
    cfg.train.epoch_num = 4
    base = Experiment(cfg).setup().run()

    cfg2 = tiny_cfg(tmp_path)
    cfg2.train.epoch_num = 4
    out = run_multiseed(cfg2, seeds=[0, 1], epochs_per_dispatch=2)
    assert out["n_seeds"] == 2
    np.testing.assert_allclose(out["loss_train"][0], base["loss_train"], rtol=1e-6)
    np.testing.assert_allclose(out["loss_test"][0], base["loss_test"], rtol=1e-6)
    # different seeds -> different trajectories
    assert abs(out["loss_train"][0] - out["loss_train"][1]) > 1e-9
    assert out["train_min"] <= out["train_mean"] <= out["train_max"]


def test_multiseed_seed_relabeling(tmp_path):
    """Replica identity depends only on the seed value, not its position."""
    cfg = tiny_cfg(tmp_path)
    cfg.train.epoch_num = 2
    a = run_multiseed(cfg, seeds=[3, 5])
    b = run_multiseed(cfg, seeds=[5, 3])
    np.testing.assert_allclose(a["loss_train"], b["loss_train"][::-1], rtol=1e-6)


def test_multiseed_tail_metrics(tmp_path):
    """tail_metrics returns the last dispatch chunk's per-epoch held-out
    losses ([N, k]), with the final column equal to loss_test — incl.
    through the replica_batch partitioning path."""
    cfg = tiny_cfg(tmp_path)
    cfg.train.epoch_num = 4
    out = run_multiseed(
        cfg, seeds=[0, 1, 2], epochs_per_dispatch=2, replica_batch=2,
        tail_metrics=True,
    )
    tail = np.asarray(out["test_loss_tail"])
    assert tail.shape == (3, 2)
    np.testing.assert_allclose(tail[:, -1], out["loss_test"], rtol=1e-6)
