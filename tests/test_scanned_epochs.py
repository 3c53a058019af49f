"""epochs_per_dispatch: scanning K epochs into one XLA dispatch must be
bit-equivalent to the per-epoch dispatch path (same fold_in key derivation,
same programs), including a non-divisible final chunk and resume."""

import jax
import numpy as np

from mfvae_tpu.training.experiment import Experiment

from tests.test_training import tiny_cfg


def _run(tmp_path, sub, **train_kw):
    cfg = tiny_cfg(None, **train_kw)
    cfg.train.epoch_num = 5
    cfg.train.log_dir = str(tmp_path / sub / "results")
    cfg.train.checkpoint_dir = str(tmp_path / sub / "ckpt")
    return Experiment(cfg).setup().run()


def test_scanned_matches_per_epoch(tmp_path):
    base = _run(tmp_path, "base")
    # K=2 with epoch_num=5 exercises the remainder chunk (2+2+1)
    scanned = _run(tmp_path, "scan", epochs_per_dispatch=2)
    assert scanned["epoch"] == base["epoch"] == 4
    np.testing.assert_allclose(
        scanned["loss_train"], base["loss_train"], rtol=1e-6
    )
    np.testing.assert_allclose(scanned["loss_test"], base["loss_test"], rtol=1e-6)


def test_scanned_whole_run_single_dispatch(tmp_path):
    """K >= epoch_num: the ENTIRE training run is one XLA program (the
    reference vdn.py pattern, SURVEY §3.4)."""
    out = _run(tmp_path, "whole", epochs_per_dispatch=16)
    base = _run(tmp_path, "whole_base")
    np.testing.assert_allclose(out["loss_train"], base["loss_train"], rtol=1e-6)


def test_scanned_checkpoint_resume(tmp_path):
    cfg = tiny_cfg(None, epochs_per_dispatch=2, checkpoint_every=2)
    cfg.train.epoch_num = 4
    cfg.train.log_dir = str(tmp_path / "r" / "results")
    cfg.train.checkpoint_dir = str(tmp_path / "r" / "ckpt")
    out = Experiment(cfg).setup().run()
    assert out["epoch"] == 3
    # resume from the saved final chunk: no epochs left to run
    cfg.train.resume = True
    exp = Experiment(cfg).setup()
    assert exp.start_epoch == 4


def test_scanned_requires_fused_epoch(tmp_path):
    import pytest

    cfg = tiny_cfg(tmp_path, epochs_per_dispatch=2, fused_epoch=False)
    with pytest.raises(ValueError, match="epochs_per_dispatch"):
        Experiment(cfg).setup()


def test_eval_scan_matches_eval_vmap(tmp_path):
    a = _run(tmp_path, "ev", eval_vmap=True)
    b = _run(tmp_path, "es", eval_vmap=False)
    np.testing.assert_allclose(a["loss_test"], b["loss_test"], rtol=1e-6)


def test_scanned_resume_complete_run_keeps_checkpoint(tmp_path):
    """Resuming an already-finished run must not save a phantom epoch past
    epoch_num-1 (which would skip a real epoch if epoch_num is later raised)."""
    cfg = tiny_cfg(None, epochs_per_dispatch=2)
    cfg.train.epoch_num = 4
    cfg.train.log_dir = str(tmp_path / "rc" / "results")
    cfg.train.checkpoint_dir = str(tmp_path / "rc" / "ckpt")
    Experiment(cfg).setup().run()
    cfg.train.resume = True
    exp = Experiment(cfg).setup()
    out = exp.run()  # nothing left to do
    assert exp.ckpt.latest_step() == 3
    assert "loss_train" not in out  # no epochs ran; honest empty result


def test_scanned_metrics_logged_per_epoch(tmp_path):
    cfg = tiny_cfg(None, epochs_per_dispatch=3)
    cfg.train.epoch_num = 5
    cfg.train.log_dir = str(tmp_path / "m" / "results")
    cfg.train.checkpoint_dir = str(tmp_path / "m" / "ckpt")
    exp = Experiment(cfg).setup()
    out = exp.run()
    # JSONL fallback sink writes one line per (epoch, phase) pair
    lines = (exp.logger.run_dir / "metrics.jsonl").read_text().strip().splitlines()
    import json

    epochs_train = {
        json.loads(ln)["step"]
        for ln in lines
        if json.loads(ln).get("tag", "").endswith("Loss/Train")
    }
    assert epochs_train == set(range(5)), epochs_train
