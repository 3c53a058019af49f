"""BASELINE.json acceptance configs 1-4 as runnable experiments."""

import numpy as np
import pytest

from mfvae_tpu.training.vae_experiment import VaeExperimentConfig, run_vae_experiment


@pytest.mark.parametrize("family", ["mlp", "conv", "factorized"])
def test_families_train(tmp_path, family):
    cfg = VaeExperimentConfig(
        family=family,
        steps=40,
        batch_size=16,
        log_every=20,
        latent_dim=8,
        image_size=8,
        image_channels=1,
        conv_channels=(4, 8),
        modality_dims=(16, 8),
        shared_latent=4,
        private_latent=4,
        kl_weight=0.05,
        log_dir=str(tmp_path),
    )
    result = run_vae_experiment(cfg)
    assert np.isfinite(result["final_loss"])
    assert result["final_loss"] < result["first_loss"]


def test_beta_vae_config4(tmp_path):
    cfg = VaeExperimentConfig(
        family="mlp",
        steps=40,
        batch_size=16,
        log_every=20,
        latent_dim=8,
        kl_weight=1.0,
        kl_anneal_steps=500,
        free_bits=0.02,
        log_dir=str(tmp_path),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    result = run_vae_experiment(cfg)
    assert np.isfinite(result["final_loss"])
    import pathlib

    assert any(pathlib.Path(tmp_path / "ckpt").iterdir())


def test_unknown_family_raises(tmp_path):
    with pytest.raises(ValueError):
        run_vae_experiment(VaeExperimentConfig(family="nope", log_dir=str(tmp_path)))
