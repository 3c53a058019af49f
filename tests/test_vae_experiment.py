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


class TestWorldCommPipeline:
    def test_mavae_trains_on_world_comm(self, tmp_path):
        """Full MAVAE pipeline on simple_world_comm: three agent classes
        (lead 34-dim/Discrete(20), adversaries 34/5, good 28/5) exercise
        the 3-group spec and heterogeneous action spaces end-to-end."""
        from tests.test_training import tiny_cfg
        from mfvae_tpu.training.experiment import Experiment

        cfg = tiny_cfg(tmp_path, epoch_num=3)
        cfg.env.name = "MPE_simple_world_comm_v3"
        cfg.env.num_good_agents = 2
        cfg.env.num_adversaries = 3  # leader + 2
        cfg.env.num_obs = 1
        cfg.env.max_steps = 8
        exp = Experiment(cfg).setup()
        assert len(exp.spec.groups) == 3
        # leader group has its own act_dim (5 * dim_c)
        (_, lead_act), _ = exp.spec.groups[0]
        assert lead_act == 20
        result = exp.run()
        assert np.isfinite(result["loss_train"]) and np.isfinite(result["loss_test"])

    def test_collection_samples_full_leader_range(self, tmp_path):
        """Random collection must cover the leader's extended action space
        (uniform within each agent's own range, not truncated to 5)."""
        import jax
        import jax.numpy as jnp

        from mfvae_tpu.envs.mpe import make
        from mfvae_tpu.models.mavae import AgentSpec

        env = make("MPE_simple_world_comm_v3")
        spec = AgentSpec.from_dicts(
            env.agents, {a: env.obs_dim(a) for a in env.agents},
            {a: env.action_space(a).n for a in env.agents},
        )
        act_dims_arr = jnp.asarray(spec.act_dims, jnp.float32)
        samples = []
        for i in range(200):
            u = jax.random.uniform(jax.random.PRNGKey(i), (spec.n_agents,))
            a = jnp.minimum(
                (u * act_dims_arr).astype(jnp.int32),
                act_dims_arr.astype(jnp.int32) - 1,
            )
            samples.append(np.asarray(a))
        s = np.stack(samples)
        assert s[:, 0].max() >= 15 and s[:, 0].min() <= 2  # leader uses 0..19
        assert s[:, 1:].max() == 4  # others capped at their own range
