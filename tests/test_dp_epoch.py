"""Batched-env epoch program + data-parallel layout over the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_training import tiny_cfg


class TestBatchedEpoch:
    def test_n_envs_single_device(self, tmp_path):
        from mfvae_tpu.training.experiment import Experiment

        cfg = tiny_cfg(tmp_path, n_envs=4)
        cfg.buffer.batch_size = 8  # 2 per shard
        exp = Experiment(cfg).setup()
        result = exp.run()
        assert np.isfinite(result["loss_train"]) and np.isfinite(result["loss_test"])
        # buffer shards have the leading env axis
        assert exp.carry.buffer_state.cursor.shape == (4,)
        assert int(exp.carry.buffer_state.size[0]) > 0

    def test_dp_over_mesh(self, tmp_path):
        from mfvae_tpu.training.experiment import Experiment

        cfg = tiny_cfg(tmp_path, n_envs=8)
        cfg.buffer.batch_size = 16
        cfg.mesh.enable = True
        exp = Experiment(cfg).setup()
        # env carry is laid out over the 8 data shards
        shardings = {
            str(s)
            for s in jax.tree.leaves(
                jax.tree.map(lambda x: x.sharding.spec, exp.carry.env.state)
            )
        }
        assert any("data" in s for s in shardings)
        result = exp.run()
        assert np.isfinite(result["loss_train"]) and np.isfinite(result["loss_test"])
        # params stayed replicated (single logical copy, no drift possible)
        for leaf in jax.tree.leaves(exp.carry.train_state.params):
            assert leaf.sharding.is_fully_replicated

    def test_dp_over_mesh_with_unroll(self, tmp_path):
        """Multi-step unroll training composes with DP: per-shard window
        sampling, sharded env carry, replicated params — one program."""
        from mfvae_tpu.training.experiment import Experiment

        cfg = tiny_cfg(tmp_path, n_envs=8, unroll_steps=4)
        cfg.buffer.batch_size = 16
        cfg.buffer.max_size = 128  # per-shard 16, divisible by sample_num=8
        cfg.mesh.enable = True
        exp = Experiment(cfg).setup()
        result = exp.run()
        assert np.isfinite(result["loss_train"]) and np.isfinite(result["loss_test"])
        for leaf in jax.tree.leaves(exp.carry.train_state.params):
            assert leaf.sharding.is_fully_replicated

    def test_tp_epoch_over_2d_mesh(self, tmp_path):
        """TP flows through the epoch-level program: with
        mesh.model_axis=2 the batched epoch runs on a ('data','model') =
        4x2 grid with tensor-parallel train-state shardings (Megatron
        decoder splits + agent-axis encoder sharding), and produces the
        same training trajectory as the unsharded single-device run."""
        from mfvae_tpu.training.experiment import Experiment

        def base(subdir):
            cfg = tiny_cfg(tmp_path / subdir, n_envs=4)
            cfg.env.num_good_agents = 2  # groups (2,2) divide the model axis
            cfg.buffer.batch_size = 8
            return cfg

        cfg = base("tp")
        cfg.mesh.enable = True
        cfg.mesh.model_axis = 2
        exp = Experiment(cfg).setup()
        assert dict(exp.mesh.shape) == {"data": 4, "model": 2}
        specs = {
            str(leaf.sharding.spec)
            for leaf in jax.tree.leaves(exp.carry.train_state.params)
        }
        assert any("model" in s for s in specs), specs
        result = exp.run()
        assert np.isfinite(result["loss_train"]) and np.isfinite(result["loss_test"])

        ref = Experiment(base("single")).setup().run()
        np.testing.assert_allclose(
            result["loss_train"], ref["loss_train"], rtol=2e-3
        )
        np.testing.assert_allclose(
            result["loss_test"], ref["loss_test"], rtol=2e-3
        )

    def test_dp_checkpoint_resume(self, tmp_path):
        """Full-state checkpoint/resume works for the sharded DP carry
        (TODO item: restore onto the mesh)."""
        import numpy as np

        from mfvae_tpu.training.experiment import Experiment

        cfg = tiny_cfg(tmp_path, n_envs=8, epoch_num=2, checkpoint_every=1)
        cfg.buffer.batch_size = 16
        cfg.mesh.enable = True
        exp = Experiment(cfg).setup()
        exp.run()
        exp.ckpt.wait()

        cfg2 = tiny_cfg(tmp_path, n_envs=8, epoch_num=3, checkpoint_every=1, resume=True)
        cfg2.buffer.batch_size = 16
        cfg2.mesh.enable = True
        exp2 = Experiment(cfg2).setup()
        assert exp2.start_epoch == 2
        for a, b in zip(
            jax.tree.leaves(exp.carry.train_state.params),
            jax.tree.leaves(exp2.carry.train_state.params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        result = exp2.run()
        assert result["epoch"] == 2
        assert np.isfinite(result["loss_train"])

    def test_batched_matches_reference_structure(self, tmp_path):
        """The batched epoch with E=2 trains the same model family: loss
        decreases across epochs on the tiny setup."""
        from mfvae_tpu.training.experiment import Experiment

        cfg = tiny_cfg(tmp_path, n_envs=2, epoch_num=6)
        cfg.buffer.batch_size = 8
        exp = Experiment(cfg).setup()
        losses = []
        for e in range(cfg.train.epoch_num):
            exp.carry, m = exp._epoch_jit(exp.carry, exp.streams["train"].at(e))
            losses.append(float(m.train.loss))
        assert losses[-1] < losses[0]
