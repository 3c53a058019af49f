"""Training layer: PopArt math, fused train step, compiled epoch, e2e run,
checkpoint resume."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfvae_tpu.config import ExperimentConfig, LossConfig
from mfvae_tpu.data.buffer import ItemBuffer
from mfvae_tpu.models.mavae import GroupedBatch
from mfvae_tpu.training.popart import (
    art,
    denormalize,
    init_popart,
    normalize,
    pop_rescale_head,
)
from mfvae_tpu.training.trainer import (
    VaeBatch,
    create_train_state,
    make_test_step,
    make_train_step,
)


def tiny_cfg(tmp_path=None, **train_kw):
    cfg = ExperimentConfig()
    cfg.env.num_good_agents = 1
    cfg.env.num_adversaries = 2
    cfg.env.num_obs = 1
    cfg.env.max_steps = 16
    cfg.model.idx_features = 8
    cfg.model.obs_features = 8
    cfg.model.action_features = 8
    cfg.model.encoder_hidden = (16,)
    cfg.model.action_encoder_hidden = (8,)
    cfg.model.decoder_hidden = (32,)
    cfg.model.compute_dtype = "float32"
    cfg.buffer.max_size = 64
    cfg.buffer.min_size = 4
    cfg.buffer.batch_size = 8
    cfg.train.epoch_num = 3
    cfg.train.sample_num = 8
    cfg.train.train_num = 3
    cfg.train.test_num = 2
    cfg.train.batch_size = 8
    if tmp_path is not None:
        cfg.train.log_dir = str(tmp_path / "results")
        cfg.train.checkpoint_dir = str(tmp_path / "ckpt")
    for k, v in train_kw.items():
        setattr(cfg.train, k, v)
    return cfg


class TestPopArt:
    def test_art_tracks_moments(self):
        st = init_popart(3)
        targets = jnp.array([[10.0, -5.0, 0.0]] * 8)
        for _ in range(2000):
            st = art(st, targets, beta=0.01)
        np.testing.assert_allclose(np.asarray(st.mu), [10.0, -5.0, 0.0], atol=0.2)
        # constant targets -> sigma collapses toward floor
        assert float(st.sigma[0]) < 0.5

    def test_normalize_roundtrip(self):
        st = init_popart(2)._replace(
            mu=jnp.array([1.0, 2.0]), sigma=jnp.array([3.0, 4.0])
        )
        y = jnp.array([[7.0, -1.0]])
        np.testing.assert_allclose(
            np.asarray(denormalize(st, normalize(st, y))), np.asarray(y), rtol=1e-6
        )

    def test_pop_preserves_denormalized_outputs(self):
        """The output-preserving invariant behind torch_ver/trainer.py:71-74."""
        rng = np.random.default_rng(0)
        n_out = 4
        params = {
            "params": {
                "reward_linear": {
                    "kernel": jnp.array(rng.normal(size=(6, n_out)), jnp.float32),
                    "bias": jnp.array(rng.normal(size=(n_out,)), jnp.float32),
                },
                "other": {"w": jnp.ones((2, 2))},
            }
        }
        old = init_popart(n_out)._replace(
            mu=jnp.array([0.0, 1.0, -1.0, 2.0]), sigma=jnp.array([1.0, 2.0, 0.5, 1.5])
        )
        targets = jnp.array(rng.normal(size=(16, n_out)) * 5 + 3, jnp.float32)
        new = art(old, targets, beta=0.1)
        new_params = pop_rescale_head(
            params, old, new, ("params", "reward_linear")
        )
        x = jnp.array(rng.normal(size=(5, 6)), jnp.float32)

        def head(p, x, stats):
            y = x @ p["params"]["reward_linear"]["kernel"] + p["params"]["reward_linear"]["bias"]
            return denormalize(stats, y)

        np.testing.assert_allclose(
            np.asarray(head(params, x, old)),
            np.asarray(head(new_params, x, new)),
            rtol=1e-4,
        )
        # untouched params survive structurally
        assert new_params["params"]["other"]["w"].shape == (2, 2)


def make_batch_and_state(cfg, seed=0):
    from mfvae_tpu.envs.mpe import make
    from mfvae_tpu.models.mavae import MAVAE
    from mfvae_tpu.training.experiment import build_spec

    env = make(
        cfg.env.name,
        num_good_agents=cfg.env.num_good_agents,
        num_adversaries=cfg.env.num_adversaries,
        num_obs=cfg.env.num_obs,
        max_steps=cfg.env.max_steps,
    )
    spec = build_spec(env)
    model = MAVAE.from_config(cfg.model, spec)
    B = cfg.buffer.batch_size
    rng = np.random.default_rng(seed)
    obs = tuple(
        jnp.array(rng.normal(size=(B, len(idxs), od)), jnp.float32)
        for (od, _), idxs in spec.groups
    )
    act = tuple(
        jnp.array(rng.integers(0, 5, size=(B, len(idxs)))) for (_, _), idxs in spec.groups
    )
    batch = VaeBatch(
        inputs=GroupedBatch(obs=obs, actions=act),
        next_state=jnp.array(rng.normal(size=(B, sum(spec.obs_dims))), jnp.float32),
        rewards=jnp.array(rng.normal(size=(B, spec.n_agents)), jnp.float32),
    )
    variables = model.init(
        jax.random.PRNGKey(0), batch.inputs, None, jax.random.PRNGKey(1)
    )
    state = create_train_state(model, variables, cfg.train)
    return spec, model, batch, state


class TestTrainStep:
    @pytest.mark.parametrize("mode", ["Adam", "ART", "POPART"])
    def test_step_reduces_loss_on_fixed_batch(self, mode):
        cfg = tiny_cfg(mode=mode)
        spec, model, batch, state = make_batch_and_state(cfg)
        step = jax.jit(make_train_step(cfg.loss, mode, popart_beta=0.1))
        losses = []
        for i in range(30):
            state, outs = step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(outs.loss))
        assert losses[-1] < losses[0]
        assert int(state.step) == 30

    def test_test_step_no_param_change(self):
        cfg = tiny_cfg()
        spec, model, batch, state = make_batch_and_state(cfg)
        tstep = jax.jit(make_test_step(cfg.loss))
        outs = tstep(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(outs.loss))

    def test_kl_anneal_reduces_early_loss(self):
        cfg = tiny_cfg()
        spec, model, batch, state = make_batch_and_state(cfg)
        plain = make_train_step(cfg.loss)
        annealed_cfg = LossConfig(family="jax", kl_anneal_steps=1000)
        annealed = make_train_step(annealed_cfg)
        _, o1 = jax.jit(plain)(state, batch, jax.random.PRNGKey(0))
        _, o2 = jax.jit(annealed)(state, batch, jax.random.PRNGKey(0))
        assert float(o2.loss) < float(o1.loss)  # kl term ~zeroed at step 0


class TestEndToEnd:
    def test_experiment_runs_and_learns(self, tmp_path):
        from mfvae_tpu.training.experiment import Experiment

        cfg = tiny_cfg(tmp_path)
        exp = Experiment(cfg).setup()
        result = exp.run()
        assert np.isfinite(result["loss_train"])
        assert result["epoch"] == cfg.train.epoch_num - 1
        # the epoch program must compile exactly once — a second trace means
        # carry avals drift between epochs (e.g. weak-typed step counters),
        # which on the TPU costs a silent multi-minute remote recompile
        assert exp._epoch_jit._cache_size() == 1
        # metrics written with reference tag names
        import json

        lines = (exp.logger.run_dir / "metrics.jsonl").read_text().splitlines()
        tags = {json.loads(l)["tag"] for l in lines}
        assert {"Loss/Train", "Loss/State_Train", "Loss/Reward_Train", "Loss/KL_Train",
                "Loss/Test", "Loss/State_Test", "Loss/Reward_Test", "Loss/KL_Test"} <= tags
        # resolved-config snapshot lands in the run dir and reloads equal
        from mfvae_tpu.config import load_config

        snap = load_config(str(exp.logger.run_dir / "config.yaml"))
        assert snap == cfg

    def test_world_model_on_simple_spread(self, tmp_path):
        """The MAVAE pipeline runs unchanged on the second env family
        (homogeneous agents -> one group)."""
        from mfvae_tpu.training.experiment import Experiment

        cfg = tiny_cfg(tmp_path, epoch_num=2)
        cfg.env.name = "MPE_simple_spread_v3"
        cfg.env.num_good_agents = 3
        exp = Experiment(cfg).setup()
        assert len(exp.spec.groups) == 1
        result = exp.run()
        assert np.isfinite(result["loss_train"])

    def test_disabled_checkpointing_writes_nothing(self, tmp_path, monkeypatch):
        """train.checkpoint_dir='' disables checkpointing entirely — no
        step directories may appear in the CWD (the stray `./1` orbax dirs
        this guards against) or anywhere else."""
        from mfvae_tpu.training.checkpoint import NullCheckpointManager
        from mfvae_tpu.training.experiment import Experiment

        monkeypatch.chdir(tmp_path)
        cfg = tiny_cfg(tmp_path, epoch_num=2)
        cfg.train.checkpoint_dir = ""
        cfg.train.checkpoint_every = 1  # would save every epoch if enabled
        exp = Experiment(cfg).setup()
        assert isinstance(exp.ckpt, NullCheckpointManager)
        result = exp.run()
        assert np.isfinite(result["loss_train"])
        # only the metrics dir exists; no orbax step dirs like ./1
        stray = [p for p in tmp_path.iterdir() if p.name.isdigit()]
        assert stray == []

    def test_split_epoch_mode_matches_shapes(self, tmp_path):
        from mfvae_tpu.training.experiment import Experiment

        cfg = tiny_cfg(tmp_path, fused_epoch=False, epoch_num=2)
        exp = Experiment(cfg).setup()
        result = exp.run()
        assert np.isfinite(result["loss_train"]) and np.isfinite(result["loss_test"])

    def test_run_resilient_recovers_from_crash(self, tmp_path):
        """Simulated preemption: the first attempt dies mid-training; the
        resilient driver resumes from the checkpoint and finishes."""
        from mfvae_tpu.training.experiment import Experiment, run_resilient

        cfg = tiny_cfg(tmp_path, checkpoint_every=1, epoch_num=4)
        crashes = {"armed": True}

        class FlakyExperiment(Experiment):
            def run(self):
                if crashes["armed"]:
                    # crash after two epochs' worth of checkpoints exist
                    for epoch in range(2):
                        k = self.streams["train"].at(epoch)
                        self.carry, _ = self._epoch_jit(self.carry, k)
                        self._save(epoch)
                    self.ckpt.wait()
                    crashes["armed"] = False
                    raise RuntimeError("simulated preemption")
                return super().run()

        result = run_resilient(cfg, max_restarts=2, experiment_factory=FlakyExperiment)
        assert result["epoch"] == 3
        assert not crashes["armed"]

    def test_checkpoint_resume(self, tmp_path):
        from mfvae_tpu.training.experiment import Experiment

        cfg = tiny_cfg(tmp_path, checkpoint_every=1, epoch_num=2)
        exp = Experiment(cfg).setup()
        exp.run()
        exp.ckpt.wait()

        cfg2 = tiny_cfg(tmp_path, checkpoint_every=1, epoch_num=4, resume=True)
        exp2 = Experiment(cfg2).setup()
        assert exp2.start_epoch == 2
        # params actually restored (not reinitialized): finite + equal to saved
        saved = exp.carry.train_state.params
        restored = exp2.carry.train_state.params
        for a, b in zip(jax.tree.leaves(saved), jax.tree.leaves(restored)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        result = exp2.run()
        assert result["epoch"] == 3


def test_world_model_on_simple_adversary(tmp_path):
    """Fourth env family: heterogeneous obs widths (adversary 2L+2(A-1) vs
    good +2 goal channel), goal-conditioned observations, no contact
    forces — through the unchanged fused epoch program."""
    from mfvae_tpu.training.experiment import Experiment

    cfg = tiny_cfg(tmp_path, epoch_num=2)
    cfg.env.name = "MPE_simple_adversary_v3"
    cfg.env.num_good_agents = 2
    exp = Experiment(cfg).setup()
    assert len(exp.spec.groups) == 2  # adversary + good classes
    assert exp.spec.obs_dims[0] + 2 == exp.spec.obs_dims[1]
    result = exp.run()
    assert np.isfinite(result["loss_train"])


def test_simple_adversary_host_path(tmp_path):
    """Host backend on simple_adversary (native engine when the
    toolchain exists, LocalHostEnv otherwise — the fallback itself is
    covered directly in tests/test_continuous_actions.py)."""
    from mfvae_tpu.training.host_experiment import HostExperiment

    cfg = tiny_cfg(tmp_path, epoch_num=1, sample_num=4, train_num=1, test_num=1)
    cfg.env.name = "MPE_simple_adversary_v3"
    cfg.env.num_good_agents = 2
    cfg.buffer.min_size = 2
    cfg.buffer.batch_size = 2
    exp = HostExperiment(cfg).setup()
    assert exp.agents[0] == "adversary_0" and len(exp.agents) == 3
    result = exp.run()
    assert np.isfinite(result["loss_train"])
