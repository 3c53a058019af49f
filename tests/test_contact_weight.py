"""Contact-sharpness loss levers (round 5, VERDICT r4 item 5).

The reward-oracle probe bounds ANY reward head at the sharpness of the
model's predicted geometry at the contact radius, so these levers aim the
state loss at exactly that subspace: loss.contact_weight upweights
transitions where a contact paid out, loss.prey_dist_weight upweights the
relative-prey observation columns the true reward function reads.  Both
default off and must then be bit-identical to the reference objective.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfvae_tpu.config import ExperimentConfig, LossConfig
from mfvae_tpu.models.losses import (
    elbo_losses,
    huber,
    weighted_state_loss,
)
from mfvae_tpu.training.trainer import build_s_col_weight


def rand(*shape, key=0):
    return jnp.asarray(np.random.default_rng(key).normal(size=shape), jnp.float32)


class TestWeightedStateLoss:
    def test_levers_off_equals_plain_huber(self):
        cfg = LossConfig()
        recon, tgt = rand(8, 12, key=1), rand(8, 12, key=2)
        rewards = rand(8, 3, key=3)
        assert np.allclose(
            weighted_state_loss(recon, tgt, rewards, cfg, None),
            huber(tgt, recon, cfg.huber_delta),
            rtol=1e-6,
        )

    def test_contact_weight_matches_manual(self):
        cfg = LossConfig(contact_weight=4.0, contact_threshold=0.5)
        recon, tgt = rand(6, 10, key=1), rand(6, 10, key=2)
        rewards = jnp.zeros((6, 3)).at[1, 0].set(10.0).at[4, 2].set(10.0)
        got = float(weighted_state_loss(recon, tgt, rewards, cfg, None))
        # manual: per-row huber mean, rows 1 and 4 weighted 5x
        d = np.abs(np.asarray(recon) - np.asarray(tgt))
        q = np.minimum(d, 1.0)
        rows = (0.5 * q * q + (d - q)).mean(axis=1)
        w = np.ones(6)
        w[[1, 4]] = 5.0
        assert np.isclose(got, (rows * w).sum() / w.sum(), rtol=1e-5)

    def test_col_weight_matches_manual(self):
        cfg = LossConfig()
        recon, tgt = rand(5, 8, key=1), rand(5, 8, key=2)
        colw = jnp.asarray([1.0, 1.0, 3.0, 1.0, 1.0, 3.0, 1.0, 1.0])
        got = float(
            weighted_state_loss(recon, tgt, jnp.zeros((5, 2)), cfg, colw)
        )
        d = np.abs(np.asarray(recon) - np.asarray(tgt))
        q = np.minimum(d, 1.0)
        elem = 0.5 * q * q + (d - q)
        manual = (elem * np.asarray(colw)).sum(axis=1) / float(colw.sum())
        assert np.isclose(got, manual.mean(), rtol=1e-5)

    def test_elbo_losses_defaults_unchanged(self):
        """With both levers off, elbo_losses must be bit-identical to the
        reference path (the parity suite depends on this)."""
        cfg = LossConfig()
        recon_s, tgt_s = rand(8, 12, key=1), rand(8, 12, key=2)
        recon_r, tgt_r = rand(8, 3, key=3), rand(8, 3, key=4)
        mu, logvar = rand(8, 6, key=5), rand(8, 6, key=6)
        base = elbo_losses(recon_s, recon_r, tgt_s, tgt_r, mu, logvar, cfg)
        again = elbo_losses(
            recon_s, recon_r, tgt_s, tgt_r, mu, logvar, cfg, s_col_weight=None
        )
        assert float(base.loss) == float(again.loss)

    def test_elbo_losses_contact_shifts_state_branch_only(self):
        cfg0 = LossConfig()
        cfg1 = LossConfig(contact_weight=10.0)
        recon_s, tgt_s = rand(8, 12, key=1), rand(8, 12, key=2)
        recon_r = rand(8, 3, key=3)
        tgt_r = jnp.zeros((8, 3)).at[0, 0].set(10.0)
        mu, logvar = rand(8, 6, key=5), rand(8, 6, key=6)
        o0 = elbo_losses(recon_s, recon_r, tgt_s, tgt_r, mu, logvar, cfg0)
        o1 = elbo_losses(recon_s, recon_r, tgt_s, tgt_r, mu, logvar, cfg1)
        assert float(o0.s_loss) != float(o1.s_loss)
        assert float(o0.r_loss) == float(o1.r_loss)
        assert float(o0.kl_loss) == float(o1.kl_loss)


class TestBuildSColWeight:
    def test_off_returns_none(self):
        cfg = ExperimentConfig()
        from mfvae_tpu.models.mavae import AgentSpec

        spec = AgentSpec.from_dicts(
            ["adversary_0", "agent_0"], {"adversary_0": 6, "agent_0": 4},
            {"adversary_0": 5, "agent_0": 5},
        )
        assert build_s_col_weight(spec, cfg) is None

    def test_prey_columns_upweighted(self):
        cfg = ExperimentConfig()
        cfg.env.num_adversaries = 2
        cfg.env.num_good_agents = 1
        cfg.env.num_obs = 1
        cfg.loss.prey_dist_weight = 9.0
        from mfvae_tpu.envs import make
        from mfvae_tpu.training.experiment import build_spec

        env = make(
            cfg.env.name,
            num_good_agents=cfg.env.num_good_agents,
            num_adversaries=cfg.env.num_adversaries,
            num_obs=cfg.env.num_obs,
        )
        spec = build_spec(env)
        w = np.asarray(build_s_col_weight(spec, cfg))
        assert w.shape == (sum(spec.obs_dims),)
        od_adv = spec.obs_dims[0]
        # layout: self_vel(2) self_pos(2) landmark(2) other_adv(2) prey(2)
        prey_off = 4 + 2 * 1 + 2 * 1
        expected_hot = set()
        for a in range(2):
            for j in range(2):
                expected_hot.add(a * od_adv + prey_off + j)
        hot = set(np.where(w > 1.0)[0].tolist())
        assert hot == expected_hot
        assert np.allclose(w[sorted(hot)], 10.0)

    def test_non_tag_env_rejected(self):
        cfg = ExperimentConfig()
        cfg.env.name = "MPE_simple_spread_v3"
        cfg.loss.prey_dist_weight = 1.0
        with pytest.raises(AssertionError, match="simple_tag"):
            build_s_col_weight(object(), cfg)


class TestPreyRelSlice:
    """tag_prey_rel_slice is the single source of truth for the obs-layout
    offset that build_s_col_weight (and the studies' score functions)
    depend on — pin it against the env's ACTUAL observations."""

    def test_slice_selects_prey_relative_positions(self):
        from mfvae_tpu.envs.mpe import SimpleTagEnv, tag_prey_rel_slice

        env = SimpleTagEnv(num_good_agents=2, num_adversaries=3, num_obs=2)
        sl = env.prey_rel_slice()
        assert sl == tag_prey_rel_slice(2, 3, 2)
        obs, state = env.reset_stacked(jax.random.PRNGKey(0))
        pos = np.asarray(state.agent_pos)  # adversaries first, then good
        adv = np.asarray(obs.adversary)
        for a in range(3):
            rel = (pos[3:] - pos[a]).reshape(-1)
            np.testing.assert_allclose(adv[a, sl], rel, rtol=1e-5, atol=1e-6)

    def test_build_s_col_weight_uses_the_slice(self):
        from mfvae_tpu.envs.mpe import tag_prey_rel_slice

        cfg = ExperimentConfig()
        cfg.env.num_adversaries = 2
        cfg.env.num_good_agents = 1
        cfg.env.num_obs = 1
        cfg.loss.prey_dist_weight = 9.0
        from mfvae_tpu.envs import make
        from mfvae_tpu.training.experiment import build_spec

        env = make(
            cfg.env.name,
            num_good_agents=1, num_adversaries=2, num_obs=1,
        )
        spec = build_spec(env)
        w = np.asarray(build_s_col_weight(spec, cfg))
        sl = tag_prey_rel_slice(1, 2, 1)
        od_adv = spec.obs_dims[0]
        hot = set(np.where(w > 1.0)[0].tolist())
        expected = {
            a * od_adv + j for a in range(2) for j in range(sl.start, sl.stop)
        }
        assert hot == expected


class TestHostPathLevers:
    def test_prey_dist_weight_applies_on_host_driver(self, tmp_path):
        """Review-caught gap: HostExperiment built its train/test steps
        without s_col_weight, silently ignoring loss.prey_dist_weight.
        Pin: the host driver's jitted test step must produce a different
        state loss with the lever on vs off for the same batch."""
        import jax as _jax

        from mfvae_tpu.training.host_experiment import HostExperiment
        from tests.test_training import tiny_cfg

        def build(weight):
            cfg = tiny_cfg(tmp_path, epoch_num=1, sample_num=4, train_num=1)
            cfg.buffer.min_size = 4
            cfg.buffer.batch_size = 4
            cfg.loss.prey_dist_weight = weight
            return HostExperiment(cfg).setup()

        exp_on = build(9.0)
        exp_off = build(0.0)
        batch = exp_on._fake_batch(4)
        rng = np.random.default_rng(0)
        batch = batch._replace(
            inputs=batch.inputs._replace(
                obs=tuple(
                    jnp.asarray(rng.normal(size=o.shape), jnp.float32)
                    for o in batch.inputs.obs
                )
            ),
            next_state=jnp.asarray(
                rng.normal(size=batch.next_state.shape), jnp.float32
            ),
        )
        # same cfg.train.seed -> identical init params in both drivers
        k = _jax.random.PRNGKey(0)
        out_on = exp_on._test_jit(exp_on.train_state, batch, k)
        out_off = exp_off._test_jit(exp_off.train_state, batch, k)
        assert float(out_on.s_loss) != float(out_off.s_loss)


class TestEndToEndLevers:
    def test_training_runs_with_both_levers(self, tmp_path):
        from mfvae_tpu.training.experiment import Experiment

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
        cfg.train.epoch_num = 2
        cfg.train.sample_num = 8
        cfg.train.train_num = 3
        cfg.train.test_num = 2
        cfg.train.batch_size = 8
        cfg.train.log_dir = str(tmp_path / "results")
        cfg.train.checkpoint_dir = ""
        cfg.loss.contact_weight = 5.0
        cfg.loss.prey_dist_weight = 9.0
        result = Experiment(cfg).setup().run()
        assert np.isfinite(result["loss_train"])

    def test_unroll_runs_with_both_levers(self, tmp_path):
        from mfvae_tpu.training.experiment import Experiment

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
        cfg.buffer.min_size = 16
        cfg.buffer.batch_size = 8
        cfg.train.epoch_num = 2
        cfg.train.sample_num = 16
        cfg.train.train_num = 3
        cfg.train.test_num = 2
        cfg.train.batch_size = 8
        cfg.train.unroll_steps = 4
        cfg.train.log_dir = str(tmp_path / "results")
        cfg.train.checkpoint_dir = ""
        cfg.loss.contact_weight = 5.0
        cfg.loss.prey_dist_weight = 9.0
        result = Experiment(cfg).setup().run()
        assert np.isfinite(result["loss_train"])

    def test_unroll_w1_parity_preserved_with_levers_off(self):
        """The W=1-equals-reference invariant (tests/test_unroll.py) must
        survive the new accumulator: levers off -> identical loss."""
        from mfvae_tpu.models.mavae import AgentSpec, GroupedBatch, MAVAE
        from mfvae_tpu.config import ModelConfig
        from mfvae_tpu.data.transitions import GroupedTransition
        from mfvae_tpu.models.losses import elbo_losses
        from mfvae_tpu.models.mavae import agent_order_concat
        from mfvae_tpu.training.unroll import make_unroll_loss_fn

        spec = AgentSpec.from_dicts(
            ["adversary_0", "adversary_1", "agent_0"],
            {"adversary_0": 8, "adversary_1": 8, "agent_0": 6},
            {"adversary_0": 5, "adversary_1": 5, "agent_0": 5},
        )
        mc = ModelConfig(
            idx_features=8, obs_features=8, action_features=8,
            encoder_hidden=(16,), action_encoder_hidden=(8,),
            decoder_hidden=(32,), compute_dtype="float32",
        )
        model = MAVAE.from_config(mc, spec)
        rng = np.random.default_rng(0)
        B = 6
        obs = tuple(
            jnp.asarray(rng.normal(size=(B, 1, len(idxs), od)), jnp.float32)
            for (od, _), idxs in spec.groups
        )
        acts = tuple(
            jnp.asarray(rng.integers(0, 5, size=(B, 1, len(idxs))), jnp.int32)
            for (_, _), idxs in spec.groups
        )
        next_obs = tuple(
            jnp.asarray(rng.normal(size=(B, 1, len(idxs), od)), jnp.float32)
            for (od, _), idxs in spec.groups
        )
        rewards = jnp.asarray(rng.normal(size=(B, 1, 3)), jnp.float32)
        wbatch = GroupedTransition(
            obs=obs, actions=acts, next_obs=next_obs, rewards=rewards,
            done=jnp.zeros((B, 1)),
        )
        params = model.init(
            jax.random.PRNGKey(0),
            GroupedBatch(obs=tuple(o[:, 0] for o in obs),
                         actions=tuple(a[:, 0] for a in acts)),
            None, jax.random.PRNGKey(1),
        )
        cfg = LossConfig()
        loss_fn = make_unroll_loss_fn(spec, cfg, 1)
        k = jax.random.PRNGKey(7)
        loss_w1, _ = loss_fn(model.apply, params, wbatch, k)
        recon_s, recon_r, mu, logvar = model.apply(
            params,
            GroupedBatch(obs=tuple(o[:, 0] for o in obs),
                         actions=tuple(a[:, 0] for a in acts)),
            None, jax.random.split(k, 1)[0],
        )
        ref = elbo_losses(
            recon_s, recon_r,
            agent_order_concat(spec, tuple(o[:, 0] for o in next_obs)),
            rewards[:, 0], mu, logvar, cfg,
        )
        assert np.isclose(float(loss_w1), float(ref.loss), rtol=1e-6)
