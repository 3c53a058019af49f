"""Residual state decoding (model.residual_state): the state head predicts
the DELTA from the current global state instead of the reference's absolute
reconstruction (motivation: PARITY.md round-4 rollout-accuracy study — the
absolute decoder never beats the frozen-world baseline at state
prediction).  Adds no parameters, so a residual model and a plain model
share the exact same variable tree."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfvae_tpu.config import ExperimentConfig
from mfvae_tpu.inference import WorldModel
from mfvae_tpu.models.mavae import GroupedBatch, MAVAE, agent_order_concat
from mfvae_tpu.training.experiment import Experiment


def tiny_cfg(**model_kw):
    cfg = ExperimentConfig()
    cfg.env.num_good_agents = 1
    cfg.env.num_adversaries = 2
    cfg.env.num_obs = 1
    cfg.model.idx_features = 8
    cfg.model.obs_features = 8
    cfg.model.action_features = 8
    cfg.model.encoder_hidden = (16,)
    cfg.model.action_encoder_hidden = (8,)
    cfg.model.decoder_hidden = (32,)
    cfg.model.compute_dtype = "float32"
    for k, v in model_kw.items():
        setattr(cfg.model, k, v)
    return cfg


class TestResidualDecode:
    def test_exact_offset_and_shared_params(self):
        """Same variables: residual recon_state == plain recon_state +
        current flat state; rewards identical."""
        exp = Experiment(tiny_cfg())
        batch = exp._fake_batch(4)
        var = exp.model.init(jax.random.PRNGKey(0), batch, None,
                             jax.random.PRNGKey(1))
        res_model = dataclasses.replace(exp.model, residual_state=True)

        k = jax.random.PRNGKey(2)
        s_plain, r_plain, mu_p, lv_p = exp.model.apply(var, batch, None, k)
        s_res, r_res, mu_r, lv_r = res_model.apply(var, batch, None, k)

        base = agent_order_concat(exp.spec, batch.obs)
        np.testing.assert_allclose(
            np.asarray(s_res), np.asarray(s_plain + base), rtol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(r_res), np.asarray(r_plain))
        np.testing.assert_array_equal(np.asarray(mu_r), np.asarray(mu_p))
        np.testing.assert_array_equal(np.asarray(lv_r), np.asarray(lv_p))

    def test_decode_requires_base(self):
        exp = Experiment(tiny_cfg(residual_state=True))
        batch = exp._fake_batch(2)
        var = exp.model.init(jax.random.PRNGKey(0), batch, None,
                             jax.random.PRNGKey(1))
        model = exp.model
        mu, logvar, aemb, experts, det = model.apply(
            var, batch, None, method=lambda m, b, ids: m.encode(b, ids)
        )
        with pytest.raises(ValueError, match="base_state"):
            model.apply(
                var, mu, aemb, None, det, None,
                method=lambda m, z, a, s, d, b: m.decode(z, a, s, d, b),
            )

    def test_worldmodel_predict_applies_residual(self):
        """WorldModel.predict on a residual model == plain-model predict +
        current flat state (shared params)."""
        exp = Experiment(tiny_cfg())
        batch = exp._fake_batch(3)
        var = exp.model.init(jax.random.PRNGKey(0), batch, None,
                             jax.random.PRNGKey(1))
        res_model = dataclasses.replace(exp.model, residual_state=True)

        wm_plain = WorldModel(exp.model, var)
        wm_res = WorldModel(res_model, var)
        s_p, r_p = wm_plain._predict(batch)
        s_r, r_r = wm_res._predict(batch)
        base = agent_order_concat(exp.spec, batch.obs)
        np.testing.assert_allclose(
            np.asarray(s_r), np.asarray(s_p + base), rtol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(r_r), np.asarray(r_p))

    def test_trains_end_to_end(self):
        cfg = tiny_cfg(residual_state=True)
        cfg.train.epoch_num = 2
        cfg.train.run_name = "residual_smoke"
        cfg.train.log_dir = "/tmp/residual_smoke"
        cfg.train.checkpoint_dir = "/tmp/residual_smoke_ck"
        exp = Experiment(cfg).setup()
        out = exp.run()
        assert np.isfinite(out["loss_train"]) and np.isfinite(out["loss_test"])


class TestStateWeight:
    def test_s_weight_rebalances_without_touching_metrics(self):
        """loss.s_weight scales only the state term inside the combined
        loss; the reported components stay raw, and the default 1.0 is the
        reference weighting."""
        from mfvae_tpu.config import LossConfig
        from mfvae_tpu.models.losses import combine_losses

        s, r, kl = jnp.float32(0.007), jnp.float32(2.0), jnp.float32(0.5)
        for family in ("jax", "torch"):
            base = combine_losses(s, r, kl, LossConfig(family=family))
            up = combine_losses(
                s, r, kl, LossConfig(family=family, s_weight=100.0)
            )
            np.testing.assert_allclose(float(up.s_loss), float(s))
            np.testing.assert_allclose(float(up.r_loss), float(r))
            sw_share = 1.0 - (0.5 if family == "jax" else 0.0)
            want = float(base.loss) + 99.0 * float(s) * sw_share
            np.testing.assert_allclose(float(up.loss), want, rtol=1e-6)


class TestStateSkip:
    def test_trains_and_serves_end_to_end(self):
        """state_skip + residual_state + s_weight: the dynamics-capable
        configuration trains and serves (the skip changes decoder input
        width, so params differ from the reference structure)."""
        cfg = tiny_cfg(residual_state=True, state_skip=True)
        cfg.loss.s_weight = 300.0
        cfg.train.epoch_num = 2
        cfg.train.run_name = "skip_smoke"
        cfg.train.log_dir = "/tmp/skip_smoke"
        cfg.train.checkpoint_dir = "/tmp/skip_smoke_ck"
        exp = Experiment(cfg).setup()
        out = exp.run()
        assert np.isfinite(out["loss_train"])
        wm = WorldModel(exp.model, exp.carry.train_state.params)
        batch = exp._fake_batch(3)
        s, r = wm._predict(batch)
        assert s.shape == (3, sum(exp.spec.obs_dims))
        assert np.isfinite(np.asarray(s)).all()

    def test_skip_actually_conditions_the_decoder(self):
        """Same latents, different base -> different state prediction (the
        skip input reaches the decoder); without state_skip the prediction
        ignores the base entirely (holding encoder inputs fixed)."""
        exp = Experiment(tiny_cfg(state_skip=True))
        batch = exp._fake_batch(2)
        var = exp.model.init(jax.random.PRNGKey(0), batch, None,
                             jax.random.PRNGKey(1))
        model = exp.model
        mu, logvar, aemb, experts, det = model.apply(
            var, batch, None, method=lambda m, b, ids: m.encode(b, ids)
        )
        base1 = agent_order_concat(exp.spec, batch.obs)
        base2 = base1 + 1.0
        dec = lambda m, z, a, s, d, b: m.decode(z, a, s, d, b)
        s1, _ = model.apply(var, mu, aemb, None, det, base1, method=dec)
        s2, _ = model.apply(var, mu, aemb, None, det, base2, method=dec)
        assert float(np.abs(np.asarray(s1 - s2)).max()) > 0.0

    def test_state_skip_requires_base(self):
        exp = Experiment(tiny_cfg(state_skip=True))
        batch = exp._fake_batch(2)
        var = exp.model.init(jax.random.PRNGKey(0), batch, None,
                             jax.random.PRNGKey(1))
        model = exp.model
        mu, logvar, aemb, experts, det = model.apply(
            var, batch, None, method=lambda m, b, ids: m.encode(b, ids)
        )
        with pytest.raises(ValueError, match="base_state"):
            model.apply(
                var, mu, aemb, None, det, None,
                method=lambda m, z, a, s, d, b: m.decode(z, a, s, d, b),
            )


class TestDecoderLayerNorm:
    def test_dynamics_recipe_trains_and_predicts(self):
        """residual + skip + layernorm + s_weight — the measured dynamics
        recipe — trains end-to-end and serves."""
        cfg = tiny_cfg(residual_state=True, state_skip=True,
                       decoder_layernorm=True)
        cfg.loss.s_weight = 300.0
        cfg.train.epoch_num = 2
        cfg.train.run_name = "ln_smoke"
        cfg.train.log_dir = "/tmp/ln_smoke"
        cfg.train.checkpoint_dir = "/tmp/ln_smoke_ck"
        exp = Experiment(cfg).setup()
        out = exp.run()
        assert np.isfinite(out["loss_train"])
        wm = WorldModel(exp.model, exp.carry.train_state.params)
        s, r = wm._predict(exp._fake_batch(2))
        assert np.isfinite(np.asarray(s)).all()

    def test_layernorm_params_exist_only_when_on(self):
        exp_on = Experiment(tiny_cfg(decoder_layernorm=True))
        exp_off = Experiment(tiny_cfg())
        b = exp_on._fake_batch(2)
        v_on = exp_on.model.init(jax.random.PRNGKey(0), b, None,
                                 jax.random.PRNGKey(1))
        v_off = exp_off.model.init(jax.random.PRNGKey(0), b, None,
                                   jax.random.PRNGKey(1))
        flat_on = jax.tree_util.tree_flatten_with_path(v_on)[0]
        names_on = {"/".join(str(p) for p in path) for path, _ in flat_on}
        flat_off = jax.tree_util.tree_flatten_with_path(v_off)[0]
        names_off = {"/".join(str(p) for p in path) for path, _ in flat_off}
        assert any("ln" in n for n in names_on - names_off)
        assert not any("ln" in n and "ln" == n.split("'")[1][:2]
                       for n in names_off)
