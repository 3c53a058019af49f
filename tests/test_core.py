"""Unit tests: config round-trip, RNG streams, loss functions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfvae_tpu.config import (
    ExperimentConfig,
    LossConfig,
    apply_overrides,
    load_config,
    save_config,
)
from mfvae_tpu.models.losses import elbo_losses, huber, kl_gaussian, mse
from mfvae_tpu.rng import make_streams


class TestConfig:
    def test_yaml_roundtrip(self, tmp_path):
        cfg = ExperimentConfig()
        cfg.train.lr = 3e-4
        cfg.model.encoder_hidden = (32, 32)
        p = tmp_path / "cfg.yaml"
        save_config(cfg, str(p))
        back = load_config(str(p))
        assert back.train.lr == 3e-4
        assert back.model.encoder_hidden == (32, 32)
        assert back == cfg

    def test_overrides(self):
        cfg = ExperimentConfig()
        apply_overrides(
            cfg, ["train.lr=0.01", "model.discrete_act=false", "buffer.max_size=5"]
        )
        assert cfg.train.lr == 0.01
        assert cfg.model.discrete_act is False
        assert cfg.buffer.max_size == 5

    def test_loss_family_defaults(self):
        assert LossConfig(family="jax").resolved_weights() == (0.1, 0.5)
        assert LossConfig(family="torch").resolved_weights() == (0.0025, 0.005)
        assert LossConfig(family="jax", kl_weight=0.2).resolved_weights()[0] == 0.2
        with pytest.raises(ValueError):
            LossConfig(family="nope").resolved_weights()


class TestRng:
    def test_streams_independent_and_advancing(self):
        s = make_streams(0)
        k1, s1 = s["act"].next()
        k2, s2 = s1.next()
        assert not np.array_equal(np.asarray(k1), np.asarray(k2))
        ka, _ = s["act"].next()
        kb, _ = s["step"].next()
        assert not np.array_equal(np.asarray(ka), np.asarray(kb))

    def test_at_matches_next(self):
        s = make_streams(7)["sample"]
        k0, s = s.next()
        k1, _ = s.next()
        assert np.array_equal(np.asarray(k0), np.asarray(s._replace(counter=0).at(0)))
        assert np.array_equal(np.asarray(k1), np.asarray(s._replace(counter=0).at(1)))

    def test_bug_compat_reuses_key(self):
        s = make_streams(0, bug_compat=True)["step"]
        k1, s = s.next()
        k2, _ = s.next()
        assert np.array_equal(np.asarray(k1), np.asarray(k2))


class TestLosses:
    def test_huber_matches_torch_semantics(self):
        # quadratic inside delta, linear outside
        x = jnp.array([0.0, 0.0, 0.0])
        y = jnp.array([0.5, 2.0, -3.0])
        expected = np.mean([0.5 * 0.25, 2.0 - 0.5, 3.0 - 0.5])
        assert np.isclose(float(huber(x, y)), expected, atol=1e-6)

    def test_mse(self):
        x = jnp.array([1.0, 2.0])
        y = jnp.array([3.0, 2.0])
        assert np.isclose(float(mse(x, y)), 2.0)

    def test_kl_zero_at_standard_normal(self):
        mu = jnp.zeros((4, 8))
        logvar = jnp.zeros((4, 8))
        assert np.isclose(float(kl_gaussian(mu, logvar)), 0.0, atol=1e-6)

    def test_kl_matches_reference_formula(self):
        # reference: mean over batch of -0.5*sum(1+lv-mu^2-e^lv) (jax_ver/trainer.py:54-55)
        rng = np.random.default_rng(0)
        mu = rng.normal(size=(8, 16)).astype(np.float32)
        lv = rng.normal(size=(8, 16)).astype(np.float32)
        ref = np.mean(-0.5 * np.sum(1 + lv - mu**2 - np.exp(lv), axis=-1))
        assert np.isclose(float(kl_gaussian(jnp.array(mu), jnp.array(lv))), ref, rtol=1e-5)

    def test_kl_3d_equals_concat_2d(self):
        # [B, A, F] sum == [B, A*F] sum — the torch-vs-jax aggregation
        # identity (SURVEY §2.2)
        rng = np.random.default_rng(1)
        mu = rng.normal(size=(4, 5, 6)).astype(np.float32)
        lv = rng.normal(size=(4, 5, 6)).astype(np.float32)
        a = float(kl_gaussian(jnp.array(mu), jnp.array(lv)))
        b = float(kl_gaussian(jnp.array(mu.reshape(4, -1)), jnp.array(lv.reshape(4, -1))))
        assert np.isclose(a, b, rtol=1e-6)

    def test_free_bits_floor(self):
        mu = jnp.zeros((2, 4))
        logvar = jnp.zeros((2, 4))
        out = kl_gaussian(mu, logvar, free_bits=0.5)
        assert np.isclose(float(out), 4 * 0.5)

    def test_elbo_families(self):
        rng = np.random.default_rng(2)
        B, S, A, F = 4, 10, 3, 5
        rs = jnp.array(rng.normal(size=(B, S)), dtype=jnp.float32)
        ns = jnp.array(rng.normal(size=(B, S)), dtype=jnp.float32)
        rr = jnp.array(rng.normal(size=(B, A)), dtype=jnp.float32)
        rw = jnp.array(rng.normal(size=(B, A)), dtype=jnp.float32)
        mu = jnp.array(rng.normal(size=(B, A * F)), dtype=jnp.float32)
        lv = jnp.array(rng.normal(size=(B, A * F)), dtype=jnp.float32)

        out_jax = elbo_losses(rs, rr, ns, rw, mu, lv, LossConfig(family="jax"))
        s, r, k = float(out_jax.s_loss), float(out_jax.r_loss), float(out_jax.kl_loss)
        assert np.isclose(float(out_jax.loss), 0.5 * s + 0.5 * r + 0.1 * k, rtol=1e-6)

        out_t = elbo_losses(rs, rr, ns, rw, mu, lv, LossConfig(family="torch"))
        s, r, k = float(out_t.s_loss), float(out_t.r_loss), float(out_t.kl_loss)
        assert np.isclose(float(out_t.loss), s + 0.005 * r + 0.0025 * k, rtol=1e-6)

    def test_kl_anneal_scale(self):
        rs = jnp.zeros((2, 3))
        rr = jnp.zeros((2, 2))
        mu = jnp.ones((2, 4))
        lv = jnp.zeros((2, 4))
        cfg = LossConfig(family="jax")
        full = elbo_losses(rs, rr, rs, rr, mu, lv, cfg)
        half = elbo_losses(rs, rr, rs, rr, mu, lv, cfg, kl_scale=jnp.float32(0.5))
        assert float(half.loss) < float(full.loss)
        assert np.isclose(float(half.kl_loss), float(full.kl_loss))  # raw kl unscaled
