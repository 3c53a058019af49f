"""VAE model families: MLP VAE, ConvVAE, factorized multimodal VAE."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfvae_tpu.models.factorized import FactorizedMultimodalVAE, product_of_experts
from mfvae_tpu.models.vae import VAE, ConvVAE
from mfvae_tpu.training.vae_trainer import create_vae_state, make_vae_train_step


class TestMlpVAE:
    def test_shapes_and_training(self):
        model = VAE(in_dim=20, latent_dim=8, encoder_hidden=(32,), decoder_hidden=(32,))
        x = jnp.asarray(np.random.default_rng(0).normal(size=(64, 20)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
        recon, mu, lv = model.apply(variables, x, jax.random.PRNGKey(2))
        assert recon.shape == (64, 20) and mu.shape == (64, 8)

        state = create_vae_state(model, variables, lr=1e-3)
        step = jax.jit(make_vae_train_step(kl_weight=0.1))
        losses = []
        for i in range(40):
            state, outs = step(state, x, jax.random.PRNGKey(i))
            losses.append(float(outs.loss))
        assert losses[-1] < losses[0]


class TestConvVAE:
    def test_shapes_and_bf16(self):
        model = ConvVAE(image_shape=(16, 16, 3), latent_dim=16, channels=(8, 16))
        x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 16, 16, 3)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
        recon, mu, lv = model.apply(variables, x, jax.random.PRNGKey(2))
        assert recon.shape == (4, 16, 16, 3)
        assert recon.dtype == jnp.float32  # f32 outputs from bf16 compute
        assert mu.shape == (4, 16)

    def test_trains(self):
        model = ConvVAE(image_shape=(8, 8, 1), latent_dim=8, channels=(4, 8))
        x = jnp.asarray(np.random.default_rng(1).normal(size=(16, 8, 8, 1)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
        state = create_vae_state(model, variables, lr=1e-3)
        step = jax.jit(make_vae_train_step(kl_weight=0.01))
        l0 = lN = None
        for i in range(30):
            state, outs = step(state, x, jax.random.PRNGKey(i))
            l0 = l0 if l0 is not None else float(outs.loss)
            lN = float(outs.loss)
        assert lN < l0

    def test_indivisible_spatial_raises(self):
        with pytest.raises(AssertionError):
            m = ConvVAE(image_shape=(10, 10, 1), channels=(4, 8))
            x = jnp.zeros((1, 10, 10, 1))
            m.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))


class TestPoE:
    def test_single_expert_with_prior(self):
        mu = jnp.array([[2.0]])
        lv = jnp.array([[0.0]])  # var 1
        m, l = product_of_experts([mu], [lv])
        # prior N(0,1) x expert N(2,1) -> N(1, 1/2)
        np.testing.assert_allclose(float(m[0, 0]), 1.0, rtol=1e-6)
        np.testing.assert_allclose(float(jnp.exp(l)[0, 0]), 0.5, rtol=1e-6)

    def test_sharper_expert_dominates(self):
        mu1, lv1 = jnp.array([[5.0]]), jnp.array([[4.0]])  # diffuse
        mu2, lv2 = jnp.array([[-1.0]]), jnp.array([[-4.0]])  # sharp
        m, _ = product_of_experts([mu1, mu2], [lv1, lv2])
        assert abs(float(m[0, 0]) - (-1.0)) < 0.1


class TestFactorizedVAE:
    def test_multimodal_roundtrip_and_training(self):
        model = FactorizedMultimodalVAE(
            modality_dims=(12, 6),
            shared_latent=4,
            private_latent=4,
            encoder_hidden=(32,),
            decoder_hidden=(32,),
        )
        rng = np.random.default_rng(0)
        # correlated modalities: x2 is a projection of x1's source
        src = rng.normal(size=(32, 4)).astype(np.float32)
        x1 = jnp.asarray(src @ rng.normal(size=(4, 12)).astype(np.float32))
        x2 = jnp.asarray(src @ rng.normal(size=(4, 6)).astype(np.float32))
        xs = (x1, x2)
        variables = model.init(jax.random.PRNGKey(0), xs, jax.random.PRNGKey(1))
        recons, mu, lv = model.apply(variables, xs, jax.random.PRNGKey(2))
        assert recons[0].shape == (32, 12) and recons[1].shape == (32, 6)
        assert mu.shape == (32, 4 + 4 + 4)  # shared + 2 privates

        state = create_vae_state(model, variables, lr=1e-3)
        step = jax.jit(make_vae_train_step(kl_weight=0.01))
        losses = []
        for i in range(40):
            state, outs = step(state, xs, jax.random.PRNGKey(i))
            losses.append(float(outs.loss))
        assert losses[-1] < losses[0]
