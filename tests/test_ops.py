"""Pallas kernels vs jnp reference implementations (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfvae_tpu.models.losses import huber as huber_ref, kl_gaussian
from mfvae_tpu.ops.fused_elbo import fused_reparam_kl, huber_mean


class TestFusedReparamKL:
    def setup_method(self):
        rng = np.random.default_rng(0)
        self.mu = jnp.asarray(rng.normal(size=(4, 5, 64)), jnp.float32)
        self.lv = jnp.asarray(rng.normal(size=(4, 5, 64)) * 0.3, jnp.float32)
        self.eps = jnp.asarray(rng.normal(size=(4, 5, 64)), jnp.float32)

    def test_forward_matches_reference(self):
        z, kl = fused_reparam_kl(self.mu, self.lv, self.eps)
        z_ref = self.mu + self.eps * jnp.exp(0.5 * self.lv)
        kl_ref = -0.5 * jnp.sum(
            1 + self.lv - self.mu**2 - jnp.exp(self.lv), axis=-1
        )
        np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(kl), np.asarray(kl_ref), rtol=1e-4, atol=1e-4)
        # summing row-KL over agents and averaging over batch equals the
        # loss module's kl_gaussian on [B, A, F]
        np.testing.assert_allclose(
            float(jnp.mean(jnp.sum(kl, axis=1))),
            float(kl_gaussian(self.mu, self.lv)),
            rtol=1e-4,
        )

    def test_grads_match_reference(self):
        def f_kernel(mu, lv):
            z, kl = fused_reparam_kl(mu, lv, self.eps)
            return jnp.sum(z * 1.7) + jnp.sum(kl * 0.3)

        def f_ref(mu, lv):
            z = mu + self.eps * jnp.exp(0.5 * lv)
            kl = -0.5 * jnp.sum(1 + lv - mu**2 - jnp.exp(lv), axis=-1)
            return jnp.sum(z * 1.7) + jnp.sum(kl * 0.3)

        g1 = jax.grad(f_kernel, argnums=(0, 1))(self.mu, self.lv)
        g2 = jax.grad(f_ref, argnums=(0, 1))(self.mu, self.lv)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

    def test_jits(self):
        out = jax.jit(fused_reparam_kl)(self.mu, self.lv, self.eps)
        assert out[0].shape == (4, 5, 64)
        assert out[1].shape == (4, 5)


class TestHuberMean:
    def test_matches_reference(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(16, 70)) * 3, jnp.float32)
        y = jnp.asarray(rng.normal(size=(16, 70)), jnp.float32)
        np.testing.assert_allclose(
            float(huber_mean(x, y, 1.0)), float(huber_ref(x, y, 1.0)), rtol=1e-5
        )

    def test_grad_matches(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(8, 33)) * 2, jnp.float32)
        y = jnp.asarray(rng.normal(size=(8, 33)), jnp.float32)
        g1 = jax.grad(lambda a: huber_mean(a, y, 1.0))(x)
        g2 = jax.grad(lambda a: huber_ref(a, y, 1.0))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-6)
