"""Synthetic on-device datasets."""

import jax
import jax.numpy as jnp
import numpy as np

from mfvae_tpu.data.synthetic import correlated_modalities, sprites


class TestSprites:
    def test_shapes_and_range(self):
        x = sprites(jax.random.PRNGKey(0), 8, 16, 3)
        assert x.shape == (8, 16, 16, 3)
        assert float(x.min()) >= 0.0 and float(x.max()) <= 1.0
        # something actually drawn
        assert float(x.sum()) > 0.0

    def test_deterministic_per_key(self):
        a = sprites(jax.random.PRNGKey(1), 4, 8, 1)
        b = sprites(jax.random.PRNGKey(1), 4, 8, 1)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        c = sprites(jax.random.PRNGKey(2), 4, 8, 1)
        assert not np.allclose(np.asarray(a), np.asarray(c))


class TestCorrelatedModalities:
    def test_shared_source_correlation(self):
        xa, xb = correlated_modalities(jax.random.PRNGKey(0), 512, 16, 8, 4, noise=0.01)
        assert xa.shape == (512, 16) and xb.shape == (512, 8)
        # cross-modal correlation via shared source: top canonical direction
        # of cov(xa, xb) should be strong when noise is low
        a = np.asarray(xa) - np.asarray(xa).mean(0)
        b = np.asarray(xb) - np.asarray(xb).mean(0)
        cross = a.T @ b / len(a)
        s = np.linalg.svd(cross, compute_uv=False)
        assert s[0] > 0.5
