"""Factorized multimodal VAE: shared + modality-private latents
(BASELINE.json config 3).

Each modality m gets a private posterior q(z_m | x_m) and contributes a
Gaussian expert to the shared posterior, combined by product-of-experts
(PoE) with a unit-Gaussian prior expert:

    precision T = 1 + Σ_m 1/σ_m²,  μ_shared = (Σ_m μ_m/σ_m²) / T

Each decoder reconstructs its modality from (z_shared ‖ z_m_private).
This generalizes the MAVAE factorization (per-agent latents decoded
jointly, jax_ver/model.py:100-199) to explicit shared/private structure.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mfvae_tpu.models.layers import MLP
from mfvae_tpu.models.vae import reparameterize


def product_of_experts(
    mus: Sequence[jnp.ndarray], logvars: Sequence[jnp.ndarray]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """PoE over Gaussian experts + implicit N(0, I) prior expert.
    All inputs [B, D]; returns (mu, logvar) of the product."""
    precisions = [jnp.ones_like(mus[0])] + [jnp.exp(-lv) for lv in logvars]
    weighted = [jnp.zeros_like(mus[0])] + [
        m * jnp.exp(-lv) for m, lv in zip(mus, logvars)
    ]
    total_prec = sum(precisions)
    mu = sum(weighted) / total_prec
    logvar = -jnp.log(total_prec)
    return mu, logvar


class FactorizedMultimodalVAE(nn.Module):
    """modality_dims: flat input width per modality."""

    modality_dims: Tuple[int, ...]
    shared_latent: int = 32
    private_latent: int = 32
    encoder_hidden: Tuple[int, ...] = (256, 256)
    decoder_hidden: Tuple[int, ...] = (256, 256)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        n = len(self.modality_dims)
        # per-modality encoders emit (private mu/logvar, shared-expert mu/logvar)
        self.encoders = [
            MLP(
                hidden=self.encoder_hidden,
                out_dim=2 * self.private_latent + 2 * self.shared_latent,
                dtype=self.dtype,
            )
            for _ in range(n)
        ]
        self.decoders = [
            MLP(hidden=self.decoder_hidden, out_dim=d, dtype=self.dtype)
            for d in self.modality_dims
        ]

    def encode(self, xs: Sequence[jnp.ndarray]):
        priv_mu, priv_lv, shared_mus, shared_lvs = [], [], [], []
        p, s = self.private_latent, self.shared_latent
        for enc, x in zip(self.encoders, xs):
            h = enc(x.astype(self.dtype)).astype(jnp.float32)
            priv_mu.append(h[..., :p])
            priv_lv.append(h[..., p : 2 * p])
            shared_mus.append(h[..., 2 * p : 2 * p + s])
            shared_lvs.append(h[..., 2 * p + s :])
        sh_mu, sh_lv = product_of_experts(shared_mus, shared_lvs)
        return priv_mu, priv_lv, sh_mu, sh_lv

    def decode(self, z_shared, z_privates):
        recons = []
        for dec, zp in zip(self.decoders, z_privates):
            zin = jnp.concatenate([z_shared, zp], axis=-1)
            recons.append(dec(zin.astype(self.dtype)).astype(jnp.float32))
        return recons

    def __call__(self, xs: Sequence[jnp.ndarray], rng_key):
        priv_mu, priv_lv, sh_mu, sh_lv = self.encode(xs)
        keys = jax.random.split(rng_key, len(xs) + 1)
        z_sh = reparameterize(sh_mu, sh_lv, keys[0])
        z_priv = [
            reparameterize(m, lv, k)
            for m, lv, k in zip(priv_mu, priv_lv, keys[1:])
        ]
        recons = self.decode(z_sh, z_priv)
        # concatenated mu/logvar across shared + privates for a single KL
        mu_all = jnp.concatenate([sh_mu] + priv_mu, axis=-1)
        lv_all = jnp.concatenate([sh_lv] + priv_lv, axis=-1)
        return recons, mu_all, lv_all
