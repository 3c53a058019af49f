"""Single-modality VAE families (BASELINE.json configs 1-2).

- ``VAE``: MLP encoder/decoder over a flat modality — the acceptance
  config-1 model ("MLP VAE, single modality, batch 64").
- ``ConvVAE``: strided-Conv encoder / ConvTranspose decoder over an image
  modality — acceptance config 2, designed for bf16 conv throughput on the
  MXU (NHWC layout, channel counts in multiples of 8/128 where sizes allow).

Both expose encode/decode/__call__(x, rng) -> (recon, mu, logvar) and train
with training.vae_trainer.make_vae_train_step.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mfvae_tpu.models.layers import MLP


def reparameterize(mu, logvar, rng_key):
    """z = mu + eps*exp(0.5 logvar) in f32 (jax_ver/model.py:53-57)."""
    mu32 = mu.astype(jnp.float32)
    std = jnp.exp(0.5 * logvar.astype(jnp.float32))
    return mu32 + jax.random.normal(rng_key, std.shape) * std


class VAE(nn.Module):
    """MLP VAE: hidden widths default to the reference encoder/decoder
    families scaled to single-modality use."""

    in_dim: int
    latent_dim: int = 64
    encoder_hidden: Tuple[int, ...] = (256, 256)
    decoder_hidden: Tuple[int, ...] = (256, 256)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = MLP(
            hidden=self.encoder_hidden, out_dim=2 * self.latent_dim, dtype=self.dtype
        )
        self.decoder = MLP(
            hidden=self.decoder_hidden, out_dim=self.in_dim, dtype=self.dtype
        )

    def encode(self, x):
        h = self.encoder(x.astype(self.dtype))
        return h[..., : self.latent_dim], h[..., self.latent_dim :]

    def decode(self, z):
        return self.decoder(z.astype(self.dtype)).astype(jnp.float32)

    def __call__(self, x, rng_key):
        mu, logvar = self.encode(x)
        z = reparameterize(mu, logvar, rng_key)
        recon = self.decode(z)
        return recon, mu.astype(jnp.float32), logvar.astype(jnp.float32)


class ConvVAE(nn.Module):
    """Conv encoder / ConvTranspose decoder VAE for [H, W, C] images.

    Downsamples by stride-2 convs (len(channels) times), flattens to the
    latent head, mirrors back up with ConvTranspose.  H and W must be
    divisible by 2**len(channels)."""

    image_shape: Tuple[int, int, int]  # (H, W, C)
    latent_dim: int = 64
    channels: Tuple[int, ...] = (32, 64, 128)
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def _spatial(self) -> Tuple[int, int]:
        h, w, _ = self.image_shape
        f = 2 ** len(self.channels)
        assert h % f == 0 and w % f == 0, (self.image_shape, self.channels)
        return h // f, w // f

    def setup(self):
        self.enc_convs = [
            nn.Conv(c, (3, 3), strides=(2, 2), dtype=self.dtype, name=f"enc{i}")
            for i, c in enumerate(self.channels)
        ]
        self.enc_head = nn.Dense(2 * self.latent_dim, dtype=self.dtype)
        hs, ws = self._spatial
        self.dec_head = nn.Dense(hs * ws * self.channels[-1], dtype=self.dtype)
        rev = tuple(reversed(self.channels[:-1])) + (self.image_shape[-1],)
        self.dec_convs = [
            nn.ConvTranspose(
                c, (3, 3), strides=(2, 2), dtype=self.dtype, name=f"dec{i}"
            )
            for i, c in enumerate(rev)
        ]

    def encode(self, x):
        h = x.astype(self.dtype)
        for conv in self.enc_convs:
            h = nn.relu(conv(h))
        h = h.reshape(h.shape[0], -1)
        out = self.enc_head(h)
        return out[..., : self.latent_dim], out[..., self.latent_dim :]

    def decode(self, z):
        hs, ws = self._spatial
        h = nn.relu(self.dec_head(z.astype(self.dtype)))
        h = h.reshape(-1, hs, ws, self.channels[-1])
        for i, conv in enumerate(self.dec_convs):
            h = conv(h)
            if i < len(self.dec_convs) - 1:
                h = nn.relu(h)
        return h.astype(jnp.float32)

    def __call__(self, x, rng_key):
        mu, logvar = self.encode(x)
        z = reparameterize(mu, logvar, rng_key)
        recon = self.decode(z)
        return recon, mu.astype(jnp.float32), logvar.astype(jnp.float32)
