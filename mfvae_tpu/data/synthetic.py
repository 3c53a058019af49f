"""On-device synthetic datasets for the VAE families.

The image has no bundled datasets (zero egress), so benchmarks and the
Conv/multimodal VAE acceptance configs (BASELINE.json configs 2-3) train on
procedurally generated data, produced directly in HBM by jitted generators —
no host IO at all.

- ``sprites``: images with 1-3 axis-aligned bright rectangles on a dark
  background; latent factors = positions/sizes, so a VAE has real structure
  to learn.
- ``correlated_modalities``: two flat modalities driven by a common latent
  source plus private noise — ground truth for shared/private factorization.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnums=(1, 2, 3))
def sprites(
    rng_key: jax.Array,
    batch: int,
    size: int = 16,
    channels: int = 3,
) -> jnp.ndarray:
    """[batch, size, size, channels] float32 in [0, 1]."""
    k_pos, k_wh, k_col = jax.random.split(rng_key, 3)
    n_rects = 2
    pos = jax.random.uniform(k_pos, (batch, n_rects, 2), minval=0.0, maxval=1.0)
    wh = jax.random.uniform(k_wh, (batch, n_rects, 2), minval=0.15, maxval=0.45)
    color = jax.random.uniform(k_col, (batch, n_rects, channels), minval=0.4, maxval=1.0)

    ys = jnp.linspace(0.0, 1.0, size)
    xs = jnp.linspace(0.0, 1.0, size)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")  # [H, W]

    def render(pos_b, wh_b, col_b):
        def rect(p, s, c):
            inside = (
                (yy >= p[0]) & (yy <= p[0] + s[0]) & (xx >= p[1]) & (xx <= p[1] + s[1])
            )
            return inside[..., None].astype(jnp.float32) * c[None, None, :]

        layers = jax.vmap(rect)(pos_b, wh_b, col_b)  # [R, H, W, C]
        return jnp.clip(jnp.sum(layers, axis=0), 0.0, 1.0)

    return jax.vmap(render)(pos, wh, color)


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def correlated_modalities(
    rng_key: jax.Array,
    batch: int,
    dim_a: int = 32,
    dim_b: int = 16,
    source_dim: int = 8,
    noise: float = 0.1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two modalities sharing a latent source (for the factorized VAE)."""
    k_src, k_wa, k_wb, k_na, k_nb = jax.random.split(rng_key, 5)
    src = jax.random.normal(k_src, (batch, source_dim))
    wa = jax.random.normal(k_wa, (source_dim, dim_a)) / jnp.sqrt(source_dim)
    wb = jax.random.normal(k_wb, (source_dim, dim_b)) / jnp.sqrt(source_dim)
    xa = src @ wa + noise * jax.random.normal(k_na, (batch, dim_a))
    xb = src @ wb + noise * jax.random.normal(k_nb, (batch, dim_b))
    return xa, xb
