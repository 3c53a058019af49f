"""Building-block layers.

Where the reference instantiates one small ``Encoder`` per agent and loops
over 40 agents in Python (jax_ver/model.py:110-123,149-181), here per-agent
parameters are *stacked along a leading agent axis* and applied with one
batched contraction (``einsum('bai,aio->bao')``) — a single
``dot_general`` with a batch dimension that XLA tiles straight onto the MXU,
and whose agent axis is shardable over the mesh 'model' axis.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class MLP(nn.Module):
    """Plain ReLU MLP: hidden widths then a linear head.

    With hidden=(64,64,256) this is the reference Encoder
    (jax_ver/model.py:12-23); with (1024,256,64,256,1024) the Decoder
    (model.py:64-76); with (64,) the ActionEncoder (model.py:36-48)."""

    hidden: Tuple[int, ...]
    out_dim: int
    dtype: Dtype = jnp.float32
    remat: bool = False
    # LayerNorm before every Dense.  Measured necessity (PARITY.md round
    # 4): at the canonical 40-agent input width the raw observation
    # concat is so ill-conditioned that Adam cannot recover the (linearly
    # recoverable, R²=0.976) state-delta signal — huber stays pinned at
    # the zero-delta floor for any lr/width; with LayerNorm the same
    # budget reaches delta corr ~0.9.  Off = reference structure.
    layernorm: bool = False

    @nn.compact
    def __call__(self, x):
        dense = nn.remat(nn.Dense) if self.remat else nn.Dense
        for i, h in enumerate(self.hidden):
            if self.layernorm:
                x = nn.LayerNorm(dtype=self.dtype, name=f"ln{i}")(x)
            x = dense(h, dtype=self.dtype, name=f"fc{i}")(x)
            x = nn.relu(x)
        if self.layernorm:
            x = nn.LayerNorm(dtype=self.dtype, name="ln_out")(x)
        x = dense(self.out_dim, dtype=self.dtype, name="out")(x)
        return x


class Embedding(nn.Module):
    """Normal-initialized embedding table (jax_ver/model.py:82-97)."""

    num_embeddings: int
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, indices):
        table = self.param(
            "embedding",
            nn.initializers.normal(stddev=1.0),
            (self.num_embeddings, self.features),
        )
        return jnp.take(table, indices, axis=0).astype(self.dtype)


def _stacked_kernel_init(
    base: Callable = nn.initializers.lecun_normal()
) -> Callable:
    """Init for [A, in, out] stacked kernels: per-slice fan-in matches a
    per-agent Dense so the stacked model initializes identically (in
    distribution) to 40 independent Dense layers."""

    def init(key, shape, dtype=jnp.float32):
        a = shape[0]
        keys = jax.random.split(key, a)
        return jnp.stack([base(k, shape[1:], dtype) for k in keys], axis=0)

    return init


class StackedDense(nn.Module):
    """A Dense layer with an extra leading 'stack' (agent) parameter axis.

    Input  [B, A, in] -> output [B, A, out] via one batched matmul.
    Equivalent to A independent nn.Dense layers, but MXU-shaped."""

    stack: int
    features: int
    dtype: Dtype = jnp.float32
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        kernel = self.param(
            "kernel", _stacked_kernel_init(), (self.stack, in_dim, self.features)
        )
        y = jnp.einsum(
            "bai,aio->bao",
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            preferred_element_type=self.dtype,
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.stack, self.features)
            )
            y = y + bias.astype(self.dtype)[None, :, :]
        return y


class StackedMLP(nn.Module):
    """ReLU MLP over [B, A, in] with independent per-A parameters,
    applied as batched matmuls.  The TPU-native replacement for the
    reference's per-agent Encoder/ActionEncoder dicts
    (jax_ver/model.py:110-123)."""

    stack: int
    hidden: Tuple[int, ...]
    out_dim: int
    dtype: Dtype = jnp.float32
    remat: bool = False
    layernorm: bool = False  # see MLP.layernorm

    @nn.compact
    def __call__(self, x):
        dense = nn.remat(StackedDense) if self.remat else StackedDense
        for i, h in enumerate(self.hidden):
            if self.layernorm:
                x = nn.LayerNorm(dtype=self.dtype, name=f"ln{i}")(x)
            x = dense(self.stack, h, dtype=self.dtype, name=f"fc{i}")(x)
            x = nn.relu(x)
        if self.layernorm:
            x = nn.LayerNorm(dtype=self.dtype, name="ln_out")(x)
        x = dense(self.stack, self.out_dim, dtype=self.dtype, name="out")(x)
        return x


class StackedEmbedding(nn.Module):
    """Per-stack embedding tables [A, num_embeddings, features]; lookup of
    index i for stack a returns table[a, i].  Replaces the reference's
    per-agent discrete-action Embedding dict (jax_ver/model.py:118-122).

    Lookup is a one-hot matmul (num_embeddings is tiny — 5 for MPE discrete
    actions) which keeps everything on the MXU and gather-free."""

    stack: int
    num_embeddings: int
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, indices):
        # indices: [B, A] integer
        tables = self.param(
            "embedding",
            nn.initializers.normal(stddev=1.0),
            (self.stack, self.num_embeddings, self.features),
        )
        onehot = jax.nn.one_hot(indices, self.num_embeddings, dtype=self.dtype)
        return jnp.einsum(
            "ban,anf->baf",
            onehot,
            tables.astype(self.dtype),
            preferred_element_type=self.dtype,
        )
