"""Minimal action/observation spaces.

Replaces the gymnax space types the reference introspects
(jax_ver/main.py:23-30 get_space_size) and the gymnasium ones in
torch_ver/src/env.py:6-21, with the same introspection surface."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class Discrete:
    n: int
    dtype: jnp.dtype = jnp.int32

    def sample(self, rng_key: jax.Array, shape: Tuple[int, ...] = ()) -> jnp.ndarray:
        return jax.random.randint(rng_key, shape, 0, self.n, dtype=self.dtype)

    def contains(self, x) -> jnp.ndarray:
        return (x >= 0) & (x < self.n)


@dataclass(frozen=True)
class Box:
    low: float
    high: float
    shape: Tuple[int, ...]
    dtype: jnp.dtype = jnp.float32

    def sample(self, rng_key: jax.Array) -> jnp.ndarray:
        return jax.random.uniform(
            rng_key, self.shape, self.dtype, self.low, self.high
        )

    def contains(self, x) -> jnp.ndarray:
        return jnp.all((x >= self.low) & (x <= self.high))


def get_space_size(space) -> int:
    """Flat size of a space (reference surface: jax_ver/main.py:23-30,
    torch_ver/src/env.py:6-21)."""
    if isinstance(space, Discrete):
        return space.n
    if isinstance(space, Box):
        return int(space.shape[0])
    raise NotImplementedError(f"unknown space {type(space)!r}")
