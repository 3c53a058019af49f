"""Reference-surface compatibility layer for the replay buffer.

The reference wraps flashbax in a stateful class with
``init_buffer/add_trans/can_sample/sample`` (jax_ver/jax_buffer.py:80-140).
``TransitionBuffer`` reproduces that exact surface on top of the in-repo
HBM ItemBuffer so reference-style experiment code ports line-for-line,
while new code should use the pure-functional ItemBuffer directly (it
composes with lax.scan; this wrapper's Python-level statefulness cannot).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from mfvae_tpu.data.buffer import ItemBuffer
from mfvae_tpu.data.transitions import create_joint_transition


def generate_dummy_transition(transition: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Zeros-like schema probe (jax_ver/jax_buffer.py:62-78)."""
    return {k: jnp.zeros_like(v) for k, v in transition.items()}


def print_transition_shape(transition: Dict[str, jnp.ndarray]) -> None:
    """Shape/dtype dump (jax_ver/jax_buffer.py:58-60)."""
    for k, v in transition.items():
        print(f"key {k} with shape: {v.shape} and type {v.dtype}")


class TransitionBuffer:
    """Drop-in for the reference's JaxFbxBuffer surface
    (max_length/min_length/batch_size ctor, init_buffer/add_trans/
    can_sample/sample methods; jax_ver/jax_buffer.py:80-140)."""

    def __init__(
        self,
        max_length: int = 50_000,
        min_length: int = 64,
        batch_size: int = 64,
        add_batch: bool = False,
    ):
        self._buffer = ItemBuffer(
            max_length=max_length,
            min_length=min_length,
            sample_batch_size=batch_size,
        )
        self._add_batch = add_batch
        self.buffer_state = None
        self._add_jit = jax.jit(
            self._buffer.add_batch if add_batch else self._buffer.add,
            donate_argnums=0,
        )
        self._sample_jit = jax.jit(self._buffer.sample)

    def init_buffer(self, obs, reward, actions, next_obs, done) -> None:
        transition = create_joint_transition(obs, reward, actions, next_obs, done)
        dummy = generate_dummy_transition(transition)
        self.buffer_state = self._buffer.init(dummy)

    def add_trans(self, obs, reward, actions, next_obs, done) -> None:
        if self.buffer_state is None:
            print("buffer not init; please call init_buffer() first")
            return
        transition = create_joint_transition(obs, reward, actions, next_obs, done)
        self.buffer_state = self._add_jit(self.buffer_state, transition)

    def can_sample(self) -> Optional[bool]:
        if self.buffer_state is None:
            print("buffer not init; please call init_buffer() first")
            return None
        return bool(self._buffer.can_sample(self.buffer_state))

    def sample(self, rng_key):
        if self.buffer_state is None:
            print("buffer not init; please call init_buffer() first")
            return None
        if not self.can_sample():
            print("can not sample now")
            return None
        return self._sample_jit(self.buffer_state, rng_key)
