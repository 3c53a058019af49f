"""HBM-resident replay buffers with jitted, donation-friendly add/sample.

The reference keeps its buffer either on the host in C++ (cpprb,
torch_ver/src/replay_buffer.py:83) or wraps flashbax with host-driven
Python-loop adds (jax_ver/jax_buffer.py:109-124); its one attempt at a pure
jitted ring buffer mutates `self` under jit and is a no-op
(torch_ver/src/replay_buffer.py:9-32).  Here the buffer is what that code
wanted to be: a pure pytree state + three jittable functions.  Everything
lives in HBM; `add` is a dynamic-slice write at a running cursor, `sample` is
a uniform gather along the leading axis (`jnp.take`), and callers donate the
state at their jit boundary so add/sample never double-allocate.

Two flavors mirror the reference's dependency surface (SURVEY §2.4):

- ``ItemBuffer``       ≙ flashbax ``make_item_buffer`` (jax_ver/jax_buffer.py:86-91)
- ``TrajectoryBuffer`` ≙ flashbax ``make_trajectory_buffer`` (vdn.py:161-169)

Both are dataclass factories returning pure functions over ``BufferState`` so
they compose with `lax.scan` (adds inside a scanned collection loop — the
pattern jax_ver/main.py:154-161 dispatches eagerly from Python).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

Pytree = Any


class BufferState(NamedTuple):
    """data: pytree with leading [capacity, ...] axes (time axis for
    trajectory buffers); cursor: next write position; size: valid entries."""

    data: Pytree
    cursor: jnp.ndarray  # int32
    size: jnp.ndarray  # int32


class SampleBatch(NamedTuple):
    """Mirrors flashbax's sample return (`batch.experience` at
    jax_ver/jax_buffer.py:186-188)."""

    experience: Pytree


def _zeros_like_capacity(item: Pytree, capacity: int) -> Pytree:
    return jax.tree.map(
        lambda x: jnp.zeros((capacity,) + jnp.shape(x), dtype=jnp.asarray(x).dtype),
        item,
    )


@dataclass(frozen=True)
class ItemBuffer:
    """Uniform-sampling FIFO ring over single items or item batches.

    API parity with the reference's buffer surface
    (init/add/can_sample/sample, jax_ver/jax_buffer.py:94-140), as pure
    functions.  ``add`` accepts an item shaped like the init example;
    ``add_batch`` accepts a leading batch axis and writes contiguously with
    wraparound.
    """

    max_length: int
    min_length: int = 64
    sample_batch_size: int = 64

    def init(self, example_item: Pytree) -> BufferState:
        return BufferState(
            data=_zeros_like_capacity(example_item, self.max_length),
            cursor=jnp.int32(0),
            size=jnp.int32(0),
        )

    def add(self, state: BufferState, item: Pytree) -> BufferState:
        data = jax.tree.map(
            lambda buf, x: jax.lax.dynamic_update_index_in_dim(
                buf, x.astype(buf.dtype), state.cursor, axis=0
            ),
            state.data,
            item,
        )
        cursor = (state.cursor + 1) % self.max_length
        size = jnp.minimum(state.size + 1, self.max_length)
        return BufferState(data=data, cursor=cursor, size=size)

    def add_batch(self, state: BufferState, items: Pytree) -> BufferState:
        """Write a [B, ...] batch at the cursor (wraparound via modular
        scatter indices — one XLA scatter per leaf, no host loop)."""
        b = jax.tree.leaves(items)[0].shape[0]
        idx = (state.cursor + jnp.arange(b, dtype=jnp.int32)) % self.max_length
        data = jax.tree.map(
            lambda buf, x: buf.at[idx].set(x.astype(buf.dtype)),
            state.data,
            items,
        )
        cursor = (state.cursor + b) % self.max_length
        size = jnp.minimum(state.size + b, self.max_length)
        return BufferState(data=data, cursor=cursor, size=size)

    def can_sample(self, state: BufferState) -> jnp.ndarray:
        return state.size >= self.min_length

    def sample(self, state: BufferState, rng_key: jax.Array) -> SampleBatch:
        """Uniform with replacement over the valid prefix (matches flashbax
        item-buffer semantics the reference relies on)."""
        idx = jax.random.randint(
            rng_key, (self.sample_batch_size,), 0, jnp.maximum(state.size, 1)
        )
        batch = jax.tree.map(lambda buf: jnp.take(buf, idx, axis=0), state.data)
        return SampleBatch(experience=batch)

    def sample_window(
        self,
        state: BufferState,
        rng_key: jax.Array,
        window: int,
        block: int = 0,
    ) -> SampleBatch:
        """Sample [sample_batch_size, window, ...] runs of CONSECUTIVE items.

        Valid because sequential `add`s write time-adjacent entries at
        adjacent ring slots; two seams break that adjacency and are excluded
        from the start distribution:

        - the write seam once the ring is full (newest abuts oldest) —
          handled exactly like TrajectoryBuffer.sample: starts live in
          [cursor, cursor + capacity - window] mod capacity;
        - caller-injected discontinuities every ``block`` items (e.g. the
          epoch program interleaves train- and test-phase collection, so
          entries i*sample_num-1 and i*sample_num are NOT consecutive env
          steps): with block > 0 (must divide max_length), windows are
          additionally restricted to lie inside one block.

        Episode boundaries WITHIN a window are the caller's job (mask on the
        stored ``done`` flags — see training/unroll.py)."""
        assert window <= self.max_length
        if block:
            assert window <= block <= self.max_length
            assert self.max_length % block == 0, (self.max_length, block)
        k_a, k_b = jax.random.split(rng_key)
        full = state.size >= self.max_length
        if block:
            # start = block_start + offset, offset in [0, block - window]
            n_blocks_valid = jnp.maximum(state.size // block, 1)
            blk = jax.random.randint(
                k_a, (self.sample_batch_size,), 0, n_blocks_valid
            )
            off = jax.random.randint(
                k_b, (self.sample_batch_size,), 0, block - window + 1
            )
            starts = blk * block + off
            # when full the ring seam sits at a block boundary (block
            # divides capacity and adds arrive in block-sized phases), so
            # in-block windows never cross it and no cursor shift is needed.
            # Guard against misuse outside that invariant (size below or
            # unaligned to block): clamp starts into the valid prefix so a
            # caller can never read the zero-initialized tail — windows
            # degrade to overlapping valid ones instead of fabricated data.
            starts = jnp.minimum(starts, jnp.maximum(state.size - window, 0))
        else:
            n_starts = jnp.where(
                full,
                self.max_length - window + 1,
                jnp.maximum(state.size - window + 1, 1),
            )
            base = jnp.where(full, state.cursor, 0)
            starts = (
                base
                + jax.random.randint(k_a, (self.sample_batch_size,), 0, n_starts)
            ) % self.max_length
        offs = jnp.arange(window, dtype=jnp.int32)
        idx = (starts[:, None] + offs[None, :]) % self.max_length
        batch = jax.tree.map(lambda buf: buf[idx], state.data)
        return SampleBatch(experience=batch)


@dataclass(frozen=True)
class TrajectoryBuffer:
    """Time-major trajectory ring for recurrent Q-learning.

    Capability parity with flashbax ``make_trajectory_buffer`` as consumed by
    the reference's VDN baseline (vdn.py:161-169,296-300,367): ``add`` takes
    a [B_env, T, ...] chunk per env row, ``sample`` returns
    [sample_batch_size, sample_sequence_length, ...] windows drawn uniformly
    over (env row, start time).

    Layout: leaves are [add_batch_size, time_capacity, ...]; the time axis is
    the ring.  Sampled start positions are restricted to temporally
    contiguous windows — once the ring is full, windows never cross the
    write-cursor seam (where the newest data abuts the oldest).
    """

    add_batch_size: int
    time_capacity: int
    min_length_time: int = 64
    sample_batch_size: int = 64
    sample_sequence_length: int = 8

    def init(self, example_step: Pytree) -> BufferState:
        def make(x):
            x = jnp.asarray(x)
            return jnp.zeros(
                (self.add_batch_size, self.time_capacity) + x.shape, dtype=x.dtype
            )

        return BufferState(
            data=jax.tree.map(make, example_step),
            cursor=jnp.int32(0),
            size=jnp.int32(0),
        )

    def add(self, state: BufferState, traj: Pytree) -> BufferState:
        """traj leaves: [add_batch_size, T, ...]."""
        t = jax.tree.leaves(traj)[0].shape[1]
        idx = (state.cursor + jnp.arange(t, dtype=jnp.int32)) % self.time_capacity

        def write(buf, x):
            return buf.at[:, idx].set(x.astype(buf.dtype))

        data = jax.tree.map(write, state.data, traj)
        cursor = (state.cursor + t) % self.time_capacity
        size = jnp.minimum(state.size + t, self.time_capacity)
        return BufferState(data=data, cursor=cursor, size=size)

    def can_sample(self, state: BufferState) -> jnp.ndarray:
        return state.size >= jnp.maximum(
            self.min_length_time, self.sample_sequence_length
        )

    def sample(self, state: BufferState, rng_key: jax.Array) -> SampleBatch:
        k_row, k_start = jax.random.split(rng_key)
        rows = jax.random.randint(
            k_row, (self.sample_batch_size,), 0, self.add_batch_size
        )
        # Valid window starts: before the ring wraps, starts in [0, size-L].
        # Once full, the oldest element sits at the cursor and temporal
        # continuity breaks at the write seam (newest stitched onto oldest),
        # so starts are restricted to offsets whose whole window stays on one
        # side of the seam: [0, time_capacity - L] from the oldest.
        L = self.sample_sequence_length
        full = state.size >= self.time_capacity
        n_starts = jnp.where(
            full, self.time_capacity - L + 1, jnp.maximum(state.size - L + 1, 1)
        )
        # When full, align the oldest valid element at the cursor.
        base = jnp.where(full, state.cursor, 0)
        starts = (
            base + jax.random.randint(k_start, (self.sample_batch_size,), 0, n_starts)
        ) % self.time_capacity
        offs = jnp.arange(L, dtype=jnp.int32)
        time_idx = (starts[:, None] + offs[None, :]) % self.time_capacity

        def gather(buf):
            # buf: [R, Tcap, ...] -> [S, L, ...]
            return buf[rows[:, None], time_idx]

        return SampleBatch(experience=jax.tree.map(gather, state.data))
