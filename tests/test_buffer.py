"""Replay buffer invariants: ring semantics, wraparound, sampling validity."""

import jax
import jax.numpy as jnp
import numpy as np

from mfvae_tpu.data.buffer import BufferState, ItemBuffer, TrajectoryBuffer


def item(i, d=4):
    return {"x": jnp.full((d,), float(i)), "r": jnp.float32(i)}


class TestItemBuffer:
    def test_init_shapes(self):
        buf = ItemBuffer(max_length=10, min_length=2, sample_batch_size=3)
        st = buf.init(item(0))
        assert st.data["x"].shape == (10, 4)
        assert st.data["r"].shape == (10,)
        assert int(st.size) == 0

    def test_add_and_min_size_gate(self):
        buf = ItemBuffer(max_length=10, min_length=3, sample_batch_size=2)
        st = buf.init(item(0))
        st = buf.add(st, item(1))
        assert not bool(buf.can_sample(st))
        for i in range(2, 5):
            st = buf.add(st, item(i))
        assert bool(buf.can_sample(st))
        assert int(st.size) == 4

    def test_wraparound_overwrites_oldest(self):
        buf = ItemBuffer(max_length=4, min_length=1, sample_batch_size=8)
        st = buf.init(item(0))
        for i in range(6):  # two past capacity
            st = buf.add(st, item(i))
        assert int(st.size) == 4
        vals = set(np.asarray(st.data["r"]).tolist())
        assert vals == {2.0, 3.0, 4.0, 5.0}

    def test_sample_only_valid_entries(self):
        buf = ItemBuffer(max_length=100, min_length=1, sample_batch_size=64)
        st = buf.init(item(0))
        for i in range(5):
            st = buf.add(st, item(i + 1))  # values 1..5; rest of ring is 0
        batch = buf.sample(st, jax.random.PRNGKey(0))
        r = np.asarray(batch.experience["r"])
        assert r.shape == (64,)
        assert np.all((r >= 1) & (r <= 5))

    def test_add_batch_wraparound(self):
        buf = ItemBuffer(max_length=5, min_length=1, sample_batch_size=4)
        st = buf.init(item(0))
        items = {"x": jnp.arange(7 * 4, dtype=jnp.float32).reshape(7, 4),
                 "r": jnp.arange(7, dtype=jnp.float32)}
        st = buf.add_batch(st, items)
        assert int(st.size) == 5
        # last 5 written values (2..6) survive
        assert set(np.asarray(st.data["r"]).tolist()) == {2.0, 3.0, 4.0, 5.0, 6.0}
        assert int(st.cursor) == 7 % 5

    def test_add_jits_and_donates(self):
        buf = ItemBuffer(max_length=8, min_length=1, sample_batch_size=2)
        st = buf.init(item(0))
        add = jax.jit(buf.add, donate_argnums=0)
        for i in range(3):
            st = add(st, item(i))
        assert int(st.size) == 3

    def test_scan_collection_loop(self):
        """Buffer add composes with lax.scan — the on-device collection
        pattern replacing the reference's host loop (jax_ver/main.py:154-161)."""
        buf = ItemBuffer(max_length=32, min_length=1, sample_batch_size=4)
        st = buf.init(item(0))

        def body(state, i):
            it = {"x": jnp.ones((4,)) * i, "r": i}
            return buf.add(state, it), ()

        st, _ = jax.lax.scan(body, st, jnp.arange(20.0))
        assert int(st.size) == 20


class TestTrajectoryBuffer:
    def make(self, **kw):
        d = dict(add_batch_size=3, time_capacity=16, min_length_time=4,
                 sample_batch_size=5, sample_sequence_length=4)
        d.update(kw)
        return TrajectoryBuffer(**d)

    def step(self, t):
        return {"o": jnp.full((2,), float(t)), "t": jnp.float32(t)}

    def traj(self, t0, T, rows=3):
        # rows x T, value encodes (row*1000 + time)
        vals = jnp.arange(t0, t0 + T, dtype=jnp.float32)
        o = jnp.broadcast_to(vals[None, :, None], (rows, T, 2))
        row_off = jnp.arange(rows, dtype=jnp.float32)[:, None] * 1000
        return {"o": o + row_off[..., None], "t": jnp.broadcast_to(vals[None], (rows, T)) + row_off}

    def test_init_and_add(self):
        buf = self.make()
        st = buf.init(self.step(0))
        assert st.data["o"].shape == (3, 16, 2)
        st = buf.add(st, self.traj(0, 8))
        assert int(st.size) == 8
        assert not bool(buf.can_sample(st._replace(size=jnp.int32(3))))
        assert bool(buf.can_sample(st))

    def test_sample_windows_contiguous(self):
        buf = self.make()
        st = buf.init(self.step(0))
        st = buf.add(st, self.traj(0, 10))
        batch = buf.sample(st, jax.random.PRNGKey(1))
        t = np.asarray(batch.experience["t"])  # [5, 4]
        assert t.shape == (5, 4)
        # each window is consecutive timestamps within one row
        diffs = np.diff(t, axis=1)
        np.testing.assert_array_equal(diffs, np.ones_like(diffs))

    def test_full_ring_never_crosses_seam(self):
        # Once the ring is full, the write cursor splices the newest data
        # directly onto the oldest; a window crossing that seam is
        # temporally discontinuous (e.g. times [10, 11, 4, 5]).  Sample
        # many batches and require every window strictly consecutive —
        # under seam-crossing sampling this fails with overwhelming
        # probability (~(L-1)/capacity of windows hit the seam).
        buf = self.make(time_capacity=8, sample_sequence_length=4,
                        sample_batch_size=16)
        st = buf.init(self.step(0))
        st = buf.add(st, self.traj(0, 6))
        st = buf.add(st, self.traj(6, 6))  # full + wrapped: times 4..11 live
        sample = jax.jit(buf.sample)
        for seed in range(64):
            t = np.asarray(sample(st, jax.random.PRNGKey(seed)).experience["t"]) % 1000
            diffs = np.diff(t, axis=1)
            np.testing.assert_array_equal(diffs, np.ones_like(diffs))
            assert t.min() >= 4 and t.max() <= 11

    def test_sample_after_wrap_stays_valid(self):
        buf = self.make(time_capacity=8, sample_sequence_length=3)
        st = buf.init(self.step(0))
        st = buf.add(st, self.traj(0, 6))
        st = buf.add(st, self.traj(6, 6))  # wraps: times 4..11 live
        batch = buf.sample(st, jax.random.PRNGKey(2))
        t = np.asarray(batch.experience["t"]) % 1000
        # all sampled times must be within the live window 4..11
        assert t.min() >= 4 and t.max() <= 11
        diffs = np.diff(t, axis=1)
        np.testing.assert_array_equal(diffs, np.ones_like(diffs))
