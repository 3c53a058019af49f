"""Native C++ host ring buffer + PettingZoo adapter."""

import numpy as np
import pytest

from mfvae_tpu.data.host_buffer import HostRingBuffer


SCHEMA = {
    "obs": ((3,), np.float32),
    "act": ((), np.int64),
    "rew": ((1,), np.float32),
}


@pytest.fixture(params=["native", "numpy"])
def backend(request):
    return request.param


def make_buf(backend, capacity=8, seed=0):
    buf = HostRingBuffer(SCHEMA, capacity=capacity, seed=seed,
                         force_numpy=(backend == "numpy"))
    if backend == "native" and buf.backend != "native":
        pytest.skip("native toolchain unavailable")
    return buf


class TestHostRingBuffer:
    def test_native_backend_builds(self):
        buf = HostRingBuffer(SCHEMA, capacity=4)
        assert buf.backend == "native"  # g++ is in this image

    def test_add_sample_roundtrip(self, backend):
        buf = make_buf(backend)
        for i in range(5):
            buf.add({"obs": np.full(3, i, np.float32),
                     "act": np.int64(i),
                     "rew": np.array([i], np.float32)})
        assert len(buf) == 5
        out = buf.sample(32)
        assert out["obs"].shape == (32, 3)
        assert set(out["act"].tolist()) <= {0, 1, 2, 3, 4}
        # fields stay aligned: obs[j] == act value broadcast
        np.testing.assert_allclose(out["obs"][:, 0], out["act"].astype(np.float32))
        np.testing.assert_allclose(out["rew"][:, 0], out["act"].astype(np.float32))

    def test_wraparound(self, backend):
        buf = make_buf(backend, capacity=4)
        for i in range(10):
            buf.add({"obs": np.full(3, i, np.float32),
                     "act": np.int64(i),
                     "rew": np.array([i], np.float32)})
        assert len(buf) == 4
        got = buf.gather(np.arange(4))
        vals = set(got["act"].tolist())
        assert vals == {6, 7, 8, 9}

    def test_batched_add(self, backend):
        buf = make_buf(backend, capacity=16)
        buf.add({"obs": np.arange(15, dtype=np.float32).reshape(5, 3),
                 "act": np.arange(5, dtype=np.int64),
                 "rew": np.arange(5, dtype=np.float32).reshape(5, 1)})
        assert len(buf) == 5
        got = buf.gather(np.arange(5))
        np.testing.assert_array_equal(got["act"], np.arange(5))

    def test_sample_empty_raises(self, backend):
        buf = make_buf(backend)
        with pytest.raises(RuntimeError):
            buf.sample(4)

    def test_native_and_numpy_agree_on_gather(self):
        n = make_buf("native", capacity=8)
        p = make_buf("numpy", capacity=8)
        for i in range(6):
            item = {"obs": np.full(3, i, np.float32), "act": np.int64(i),
                    "rew": np.array([i], np.float32)}
            n.add(item)
            p.add(item)
        idx = np.array([0, 3, 5])
        a, b = n.gather(idx), p.gather(idx)
        for k in SCHEMA:
            np.testing.assert_array_equal(a[k], b[k])


class TestHostAdapter:
    def test_pettingzoo_roundtrip(self):
        pytest.importorskip("pettingzoo")
        from mfvae_tpu.envs.host_adapter import (
            AsyncCollector,
            MultiAgentHostBuffer,
            create_env,
        )

        env, obs_dims, act_dims, obs, infos = create_env(
            num_good=2, num_adversaries=2, num_obstacles=1, max_cycles=20
        )
        assert all(d == 5 for d in act_dims.values())
        buf = MultiAgentHostBuffer(env, max_size=64, batch_size=8)
        col = AsyncCollector(env, buf, seed=0)
        col.collect(12)
        assert len(buf) == 12
        batch = buf.sample()
        a0 = env.agents[0] if env.agents else list(obs_dims)[0]
        assert batch[f"{a0}_observations"].shape == (8, obs_dims[a0])
        assert batch["mask"].shape == (8, 1)
