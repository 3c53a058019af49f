"""Coverage: spaces, mesh helpers, LR schedules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfvae_tpu.config import TrainConfig
from mfvae_tpu.envs.spaces import Box, Discrete, get_space_size
from mfvae_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, data_sharded, make_mesh, replicated
from mfvae_tpu.training.trainer import make_lr


class TestSpaces:
    def test_discrete(self):
        d = Discrete(5)
        s = d.sample(jax.random.PRNGKey(0), (100,))
        assert s.shape == (100,) and int(s.min()) >= 0 and int(s.max()) < 5
        assert bool(d.contains(jnp.int32(4))) and not bool(d.contains(jnp.int32(5)))
        assert get_space_size(d) == 5

    def test_box(self):
        b = Box(-1.0, 1.0, (3,))
        s = b.sample(jax.random.PRNGKey(1))
        assert s.shape == (3,) and bool(b.contains(s))
        assert get_space_size(b) == 3

    def test_unknown_space_raises(self):
        with pytest.raises(NotImplementedError):
            get_space_size(object())


class TestMesh:
    def test_shapes_and_axes(self):
        mesh = make_mesh(n_data=4, n_model=2)
        assert dict(mesh.shape) == {DATA_AXIS: 4, MODEL_AXIS: 2}
        mesh1 = make_mesh()  # all devices on data
        assert mesh1.shape[DATA_AXIS] == jax.device_count()

    def test_sharding_helpers(self):
        mesh = make_mesh(n_data=8, n_model=1)
        x = jnp.arange(16.0).reshape(16, 1)
        xs = jax.device_put(x, data_sharded(mesh))
        assert not xs.sharding.is_fully_replicated
        xr = jax.device_put(x, replicated(mesh))
        assert xr.sharding.is_fully_replicated

    def test_too_many_devices_raises(self):
        with pytest.raises(AssertionError):
            make_mesh(n_data=16, n_model=2)


class TestLrSchedules:
    def test_constant(self):
        assert make_lr(TrainConfig(lr=0.01)) == 0.01

    def test_cosine_decays(self):
        sched = make_lr(TrainConfig(lr=0.01, lr_schedule="cosine", lr_t_max=100))
        assert float(sched(0)) == pytest.approx(0.01)
        assert float(sched(100)) < 1e-6

    def test_warmup_cosine(self):
        sched = make_lr(
            TrainConfig(
                lr=0.01, lr_schedule="warmup_cosine",
                lr_warmup_steps=10, lr_t_max=100, lr_min_ratio=0.1,
            )
        )
        assert float(sched(0)) < float(sched(10))
        assert float(sched(10)) == pytest.approx(0.01, rel=1e-3)
        assert float(sched(100)) == pytest.approx(0.001, rel=1e-2)

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            make_lr(TrainConfig(lr_schedule="nope"))

    def test_periodic_cosine_matches_torch_semantics(self):
        """cosine_periodic must track torch.optim CosineAnnealingLR stepped
        per batch (torch_ver/main.py:53,98: T_max=50, eta_min=1e-4, lr=5e-3,
        512 steps) — including the oscillation after T_max, which the
        one-shot 'cosine' schedule clamps away."""
        torch = pytest.importorskip("torch")
        lr, t_max, eta_min, steps = 5e-3, 50, 1e-4, 512
        sched = make_lr(
            TrainConfig(
                lr=lr, lr_schedule="cosine_periodic",
                lr_t_max=t_max, lr_min_ratio=eta_min / lr,
            )
        )
        opt = torch.optim.Adam([torch.nn.Parameter(torch.zeros(1))], lr=lr)
        tsched = torch.optim.lr_scheduler.CosineAnnealingLR(
            opt, T_max=t_max, eta_min=eta_min
        )
        for step in range(steps):
            got = float(sched(step))
            want = tsched.get_last_lr()[0]
            assert got == pytest.approx(want, rel=1e-4, abs=1e-9), step
            opt.step()
            tsched.step()
        # periodicity: back at peak at 2*T_max, at floor at T_max/3*T_max
        assert float(sched(2 * t_max)) == pytest.approx(lr, rel=1e-6)
        assert float(sched(t_max)) == pytest.approx(eta_min, rel=1e-6)
        assert float(sched(3 * t_max)) == pytest.approx(eta_min, rel=1e-6)
