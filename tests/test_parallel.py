"""Multi-device tests on the virtual 8-CPU mesh: shard_map DP, TP sharding
rules, and the driver dry-run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mfvae_tpu.config import ExperimentConfig, LossConfig, TrainConfig
from mfvae_tpu.data.transitions import VaeBatch
from mfvae_tpu.models.mavae import GroupedBatch
from mfvae_tpu.parallel.dp import make_dp_train_step
from mfvae_tpu.parallel.mesh import DATA_AXIS, make_mesh
from mfvae_tpu.parallel.sharding import check_divisibility, mavae_param_shardings


def _setup(batch=16, n_adv=4, n_good=4):
    from __graft_entry__ import _flagship
    from mfvae_tpu.training.trainer import create_train_state

    spec, model, inputs = _flagship(
        batch_size=batch, n_adv=n_adv, n_good=n_good, n_obs=2, tiny=True
    )
    rng = np.random.default_rng(0)
    vb = VaeBatch(
        inputs=inputs,
        next_state=jnp.asarray(rng.normal(size=(batch, sum(spec.obs_dims))), jnp.float32),
        rewards=jnp.asarray(rng.normal(size=(batch, spec.n_agents)), jnp.float32),
    )
    variables = model.init(jax.random.PRNGKey(0), inputs, None, jax.random.PRNGKey(1))
    state = create_train_state(model, variables, TrainConfig())
    return spec, model, vb, state


def test_eight_devices_present():
    assert jax.device_count() == 8


class TestShardMapDP:
    def test_dp8_runs_and_learns(self):
        mesh = make_mesh(n_data=8, n_model=1)
        spec, model, vb, state = _setup(batch=16)
        step = jax.jit(make_dp_train_step(LossConfig(), mesh))
        losses = []
        for i in range(10):
            state, outs = step(state, vb, jax.random.PRNGKey(i))
            losses.append(float(outs.loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

    def test_dp1_matches_plain_step(self):
        from mfvae_tpu.training.trainer import make_train_step

        mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
        spec, model, vb, state = _setup(batch=8)
        dp = jax.jit(make_dp_train_step(LossConfig(), mesh))
        plain = jax.jit(make_train_step(LossConfig()))
        s1, o1 = dp(state, vb, jax.random.PRNGKey(0))
        s2, o2 = plain(state, vb, jax.random.PRNGKey(0))
        np.testing.assert_allclose(float(o1.loss), float(o2.loss), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

    def test_dp_popart_stats_global(self):
        mesh = make_mesh(n_data=8, n_model=1)
        spec, model, vb, state = _setup(batch=16)
        step = jax.jit(make_dp_train_step(LossConfig(), mesh, mode="POPART", popart_beta=1.0))
        state, _ = step(state, vb, jax.random.PRNGKey(0))
        # beta=1 -> stats equal the global batch moments
        np.testing.assert_allclose(
            np.asarray(state.popart.mu), np.asarray(jnp.mean(vb.rewards, axis=0)),
            rtol=1e-5, atol=1e-5,
        )


class TestTPSharding:
    def test_sharded_forward_matches_replicated(self):
        mesh = make_mesh(n_data=4, n_model=2)
        spec, model, vb, state = _setup(batch=16)
        shardings = mavae_param_shardings(state.params, mesh)
        assert check_divisibility(state.params, shardings) == {}
        params_sharded = jax.device_put(state.params, shardings)
        batch_sharded = jax.device_put(
            vb.inputs, jax.tree.map(lambda _: NamedSharding(mesh, P(DATA_AXIS)), vb.inputs)
        )
        key = jax.random.PRNGKey(5)
        out_ref = jax.jit(model.apply)(state.params, vb.inputs, None, key)
        out_sh = jax.jit(model.apply)(params_sharded, batch_sharded, None, key)
        for a, b in zip(out_ref, out_sh):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)

    def test_decoder_kernels_actually_sharded(self):
        mesh = make_mesh(n_data=4, n_model=2)
        spec, model, vb, state = _setup()
        sh = mavae_param_shardings(state.params, mesh)
        flat = jax.tree_util.tree_flatten_with_path(sh)[0]
        decoder_kernel_specs = [
            s.spec for path, s in flat
            if ("state_decoder" in jax.tree_util.keystr(path)
                or "decoder_trunk" in jax.tree_util.keystr(path))
            and "kernel" in jax.tree_util.keystr(path)
        ]
        assert any("model" in str(spec) for spec in decoder_kernel_specs)


class TestDryrun:
    def test_dryrun_multichip_8(self, capsys):
        from __graft_entry__ import dryrun_multichip

        dryrun_multichip(8)
        out = capsys.readouterr().out
        assert "dryrun_multichip: OK" in out


class TestEntry:
    def test_entry_compiles(self):
        from __graft_entry__ import entry

        fn, args = entry()
        out = jax.jit(fn)(*args)
        assert len(out) == 4
        assert np.isfinite(np.asarray(out[0])).all()
