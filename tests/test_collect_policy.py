"""Learned-policy collection (baselines/collect_policy.py): a trained VDN
greedy policy driving the VAE experiment's replay collection — the
model-based loop the reference never closes (its model jax_ver/model.py and
policy vdn.py:133-527 coexist but never touch)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfvae_tpu.baselines.collect_policy import (
    QCollectPolicy,
    load_collect_policy,
    load_policy,
    save_policy,
)
from mfvae_tpu.baselines.vdn import VdnNetwork, _pack_obs
from mfvae_tpu.training.experiment import Experiment
from mfvae_tpu.training.trainer import make_action_sampler
from tests.test_training import tiny_cfg


def make_policy_file(tmp_path, hidden_dim=8, param_share=True):
    """Init a VdnNetwork for the tiny population and save it."""
    exp = Experiment(tiny_cfg())
    n = exp.spec.n_agents
    action_dim = 5
    d_pad = max(od for (od, _), _ in exp.spec.groups)
    net = VdnNetwork(
        action_dim=action_dim, n_agents=n, hidden_dim=hidden_dim,
        param_share=param_share,
    )
    params = net.init(
        jax.random.PRNGKey(3),
        jnp.zeros((1, n, hidden_dim)),
        jnp.zeros((1, 1, n, d_pad + n)),
        jnp.zeros((1, 1), bool),
    )
    path = str(tmp_path / "policy.npz")
    save_policy(
        path, params, hidden_dim=hidden_dim, param_share=param_share,
        action_dim=action_dim, n_agents=n,
    )
    return path, params


class TestSaveLoad:
    def test_roundtrip(self, tmp_path):
        exp = Experiment(tiny_cfg())
        path, params = make_policy_file(tmp_path)
        loaded, meta = load_policy(path)
        assert meta == {
            "hidden_dim": 8, "param_share": True, "action_dim": 5,
            "n_agents": exp.spec.n_agents,
        }
        flat_a = jax.tree_util.tree_leaves(params)
        flat_b = jax.tree_util.tree_leaves(loaded)
        assert len(flat_a) == len(flat_b)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # tree STRUCTURE must survive too (apply would fail otherwise)
        assert (
            jax.tree_util.tree_structure(jax.tree.map(np.asarray, params))
            == jax.tree_util.tree_structure(jax.tree.map(np.asarray, loaded))
        )


class TestPacking:
    def test_pack_matches_vdn_pack_obs(self, tmp_path):
        """The stacked-obs packer must produce exactly what the VDN net was
        trained on (baselines/vdn._pack_obs over the dict obs)."""
        exp = Experiment(tiny_cfg())
        path, _ = make_policy_file(tmp_path)
        sample_fn, _ = make_action_sampler(exp.env, exp.spec)
        pol = load_collect_policy(path, exp.env, exp.spec, 0.0, sample_fn)

        obs, state = exp.env.reset_stacked(jax.random.PRNGKey(0))
        packed = pol._pack(obs)

        # dict form of the same observation, via the spec slot map
        slot = {}
        for g, ((_, _), idxs) in enumerate(exp.spec.groups):
            for p, i in enumerate(idxs):
                slot[i] = (g, p)
        obs_g = tuple(obs)
        obs_dict = {
            a: obs_g[slot[i][0]][slot[i][1]][None]
            for i, a in enumerate(exp.spec.agents)
        }
        want = _pack_obs(exp.env, obs_dict, exp.spec.n_agents)
        np.testing.assert_allclose(
            np.asarray(packed), np.asarray(want), rtol=1e-6
        )


class TestPolicyStep:
    def test_greedy_matches_network_argmax(self, tmp_path):
        exp = Experiment(tiny_cfg())
        path, params = make_policy_file(tmp_path)
        sample_fn, _ = make_action_sampler(exp.env, exp.spec)
        pol = load_collect_policy(path, exp.env, exp.spec, 0.0, sample_fn)

        obs, state = exp.env.reset_stacked(jax.random.PRNGKey(1))
        carry = pol.init_carry()
        new_carry, actions = pol.step(carry, obs, state, jax.random.PRNGKey(2))
        net = pol.network
        hidden, q = net.apply(
            params, carry, pol._pack(obs)[None], jnp.zeros((1, 1), bool)
        )
        np.testing.assert_array_equal(
            np.asarray(actions), np.asarray(jnp.argmax(q[0, 0], axis=-1))
        )
        np.testing.assert_allclose(
            np.asarray(new_carry), np.asarray(hidden), rtol=1e-6
        )

    def test_epsilon_one_is_uniform_sampler(self, tmp_path):
        """epsilon=1.0 must reproduce the uniform sampler's draws exactly
        (same key path as the scripted policies' mixture)."""
        exp = Experiment(tiny_cfg())
        path, _ = make_policy_file(tmp_path)
        sample_fn, _ = make_action_sampler(exp.env, exp.spec)
        pol = load_collect_policy(path, exp.env, exp.spec, 1.0, sample_fn)
        obs, state = exp.env.reset_stacked(jax.random.PRNGKey(1))
        key = jax.random.PRNGKey(5)
        _, actions = pol.step(pol.init_carry(), obs, state, key)
        _, k_rand = jax.random.split(key)
        np.testing.assert_array_equal(
            np.asarray(actions), np.asarray(sample_fn(k_rand))
        )

    def test_rejects_wrong_population(self, tmp_path):
        exp = Experiment(tiny_cfg())
        path, _ = make_policy_file(tmp_path)
        params, meta = load_policy(path)
        meta["n_agents"] += 1
        sample_fn, _ = make_action_sampler(exp.env, exp.spec)
        with pytest.raises(ValueError, match="agents"):
            QCollectPolicy(exp.env, exp.spec, params, meta, 0.0, sample_fn)


class TestEndToEnd:
    def test_experiment_trains_under_vdn_collection(self, tmp_path):
        cfg = tiny_cfg(tmp_path)
        path, _ = make_policy_file(tmp_path, hidden_dim=8)
        cfg.train.collect_policy = f"vdn:{path}"
        cfg.train.collect_epsilon = 0.25
        exp = Experiment(cfg).setup()
        out = exp.run()
        assert np.isfinite(out["loss_train"])

    def test_batched_envs_train_under_vdn_collection(self, tmp_path):
        cfg = tiny_cfg(tmp_path)
        path, _ = make_policy_file(tmp_path, hidden_dim=8)
        cfg.train.collect_policy = f"vdn:{path}"
        cfg.train.n_envs = 2
        exp = Experiment(cfg).setup()
        out = exp.run()
        assert np.isfinite(out["loss_train"])

    def test_independent_params_policy(self, tmp_path):
        cfg = tiny_cfg(tmp_path)
        path, _ = make_policy_file(tmp_path, param_share=False)
        cfg.train.collect_policy = f"vdn:{path}"
        exp = Experiment(cfg).setup()
        out = exp.run()
        assert np.isfinite(out["loss_train"])


class TestVdnDriverSave:
    def test_main_saves_loadable_policy(self, tmp_path):
        """The VDN CLI's save_policy_path emits an artifact directly
        consumable by train.collect_policy='vdn:<path>'."""
        from mfvae_tpu.baselines import vdn

        path = str(tmp_path / "p.npz")
        vdn.main(
            None,
            num_good_agents=1, num_adversaries=2, num_obs=1,
            num_updates=2, num_envs=2, buffer_size_time=64,
            min_buffer_time=16, batch_size=2, hidden_dim=8,
            log_during_training=False, test_during_training=False,
            save_policy_path=path,
        )
        exp = Experiment(tiny_cfg())
        sample_fn, _ = make_action_sampler(exp.env, exp.spec)
        pol = load_collect_policy(path, exp.env, exp.spec, 0.0, sample_fn)
        obs, state = exp.env.reset_stacked(jax.random.PRNGKey(0))
        _, actions = pol.step(pol.init_carry(), obs, state, jax.random.PRNGKey(1))
        assert actions.shape == (exp.spec.n_agents,)


class TestHostCollection:
    """HostQCollectPolicy: the host collectors' mirror of the learned
    Q-policy (jitted-on-CPU recurrent forward, numpy packing)."""

    def test_host_greedy_matches_device_policy(self, tmp_path):
        """epsilon=0: HostQCollectPolicy.actions on the named-obs dict ==
        QCollectPolicy greedy on the same stacked obs."""
        from mfvae_tpu.baselines.collect_policy import HostQCollectPolicy
        from mfvae_tpu.training.trainer import stacked_to_grouped

        exp = Experiment(tiny_cfg())
        spec = exp.spec
        path, _ = make_policy_file(tmp_path)
        sample_fn, _ = make_action_sampler(exp.env, exp.spec)
        dev = load_collect_policy(path, exp.env, spec, 0.0, sample_fn)

        obs, state = exp.env.reset_stacked(jax.random.PRNGKey(0))
        _, dev_actions = dev.step(
            dev.init_carry(), obs, state, jax.random.PRNGKey(1)
        )

        obs_g = stacked_to_grouped(spec, obs)
        named = {}
        for g, ((_, _), idxs) in enumerate(spec.groups):
            for pos, i in enumerate(idxs):
                named[spec.agents[i]] = np.asarray(obs_g[g][pos])
        host = HostQCollectPolicy(
            path, spec.agents,
            {a: v.shape[-1] for a, v in named.items()},
            epsilon=0.0, rng=np.random.default_rng(0),
        )
        host_actions = host.actions(named)[0]
        np.testing.assert_array_equal(host_actions, np.asarray(dev_actions))

    def test_host_experiment_trains_under_vdn_collection(self, tmp_path):
        from mfvae_tpu.training.host_experiment import HostExperiment

        cfg = tiny_cfg(tmp_path, epoch_num=2, sample_num=6, train_num=2)
        cfg.buffer.min_size = 4
        cfg.buffer.batch_size = 4
        path, _ = make_policy_file(tmp_path)
        cfg.train.collect_policy = f"vdn:{path}"
        exp = HostExperiment(cfg).setup()
        out = exp.run()
        assert np.isfinite(out["loss_train"])

    def test_host_batched_vdn_collection(self, tmp_path):
        from mfvae_tpu.envs.native_engine import native_engine_available
        from mfvae_tpu.training.host_experiment import HostExperiment

        if not native_engine_available():
            pytest.skip("no native toolchain")
        cfg = tiny_cfg(tmp_path, epoch_num=2, sample_num=8, train_num=2)
        cfg.env.n_host_envs = 4
        cfg.buffer.min_size = 4
        cfg.buffer.batch_size = 4
        path, _ = make_policy_file(tmp_path)
        cfg.train.collect_policy = f"vdn:{path}"
        exp = HostExperiment(cfg).setup()
        assert exp.collector._q_policy is not None
        out = exp.run()
        assert np.isfinite(out["loss_train"])
