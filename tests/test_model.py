"""MAVAE model tests: shapes, grouping, parity of stacked vs per-agent math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfvae_tpu.config import ModelConfig
from mfvae_tpu.models.layers import StackedDense, StackedMLP
from mfvae_tpu.models.mavae import AgentSpec, GroupedBatch, MAVAE, group_dict_batch


def tiny_spec(n_adv=3, n_good=2, obs_adv=10, obs_good=8, n_act=5):
    agents = tuple(f"adversary_{i}" for i in range(n_adv)) + tuple(
        f"agent_{i}" for i in range(n_good)
    )
    obs = {a: (obs_adv if a.startswith("adv") else obs_good) for a in agents}
    act = {a: n_act for a in agents}
    return AgentSpec.from_dicts(agents, obs, act)


def make_dict_batch(spec, batch=4, seed=0):
    rng = np.random.default_rng(seed)
    idx_state = {}
    actions = {}
    for i, a in enumerate(spec.agents):
        od = spec.obs_dim_map[a]
        obs = rng.normal(size=(batch, od)).astype(np.float32)
        idx_state[a] = jnp.concatenate(
            [jnp.full((batch, 1), float(i)), jnp.array(obs)], axis=1
        )
        actions[a] = jnp.array(rng.integers(0, spec.act_dim_map[a], size=(batch,)))
    return idx_state, actions


class TestAgentSpec:
    def test_grouping(self):
        spec = tiny_spec()
        assert len(spec.groups) == 2
        (dims0, idxs0), (dims1, idxs1) = spec.groups
        assert dims0 == (10, 5) and idxs0 == (0, 1, 2)
        assert dims1 == (8, 5) and idxs1 == (3, 4)
        assert spec.grouped_is_identity

    def test_interleaved_permutation(self):
        agents = ("a0", "b0", "a1", "b1")
        obs = {"a0": 4, "a1": 4, "b0": 6, "b1": 6}
        act = {k: 5 for k in agents}
        spec = AgentSpec.from_dicts(agents, obs, act)
        assert not spec.grouped_is_identity
        # grouped order: a0, a1, b0, b1 -> positions of originals
        assert spec.perm_from_grouped == (0, 2, 1, 3)


class TestStackedLayers:
    def test_stacked_dense_equals_independent(self):
        """One batched einsum == A independent Dense applications."""
        B, A, I, O = 3, 4, 6, 5
        x = jnp.array(np.random.default_rng(0).normal(size=(B, A, I)), jnp.float32)
        layer = StackedDense(stack=A, features=O)
        params = layer.init(jax.random.PRNGKey(0), x)
        y = layer.apply(params, x)
        assert y.shape == (B, A, O)
        kernel = params["params"]["kernel"]
        bias = params["params"]["bias"]
        for a in range(A):
            ref = x[:, a, :] @ kernel[a] + bias[a]
            np.testing.assert_allclose(np.asarray(y[:, a]), np.asarray(ref), rtol=1e-5)

    def test_stacked_mlp_shapes(self):
        x = jnp.ones((2, 3, 7))
        m = StackedMLP(stack=3, hidden=(8, 8), out_dim=4)
        params = m.init(jax.random.PRNGKey(1), x)
        assert m.apply(params, x).shape == (2, 3, 4)


class TestMAVAE:
    @pytest.fixture(scope="class")
    def setup(self):
        spec = tiny_spec()
        model = MAVAE.from_config(ModelConfig(compute_dtype="float32"), spec)
        idx_state, actions = make_dict_batch(spec)
        params = model.init(
            jax.random.PRNGKey(0), idx_state, actions, jax.random.PRNGKey(1)
        )
        return spec, model, idx_state, actions, params

    def test_output_shapes(self, setup):
        spec, model, idx_state, actions, params = setup
        rs, rr, mu, lv = model.apply(params, idx_state, actions, jax.random.PRNGKey(2))
        B = 4
        assert rs.shape == (B, sum(spec.obs_dims))
        assert rr.shape == (B, spec.n_agents)
        assert mu.shape == (B, spec.n_agents * 64)
        assert lv.shape == (B, spec.n_agents * 64)

    def test_dict_and_grouped_paths_agree(self, setup):
        spec, model, idx_state, actions, params = setup
        batch, _ = group_dict_batch(spec, idx_state, actions)
        out_d = model.apply(params, idx_state, actions, jax.random.PRNGKey(2))
        out_g = model.apply(params, batch, None, jax.random.PRNGKey(2))
        for a, b in zip(out_d, out_g):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)

    def test_deterministic_given_key(self, setup):
        spec, model, idx_state, actions, params = setup
        o1 = model.apply(params, idx_state, actions, jax.random.PRNGKey(3))
        o2 = model.apply(params, idx_state, actions, jax.random.PRNGKey(3))
        for a, b in zip(o1, o2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        o3 = model.apply(params, idx_state, actions, jax.random.PRNGKey(4))
        assert not np.allclose(np.asarray(o1[0]), np.asarray(o3[0]))

    def test_mu_is_agent_major_order(self, setup):
        """mu_all must be the agent-order concat (reference jax_ver/model.py:195)."""
        spec, model, idx_state, actions, params = setup
        batch, ids = group_dict_batch(spec, idx_state, actions)
        mu_g, lv_g, *_ = model.apply(
            params, batch, ids, method=lambda m, b, i: m.encode(b, i)
        )
        _, _, mu_flat, _ = model.apply(
            params, idx_state, actions, jax.random.PRNGKey(2)
        )
        # grouped order == agent order for this spec
        np.testing.assert_allclose(
            np.asarray(mu_flat),
            np.asarray(mu_g.astype(jnp.float32).reshape(4, -1)),
            rtol=1e-5,
        )

    def test_reference_rng_mode_runs(self):
        spec = tiny_spec(n_adv=2, n_good=1)
        model = MAVAE.from_config(
            ModelConfig(compute_dtype="float32", rng_mode="reference"), spec
        )
        idx_state, actions = make_dict_batch(spec, batch=2)
        params = model.init(
            jax.random.PRNGKey(0), idx_state, actions, jax.random.PRNGKey(1)
        )
        rs, rr, mu, lv = model.apply(params, idx_state, actions, jax.random.PRNGKey(2))
        assert rs.shape == (2, sum(spec.obs_dims))

    def test_fused_decoders_variant(self):
        spec = tiny_spec()
        model = MAVAE.from_config(
            ModelConfig(compute_dtype="float32", fused_decoders=True), spec
        )
        idx_state, actions = make_dict_batch(spec)
        params = model.init(
            jax.random.PRNGKey(0), idx_state, actions, jax.random.PRNGKey(1)
        )
        rs, rr, mu, lv = model.apply(params, idx_state, actions, jax.random.PRNGKey(2))
        assert rs.shape == (4, sum(spec.obs_dims)) and rr.shape == (4, spec.n_agents)
        # trunk params are stacked over the two decoders
        trunk = params["params"]["decoder_trunk"]
        first = sorted(k for k in trunk if k.startswith("fc"))[0] if any(
            k.startswith("fc") for k in trunk
        ) else "out"
        assert trunk[first]["kernel"].shape[0] == 2

    def test_continuous_actions(self):
        agents = ("x0", "x1")
        spec = AgentSpec.from_dicts(agents, {"x0": 4, "x1": 4}, {"x0": 3, "x1": 3})
        model = MAVAE.from_config(
            ModelConfig(compute_dtype="float32", discrete_act=False), spec
        )
        B = 2
        batch = GroupedBatch(
            obs=(jnp.ones((B, 2, 4)),), actions=(jnp.ones((B, 2, 3)),)
        )
        params = model.init(jax.random.PRNGKey(0), batch, None, jax.random.PRNGKey(1))
        rs, rr, mu, lv = model.apply(params, batch, None, jax.random.PRNGKey(2))
        assert rs.shape == (B, 8) and rr.shape == (B, 2)

    def test_jit_single_trace(self, setup):
        spec, model, idx_state, actions, params = setup
        import chex

        @jax.jit
        @chex.assert_max_traces(n=1)
        def fwd(p, s, a, k):
            return model.apply(p, s, a, k)

        chex.clear_trace_counter()
        fwd(params, idx_state, actions, jax.random.PRNGKey(0))
        fwd(params, idx_state, actions, jax.random.PRNGKey(1))


class TestSharedPrivateLatents:
    """latent_structure='shared_private' (BASELINE.json config 3): per-agent
    experts PoE'd into a shared latent the decoders also condition on."""

    def make(self, **kw):
        spec = tiny_spec()
        cfg = ModelConfig(
            compute_dtype="float32", latent_structure="shared_private",
            shared_latent=16, **kw,
        )
        model = MAVAE.from_config(cfg, spec)
        idx_state, actions = make_dict_batch(spec)
        params = model.init(
            jax.random.PRNGKey(0), idx_state, actions, jax.random.PRNGKey(1)
        )
        return spec, model, idx_state, actions, params

    def test_output_shapes_extend_contract(self):
        spec, model, idx_state, actions, params = self.make()
        rs, rr, mu, lv = model.apply(
            params, idx_state, actions, jax.random.PRNGKey(2)
        )
        B = 4
        assert rs.shape == (B, sum(spec.obs_dims))
        assert rr.shape == (B, spec.n_agents)
        # [B, A*F + S]: private concat + shared appended
        assert mu.shape == (B, spec.n_agents * 64 + 16)
        assert lv.shape == (B, spec.n_agents * 64 + 16)
        assert np.isfinite(np.asarray(rs)).all()

    def test_poe_matches_hand_computed(self):
        spec, model, *_ = self.make()
        rng = np.random.default_rng(0)
        mu_e = rng.normal(size=(3, 5, 7)).astype(np.float32)
        lv_e = rng.normal(size=(3, 5, 7)).astype(np.float32)
        mu, lv = MAVAE.poe((jnp.asarray(mu_e), jnp.asarray(lv_e)))
        prec = np.exp(-lv_e)
        total = 1.0 + prec.sum(axis=1)
        np.testing.assert_allclose(
            np.asarray(mu), (mu_e * prec).sum(axis=1) / total, rtol=1e-5
        )
        np.testing.assert_allclose(np.asarray(lv), -np.log(total), rtol=1e-5)

    def test_shared_latent_sees_every_agent(self):
        """Perturbing any single agent's obs must move the shared posterior
        mean (each agent contributes an expert)."""
        spec, model, idx_state, actions, params = self.make()

        def shared_mu(idx_state):
            batch, ids = group_dict_batch(spec, idx_state, actions)
            _, _, _, experts, _ = model.apply(
                params, batch, ids, method=lambda m, b, i: m.encode(b, i)
            )
            mu_s, _ = MAVAE.poe(experts)
            return np.asarray(mu_s)

        base = shared_mu(idx_state)
        for agent in spec.agents:
            bumped = dict(idx_state)
            bumped[agent] = idx_state[agent] + 1.0
            assert not np.allclose(shared_mu(bumped), base), agent

    def test_private_structure_unchanged(self):
        """latent_structure='private' must produce bit-identical outputs to
        the pre-shared-latent model (same params, same eps stream)."""
        spec = tiny_spec()
        cfg = ModelConfig(compute_dtype="float32")
        assert cfg.latent_structure == "private"
        model = MAVAE.from_config(cfg, spec)
        idx_state, actions = make_dict_batch(spec)
        params = model.init(
            jax.random.PRNGKey(0), idx_state, actions, jax.random.PRNGKey(1)
        )
        out = model.apply(params, idx_state, actions, jax.random.PRNGKey(2))
        assert out[2].shape[-1] == spec.n_agents * 64  # no shared dims

    def test_trains_end_to_end(self, tmp_path):
        from tests.test_training import tiny_cfg
        from mfvae_tpu.training.experiment import Experiment

        cfg = tiny_cfg(tmp_path, epoch_num=4)
        cfg.model.latent_structure = "shared_private"
        cfg.model.shared_latent = 8
        exp = Experiment(cfg).setup()
        result = exp.run()
        assert np.isfinite(result["loss_train"]) and np.isfinite(result["loss_test"])

    def test_fused_pallas_path_covers_shared_kl(self):
        """fused_call appends the shared KL as an extra column; total KL
        must match the reference forward's kl over the extended contract."""
        from mfvae_tpu.models.losses import kl_gaussian

        spec, model, idx_state, actions, params = self.make()
        batch, ids = group_dict_batch(spec, idx_state, actions)
        rs, rr, kl_rows = model.apply(
            params, batch, ids, jax.random.PRNGKey(2), method="fused_call"
        )
        assert kl_rows.shape == (4, spec.n_agents + 1)
        _, _, mu, lv = model.apply(
            params, idx_state, actions, jax.random.PRNGKey(2)
        )
        want = float(kl_gaussian(mu, lv))
        got = float(jnp.mean(jnp.sum(kl_rows, axis=1)))
        np.testing.assert_allclose(got, want, rtol=1e-4)


class TestDeterministicPath:
    """det_features > 0: RSSM-style deterministic encoder->decoder features
    alongside the stochastic latents (no KL cost)."""

    def make(self, **kw):
        spec = tiny_spec()
        cfg = ModelConfig(compute_dtype="float32", det_features=16, **kw)
        model = MAVAE.from_config(cfg, spec)
        idx_state, actions = make_dict_batch(spec)
        params = model.init(
            jax.random.PRNGKey(0), idx_state, actions, jax.random.PRNGKey(1)
        )
        return spec, model, idx_state, actions, params

    def test_contract_unchanged(self):
        """Output contract stays the reference's (det features are decoder
        conditioning, not part of mu/logvar)."""
        spec, model, idx_state, actions, params = self.make()
        rs, rr, mu, lv = model.apply(
            params, idx_state, actions, jax.random.PRNGKey(2)
        )
        assert rs.shape == (4, sum(spec.obs_dims))
        assert mu.shape == (4, spec.n_agents * 64)
        assert np.isfinite(np.asarray(rs)).all()

    def test_det_path_carries_state_info_without_latents(self):
        """Zeroing the stochastic latents must still leave the output
        obs-dependent through the deterministic path."""
        spec, model, idx_state, actions, params = self.make()
        batch, ids = group_dict_batch(spec, idx_state, actions)
        _, _, aemb, _, det = model.apply(
            params, batch, ids, method=lambda m, b, i: m.encode(b, i)
        )
        z0 = jnp.zeros((4, spec.n_agents, 64))

        def dec(det_):
            return model.apply(
                params, z0, aemb, None, det_,
                method=lambda m, z, a, s, d: m.decode(z, a, s, d),
            )[0]

        base = np.asarray(dec(det))
        bumped = np.asarray(dec(det + 1.0))
        assert not np.allclose(base, bumped)

    def test_composes_with_shared_private(self):
        spec, model, idx_state, actions, params = self.make(
            latent_structure="shared_private", shared_latent=8
        )
        rs, rr, mu, lv = model.apply(
            params, idx_state, actions, jax.random.PRNGKey(2)
        )
        assert mu.shape == (4, spec.n_agents * 64 + 8)
        assert np.isfinite(np.asarray(rs)).all()

    def test_fused_pallas_path(self):
        from mfvae_tpu.models.losses import kl_gaussian

        spec, model, idx_state, actions, params = self.make()
        batch, ids = group_dict_batch(spec, idx_state, actions)
        rs, rr, kl_rows = model.apply(
            params, batch, ids, jax.random.PRNGKey(2), method="fused_call"
        )
        rs2, rr2, mu, lv = model.apply(
            params, idx_state, actions, jax.random.PRNGKey(2)
        )
        np.testing.assert_allclose(np.asarray(rs), np.asarray(rs2), rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(
            float(jnp.mean(jnp.sum(kl_rows, axis=1))), float(kl_gaussian(mu, lv)),
            rtol=1e-4,
        )
