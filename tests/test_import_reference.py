"""Migration path: import reference-format MAVAE params into the stacked
layout and verify forward equivalence.

A genuine reference-STRUCTURE flax model is built here (independent
reimplementation of the published structure from jax_ver/model.py:100-136 —
per-agent Encoder/Embedding dicts auto-named ``encoders_<agent>``, joint
Decoders with unnamed Denses, ``reward_linear`` head), initialized so flax
produces the real auto-named param tree the reference pickles.  The
importer restacks it; the stacked model with imported params must compute
exactly what the per-agent reference-structure model computes.
"""

import pickle

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mfvae_tpu.config import ModelConfig
from mfvae_tpu.models.import_reference import (
    import_reference_params,
    load_reference_pickle,
)
from mfvae_tpu.models.mavae import AgentSpec, GroupedBatch, MAVAE

AGENTS = ("adversary_0", "adversary_1", "adversary_2", "agent_0", "agent_1")
OBS = {a: (9 if a.startswith("adv") else 7) for a in AGENTS}
ACT = {a: 5 for a in AGENTS}
IDX_F, OBS_F, ACT_F = 6, 4, 3
ENC_HIDDEN, DEC_HIDDEN = (8, 8), (16, 8)


class RefEncoder(nn.Module):
    """Published Encoder structure: named fc{i} hiddens + one unnamed
    output Dense (auto-named Dense_0), relu hiddens."""

    out_dim: int

    @nn.compact
    def __call__(self, x):
        for i, h in enumerate(ENC_HIDDEN):
            x = nn.relu(nn.Dense(h, name=f"fc{i}")(x))
        return nn.Dense(self.out_dim)(x)


class RefDecoder(nn.Module):
    """Published Decoder structure: all-unnamed Denses (Dense_0..Dense_N)."""

    out_dim: int

    @nn.compact
    def __call__(self, x):
        for h in DEC_HIDDEN:
            x = nn.relu(nn.Dense(h)(x))
        return nn.Dense(self.out_dim)(x)


class RefEmbedding(nn.Module):
    num: int
    dim: int

    def setup(self):
        self.embedding = self.param(
            "embedding", nn.initializers.normal(1.0), (self.num, self.dim)
        )

    def __call__(self, idx):
        return self.embedding[idx]


class RefMAVAE(nn.Module):
    """Reference module layout: dict attributes of per-agent submodules
    (flax auto-names them ``encoders_<agent>``)."""

    def setup(self):
        self.idx_emb = RefEmbedding(len(AGENTS), IDX_F)
        self.encoders = {a: RefEncoder(2 * OBS_F) for a in AGENTS}
        self.action_encoders = {a: RefEmbedding(ACT[a], ACT_F) for a in AGENTS}
        self.state_decoder = RefDecoder(sum(OBS.values()))
        self.reward_decoder = RefDecoder(len(AGENTS))
        self.reward_linear = nn.Dense(len(AGENTS))

    def __call__(self, obs_dict, act_dict):
        """Deterministic forward (z = mu), per-agent Python loop in agent
        order — the reference's control structure."""
        mus, lvs, aembs = [], [], []
        for i, a in enumerate(AGENTS):
            o = obs_dict[a]
            ide = jnp.broadcast_to(
                self.idx_emb(jnp.asarray(i)), (o.shape[0], IDX_F)
            )
            latent = self.encoders[a](jnp.concatenate([ide, o], axis=-1))
            mus.append(latent[:, :OBS_F])
            lvs.append(latent[:, OBS_F:])
            aembs.append(self.action_encoders[a](act_dict[a]))
        # decode input = z block then action block (jax_ver/model.py:182-191:
        # z_all = concat per-agent z, then concat([z_all, actions_emb]))
        flat = jnp.concatenate(mus + aembs, axis=-1)
        recon_state = self.state_decoder(flat)
        recon_reward = self.reward_linear(self.reward_decoder(flat))
        return (
            recon_state,
            recon_reward,
            jnp.concatenate(mus, axis=-1),
            jnp.concatenate(lvs, axis=-1),
        )


def make_inputs(B=4, seed=0):
    rng = np.random.default_rng(seed)
    obs = {a: jnp.asarray(rng.normal(size=(B, OBS[a])), jnp.float32) for a in AGENTS}
    act = {a: jnp.asarray(rng.integers(0, 5, size=(B,))) for a in AGENTS}
    return obs, act


def our_model():
    spec = AgentSpec.from_dicts(AGENTS, OBS, ACT)
    cfg = ModelConfig(
        idx_features=IDX_F, obs_features=OBS_F, action_features=ACT_F,
        encoder_hidden=ENC_HIDDEN, decoder_hidden=DEC_HIDDEN,
        compute_dtype="float32", fused_decoders=False,
    )
    return spec, MAVAE.from_config(cfg, spec)


class TestImportReferenceParams:
    def test_forward_equivalence(self, tmp_path):
        obs, act = make_inputs()
        ref = RefMAVAE()
        ref_vars = ref.init(jax.random.PRNGKey(3), obs, act)
        want = ref.apply(ref_vars, obs, act)

        # genuine pickle round-trip of the tree the reference saves
        path = tmp_path / "model_state.pkl"
        with open(path, "wb") as f:
            pickle.dump(jax.tree.map(np.asarray, ref_vars["params"]), f)

        spec, model = our_model()
        variables = load_reference_pickle(str(path), spec)

        # deterministic compare: z = mu on both sides
        batch_obs = tuple(
            jnp.stack([obs[spec.agents[i]] for i in idxs], axis=1)
            for (_, _), idxs in spec.groups
        )
        batch_act = tuple(
            jnp.stack([act[spec.agents[i]] for i in idxs], axis=1)
            for (_, _), idxs in spec.groups
        )
        batch = GroupedBatch(obs=batch_obs, actions=batch_act)
        mu, logvar, aemb, _, det = model.apply(
            variables, batch, None, method=lambda m, b, ids: m.encode(b, ids)
        )
        perm = jnp.asarray(spec.perm_from_grouped)
        mu_o = jnp.take(mu, perm, axis=1)
        lv_o = jnp.take(logvar, perm, axis=1)
        aemb_o = jnp.take(aemb, perm, axis=1)
        rs, rr = model.apply(
            variables, mu_o.astype(jnp.float32), aemb_o, None, det,
            method=lambda m, z, a, s, d: m.decode(z, a, s, d),
        )
        b = mu.shape[0]
        np.testing.assert_allclose(np.asarray(rs), np.asarray(want[0]), rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(rr), np.asarray(want[1]), rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(mu_o.reshape(b, -1)), np.asarray(want[2]), rtol=2e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(lv_o.reshape(b, -1)), np.asarray(want[3]), rtol=2e-5, atol=1e-6
        )

    def test_imported_tree_matches_init_structure(self):
        obs, act = make_inputs()
        ref_vars = RefMAVAE().init(jax.random.PRNGKey(0), obs, act)
        spec, model = our_model()
        imported = import_reference_params(ref_vars["params"], spec)
        batch = GroupedBatch(
            obs=tuple(
                jnp.stack([obs[spec.agents[i]] for i in idxs], axis=1)
                for (_, _), idxs in spec.groups
            ),
            actions=tuple(
                jnp.stack([act[spec.agents[i]] for i in idxs], axis=1)
                for (_, _), idxs in spec.groups
            ),
        )
        init_vars = model.init(
            jax.random.PRNGKey(0), batch, None, jax.random.PRNGKey(1)
        )
        # same treedef + same leaf shapes -> drop-in for every trainer path
        got = jax.tree.map(lambda x: x.shape, imported)
        wantt = jax.tree.map(lambda x: x.shape, init_vars)
        assert got == wantt


class TestImportTorchStateDict:
    """torch_ver migration: its state_dict genuinely lacks the per-agent
    encoders (plain-dict bug, SURVEY §2.1); everything saved must transfer
    with exact forward equivalence of the decoder stack."""

    def _torch_modules(self):
        import torch
        import torch.nn as tnn

        def seq_mlp(in_dim, hiddens, out_dim):
            layers, d = [], in_dim
            for h in hiddens:
                layers += [tnn.Linear(d, h), tnn.ReLU()]
                d = h
            layers.append(tnn.Linear(d, out_dim))
            return tnn.Sequential(*layers)

        class TorchRef(tnn.Module):
            # reference torch MAVAE's REGISTERED submodules only (the
            # plain-dict encoders never reach state_dict anyway)
            def __init__(self):
                super().__init__()
                self.idx_emb = tnn.Embedding(len(AGENTS), IDX_F)
                self.state_decoder = tnn.Module()
                self.state_decoder.net = seq_mlp(
                    (OBS_F + ACT_F) * len(AGENTS), DEC_HIDDEN, sum(OBS.values())
                )
                self.reward_decoder = tnn.Module()
                self.reward_decoder.net = seq_mlp(
                    (OBS_F + ACT_F) * len(AGENTS), DEC_HIDDEN, len(AGENTS)
                )
                self.reward_linear = tnn.Linear(len(AGENTS), len(AGENTS))
                torch.nn.init.ones_(self.reward_linear.weight)
                torch.nn.init.zeros_(self.reward_linear.bias)

        return TorchRef()

    def test_decoder_stack_transfers_exactly(self, tmp_path):
        import torch

        torch.manual_seed(0)
        ref = self._torch_modules()
        path = tmp_path / "test.pt"
        torch.save(ref.state_dict(), str(path))

        spec, model = our_model()
        obs, act = make_inputs()
        batch = GroupedBatch(
            obs=tuple(
                jnp.stack([obs[spec.agents[i]] for i in idxs], axis=1)
                for (_, _), idxs in spec.groups
            ),
            actions=tuple(
                jnp.stack([act[spec.agents[i]] for i in idxs], axis=1)
                for (_, _), idxs in spec.groups
            ),
        )
        init_vars = model.init(
            jax.random.PRNGKey(0), batch, None, jax.random.PRNGKey(1)
        )
        from mfvae_tpu.models.import_reference import load_torch_checkpoint

        variables, missing = load_torch_checkpoint(str(path), init_vars)
        assert any(m.startswith("encoders_") for m in missing)

        # decode with imported params == torch decoder stack on the same z
        rng = np.random.default_rng(1)
        z = rng.normal(size=(4, len(AGENTS), OBS_F)).astype(np.float32)
        aemb = rng.normal(size=(4, len(AGENTS), ACT_F)).astype(np.float32)
        rs, rr = model.apply(
            variables, jnp.asarray(z), jnp.asarray(aemb), None, None,
            method=lambda m, z_, a_, s_, d_: m.decode(z_, a_, s_, d_),
        )
        flat = np.concatenate([z.reshape(4, -1), aemb.reshape(4, -1)], axis=-1)
        with torch.no_grad():
            t_in = torch.from_numpy(flat)
            want_rs = ref.state_decoder.net(t_in).numpy()
            want_rr = ref.reward_linear(ref.reward_decoder.net(t_in)).numpy()
        np.testing.assert_allclose(np.asarray(rs), want_rs, rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(rr), want_rr, rtol=2e-5, atol=1e-5)
        # idx embedding transferred exactly
        np.testing.assert_allclose(
            np.asarray(variables["params"]["idx_emb"]["embedding"]),
            ref.idx_emb.weight.detach().numpy(), rtol=1e-6,
        )
        # untouched modules kept their init (the reference save bug)
        np.testing.assert_allclose(
            np.asarray(variables["params"]["encoders_0"]["fc0"]["kernel"]),
            np.asarray(init_vars["params"]["encoders_0"]["fc0"]["kernel"]),
        )
