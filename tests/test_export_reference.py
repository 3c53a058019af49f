"""Reverse interop: export stacked MAVAE params to the reference's pickle
format (models/import_reference.export_reference_params) — the inverse of
the importer, making checkpoint migration bidirectional."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfvae_tpu.config import ModelConfig
from mfvae_tpu.models.import_reference import (
    export_reference_params,
    import_reference_params,
    load_reference_pickle,
    save_reference_pickle,
)
from mfvae_tpu.models.mavae import AgentSpec, GroupedBatch, MAVAE

AGENTS = ("adversary_0", "adversary_1", "adversary_2", "agent_0", "agent_1")
OBS = {a: (8 if a.startswith("adversary") else 6) for a in AGENTS}
ACT = {a: 5 for a in AGENTS}


def build(discrete=True, fused=False, **cfg_kw):
    spec = AgentSpec.from_dicts(AGENTS, OBS, ACT)
    cfg = ModelConfig(
        idx_features=4, obs_features=4, action_features=3,
        discrete_act=discrete,
        encoder_hidden=(8, 8), action_encoder_hidden=(6,),
        decoder_hidden=(16, 12), compute_dtype="float32",
        fused_decoders=fused, **cfg_kw,
    )
    model = MAVAE.from_config(cfg, spec)
    B = 4
    rng = np.random.default_rng(0)
    batch = GroupedBatch(
        obs=(
            jnp.asarray(rng.normal(size=(B, 3, 8)), jnp.float32),
            jnp.asarray(rng.normal(size=(B, 2, 6)), jnp.float32),
        ),
        actions=(
            jnp.asarray(rng.integers(0, 5, size=(B, 3)))
            if discrete
            else jnp.asarray(rng.normal(size=(B, 3, 5)), jnp.float32),
            jnp.asarray(rng.integers(0, 5, size=(B, 2)))
            if discrete
            else jnp.asarray(rng.normal(size=(B, 2, 5)), jnp.float32),
        ),
    )
    variables = model.init(
        jax.random.PRNGKey(0), batch, None, jax.random.PRNGKey(1)
    )
    return spec, cfg, model, batch, variables


def assert_trees_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves_with_path(b)
    assert [p for p, _ in la] == [p for p, _ in lb]
    for (path, x), (_, y) in zip(la, lb):
        np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y), err_msg=str(path)
        )


@pytest.mark.parametrize("discrete", [True, False], ids=["discrete", "continuous"])
def test_roundtrip_export_import(discrete):
    spec, cfg, model, batch, variables = build(discrete=discrete)
    ref_tree = export_reference_params(variables, spec)
    back = import_reference_params(ref_tree, spec)
    assert_trees_equal(variables["params"], back["params"])


def test_exported_tree_has_reference_structure():
    spec, cfg, model, batch, variables = build()
    tree = export_reference_params(variables, spec)
    # per-agent modules, reference auto-naming (jax_ver/model.py setup)
    for a in AGENTS:
        assert f"encoders_{a}" in tree and f"action_encoders_{a}" in tree
        enc = tree[f"encoders_{a}"]
        assert set(enc) == {"fc0", "fc1", "Dense_0"}
        assert tree[f"action_encoders_{a}"]["embedding"].shape == (5, 3)
    for dec in ("state_decoder", "reward_decoder"):
        assert set(tree[dec]) == {"Dense_0", "Dense_1", "Dense_2"}
    assert tree["state_decoder"]["Dense_2"]["kernel"].shape[1] == sum(OBS.values())
    assert tree["reward_decoder"]["Dense_2"]["kernel"].shape[1] == len(AGENTS)
    assert "idx_emb" in tree and "reward_linear" in tree
    assert "params" not in tree  # bare dict, as pickled at jax_ver/main.py:239


def test_fused_decoder_export_matches_forward():
    """Exporting a fused-trunk model must yield the reference's separate
    state/reward decoders computing the SAME function: re-import into the
    non-fused layout and compare full forwards."""
    spec, cfg, model, batch, variables = build(fused=True)
    tree = export_reference_params(variables, spec)
    unfused = import_reference_params(tree, spec)
    cfg2 = ModelConfig(**{**cfg.__dict__, "fused_decoders": False})
    model2 = MAVAE.from_config(cfg2, spec)
    key = jax.random.PRNGKey(9)
    got = model.apply(variables, batch, None, key)
    want = model2.apply(unfused, batch, None, key)
    for g, w, name in zip(got, want, ("recon_state", "recon_reward", "mu", "logvar")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-5, atol=1e-6, err_msg=name
        )


@pytest.mark.parametrize(
    "kw",
    [{"det_features": 4}, {"latent_structure": "shared_private", "shared_latent": 4}],
    ids=["det_features", "shared_private"],
)
def test_non_reference_architectures_rejected(kw):
    spec, cfg, model, batch, variables = build(**kw)
    with pytest.raises(ValueError, match="reference-representable"):
        export_reference_params(variables, spec)


def test_pickle_roundtrip(tmp_path):
    spec, cfg, model, batch, variables = build()
    path = str(tmp_path / "model_state.pkl")
    save_reference_pickle(variables, spec, path)
    back = load_reference_pickle(path, spec)
    assert_trees_equal(variables["params"], back["params"])
