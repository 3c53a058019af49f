"""Bit-level parity against the ACTUAL reference source.

Unlike tests/test_import_reference.py (which verifies the importer against
an in-repo transcription of the reference structure), this file imports the
real ``/root/reference/jax_ver/model.py`` and ``trainer.py`` (they import
cleanly with the installed flax), initializes the real reference MAVAE,
restacks its genuine param tree via ``import_reference_params``, and asserts:

- forward equivalence (same rng_key, rng_mode='reference' replaying the
  per-agent key splits of jax_ver/model.py:161) for discrete AND continuous
  actions (jax_ver/model.py:121-128 action-encoder branch);
- loss equivalence vs the real ``loss_s_r_vae_fn`` (jax_ver/trainer.py:57-71);
- FULL train-step equivalence vs the real ``train_step``
  (jax_ver/trainer.py:73-84): same loss components and the same post-Adam
  parameters (re-imported and compared leaf-by-leaf);
- ``create_dataset`` equivalence vs the real jax_ver/trainer.py:9-39.

Any transcription slip — layer naming, KL aggregation, reparam order, loss
weighting — fails here against the reference's own code.
"""

import importlib.util
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax.training.train_state import TrainState

from mfvae_tpu.config import LossConfig, ModelConfig, TrainConfig
from mfvae_tpu.data.transitions import GroupedTransition, create_dataset
from mfvae_tpu.models.import_reference import import_reference_params
from mfvae_tpu.models.losses import elbo_losses
from mfvae_tpu.models.mavae import AgentSpec, GroupedBatch, MAVAE
from mfvae_tpu.training.trainer import create_train_state, make_train_step
from mfvae_tpu.data.transitions import VaeBatch

REF_DIR = "/root/reference/jax_ver"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference source not present"
)


def _load(name: str, filename: str):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF_DIR, filename)
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_mods():
    return _load("ref_jax_model", "model.py"), _load("ref_jax_trainer", "trainer.py")


# simple_tag-shaped heterogeneous population: adversary group then agent
# group, contiguous in agent order (grouped order == agent order, as in the
# real env population jax_ver/main.py:59-62)
AGENTS = ("adversary_0", "adversary_1", "adversary_2", "agent_0", "agent_1")
OBS = {a: (8 if a.startswith("adversary") else 6) for a in AGENTS}
DISCRETE_ACT = {a: 5 for a in AGENTS}
CONTINUOUS_ACT = {a: 5 for a in AGENTS}
IDX_F, OBS_F, ACT_F = 4, 4, 3
B = 6


def _ref_model(ref_model_mod, discrete: bool):
    return ref_model_mod.MAVAE(
        idx_features=IDX_F,
        obs_features=OBS_F,
        action_features=ACT_F,
        descrete_act=discrete,
        agents=list(AGENTS),
        obs_dim=dict(OBS),
        action_dim=dict(DISCRETE_ACT if discrete else CONTINUOUS_ACT),
    )


def _our_model(discrete: bool):
    spec = AgentSpec.from_dicts(
        AGENTS, OBS, DISCRETE_ACT if discrete else CONTINUOUS_ACT
    )
    cfg = ModelConfig(
        idx_features=IDX_F,
        obs_features=OBS_F,
        action_features=ACT_F,
        discrete_act=discrete,
        # the reference's hidden widths are hardcoded class attributes
        # (jax_ver/model.py:15,39,67); ModelConfig defaults match them, but
        # pin explicitly so the test can't drift
        encoder_hidden=(64, 64, 256),
        action_encoder_hidden=(64,),
        decoder_hidden=(1024, 256, 64, 256, 1024),
        compute_dtype="float32",
        fused_decoders=False,
        rng_mode="reference",
    )
    return spec, MAVAE.from_config(cfg, spec)


def _inputs(discrete: bool, seed: int = 0):
    """Reference call contract: idx_state[agent] = [B, 1+obs] with the agent
    index (float) as column 0 (jax_ver/trainer.py:23, model.py:152-155)."""
    rng = np.random.default_rng(seed)
    idx_state, actions = {}, {}
    for i, a in enumerate(AGENTS):
        obs = rng.normal(size=(B, OBS[a])).astype(np.float32)
        idx_state[a] = jnp.asarray(
            np.concatenate([np.full((B, 1), float(i), np.float32), obs], axis=1)
        )
        if discrete:
            actions[a] = jnp.asarray(rng.integers(0, DISCRETE_ACT[a], size=(B,)))
        else:
            actions[a] = jnp.asarray(
                rng.normal(size=(B, CONTINUOUS_ACT[a])).astype(np.float32)
            )
    next_state = jnp.asarray(
        rng.normal(size=(B, sum(OBS.values()))).astype(np.float32)
    )
    rewards = jnp.asarray(rng.normal(size=(B, len(AGENTS))).astype(np.float32))
    return idx_state, actions, next_state, rewards


@pytest.mark.parametrize("discrete", [True, False], ids=["discrete", "continuous"])
def test_forward_parity_vs_reference_source(ref_mods, discrete):
    ref_model_mod, _ = ref_mods
    idx_state, actions, _, _ = _inputs(discrete)
    call_rng = jax.random.PRNGKey(7)

    ref = _ref_model(ref_model_mod, discrete)
    ref_vars = ref.init(jax.random.PRNGKey(3), idx_state, actions, call_rng)
    want = ref.apply(ref_vars, idx_state, actions, call_rng)

    spec, model = _our_model(discrete)
    variables = import_reference_params(ref_vars["params"], spec)
    got = model.apply(variables, idx_state, actions, call_rng)

    for g, w, name in zip(got, want, ("recon_state", "recon_reward", "mu", "logvar")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-5, atol=1e-5, err_msg=name
        )


@pytest.mark.parametrize("discrete", [True, False], ids=["discrete", "continuous"])
def test_export_consumed_by_reference_source(ref_mods, discrete):
    """Reverse interop: params trained HERE, exported via
    export_reference_params, must drive the REAL reference MAVAE
    (jax_ver/model.py) to the same outputs as our own forward — i.e. the
    exported pickle is genuinely consumable by jax_ver/main.py:239-240
    conventions."""
    from mfvae_tpu.models.import_reference import export_reference_params

    ref_model_mod, _ = ref_mods
    idx_state, actions, _, _ = _inputs(discrete)
    call_rng = jax.random.PRNGKey(11)

    spec, model = _our_model(discrete)
    variables = model.init(
        jax.random.PRNGKey(5), idx_state, actions, call_rng
    )
    want = model.apply(variables, idx_state, actions, call_rng)

    exported = export_reference_params(variables, spec)
    ref = _ref_model(ref_model_mod, discrete)
    got = ref.apply({"params": exported}, idx_state, actions, call_rng)

    for g, w, name in zip(got, want, ("recon_state", "recon_reward", "mu", "logvar")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-5, atol=1e-5, err_msg=name
        )


def test_loss_fn_parity_vs_reference_source(ref_mods):
    """Pin huber/kl/weighting directly against jax_ver/trainer.py:42-71 on
    arbitrary tensors (model-independent)."""
    _, ref_trainer = ref_mods
    rng = np.random.default_rng(1)
    recon_s = jnp.asarray(rng.normal(size=(B, 34)).astype(np.float32)) * 3
    recon_r = jnp.asarray(rng.normal(size=(B, 5)).astype(np.float32)) * 3
    s_hat = jnp.asarray(rng.normal(size=(B, 34)).astype(np.float32))
    r_hat = jnp.asarray(rng.normal(size=(B, 5)).astype(np.float32))
    mu = jnp.asarray(rng.normal(size=(B, 20)).astype(np.float32))
    logvar = jnp.asarray(rng.normal(size=(B, 20)).astype(np.float32))

    want = ref_trainer.loss_s_r_vae_fn(recon_s, recon_r, s_hat, r_hat, mu, logvar)
    got = elbo_losses(
        recon_s, recon_r, s_hat, r_hat, mu, logvar, LossConfig(family="jax")
    )
    for g, w, name in zip(
        (got.loss, got.s_loss, got.r_loss, got.kl_loss), want,
        ("loss", "s_loss", "r_loss", "kl_loss"),
    ):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-6, atol=1e-7, err_msg=name
        )
    # and the mse family flag (jax_ver/trainer.py:45-46,59-60)
    want_mse = ref_trainer.loss_s_r_vae_fn(
        recon_s, recon_r, s_hat, r_hat, mu, logvar, using_huber_loss=False
    )
    got_mse = elbo_losses(
        recon_s, recon_r, s_hat, r_hat, mu, logvar,
        LossConfig(family="jax", use_huber=False),
    )
    np.testing.assert_allclose(
        np.asarray(got_mse.loss), np.asarray(want_mse[0]), rtol=1e-6, atol=1e-7
    )


def test_train_step_parity_vs_reference_source(ref_mods):
    """One full optimization step through the real jax_ver/trainer.py:73-84
    train_step vs our fused train step on imported params: loss components
    AND post-Adam parameters must agree."""
    ref_model_mod, ref_trainer = ref_mods
    idx_state, actions, next_state, rewards = _inputs(discrete=True)
    call_rng = jax.random.PRNGKey(11)
    lr = 1e-3

    ref = _ref_model(ref_model_mod, True)
    ref_vars = ref.init(jax.random.PRNGKey(5), idx_state, actions, call_rng)
    ref_state = TrainState.create(
        apply_fn=ref.apply, params=ref_vars["params"], tx=optax.adam(lr)
    )
    new_ref, ref_loss, ref_s, ref_r, ref_kl = ref_trainer.train_step(
        ref_state, idx_state, actions, next_state, rewards, call_rng
    )

    spec, model = _our_model(True)
    variables = import_reference_params(ref_vars["params"], spec)
    state = create_train_state(
        model,
        variables,
        TrainConfig(lr=lr, lr_schedule="constant", grad_clip=0.0),
    )
    step = make_train_step(LossConfig(family="jax"), mode="Adam")
    batch_obs = tuple(
        jnp.stack([idx_state[spec.agents[i]][:, 1:] for i in idxs], axis=1)
        for (_, _), idxs in spec.groups
    )
    batch_act = tuple(
        jnp.stack([actions[spec.agents[i]] for i in idxs], axis=1)
        for (_, _), idxs in spec.groups
    )
    batch = VaeBatch(
        inputs=GroupedBatch(obs=batch_obs, actions=batch_act),
        next_state=next_state,
        rewards=rewards,
    )
    new_state, outs = jax.jit(step)(state, batch, call_rng)

    for g, w, name in zip(
        (outs.loss, outs.s_loss, outs.r_loss, outs.kl_loss),
        (ref_loss, ref_s, ref_r, ref_kl),
        ("loss", "s_loss", "r_loss", "kl_loss"),
    ):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-5, atol=1e-6, err_msg=name
        )

    # post-step params: restack the reference's updated tree and compare
    want_params = import_reference_params(new_ref.params, spec)["params"]
    got_params = new_state.params["params"]
    flat_w = jax.tree_util.tree_flatten_with_path(want_params)[0]
    flat_g = jax.tree_util.tree_flatten_with_path(got_params)[0]
    assert len(flat_w) == len(flat_g)
    for (pw, w), (pg, g) in zip(flat_w, flat_g):
        assert jax.tree_util.keystr(pw) == jax.tree_util.keystr(pg)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-3, atol=2e-5,
            err_msg=jax.tree_util.keystr(pw),
        )


def test_create_dataset_parity_vs_reference_source(ref_mods):
    """Our jit-safe create_dataset vs the real jax_ver/trainer.py:9-39 on a
    reference-format flat transition dict ([B, D, 1] entries, the flashbax
    item shape created by jax_ver/jax_buffer.py:8-56)."""
    _, ref_trainer = ref_mods
    rng = np.random.default_rng(2)
    codebook = {a: i for i, a in enumerate(AGENTS)}
    transition = {}
    for a in AGENTS:
        transition[f"{a}_obs"] = jnp.asarray(
            rng.normal(size=(B, OBS[a], 1)).astype(np.float32)
        )
        transition[f"{a}_act"] = jnp.asarray(
            rng.integers(0, 5, size=(B, 1, 1)).astype(np.float32)
        )
        transition[f"{a}_next_obs"] = jnp.asarray(
            rng.normal(size=(B, OBS[a], 1)).astype(np.float32)
        )
        transition[f"{a}_rew"] = jnp.asarray(
            rng.normal(size=(B, 1, 1)).astype(np.float32)
        )

    w_idx, w_act, w_rew, w_next = ref_trainer.create_dataset(transition, codebook)
    g_idx, g_act, g_rew, g_next = create_dataset(transition, codebook)

    assert set(w_idx) == set(g_idx) and set(w_act) == set(g_act)
    for a in AGENTS:
        np.testing.assert_allclose(np.asarray(g_idx[a]), np.asarray(w_idx[a]))
        np.testing.assert_allclose(np.asarray(g_act[a]), np.asarray(w_act[a]))
    np.testing.assert_allclose(np.asarray(g_rew), np.asarray(w_rew))
    np.testing.assert_allclose(np.asarray(g_next), np.asarray(w_next))


def test_elbo_trace_parity_lockstep_200_steps(ref_mods):
    """BASELINE.json metric, scaled for the suite: 'ELBO matching reference
    to 1e-2 after N steps'.  Train the real reference train_step
    (jax_ver/trainer.py:73-84) and our fused step in lockstep from the same
    imported params on the SAME data stream and rng keys for 200 steps and
    compare the CONVERGED ELBO (mean of the last 50 steps) to 1e-2.

    Why not per-step max: Adam near-sign-normalizes small gradients
    (update ~ lr*g/(|g|+eps)), so f32-level gradient noise between the
    stacked-einsum and per-agent-Dense implementations yields O(lr) update
    differences on near-zero components, and the two trajectories diverge
    chaotically like twins even though any SINGLE step from shared params
    matches to 1e-3 (test_train_step_parity_vs_reference_source).  The
    meaningful implementation-parity statement — and the literal BASELINE
    wording — is about the ELBO reached, which both sides share.
    scripts/elbo_parity_10k.py runs the full 10k-step criterion on the
    TPU."""
    ref_model_mod, ref_trainer = ref_mods
    lr = 1e-3
    ref = _ref_model(ref_model_mod, True)
    idx_state0, actions0, _, _ = _inputs(discrete=True)
    ref_vars = ref.init(jax.random.PRNGKey(2), idx_state0, actions0,
                        jax.random.PRNGKey(3))
    ref_state = TrainState.create(
        apply_fn=ref.apply, params=ref_vars["params"], tx=optax.adam(lr)
    )

    spec, model = _our_model(True)
    variables = import_reference_params(ref_vars["params"], spec)
    state = create_train_state(
        model, variables, TrainConfig(lr=lr, lr_schedule="constant", grad_clip=0.0)
    )
    step = jax.jit(make_train_step(LossConfig(family="jax"), mode="Adam"))

    rng = np.random.default_rng(42)
    ref_trace, our_trace = [], []
    for t in range(200):
        idx_state, actions, next_state, rewards = _inputs(
            discrete=True, seed=int(rng.integers(1 << 30))
        )
        key = jax.random.PRNGKey(1000 + t)
        ref_state, ref_loss, *_ = ref_trainer.train_step(
            ref_state, idx_state, actions, next_state, rewards, key
        )
        batch_obs = tuple(
            jnp.stack([idx_state[spec.agents[i]][:, 1:] for i in idxs], axis=1)
            for (_, _), idxs in spec.groups
        )
        batch_act = tuple(
            jnp.stack([actions[spec.agents[i]] for i in idxs], axis=1)
            for (_, _), idxs in spec.groups
        )
        state, outs = step(
            state,
            VaeBatch(
                inputs=GroupedBatch(obs=batch_obs, actions=batch_act),
                next_state=next_state,
                rewards=rewards,
            ),
            key,
        )
        ref_trace.append(float(ref_loss))
        our_trace.append(float(outs.loss))
    ref_final = float(np.mean(ref_trace[-50:]))
    our_final = float(np.mean(our_trace[-50:]))
    assert abs(our_final - ref_final) < 1e-2, (our_final, ref_final)
    # both actually descended (synthetic noise targets leave little to
    # learn beyond the KL/mean structure, so the drop is modest)
    assert our_final < np.mean(our_trace[:10]) - 0.02
    assert ref_final < np.mean(ref_trace[:10]) - 0.02
    # per-step twin divergence stays bounded (diagnostic guard)
    assert max(abs(a - b) for a, b in zip(our_trace, ref_trace)) < 0.2
