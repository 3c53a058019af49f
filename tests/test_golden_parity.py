"""Golden parity: the vectorized stacked-agent MAVAE must compute exactly
what a straightforward per-agent-loop implementation computes.

This is the correctness anchor for the TPU-native re-design: the reference
loops 40 agents in Python (jax_ver/model.py:149-181); we run one batched
einsum per layer.  Here the loop version is reconstructed *from the stacked
parameters* and compared output-for-output.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mfvae_tpu.config import ModelConfig
from mfvae_tpu.models.mavae import AgentSpec, GroupedBatch, MAVAE


def build_model(seed=0):
    agents = ("adversary_0", "adversary_1", "adversary_2", "agent_0", "agent_1")
    obs_dims = {a: (9 if a.startswith("adv") else 7) for a in agents}
    act_dims = {a: 5 for a in agents}
    spec = AgentSpec.from_dicts(agents, obs_dims, act_dims)
    cfg = ModelConfig(
        idx_features=6,
        obs_features=4,
        action_features=3,
        encoder_hidden=(8, 8),
        decoder_hidden=(16,),
        compute_dtype="float32",
        fused_decoders=False,  # the loop reconstruction reads the separate
        # state_decoder/reward_decoder param trees
    )
    model = MAVAE.from_config(cfg, spec)
    rng = np.random.default_rng(seed)
    B = 4
    batch = GroupedBatch(
        obs=(
            jnp.asarray(rng.normal(size=(B, 3, 9)), jnp.float32),
            jnp.asarray(rng.normal(size=(B, 2, 7)), jnp.float32),
        ),
        actions=(
            jnp.asarray(rng.integers(0, 5, size=(B, 3))),
            jnp.asarray(rng.integers(0, 5, size=(B, 2))),
        ),
    )
    variables = model.init(jax.random.PRNGKey(0), batch, None, jax.random.PRNGKey(1))
    return spec, cfg, model, batch, variables


def loop_forward(spec, cfg, params, batch, eps):
    """Per-agent Python-loop forward (the reference's structure), built from
    the stacked params by slicing agent a's kernel/bias out of each layer."""
    p = params["params"]
    idx_table = p["idx_emb"]["embedding"]  # [A, idx_features]

    def mlp_slice(tree, a, x):
        layers = sorted(k for k in tree if k.startswith("fc")) + ["out"]
        for name in layers:
            k = tree[name]["kernel"][a]
            b = tree[name]["bias"][a]
            x = x @ k + b
            if name != "out":
                x = jax.nn.relu(x)
        return x

    mus, lvs, aembs = [], [], []
    agent_pos = 0
    for g, ((od, ad), idxs) in enumerate(spec.groups):
        enc = p[f"encoders_{g}"]
        act_table = p[f"action_encoders_{g}"]["embedding"]  # [A_g, n_act, F]
        for local_a, global_a in enumerate(idxs):
            obs = batch.obs[g][:, local_a, :]  # [B, od]
            id_emb = jnp.broadcast_to(idx_table[global_a], (obs.shape[0], idx_table.shape[1]))
            x = jnp.concatenate([id_emb, obs], axis=-1)
            latent = mlp_slice(enc, local_a, x)
            mus.append(latent[:, : cfg.obs_features])
            lvs.append(latent[:, cfg.obs_features :])
            act = batch.actions[g][:, local_a]
            aembs.append(act_table[local_a][act])

    # reparameterize with the SAME eps tensor the vectorized model drew
    zs = [m + e * jnp.exp(0.5 * lv) for m, lv, e in zip(mus, lvs, jnp.moveaxis(eps, 1, 0))]
    z_flat = jnp.concatenate(zs, axis=-1)
    a_flat = jnp.concatenate(aembs, axis=-1)
    flat = jnp.concatenate([z_flat, a_flat], axis=-1)

    def dense_mlp(tree, x):
        layers = sorted(k for k in tree if k.startswith("fc")) + ["out"]
        for name in layers:
            x = x @ tree[name]["kernel"] + tree[name]["bias"]
            if name != "out":
                x = jax.nn.relu(x)
        return x

    recon_state = dense_mlp(p["state_decoder"], flat)
    rr = dense_mlp(p["reward_decoder"], flat)
    recon_reward = rr @ p["reward_linear"]["kernel"] + p["reward_linear"]["bias"]
    mu_all = jnp.concatenate(mus, axis=-1)
    lv_all = jnp.concatenate(lvs, axis=-1)
    return recon_state, recon_reward, mu_all, lv_all


class TestGoldenParity:
    def test_vectorized_equals_per_agent_loop(self):
        spec, cfg, model, batch, variables = build_model()
        key = jax.random.PRNGKey(7)
        out_vec = model.apply(variables, batch, None, key)

        # reproduce the eps the vectorized path drew
        B, A, F = 4, spec.n_agents, cfg.obs_features
        eps = jax.random.normal(key, (B, A, F))
        out_loop = loop_forward(spec, cfg, variables, batch, eps)

        names = ["recon_state", "recon_reward", "mu_all", "logvar_all"]
        for name, a, b in zip(names, out_vec, out_loop):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5, err_msg=name
            )

    def test_gradients_flow_to_all_params(self):
        """Every parameter (including every per-agent slice) receives a
        nonzero gradient — the invariant the torch reference silently broke
        by keeping encoders in plain dicts (torch_ver/model.py:112,114)."""
        spec, cfg, model, batch, variables = build_model()

        def loss(v):
            rs, rr, mu, lv = model.apply(v, batch, None, jax.random.PRNGKey(3))
            return jnp.sum(rs**2) + jnp.sum(rr**2) + jnp.sum(mu**2) + jnp.sum(lv**2)

        grads = jax.grad(loss)(variables)
        flat = jax.tree_util.tree_flatten_with_path(grads)[0]
        for path, g in flat:
            name = jax.tree_util.keystr(path)
            assert float(jnp.max(jnp.abs(g))) > 0.0, f"zero grad at {name}"
            if "encoders" in name and g.ndim >= 2:
                per_agent = jnp.max(jnp.abs(g.reshape(g.shape[0], -1)), axis=1)
                assert float(jnp.min(per_agent)) > 0.0, f"dead agent slice in {name}"
