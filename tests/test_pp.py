"""Pipeline parallelism: the GPipe schedule must compute EXACTLY the
unpipelined function — forward and backward — on the virtual CPU mesh
(parallel/pp.py; the reference has no parallelism of any kind, SURVEY §2.3).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mfvae_tpu.parallel.pp import (
    PipelineParams,
    init_pipeline_params,
    make_pipe_mesh,
    pipeline_apply,
    pipeline_param_shardings,
    sequential_apply,
)

S, L, W = 4, 2, 16


@pytest.fixture(scope="module")
def setup():
    params = init_pipeline_params(jax.random.PRNGKey(0), S, L, W)
    x = jax.random.normal(jax.random.PRNGKey(1), (32, W))
    return params, x


def test_forward_matches_sequential(setup):
    params, x = setup
    mesh = make_pipe_mesh(n_pipe=S)
    y_pipe = jax.jit(
        lambda p, x: pipeline_apply(p, x, mesh=mesh, n_microbatches=8)
    )(params, x)
    y_seq = sequential_apply(params, x)
    np.testing.assert_allclose(np.asarray(y_pipe), np.asarray(y_seq), atol=1e-6)


def test_forward_microbatch_count_invariance(setup):
    params, x = setup
    mesh = make_pipe_mesh(n_pipe=S)
    y4 = pipeline_apply(params, x, mesh=mesh, n_microbatches=4)
    y16 = pipeline_apply(params, x, mesh=mesh, n_microbatches=16)
    np.testing.assert_allclose(np.asarray(y4), np.asarray(y16), atol=1e-6)


def test_grad_matches_sequential(setup):
    params, x = setup
    mesh = make_pipe_mesh(n_pipe=S)
    target = jax.random.normal(jax.random.PRNGKey(2), x.shape)

    def loss_pipe(p):
        return jnp.mean((pipeline_apply(p, x, mesh=mesh, n_microbatches=8) - target) ** 2)

    def loss_seq(p):
        return jnp.mean((sequential_apply(p, x) - target) ** 2)

    l_p, g_p = jax.jit(jax.value_and_grad(loss_pipe))(params)
    l_s, g_s = jax.value_and_grad(loss_seq)(params)
    np.testing.assert_allclose(float(l_p), float(l_s), atol=1e-6)
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_dp_x_pp_grid(setup):
    """2x4 ('data','pipe') grid: batch sharded over data, stages over pipe;
    result must still equal the single-device computation."""
    params, x = setup
    mesh = make_pipe_mesh(n_pipe=S, n_data=2)
    params_s = jax.device_put(params, pipeline_param_shardings(params, mesh))
    y = jax.jit(
        lambda p, x: pipeline_apply(
            p, x, mesh=mesh, n_microbatches=4, data_parallel=True
        )
    )(params_s, x)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(sequential_apply(params, x)), atol=1e-6
    )


def test_param_shardings_place_one_stage_per_device(setup):
    params, _ = setup
    mesh = make_pipe_mesh(n_pipe=S, n_data=2)
    params_s = jax.device_put(params, pipeline_param_shardings(params, mesh))
    shard_shapes = {s.data.shape for s in params_s.kernel.addressable_shards}
    assert shard_shapes == {(1, L, W, W)}


def test_pipelined_training_matches_sequential_training():
    """Adam training through the pipeline tracks unpipelined training
    step-for-step (same inits, same data)."""
    params = init_pipeline_params(jax.random.PRNGKey(3), S, L, W)
    mesh = make_pipe_mesh(n_pipe=S)
    x = jax.random.normal(jax.random.PRNGKey(4), (64, W))
    y = jax.random.normal(jax.random.PRNGKey(5), (64, W))
    opt = optax.adam(1e-3)

    def make_step(apply_fn):
        def loss_fn(p):
            return jnp.mean((apply_fn(p, x) - y) ** 2)

        @jax.jit
        def step(p, opt_state):
            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, opt_state = opt.update(grads, opt_state, p)
            return optax.apply_updates(p, updates), opt_state, loss

        return step

    step_pipe = make_step(
        lambda p, x: pipeline_apply(p, x, mesh=mesh, n_microbatches=8)
    )
    step_seq = make_step(sequential_apply)

    p_p, o_p = params, opt.init(params)
    p_s, o_s = params, opt.init(params)
    losses_p, losses_s = [], []
    for _ in range(5):
        p_p, o_p, l_p = step_pipe(p_p, o_p)
        p_s, o_s, l_s = step_seq(p_s, o_s)
        losses_p.append(float(l_p))
        losses_s.append(float(l_s))
    np.testing.assert_allclose(losses_p, losses_s, atol=1e-5)
    assert losses_p[-1] < losses_p[0]


def test_rejects_wrong_stage_count(setup):
    params, x = setup
    mesh = make_pipe_mesh(n_pipe=2)
    with pytest.raises(AssertionError):
        pipeline_apply(params, x, mesh=mesh, n_microbatches=4)


class TestMAVAEThroughPipeline:
    """A REAL model trunk through the GPipe executor (VERDICT r2 item 6):
    MAVAE with a deliberately deepened uniform decoder
    (decoder_hidden=(32,)*5 -> fc0 projection + 4-layer uniform body + out
    head) decoded via parallel.pp.pipelined_mlp must match the unpipelined
    model exactly — outputs, ELBO, and gradients over the FULL parameter
    tree (encoders included: the backward pipeline feeds dz back through
    the latents)."""

    B, M = 16, 4  # batch, microbatches

    def _build(self):
        from mfvae_tpu.config import LossConfig, ModelConfig
        from mfvae_tpu.models.mavae import AgentSpec, GroupedBatch, MAVAE

        agents = ("agent_0", "agent_1", "agent_2")
        spec = AgentSpec.from_dicts(
            agents, {a: 6 for a in agents}, {a: 5 for a in agents}
        )
        assert spec.grouped_is_identity
        cfg = ModelConfig(
            idx_features=4, obs_features=4, action_features=3,
            encoder_hidden=(8,), decoder_hidden=(32,) * 5,
            compute_dtype="float32", fused_decoders=False,
        )
        model = MAVAE.from_config(cfg, spec)
        rng = np.random.default_rng(0)
        batch = GroupedBatch(
            obs=(jnp.asarray(rng.normal(size=(self.B, 3, 6)), jnp.float32),),
            actions=(jnp.asarray(rng.integers(0, 5, size=(self.B, 3))),),
        )
        variables = model.init(
            jax.random.PRNGKey(0), batch, None, jax.random.PRNGKey(1)
        )
        return spec, model, batch, variables

    def _pp_forward(self, model, variables, batch, call_rng, mesh):
        """MAVAE forward with BOTH decoder trunks routed through the
        pipeline (same math as MAVAE.__call__ for the identity-perm,
        private-latent, f32 case)."""
        from mfvae_tpu.parallel.pp import pipelined_mlp

        mu, logvar, aemb, _, _ = model.apply(
            variables, batch, None, method=lambda m, b, ids: m.encode(b, ids)
        )
        z = model.apply(
            variables, mu, logvar, call_rng,
            method=lambda m, mu_, lv_, k: m.reparameterize(mu_, lv_, k),
        )
        b = mu.shape[0]
        flat = jnp.concatenate([z.reshape(b, -1), aemb.reshape(b, -1)], axis=-1)
        p = variables["params"]
        recon_state = pipelined_mlp(p["state_decoder"], flat, mesh, self.M)
        rdec = pipelined_mlp(p["reward_decoder"], flat, mesh, self.M)
        recon_reward = (
            rdec @ p["reward_linear"]["kernel"] + p["reward_linear"]["bias"]
        )
        return recon_state, recon_reward, mu.reshape(b, -1), logvar.reshape(b, -1)

    def test_forward_loss_and_grads_match_unpipelined(self):
        from mfvae_tpu.config import LossConfig
        from mfvae_tpu.models.losses import elbo_losses

        spec, model, batch, variables = self._build()
        mesh = make_pipe_mesh(n_pipe=4)
        call_rng = jax.random.PRNGKey(7)
        rng = np.random.default_rng(1)
        next_state = jnp.asarray(
            rng.normal(size=(self.B, sum(spec.obs_dims))), jnp.float32
        )
        rewards = jnp.asarray(
            rng.normal(size=(self.B, spec.n_agents)), jnp.float32
        )
        loss_cfg = LossConfig(family="jax")

        def loss_ref(v):
            rs, rr, mu, lv = model.apply(v, batch, None, call_rng)
            return elbo_losses(rs, rr, next_state, rewards, mu, lv, loss_cfg).loss

        def loss_pp(v):
            rs, rr, mu, lv = self._pp_forward(model, v, batch, call_rng, mesh)
            return elbo_losses(rs, rr, next_state, rewards, mu, lv, loss_cfg).loss

        want_out = model.apply(variables, batch, None, call_rng)
        got_out = jax.jit(
            lambda v: self._pp_forward(model, v, batch, call_rng, mesh)
        )(variables)
        for g, w, name in zip(
            got_out, want_out, ("recon_state", "recon_reward", "mu", "logvar")
        ):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), atol=1e-5, err_msg=name
            )

        l_ref, g_ref = jax.jit(jax.value_and_grad(loss_ref))(variables)
        l_pp, g_pp = jax.jit(jax.value_and_grad(loss_pp))(variables)
        np.testing.assert_allclose(float(l_pp), float(l_ref), atol=1e-6)
        flat_ref = jax.tree_util.tree_flatten_with_path(g_ref)[0]
        flat_pp = jax.tree_util.tree_flatten_with_path(g_pp)[0]
        assert len(flat_ref) == len(flat_pp)
        for (pr, wv), (pp_, gv) in zip(flat_ref, flat_pp):
            assert jax.tree_util.keystr(pr) == jax.tree_util.keystr(pp_)
            np.testing.assert_allclose(
                np.asarray(gv), np.asarray(wv), atol=1e-5,
                err_msg=jax.tree_util.keystr(pr),
            )
