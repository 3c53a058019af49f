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
