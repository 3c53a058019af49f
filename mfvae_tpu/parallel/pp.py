"""Pipeline parallelism (GPipe schedule) over a 'pipe' mesh axis.

The reference has no pipeline (or any other) parallelism (SURVEY §2.3); this
module adds the TPU-native version: each device owns one *stage* (a block of
layers), microbatches stream through the stages, and activations hop between
neighboring devices over ICI with ``jax.lax.ppermute`` inside ``shard_map``.
Autodiff composes: the transpose of ``ppermute`` is the reverse permute, so
``jax.grad`` of a pipelined forward is the reverse (backward) pipeline — no
hand-written schedule needed for training.

Scope note (honest): MAVAE's decoder is 6 small MLP layers — far below the
depth where PP beats pure DP×TP, so PP is OFF in every shipped config.  The
module exists because the framework is the scaling substrate, not just this
model: it pipelines any uniform-width layer body (the shape deep trunks
take), and the tests prove exact forward/backward equivalence with the
unpipelined computation on a CPU mesh, composed with DP on a 2-D
('data','pipe') grid.

Schedule: classic GPipe fill-drain.  For S stages and M microbatches the
loop runs T = M + S - 1 ticks; tick t has stage s compute microbatch
t - s (when 0 <= t - s < M).  Bubble fraction = (S-1)/(M+S-1), so callers
should pick M >= ~4*S.  All control flow is a ``lax.scan`` over ticks —
one compiled program, no per-tick dispatch.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PIPE_AXIS = "pipe"
DATA_AXIS = "data"


class PipelineParams(NamedTuple):
    """Stacked per-stage parameters for a uniform-width ReLU body.

    kernel: [S, L, W, W] — S stages of L layers each (leading axis sharded
            over 'pipe': each device holds only its own stage's slice)
    bias:   [S, L, W]
    """

    kernel: jnp.ndarray
    bias: jnp.ndarray

    @property
    def n_stages(self) -> int:
        return self.kernel.shape[0]

    @property
    def layers_per_stage(self) -> int:
        return self.kernel.shape[1]

    @property
    def width(self) -> int:
        return self.kernel.shape[-1]


def init_pipeline_params(
    key: jax.Array, n_stages: int, layers_per_stage: int, width: int
) -> PipelineParams:
    """Lecun-normal kernels, per (stage, layer) slice — identical in
    distribution to independently initialized Dense layers."""
    init = jax.nn.initializers.lecun_normal()
    keys = jax.random.split(key, n_stages * layers_per_stage)
    kernel = jnp.stack(
        [init(k, (width, width), jnp.float32) for k in keys]
    ).reshape(n_stages, layers_per_stage, width, width)
    bias = jnp.zeros((n_stages, layers_per_stage, width), jnp.float32)
    return PipelineParams(kernel=kernel, bias=bias)


def sequential_apply(
    params: PipelineParams, x: jnp.ndarray, activation=jax.nn.relu
) -> jnp.ndarray:
    """Ground truth: run all S*L layers in order on one device.  Used by the
    equivalence tests and as the fallback when no mesh is configured."""
    s, l = params.n_stages, params.layers_per_stage
    k = params.kernel.reshape(s * l, params.width, params.width)
    b = params.bias.reshape(s * l, params.width)
    for i in range(s * l):
        x = activation(x @ k[i] + b[i])
    return x


def _stage_block(kernel, bias, h, activation):
    """Apply one stage's L layers.  kernel [L, W, W], bias [L, W] (the local
    shard_map slice, stage axis already stripped to size 1 and squeezed)."""
    for i in range(kernel.shape[0]):
        h = activation(h @ kernel[i] + bias[i])
    return h


def pipeline_apply(
    params: PipelineParams,
    x: jnp.ndarray,
    mesh: Mesh,
    n_microbatches: int,
    activation: Callable = jax.nn.relu,
    data_parallel: bool = False,
) -> jnp.ndarray:
    """Pipelined forward of the uniform body: x [B, W] -> [B, W].

    The stage axis of ``params`` shards over mesh axis 'pipe'; with
    ``data_parallel=True`` the batch additionally shards over 'data'
    (2-D DP×PP grid) and the pipeline runs independently per data shard.
    B (per data shard) must divide by n_microbatches.  Differentiable:
    wrap in jax.grad/value_and_grad as usual.
    """
    n_stages = mesh.shape[PIPE_AXIS]
    assert params.n_stages == n_stages, (params.n_stages, n_stages)
    batch_spec = P(DATA_AXIS) if data_parallel else P()

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(PIPE_AXIS), batch_spec),
        out_specs=batch_spec,
        check_vma=False,
    )
    def run(local_params: PipelineParams, x_local: jnp.ndarray):
        kernel = local_params.kernel[0]  # [L, W, W] — this device's stage
        bias = local_params.bias[0]
        stage = jax.lax.axis_index(PIPE_AXIS)
        b, w = x_local.shape
        m = n_microbatches
        assert b % m == 0, (b, m)
        mb = x_local.reshape(m, b // m, w)

        fwd_perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
        zero = jnp.zeros((b // m, w), x_local.dtype)
        outputs0 = jnp.zeros((m, b // m, w), x_local.dtype)

        def tick(carry, t):
            state, outputs = carry
            # stage 0 ingests microbatch t (clipped: garbage past the fill
            # phase is masked out by the output-collection condition below)
            feed = mb[jnp.clip(t, 0, m - 1)]
            h = jnp.where(stage == 0, feed, state)
            out = _stage_block(kernel, bias, h, activation)
            # the last stage completes microbatch t-(S-1) at tick t
            oidx = jnp.clip(t - (n_stages - 1), 0, m - 1)
            done = (stage == n_stages - 1) & (t >= n_stages - 1)
            outputs = jnp.where(done, outputs.at[oidx].set(out), outputs)
            # hand activations to the next stage (S-1 -> 0 wraps; stage 0
            # ignores its incoming edge, so the wrap carries no information)
            state = jax.lax.ppermute(out, PIPE_AXIS, fwd_perm)
            return (state, outputs), None

        (state, outputs), _ = jax.lax.scan(
            tick, (zero, outputs0), jnp.arange(m + n_stages - 1)
        )
        # only the last stage holds real outputs; replicate across the pipe
        # (psum of a one-hot-by-stage contribution)
        outputs = jnp.where(stage == n_stages - 1, outputs, 0)
        outputs = jax.lax.psum(outputs, PIPE_AXIS)
        return outputs.reshape(b, w)

    return run(params, x)


def mlp_body_to_pipeline(params: dict, n_stages: int) -> PipelineParams:
    """Restack the uniform-width hidden body of an MLP module's param tree
    (models/layers.py naming: fc0..fcN hiddens + 'out') into stacked
    per-stage PipelineParams.

    fc0 is the input projection (in_dim -> W) and stays outside the
    pipeline; fc1..fcN form the uniform W -> W body and must split evenly
    into ``n_stages`` stages.  Returns the [S, L, W, W] / [S, L, W] stacks
    ready for ``pipeline_apply``."""
    body_names = sorted(
        (k for k in params if k.startswith("fc") and k != "fc0"),
        key=lambda s: int(s[2:]),
    )
    assert body_names, "MLP has no hidden body beyond fc0"
    assert len(body_names) % n_stages == 0, (
        f"{len(body_names)} body layers don't split into {n_stages} stages"
    )
    kernels = jnp.stack([params[n]["kernel"] for n in body_names])
    biases = jnp.stack([params[n]["bias"] for n in body_names])
    w = kernels.shape[-1]
    assert kernels.shape[-2] == w, (
        f"body is not uniform-width: {kernels.shape}"
    )
    lps = len(body_names) // n_stages
    return PipelineParams(
        kernel=kernels.reshape(n_stages, lps, w, w),
        bias=biases.reshape(n_stages, lps, w),
    )


def pipelined_mlp(
    params: dict,
    x: jnp.ndarray,
    mesh: Mesh,
    n_microbatches: int,
    activation: Callable = jax.nn.relu,
    data_parallel: bool = False,
) -> jnp.ndarray:
    """Apply a real MLP module (models/layers.py param tree: fc0..fcN +
    'out') with its uniform hidden body pipelined over the mesh 'pipe'
    axis: fc0 and the output head run replicated (they are a tiny fraction
    of the FLOPs in a deep trunk); fc1..fcN stream through the GPipe
    schedule.  Differentiable end-to-end, so a train step whose decoder
    runs through this function backpropagates through the pipeline
    (ppermute transposes to the reverse permute).

    This is the bridge that routes MAVAE's decoder trunk through PP: give
    the model a uniform deep decoder (e.g. decoder_hidden=(256,)*9) and
    decode with this instead of the in-module MLP —
    tests/test_pp.py::TestMAVAEThroughPipeline proves exact fwd/bwd
    equivalence vs the unpipelined model."""
    n_stages = mesh.shape[PIPE_AXIS]
    pp = mlp_body_to_pipeline(params, n_stages)
    h = activation(x @ params["fc0"]["kernel"] + params["fc0"]["bias"])
    h = pipeline_apply(
        pp, h, mesh, n_microbatches, activation=activation,
        data_parallel=data_parallel,
    )
    return h @ params["out"]["kernel"] + params["out"]["bias"]


def make_pipe_mesh(
    n_pipe: int,
    n_data: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """('data', 'pipe') mesh; 'pipe' innermost so activation hops ride the
    fastest ICI links (neighbor exchange dominates PP traffic)."""
    devices = list(devices if devices is not None else jax.devices())
    assert n_pipe * n_data <= len(devices), (n_pipe, n_data, len(devices))
    grid = np.array(devices[: n_pipe * n_data]).reshape(n_data, n_pipe)
    return Mesh(grid, (DATA_AXIS, PIPE_AXIS))


def pipeline_param_shardings(params: PipelineParams, mesh: Mesh) -> PipelineParams:
    """NamedShardings placing each stage's slice on its pipeline device."""
    return PipelineParams(
        kernel=NamedSharding(mesh, P(PIPE_AXIS)),
        bias=NamedSharding(mesh, P(PIPE_AXIS)),
    )
