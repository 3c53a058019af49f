"""Tensor-parallel sharding rules for MAVAE parameters.

The scaling recipe: annotate parameter and batch shardings on a
('data','model') mesh and let the XLA SPMD partitioner insert the
collectives (all-gather/reduce-scatter over ICI).  Layout choices:

- **Stacked per-agent encoder params** [A_g, in, out] shard the *agent* axis
  over 'model' — each model shard owns a subset of agents (an expert-parallel
  flavor of TP: zero communication in the encoder, since the batched einsum
  is block-diagonal over agents).
- **Joint decoders** (the FLOPs: in = (64+64)·40 = 5120 → hidden 1024, …)
  use Megatron-style column→row splits per consecutive layer pair: layer0
  kernel [in, h] shards the output dim, layer1 [h, h'] shards the input dim,
  so activations stay sharded between them and one psum materializes per
  pair.
- Everything else (embeddings, biases, reward head) replicates.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mfvae_tpu.parallel.mesh import MODEL_AXIS


def _spec_for(path: Tuple[str, ...], leaf) -> P:
    keys = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
    joined = "/".join(keys)
    # non-array leaves (e.g. TrainState.step created as a Python int) replicate
    ndim = getattr(leaf, "ndim", 0)

    # stacked per-agent kernels/biases: shard the agent axis
    if "encoders_" in joined or "action_encoders_" in joined:
        if ndim >= 2:
            return P(MODEL_AXIS, *([None] * (ndim - 1)))
        return P(MODEL_AXIS)

    # fused decoder trunk [2, in, out]: same column/row alternation on the
    # trailing matmul dims, decoder-id axis unsharded
    if "decoder_trunk" in joined and keys[-1] == "kernel":
        layer_name = keys[-2]
        if layer_name.startswith("fc"):
            i = int(layer_name[2:])
            if i % 2 == 0:
                return P(None, None, MODEL_AXIS)
            return P(None, MODEL_AXIS, None)
        # trunk 'out' layer (the last hidden layer) stays replicated —
        # divisibility of the odd widths (e.g. 5660-dim heads) isn't
        # guaranteed and the final layers are small
        return P(None, None, None)
    if "decoder_trunk" in joined and keys[-1] == "bias":
        layer_name = keys[-2]
        if layer_name.startswith("fc") and int(layer_name[2:]) % 2 == 0:
            return P(None, MODEL_AXIS)
        return P(None, None)

    # joint decoders: alternate column/row split over fc layers
    if ("state_decoder" in joined or "reward_decoder" in joined) and keys[-1] == "kernel":
        layer_name = keys[-2]  # fc0 / fc1 / ... / out
        if layer_name.startswith("fc"):
            i = int(layer_name[2:])
            if i % 2 == 0:
                return P(None, MODEL_AXIS)  # column parallel
            return P(MODEL_AXIS, None)  # row parallel
        return P(None, None)  # output head replicated
    if ("state_decoder" in joined or "reward_decoder" in joined) and keys[-1] == "bias":
        layer_name = keys[-2]
        if layer_name.startswith("fc"):
            i = int(layer_name[2:])
            if i % 2 == 0:
                return P(MODEL_AXIS)
        return P(None)

    return P(*([None] * ndim))


def mavae_param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree matching `params` (apply with jax.device_put or
    as jit in_shardings)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for(path, leaf)), params
    )


def check_divisibility(params: Any, shardings: Any) -> Dict[str, str]:
    """Report leaves whose sharded axis is not divisible by the mesh axis
    size (XLA would pad; better to know)."""
    issues = {}

    def visit(path, leaf, sh):
        spec = sh.spec
        for axis_i, name in enumerate(spec):
            if name is None:
                continue
            size = sh.mesh.shape[name] if isinstance(name, str) else 1
            if leaf.shape[axis_i] % size != 0:
                issues[jax.tree_util.keystr(path)] = (
                    f"dim {axis_i} ({leaf.shape[axis_i]}) % {name}({size}) != 0"
                )

    jax.tree_util.tree_map_with_path(visit, params, shardings)
    return issues
