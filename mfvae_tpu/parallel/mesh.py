"""Device mesh construction.

The reference queries `jax.devices()` and never uses more than one
(jax_ver/main.py:52, SURVEY §2.3).  Here the mesh is a first-class runtime
object with two axes:

- 'data'  — batch (DP): gradients psum over ICI,
- 'model' — tensor parallelism for the joint decoders and the stacked
  per-agent parameter axis.

On a multi-host slice, initialize with `jax.distributed.initialize()` before
building the mesh; axis order keeps 'model' innermost so TP collectives ride
the fastest ICI links and DP can later map onto DCN for multi-slice.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: int = -1,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data == -1:
        assert n % n_model == 0, (n, n_model)
        n_data = n // n_model
    assert n_data * n_model <= n, f"need {n_data * n_model} devices, have {n}"
    grid = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up: call once per process BEFORE building the mesh.
    On Cloud TPU pods bare `jax.distributed.initialize()` autodetects; args
    are for manual/DCN setups.  (The reference is single-process only,
    SURVEY §2.3.)"""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding."""
    return NamedSharding(mesh, P(DATA_AXIS))
