"""Worker process for the multi-host (DCN) smoke test.

Spawned by tests/test_multihost.py as 2 CPU processes x 2 virtual devices.
Each process bootstraps jax.distributed through
mfvae_tpu.parallel.mesh.init_distributed (the path that is dead code on a
single host), builds the global ('data','model') mesh, and runs ONE real
data-parallel MAVAE train step with psum'd gradients via shard_map over a
mesh that spans both processes — so the gradient reduction actually crosses
the process boundary (DCN-equivalent on CPU; on a TPU pod the same code
rides ICI/DCN).

Usage: python dcn_worker.py <process_id> <num_processes> <port>
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

import numpy as np  # noqa: E402


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

    from mfvae_tpu.parallel.mesh import DATA_AXIS, init_distributed, make_mesh

    init_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    n_global = jax.device_count()
    assert n_global == 2 * nproc, (n_global, jax.local_device_count())

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mfvae_tpu.config import LossConfig, ModelConfig, TrainConfig
    from mfvae_tpu.data.transitions import VaeBatch
    from mfvae_tpu.models.mavae import AgentSpec, GroupedBatch, MAVAE
    from mfvae_tpu.parallel.dp import make_dp_train_step
    from mfvae_tpu.training.trainer import create_train_state

    mesh = make_mesh(n_data=n_global, n_model=1)
    print(f"proc {pid}: mesh {dict(mesh.shape)}", flush=True)

    agents = ("adversary_0", "adversary_1", "agent_0", "agent_1")
    spec = AgentSpec.from_dicts(
        agents, {a: 10 if a.startswith("adv") else 8 for a in agents},
        {a: 5 for a in agents},
    )
    mc = ModelConfig(
        idx_features=8, obs_features=8, action_features=8,
        encoder_hidden=(16,), action_encoder_hidden=(8,),
        decoder_hidden=(32,), compute_dtype="float32",
    )
    model = MAVAE.from_config(mc, spec)

    batch_size = 2 * n_global
    rng = np.random.default_rng(0)  # identical data on every process

    def grouped(mk):
        obs = tuple(
            jnp.asarray(mk((batch_size, len(i), od))) for (od, _), i in spec.groups
        )
        act = tuple(
            jnp.asarray(
                rng.integers(0, 5, size=(batch_size, len(i))), jnp.int32
            )
            for (_, _), i in spec.groups
        )
        return GroupedBatch(obs=obs, actions=act)

    inputs = grouped(lambda s: rng.normal(size=s).astype(np.float32))
    host_batch = VaeBatch(
        inputs=inputs,
        next_state=jnp.asarray(
            rng.normal(size=(batch_size, sum(spec.obs_dims))), jnp.float32
        ),
        rewards=jnp.asarray(
            rng.normal(size=(batch_size, spec.n_agents)), jnp.float32
        ),
    )

    # Globalize: params replicated, batch sharded on its leading axis over
    # 'data'.  make_array_from_callback assembles per-device shards into
    # arrays spanning both processes.
    def globalize(x, pspec):
        x = np.asarray(x)
        sharding = NamedSharding(mesh, pspec)
        return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])

    variables = model.init(
        jax.random.PRNGKey(0), inputs, None, jax.random.PRNGKey(1)
    )
    state = create_train_state(model, variables, TrainConfig())
    state = jax.tree.map(
        lambda x: globalize(x, P()) if hasattr(x, "shape") else x, state
    )
    batch = jax.tree.map(lambda x: globalize(x, P(DATA_AXIS)), host_batch)

    dp_step = jax.jit(make_dp_train_step(LossConfig(), mesh))
    new_state, outs = dp_step(state, batch, jax.random.PRNGKey(2))
    loss = float(np.asarray(jax.block_until_ready(outs.loss).addressable_data(0)))
    assert np.isfinite(loss), loss
    print(f"proc {pid}: dp step loss={loss:.6f}", flush=True)

    # Cross-process agreement: every process must see the identical psum'd
    # loss and identical updated params (same logical computation).
    from jax.experimental import multihost_utils

    losses = np.asarray(multihost_utils.process_allgather(np.float32(loss)))
    assert np.allclose(losses, losses[0]), losses
    p0 = jax.tree.leaves(new_state.params)[0]
    p0_local = float(np.abs(np.asarray(p0.addressable_data(0))).sum())
    gathered = np.asarray(
        multihost_utils.process_allgather(np.float32(p0_local))
    )
    assert np.allclose(gathered, gathered[0]), gathered
    print(f"proc {pid}: OK", flush=True)


if __name__ == "__main__":
    main()
