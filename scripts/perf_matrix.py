#!/usr/bin/env python
"""Device-side train-step perf matrix (scan-of-steps discipline, real
host-transfer syncs — see bench.py header for why).

Measures samples/s and MFU across batch sizes and model options on the
flagship 40-agent MAVAE.  Run on the TPU env: python scripts/perf_matrix.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mfvae_tpu.config import LossConfig, ModelConfig, TrainConfig  # noqa: E402
from mfvae_tpu.data.transitions import VaeBatch  # noqa: E402
from mfvae_tpu.models.mavae import AgentSpec, GroupedBatch, MAVAE  # noqa: E402
from mfvae_tpu.training.trainer import create_train_state, make_train_step  # noqa: E402

V5E_PEAK = 197e12


def flagship_batch(spec, batch):
    rng = np.random.default_rng(0)
    obs = tuple(
        jnp.asarray(rng.normal(size=(batch, len(i), od)), jnp.float32)
        for (od, _), i in spec.groups
    )
    act = tuple(
        jnp.asarray(rng.integers(0, 5, size=(batch, len(i))))
        for (_, _), i in spec.groups
    )
    return VaeBatch(
        inputs=GroupedBatch(obs=obs, actions=act),
        next_state=jnp.asarray(rng.normal(size=(batch, sum(spec.obs_dims))), jnp.float32),
        rewards=jnp.asarray(rng.normal(size=(batch, spec.n_agents)), jnp.float32),
    )


def measure(mc: ModelConfig, batch_size: int, n_scan: int = 300, label: str = "",
            n_adv: int = 30, n_good: int = 10, n_land: int = 20):
    from mfvae_tpu.envs.mpe import SimpleTagEnv

    env = SimpleTagEnv(num_adversaries=n_adv, num_good_agents=n_good, num_obs=n_land)
    spec = AgentSpec.from_dicts(
        env.agents,
        {a: env.obs_dim(a.startswith("adversary")) for a in env.agents},
        {a: 5 for a in env.agents},
    )
    model = MAVAE.from_config(mc, spec)
    batch = flagship_batch(spec, batch_size)
    variables = model.init(
        jax.random.PRNGKey(0), batch.inputs, None, jax.random.PRNGKey(1)
    )
    state = create_train_state(model, variables, TrainConfig())
    raw_step = make_train_step(LossConfig(), use_pallas=mc.use_pallas)

    def scan_steps(state, keys):
        def body(s, k):
            s, outs = raw_step(s, batch, k)
            return s, outs.loss
        return jax.lax.scan(body, state, keys)

    scan_jit = jax.jit(scan_steps, donate_argnums=0)
    try:
        # cost_analysis counts the scan BODY once, i.e. one step's flops
        flops = float(
            scan_jit.lower(state, jax.random.split(jax.random.PRNGKey(7), n_scan))
            .compile().cost_analysis().get("flops", 0.0)
        )
    except Exception:
        flops = 0.0
    keys = jax.random.split(jax.random.PRNGKey(7), n_scan)
    state, losses = scan_jit(state, keys)
    float(losses[-1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state, losses = scan_jit(state, keys)
        float(losses[-1])
        best = min(best, time.perf_counter() - t0)
    sps = batch_size * n_scan / best
    mfu = flops * (sps / batch_size) / V5E_PEAK if flops else None
    row = {
        "label": label,
        "batch": batch_size,
        "ms_per_step": round(1000 * best / n_scan, 3),
        "samples_per_sec": round(sps, 0),
        "flops_per_step": flops,
        "mfu_pct": round(100 * mfu, 2) if mfu else None,
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    rows = []
    for b in (256, 1024, 4096):
        rows.append(measure(ModelConfig(), b, label="default_bf16"))
    rows.append(measure(ModelConfig(use_pallas=True), 256, label="pallas"))
    rows.append(measure(ModelConfig(fused_decoders=False), 256, label="separate_decoders"))
    rows.append(measure(ModelConfig(det_features=64), 256, label="det64"))
    rows.append(measure(ModelConfig(compute_dtype="float32"), 256, label="f32"))
    # population scaling: the stacked agent axis is the framework's long
    # axis; decoder input grows as (64+64)*A
    for n_adv, n_good in ((60, 20), (120, 40), (240, 80)):
        rows.append(
            measure(ModelConfig(), 256, n_scan=100,
                    label=f"agents_{n_adv + n_good}",
                    n_adv=n_adv, n_good=n_good, n_land=20)
        )
    print(json.dumps({"matrix": rows}))


if __name__ == "__main__":
    main()
