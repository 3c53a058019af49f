#!/usr/bin/env python
"""Inference/serving benchmark: WorldModel predict latency/throughput AND
compiled k-step imagination-rollout throughput on the flagship 40-agent
MAVAE (single chip).

Measurement discipline (bench.py header): ``jax.block_until_ready`` is a
NO-OP on the axon PJRT tunnel, so every sync below is a real host scalar
fetch (``float(...)``).  Throughput rows amortize the ~35-50 ms tunnel RTT
over many dispatches; the latency row syncs per call (what a synchronous
caller sees, link RTT included).

Prints one JSON line with all rows.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from __graft_entry__ import _flagship
    from mfvae_tpu.inference import WorldModel

    HORIZON = 25
    out = {"horizon": HORIZON}
    for batch in (1, 64, 1024):
        spec, model, inputs = _flagship(batch_size=batch)
        variables = model.init(
            jax.random.PRNGKey(0), inputs, None, jax.random.PRNGKey(1)
        )
        wm = WorldModel(model, variables)

        # ---- one-step predict ----
        s, r = wm.predict(inputs, None)
        float(s[0, 0])  # compile + sync
        n = 100
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n):
                s, r = wm.predict(inputs, None)
            float(s[0, 0])
            best = min(best, time.perf_counter() - t0)
        out[f"predict_b{batch}_per_sec"] = round(batch * n / best, 1)

        if batch == 1:
            # per-call sync latency: the synchronous-caller view
            n_lat = 20
            t0 = time.perf_counter()
            for _ in range(n_lat):
                s, r = wm.predict(inputs, None)
                float(s[0, 0])
            out["predict_b1_latency_ms"] = round(
                (time.perf_counter() - t0) / n_lat * 1e3, 2
            )

        # ---- compiled k-step rollout (serving the imagination surface) ----
        rng = jax.random.PRNGKey(2)
        plan = tuple(
            jax.random.randint(
                jax.random.fold_in(rng, g),
                (HORIZON, batch, len(idxs)),
                0,
                spec.act_dims[idxs[0]],
            )
            for g, ((_, _), idxs) in enumerate(spec.groups)
        )
        states, rewards = wm._rollout(inputs.obs, plan)
        float(states[0, 0, 0])  # compile + sync
        n_roll = 30
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n_roll):
                states, rewards = wm._rollout(inputs.obs, plan)
            float(states[0, 0, 0])
            best = min(best, time.perf_counter() - t0)
        out[f"rollout{HORIZON}_b{batch}_traj_per_sec"] = round(
            batch * n_roll / best, 1
        )
        out[f"rollout{HORIZON}_b{batch}_steps_per_sec"] = round(
            batch * n_roll * HORIZON / best, 1
        )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
