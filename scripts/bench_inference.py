#!/usr/bin/env python
"""Inference/serving benchmark: WorldModel.predict latency and throughput
on the flagship 40-agent MAVAE (single chip)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from __graft_entry__ import _flagship
    from mfvae_tpu.inference import WorldModel
    from mfvae_tpu.models.mavae import GroupedBatch

    results = {}
    for batch in (1, 64, 1024):
        spec, model, inputs = _flagship(batch_size=batch)
        variables = model.init(
            jax.random.PRNGKey(0), inputs, None, jax.random.PRNGKey(1)
        )
        wm = WorldModel(model, variables)
        s, r = wm.predict(inputs, None)
        jax.block_until_ready(s)
        n = 100
        t0 = time.perf_counter()
        for _ in range(n):
            s, r = wm.predict(inputs, None)
        jax.block_until_ready(s)
        dt = (time.perf_counter() - t0) / n
        results[batch] = dt
        print(
            f"predict batch {batch:5d}: {dt*1e3:7.3f} ms  "
            f"{batch/dt:12,.0f} predictions/s"
        )
    print(
        f"serving summary: p50-ish latency b1 {results[1]*1e3:.2f} ms, "
        f"throughput b1024 {1024/results[1024]:,.0f}/s"
    )


if __name__ == "__main__":
    main()
