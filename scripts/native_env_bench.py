#!/usr/bin/env python
"""Host env stepping throughput: native C++ engine vs jitted-JAX fallback.

The host collection loop is the reference's hot loop (torch_ver/main.py:67-76,
128 steps/epoch at the 40-agent population).  This measures single-env and
batched stepping rates for the native engine, and the LocalHostEnv
(jitted JAX + per-step dispatch) it replaces in the fallback chain.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

POP = dict(num_good=10, num_adversaries=30, num_obstacles=20)


def bench_native_single(n_steps=2000):
    from mfvae_tpu.envs.native_engine import NativeHostEnv

    env = NativeHostEnv(**POP, max_cycles=10_000)
    env.reset(seed=0)
    rng = np.random.default_rng(0)
    acts_list = [
        {a: int(rng.integers(0, 5)) for a in env.agents} for _ in range(64)
    ]
    t0 = time.perf_counter()
    for i in range(n_steps):
        env.step(acts_list[i % 64])
    dt = time.perf_counter() - t0
    return n_steps / dt


def bench_native_batched(n_envs=64, n_steps=200, n_threads=0):
    from mfvae_tpu.envs.native_engine import NativeSimpleTagEnv

    env = NativeSimpleTagEnv(
        n_envs=n_envs, num_good_agents=POP["num_good"],
        num_adversaries=POP["num_adversaries"], num_obs=POP["num_obstacles"],
        max_steps=10_000, n_threads=n_threads,
    )
    env.reset()
    rng = np.random.default_rng(0)
    acts = rng.integers(0, 5, size=(n_steps, n_envs, env.num_agents)).astype(np.int32)
    env.step(acts[0])  # warm
    t0 = time.perf_counter()
    for i in range(n_steps):
        env.step(acts[i])
    dt = time.perf_counter() - t0
    return n_envs * n_steps / dt


def bench_local_jax(n_steps=100):
    from mfvae_tpu.envs.host_adapter import LocalHostEnv

    env = LocalHostEnv(
        "simple_tag_v3",
        POP["num_good"], POP["num_adversaries"], POP["num_obstacles"], 10_000,
    )
    env.reset(seed=0)
    rng = np.random.default_rng(0)
    acts = {a: int(rng.integers(0, 5)) for a in env.agents}
    env.step(acts)  # compile
    t0 = time.perf_counter()
    for _ in range(n_steps):
        env.step(acts)
    dt = time.perf_counter() - t0
    return n_steps / dt


def bench_scenario(make, n_envs=64, n_steps=200):
    env = make(n_envs)
    env.reset()
    rng = np.random.default_rng(0)
    acts = (
        rng.integers(0, env.action_highs[None, :], size=(n_steps, n_envs, env.num_agents))
        .astype(np.int32)
    )
    env.step(acts[0])  # warm
    t0 = time.perf_counter()
    for i in range(n_steps):
        env.step(acts[i])
    return n_envs * n_steps / (time.perf_counter() - t0)


def main():
    from mfvae_tpu.envs.native_engine import (
        NativeSimpleSpreadEnv,
        NativeSimpleWorldCommEnv,
    )

    native_1 = bench_native_single()
    native_b = bench_native_batched()
    spread_b = bench_scenario(
        lambda n: NativeSimpleSpreadEnv(n_envs=n, num_agents=3, max_steps=10_000)
    )
    wc_b = bench_scenario(
        lambda n: NativeSimpleWorldCommEnv(n_envs=n, max_steps=10_000)
    )
    jax_1 = bench_local_jax()
    print(f"native single-env (tag 40 agents):  {native_1:,.0f} steps/s")
    print(f"native batched x64 (tag):           {native_b:,.0f} env-steps/s")
    print(f"native batched x64 (spread, 3 ag):  {spread_b:,.0f} env-steps/s")
    print(f"native batched x64 (world_comm):    {wc_b:,.0f} env-steps/s")
    print(f"jax LocalHostEnv:    {jax_1:,.2f} steps/s")
    print(f"native/jax speedup:  {native_1 / jax_1:,.1f}x single, "
          f"{native_b / jax_1:,.1f}x batched")


if __name__ == "__main__":
    main()
