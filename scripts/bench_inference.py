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

    # ---- control-surface serving cost: planners vs amortized policy ----
    # env-steps/s of each compiled actor driving REAL simple_tag episodes
    # at canonical scale (planning-in-the-loop: each env step pays the
    # actor's full imagination search).  Untrained params — throughput
    # only.
    from mfvae_tpu.envs.mpe import SimpleTagEnv
    from mfvae_tpu.imagination import PolicyMLP, make_policy_actor
    from mfvae_tpu.planning import (
        eval_joint_policy,
        make_cem_actor,
        make_mpc_actor,
    )
    from mfvae_tpu.training.trainer import make_action_sampler

    spec, model, inputs = _flagship(batch_size=1)
    variables = model.init(
        jax.random.PRNGKey(0), inputs, None, jax.random.PRNGKey(1)
    )
    wm = WorldModel(model, variables)
    env = SimpleTagEnv(num_good_agents=10, num_adversaries=30, num_obs=20)
    sample_actions, _ = make_action_sampler(env, spec)
    adv_idx = tuple(range(30))
    is_adv = jnp.arange(spec.n_agents) < 30

    def dist_fact(states, rewards):
        adv_obs = states[:, :, : 30 * spec.obs_dims[0]].reshape(
            states.shape[0], states.shape[1], 30, spec.obs_dims[0]
        )
        off = 4 + 2 * 20 + 2 * 29
        rel = adv_obs[..., off : off + 20].reshape(
            states.shape[0], states.shape[1], 30, 10, 2
        )
        d = jnp.min(jnp.sqrt(jnp.sum(rel * rel, axis=-1) + 1e-12), axis=-1)
        return -jnp.sum(d, axis=0)

    policy = PolicyMLP()
    pparams = policy.init(
        jax.random.PRNGKey(3), jnp.zeros((1, 1, spec.obs_dims[0]))
    )
    actors = {
        "mpc_shoot_n256_h8": make_mpc_actor(
            wm, env, spec, horizon=8, n_candidates=256, plan_agents=adv_idx,
            score_fn=dist_fact, factorized=True, candidate_mode="random",
        ),
        "cem_i3_n256_h8": make_cem_actor(
            wm, env, spec, horizon=8, n_candidates=256, plan_agents=adv_idx,
            score_fn=dist_fact, iters=3,
        ),
        "imagination_policy": make_policy_actor(
            policy, pparams, env, spec, adv_idx
        ),
    }

    # policy-warm-started CEM (the measured best-return config,
    # results/r4/distill_policy.json): proposal forward + 1 refit iter
    from mfvae_tpu.training.trainer import stacked_to_grouped

    def proposal_fn(stacked):
        return policy.apply(
            pparams, stacked_to_grouped(spec, stacked)[0][:30][None]
        )[0]

    actors["cem_warm_i1_n256_h8"] = make_cem_actor(
        wm, env, spec, horizon=8, n_candidates=256, plan_agents=adv_idx,
        score_fn=dist_fact, iters=1, proposal_fn=proposal_fn,
    )

    def bench_actor(actor, n_episodes=4, ep_len=32):
        def joint(obs, state, key):
            k1, k2 = jax.random.split(key)
            return jnp.where(is_adv, actor(obs, k1), sample_actions(k2))

        def run(k):
            return float(
                jnp.sum(
                    eval_joint_policy(
                        env, spec, joint, n_episodes=n_episodes,
                        ep_len=ep_len, key=k,
                    )
                )
            )

        run(jax.random.PRNGKey(0))  # compile + sync
        t0 = time.perf_counter()
        run(jax.random.PRNGKey(1))
        return n_episodes * ep_len / (time.perf_counter() - t0)

    for name, actor in actors.items():
        out[f"actor_{name}_env_steps_per_sec"] = round(bench_actor(actor), 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
