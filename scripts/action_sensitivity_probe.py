#!/usr/bin/env python
"""Is the world model action-CONDITIONED or merely state-extrapolating?

Every MPC arm — joint or factorized, reward- or distance-scored, either
world model — measured AT the random baseline (results/r4/mpc_study.json).
The remaining hypothesis: the model's 0.85 delta correlation is carried by
the PASSIVE dynamics (velocity damping / persistence, which dominate
next-state deltas under random-walk collection) while the ACTION-dependent
component is ignored — in which case all imagined candidate futures are
near-identical and argmax planning is noise.

Direct measurement: from B burn-in states, roll H steps with every
adversary holding ONE constant direction (up/down/left/right; good agents
noop), through (a) the true env and (b) WorldModel.rollout.  Report the
mean displacement of each adversary's predicted self_pos per direction,
and the cross-direction separation  ‖final(d1) − final(d2)‖  for the true
vs imagined futures.  action_effect_ratio ≈ 1 → the model moves agents
where actions push them; ≈ 0 → action-blind.

Run on the TPU env: python scripts/action_sensitivity_probe.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from mfvae_tpu.inference import WorldModel  # noqa: E402
from mfvae_tpu.training.trainer import make_action_sampler, stacked_to_grouped  # noqa: E402

from unroll_study import train  # noqa: E402

H = 8
B = 64
# action ids: 0 noop, 1 left, 2 right, 3 down, 4 up (envs/mpe.py:53)
DIRS = {"left": 1, "right": 2, "down": 3, "up": 4}


def build_arm(arm: str, epochs: int):
    """Known checkpoints by name: w1 (one-step recipe), w8_clip10 (unroll
    rescue winner), pursuitWM (pursuit-collected recipe), or any
    'unrollN[_tag]' via unroll_study.train kwargs."""
    if arm == "w1":
        return train(1, epochs)
    if arm == "w8_clip10":
        return train(8, epochs, grad_clip=10.0, tag="_w8_clip10")
    if arm == "pursuitWM":
        from dynamics_recipe_study import train as train_recipe

        return train_recipe("pursuit", epochs)
    raise SystemExit(f"unknown arm {arm!r}")


def measure_action_sensitivity(exp, wm: WorldModel) -> dict:
    """The probe as a reusable measurement (also used by sticky_study.py):
    returns per-direction displacements + action_effect_ratio."""
    t0 = time.time()
    env, spec = exp.env, exp.spec
    n_adv = exp.cfg.env.num_adversaries
    n_agents = spec.n_agents
    od_adv = spec.obs_dims[0]
    sample_actions, group_actions = make_action_sampler(env, spec)

    @jax.jit
    def burn_in(key):
        def one(k):
            k0, kr = jax.random.split(k)
            obs, state = env.reset_stacked(k0)

            def step(c, kk):
                o, s = c
                ka, ks = jax.random.split(kk)
                no, ns, *_ = env.step_stacked(ks, s, sample_actions(ka))
                return (no, ns), ()

            (obs, state), _ = jax.lax.scan(
                step, (obs, state), jax.random.split(kr, 32)
            )
            return obs, state

        return jax.vmap(one)(jax.random.split(key, B))

    obs0, state0 = burn_in(jax.random.PRNGKey(77))

    def const_plan(action_id):
        acts = jnp.zeros((H, B, n_agents), jnp.int32)
        return acts.at[:, :, :n_adv].set(action_id)

    @jax.jit
    def true_roll(state, plan):
        def one(s, acts):  # acts [H, A]
            def step(s_c, a_t):
                no, ns, *_ = env.step_stacked(jax.random.PRNGKey(0), s_c, a_t)
                return ns, no

            _, obs_seq = jax.lax.scan(step, s, acts)
            return obs_seq  # stacked obs with leading [H]

        return jax.vmap(one)(state, jnp.moveaxis(plan, 1, 0))

    results = {}
    finals_true, finals_pred = {}, {}
    for dname, aid in DIRS.items():
        plan = const_plan(aid)
        # true env: final adversary positions  [B, n_adv, 2]
        obs_seq = true_roll(state0, plan)
        adv_final_true = np.asarray(tuple(obs_seq)[0][:, -1, :, 2:4])
        # imagined: states [H, B, Σobs] -> adversary self_pos slices
        states, _ = wm._rollout(
            tuple(stacked_to_grouped(spec, obs0)), group_actions(plan)
        )
        adv_obs = np.asarray(states[-1][:, : n_adv * od_adv]).reshape(
            B, n_adv, od_adv
        )
        adv_final_pred = adv_obs[:, :, 2:4]
        # start positions from the initial obs
        start = np.asarray(tuple(obs0)[0][:, :, 2:4])  # [B, n_adv, 2]
        disp_true = (adv_final_true - start).mean(axis=(0, 1))
        disp_pred = (adv_final_pred - start).mean(axis=(0, 1))
        finals_true[dname] = adv_final_true
        finals_pred[dname] = adv_final_pred
        results[dname] = {
            "true_disp": [round(float(x), 4) for x in disp_true],
            "pred_disp": [round(float(x), 4) for x in disp_pred],
        }
        print(f"[{time.time()-t0:.0f}s] {dname}: {results[dname]}", flush=True)

    # cross-direction separation of final positions
    names = list(DIRS)
    sep_t, sep_p = [], []
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            sep_t.append(float(np.linalg.norm(
                finals_true[names[i]] - finals_true[names[j]], axis=-1).mean()))
            sep_p.append(float(np.linalg.norm(
                finals_pred[names[i]] - finals_pred[names[j]], axis=-1).mean()))
    ratio = float(np.mean(sep_p) / np.mean(sep_t))
    return {
        "per_direction": results,
        "true_separation": round(float(np.mean(sep_t)), 4),
        "pred_separation": round(float(np.mean(sep_p)), 4),
        "action_effect_ratio": round(ratio, 4),
    }


def main(arm: str = "w1", epochs: int = 256):
    exp = build_arm(arm, epochs)
    wm = WorldModel(exp.model, exp.carry.train_state.params)
    out = measure_action_sensitivity(exp, wm)
    out["study"] = "action sensitivity (H=8 const plans)"
    out["arm"] = arm
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "w1",
         int(sys.argv[2]) if len(sys.argv) > 2 else 256)
