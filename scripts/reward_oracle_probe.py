#!/usr/bin/env python
"""Is contact detection bounded by the reward BRANCH or by state PRECISION?

Both reward head modes AND the pred_state input measure near-chance event
AUC (results/r4/reward_head.json) — but the tag collision margin is 0.125
(ADV_SIZE + GOOD_SIZE, envs/mpe.py) while even the recipe model's one-step
position error is of comparable scale.  This probe applies the TRUE reward
function (collision counting over the adversary obs' relative-prey
vectors) to three state sources:

  1. the TRUE next state       -> AUC 1.0 by construction (sanity);
  2. the model's PREDICTED next state -> the ceiling ANY reward head could
     reach from the model's geometry; if this is near-chance, no learned
     head can fix reward-scored planning at one step;
  3. the CURRENT state (persistence) -> calibration: contacts persist, so
     a frozen detector is the model-free baseline to beat.

Run on the TPU env: python scripts/reward_oracle_probe.py [epochs]
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
from mfvae_tpu.models.mavae import GroupedBatch  # noqa: E402
from mfvae_tpu.rollout_eval import flatten_global_state  # noqa: E402
from mfvae_tpu.training.trainer import make_action_sampler  # noqa: E402
from mfvae_tpu.envs.policies import make_collect_policy  # noqa: E402

from sticky_study import train_sticky  # noqa: E402

HOLD = 0.9
CONTACT = 0.075 + 0.05  # ADV_SIZE + GOOD_SIZE (envs/mpe.py)


def auc(pred: np.ndarray, event: np.ndarray) -> float:
    n_ev = int(event.sum())
    if n_ev == 0 or n_ev == len(event):
        return float("nan")
    order = np.argsort(pred, kind="mergesort")
    ranks = np.empty(len(pred))
    ranks[order] = np.arange(1, len(pred) + 1)
    return float(
        (ranks[event].sum() - n_ev * (n_ev + 1) / 2)
        / (n_ev * (len(event) - n_ev))
    )


def oracle_auc_cells(exp, wm, n_starts: int = 256, T: int = 64) -> dict:
    """The probe as a reusable measurement (also used by
    contact_sharpness_study.py): per collection policy, the true-reward
    oracle's contact AUC on predicted vs current vs true-next geometry."""
    t0 = time.time()
    env, spec = exp.env, exp.spec
    n_adv = exp.cfg.env.num_adversaries
    n_good = exp.cfg.env.num_good_agents
    od_adv = spec.obs_dims[0]
    prey_off = 4 + 2 * exp.cfg.env.num_obs + 2 * (n_adv - 1)
    sample_actions, group_actions = make_action_sampler(env, spec)

    def oracle_reward(states):
        """TRUE tag team reward from a [B, Σobs] global state: +10 per
        (adversary, prey) pair inside the contact radius, via each
        adversary's relative-prey obs slice (averaged over the n_adv
        redundant copies of the same geometry for noise robustness)."""
        b = states.shape[0]
        adv_obs = states[:, : n_adv * od_adv].reshape(b, n_adv, od_adv)
        rel = adv_obs[:, :, prey_off : prey_off + 2 * n_good].reshape(
            b, n_adv, n_good, 2
        )
        d = jnp.sqrt(jnp.sum(rel * rel, axis=-1) + 1e-12)  # [B, adv, prey]
        return 10.0 * jnp.sum((d < CONTACT).astype(jnp.float32), axis=(1, 2))

    results = {}
    for policy in ("pursuit", "sticky"):
        pol = make_collect_policy(env, spec, policy, 0.1, sample_actions,
                                  mix_frac=HOLD)
        stateful = hasattr(pol, "init_carry")

        def one(k):
            k_reset, k_run = jax.random.split(k)
            obs, state = env.reset_stacked(k_reset)
            pc = pol.init_carry() if stateful else ()

            def step(c, kt):
                obs_c, state_c, pc_c = c
                k_act, k_step = jax.random.split(kt)
                if stateful:
                    pc_c, actions = pol.step(pc_c, obs_c, state_c, k_act)
                else:
                    actions = pol(state_c, k_act)
                nobs, nstate, rewards, done, _ = env.step_stacked(
                    k_step, state_c, actions
                )
                return (nobs, nstate, pc_c), (obs_c, actions, rewards, nobs)

            _, traj = jax.lax.scan(
                step, (obs, state, pc), jax.random.split(k_run, T)
            )
            return traj

        @jax.jit
        def collect(k):
            obs_seq, act_seq, rew_seq, nobs_seq = jax.vmap(one)(
                jax.random.split(k, n_starts)
            )
            obs_flat = tuple(o.reshape((-1,) + o.shape[2:]) for o in obs_seq)
            acts = act_seq.reshape((-1,) + act_seq.shape[2:])
            pred_state, _ = wm._predict(
                GroupedBatch(obs=obs_flat, actions=group_actions(acts))
            )
            cur_state = flatten_global_state(spec, obs_flat)
            true_next = flatten_global_state(
                spec, tuple(o.reshape((-1,) + o.shape[2:]) for o in nobs_seq)
            )
            return (
                oracle_reward(pred_state),
                oracle_reward(cur_state),
                oracle_reward(true_next),
                rew_seq.reshape((-1,) + rew_seq.shape[2:])[:, 0],  # adv team reward
            )

        pred_o, cur_o, true_o, true_r = map(
            np.asarray, jax.device_get(collect(jax.random.PRNGKey(77)))
        )
        event = true_r > 0.5
        row = {
            "event_rate": float(event.mean()),
            "auc_oracle_on_true_next": auc(true_o, event),
            "auc_oracle_on_predicted": auc(pred_o, event),
            "auc_oracle_on_current(persistence)": auc(cur_o, event),
            "corr_pred_vs_true_reward": float(
                np.corrcoef(pred_o, true_r)[0, 1]
            ),
            "corr_current_vs_true_reward": float(
                np.corrcoef(cur_o, true_r)[0, 1]
            ),
        }
        results[policy] = row
        print(f"[{time.time()-t0:.0f}s] {policy}: {json.dumps(row)}",
              flush=True)
    return results


def main(epochs: int = 256, n_starts: int = 256, T: int = 64):
    exp = train_sticky(8, epochs, hold=HOLD, grad_clip=10.0,
                       tag="_sticky90_w8_clip10")
    wm = WorldModel(exp.model, exp.carry.train_state.params)
    results = oracle_auc_cells(exp, wm, n_starts, T)

    out = {"study": "reward oracle on predicted geometry", "contact": CONTACT,
           "cells": results}
    path = Path(__file__).resolve().parents[1] / "results/r4/reward_oracle.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:4]])
