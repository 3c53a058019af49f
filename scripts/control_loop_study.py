#!/usr/bin/env python
"""The last mile through the control-grade model: student push + one
on-policy loop iteration (round 5).

The control-grade world model (action_delta_head + hold 0.95,
examples/world_model_control.yaml) moved the planning frontier to 92% of
the scripted oracle (CEM-i3 191,958 vs 209,133) and warm-CEM to 177.2k —
but the amortized one-forward-pass student only reached 56.7k
(results/r5/{action_delta,distill_control}.json).  With the model no
longer binding (the oracle decomposition), two questions remain:

  1. STUDENT PUSH: through the blurry round-4 model, 2x width + 2x
     updates was flat (distill_policy_w256.json) — the teacher's labels
     were the wall.  Through the SHARP model, does a 256-wide student
     with 3x updates close any of the 56.7k -> 177k amortization gap?
     (Diagnostic: the enumerated teacher's self-agreement through the
     control WM, vs 0.90 through the round-4 WM.)

  2. LOOP: retrain the control WM on its own distilled policy's
     collection (imagination:policy0, eps 0.03, hold 0.95 — the round-4
     conditioning guard) and re-plan.  Does on-policy data push uniform
     CEM past 191.9k toward the oracle, or has the loop converged?

Protocol/keys identical to the planning studies (eval PRNGKey(1234+c),
128 episodes = 4 chunks x 32 eps x 128 steps, adversary team return).

Run on the TPU env: python scripts/control_loop_study.py
    [n_episodes] [ep_len] [chunks] [epochs] [updates] [width]
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

from mfvae_tpu.behavior import save_policy, train_behavior  # noqa: E402
from mfvae_tpu.config import ExperimentConfig  # noqa: E402
from mfvae_tpu.imagination import make_policy_actor  # noqa: E402
from mfvae_tpu.inference import WorldModel  # noqa: E402
from mfvae_tpu.planning import eval_joint_policy, make_cem_actor  # noqa: E402
from mfvae_tpu.training.experiment import Experiment  # noqa: E402
from mfvae_tpu.training.trainer import (  # noqa: E402
    make_action_sampler,
    stacked_to_grouped,
)
from mfvae_tpu.envs.policies import make_collect_policy  # noqa: E402

from action_sensitivity_probe import measure_action_sensitivity  # noqa: E402
from dreamer_iteration_study import (  # noqa: E402
    HORIZON,
    _retry,
    behavior_cfg,
    teacher_consistency,
)
from sticky_study import train_sticky  # noqa: E402

HOLD = 0.95  # the control-grade conditioning guard (data side)
EPS = 0.03


def train_wm1_on_policy(policy_path: str, epochs: int) -> Experiment:
    """Control-config WM retrained on the distilled policy's collection."""
    cfg = ExperimentConfig()
    cfg.model.det_features = 128
    cfg.model.residual_state = True
    cfg.model.state_skip = True
    cfg.model.decoder_layernorm = True
    cfg.model.fused_decoders = False
    cfg.model.action_delta_head = True
    cfg.loss.s_weight = 300.0
    cfg.buffer.max_size = 10240
    cfg.train.unroll_steps = 8
    cfg.train.grad_clip = 10.0
    cfg.train.epoch_num = epochs
    cfg.train.collect_policy = f"imagination:{policy_path}"
    cfg.train.collect_epsilon = EPS
    cfg.train.collect_mix_frac = HOLD
    cfg.train.epochs_per_dispatch = 32
    cfg.train.run_name = "ctrl_loop_wm1"
    cfg.train.log_dir = "/tmp/ctrl_loop"
    cfg.train.checkpoint_dir = "/tmp/ctrl_loop/ck_wm1"
    cfg.train.resume = True
    exp = Experiment(cfg).setup()
    exp.run()
    return exp


def main(n_episodes: int = 32, ep_len: int = 128, chunks: int = 4,
         epochs: int = 256, updates: int = 3000, width: int = 256):
    t0 = time.time()

    def log(msg):
        print(f"[{time.time()-t0:.0f}s] {msg}", flush=True)

    # ---------------- WM0: the control-grade model (checkpoint-cached)
    exp0 = train_sticky(8, epochs, hold=HOLD, grad_clip=10.0,
                        tag="_adh95_w8_clip10", action_delta_head=True)
    behavior_cfg(exp0.cfg, updates)
    exp0.cfg.behavior.hidden = (width, width)
    log("WM0 (control) ready")

    wm0 = WorldModel(exp0.model, exp0.carry.train_state.params)
    diag0 = {
        "teacher_agree": _retry(lambda: teacher_consistency(exp0),
                                label="teacher_wm0"),
        "action_effect_ratio": _retry(
            lambda: measure_action_sensitivity(exp0, wm0),
            label="ratio_wm0")["action_effect_ratio"],
    }
    log(f"WM0 diag: {json.dumps(diag0)}")

    # ---------------- stage 1: pushed student (width x updates)
    res0 = _retry(lambda: train_behavior(exp0, key=jax.random.PRNGKey(7)),
                  label="policy0")
    pol_path = "/tmp/ctrl_loop/policy0.msgpack"
    save_policy(pol_path, res0, exp0.cfg.behavior,
                obs_dim=int(exp0.spec.obs_dims[0]),
                act_dim=int(exp0.spec.act_dims[0]))
    log(f"policy0 distilled (width={width}, updates={updates})")

    # ---------------- stage 2: the loop — WM1 on policy0's collection
    exp1 = train_wm1_on_policy(pol_path, epochs)
    behavior_cfg(exp1.cfg, updates)
    wm1 = WorldModel(exp1.model, exp1.carry.train_state.params)
    diag1 = {
        "teacher_agree": _retry(lambda: teacher_consistency(exp1),
                                label="teacher_wm1"),
        "action_effect_ratio": _retry(
            lambda: measure_action_sensitivity(exp1, wm1),
            label="ratio_wm1")["action_effect_ratio"],
    }
    log(f"WM1 diag: {json.dumps(diag1)}")

    # ---------------- real-env eval, fixed keys
    env, spec = exp0.env, exp0.spec
    n_adv = exp0.cfg.env.num_adversaries
    n_good = exp0.cfg.env.num_good_agents
    adv_idx = tuple(range(n_adv))
    is_adv = jnp.arange(spec.n_agents) < n_adv
    od_adv = spec.obs_dims[0]
    prey_off = 4 + 2 * exp0.cfg.env.num_obs + 2 * (n_adv - 1)
    sample_actions, _ = make_action_sampler(env, spec)
    scripted = make_collect_policy(env, spec, "pursuit", 0.0, sample_actions)

    def dist_fact(states, rewards):
        h, n = states.shape[:2]
        adv_obs = states[:, :, : n_adv * od_adv].reshape(h, n, n_adv, od_adv)
        rel = adv_obs[..., prey_off : prey_off + 2 * n_good].reshape(
            h, n, n_adv, n_good, 2
        )
        d = jnp.min(jnp.sqrt(jnp.sum(rel * rel, axis=-1) + 1e-12), axis=-1)
        return -jnp.sum(d, axis=0)

    def proposal_fn(stacked):
        return res0.policy.apply(
            res0.params, stacked_to_grouped(spec, stacked)[0][:n_adv][None]
        )[0]

    def arm_random(obs, state, k):
        return sample_actions(k)

    def arm_pursuit(obs, state, k):
        k1, k2 = jax.random.split(k)
        return jnp.where(is_adv, scripted(state, k1), sample_actions(k2))

    arms = {"random": arm_random, "oracle:pursuit": arm_pursuit}

    actor0 = make_policy_actor(res0.policy, res0.params, env, spec, adv_idx,
                               greedy=False)

    def arm_pol(obs, state, k):
        k1, k2 = jax.random.split(k)
        return jnp.where(is_adv, actor0(obs, k1), sample_actions(k2))

    arms["policy0:sample"] = arm_pol

    planner_specs = {
        "cem0_warm:i2": (wm0, 2, proposal_fn),
        "cem1_uniform:i3": (wm1, 3, None),
        "cem1_warm:i2": (wm1, 2, proposal_fn),
    }
    for name, (wm, iters, prop) in planner_specs.items():
        cem = make_cem_actor(
            wm, env, spec, horizon=HORIZON, n_candidates=256,
            plan_agents=adv_idx, score_fn=dist_fact, iters=iters,
            proposal_fn=prop,
        )

        def arm_cem(obs, state, k, cem=cem):
            k1, k2 = jax.random.split(k)
            return jnp.where(is_adv, cem(obs, k1), sample_actions(k2))

        arms[name] = arm_cem

    results = {}
    for name, pol in arms.items():
        rets = []
        for c in range(chunks):
            rewards = _retry(lambda: eval_joint_policy(
                env, spec, pol, n_episodes=n_episodes, ep_len=ep_len,
                key=jax.random.PRNGKey(1234 + c),
            ), label=f"eval_{name}_{c}")
            rets.append(np.asarray(jnp.sum(rewards[:, :, :n_adv], axis=(1, 2))))
        adv_ret = np.concatenate(rets)
        results[name] = {
            "adv_return_mean": float(adv_ret.mean()),
            "adv_return_sem": float(adv_ret.std(ddof=1) / np.sqrt(len(adv_ret))),
            "n_episodes": int(len(adv_ret)),
        }
        log(f"{name}: {json.dumps(results[name])}")

    print(json.dumps({
        "study": "control-grade last mile: pushed student + one on-policy "
                 "loop iteration",
        "hold": HOLD, "eps": EPS, "epochs": epochs, "updates": updates,
        "width": width, "horizon": HORIZON,
        "wm0_diag": diag0, "wm1_diag": diag1,
        "distill_curve_tail": [
            {k: float(v) for k, v in m.items()} for m in res0.curve[-3:]
        ],
        "anchors_prior": {
            "distill_control sampled (w128, 1k upd)": 56721.1,
            "cem_warm:i2 (w128 proposal, WM0)": 177229.7,
            "cem_uniform:i3 (WM0, action_delta.json)": 191957.8,
            "true_cem_i3": 208748.4, "oracle": 209132.8,
            "random": 36843.75,
        },
        "arms": results,
    }))


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:7]])
