#!/usr/bin/env python
"""The amortization wall dissected: is it the OBSERVATION INTERFACE or
the SEARCH itself?  (round 5, behavior.centralized)

The last-mile chapter (PARITY.md, results/r5/control_loop.json) located
the cost-1 policy's wall by ELIMINATION: through the control-grade world
model the enumerated teacher self-agrees at 0.969 (not label noise) and
a 2x-width/3x-update student stays flat (not capacity) — leaving "the
decentralized observation interface" as the conjectured binding
constraint: the teacher ranks actions by per-STATE search through the
joint model, the student maps each agent's partial LOCAL observation.

That conjecture conflates two distinct mechanisms, and this study
separates them CAUSALLY with the new behavior.centralized lever
(imagination.make_obs_builder): feed each student head the FULL
flattened joint observation (exactly the information the teacher's
search conditions on) alongside its own row, same teacher, same updates,
same eval keys.

  - If the centralized student closes a large part of the 56.7k -> 177k
    distill->search gap, the wall was INFORMATION (partial observability
    at execution), and centralized execution/communication is the lever.
  - If it stays flat, the wall is the per-state SEARCH COMPUTATION:
    the planner's ranking is a function a one-forward-pass map cannot
    amortize even given the full state — the gap is then the price of
    reactive serving, full stop.

Arms (all through the control-grade WM, enumerated+CRN teacher,
identical protocol/keys to distill_control.json):
  student_dec:   centralized=False, width 128  (replication anchor)
  student_cen:   centralized=True,  width 128
  student_cen_w256: centralized=True, width 256 (information x capacity
    interaction — the joint input is ~5x wider, give it headroom)

Run on the TPU env: python scripts/centralized_student_study.py
    [n_episodes] [ep_len] [chunks] [epochs] [updates]
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

from mfvae_tpu.behavior import train_behavior  # noqa: E402
from mfvae_tpu.imagination import make_policy_actor  # noqa: E402
from mfvae_tpu.planning import eval_joint_policy  # noqa: E402
from mfvae_tpu.training.trainer import make_action_sampler  # noqa: E402
from mfvae_tpu.envs.policies import make_collect_policy  # noqa: E402

from dreamer_iteration_study import _retry, behavior_cfg  # noqa: E402
from sticky_study import train_sticky  # noqa: E402

HOLD = 0.95


def main(n_episodes: int = 32, ep_len: int = 128, chunks: int = 4,
         epochs: int = 256, updates: int = 1000):
    t0 = time.time()

    def log(msg):
        print(f"[{time.time()-t0:.0f}s] {msg}", flush=True)

    # the control-grade WM (checkpoint-cached across studies)
    exp = train_sticky(8, epochs, hold=HOLD, grad_clip=10.0,
                       tag="_adh95_w8_clip10", action_delta_head=True)
    log("control WM ready")
    env, spec = exp.env, exp.spec
    n_adv = exp.cfg.env.num_adversaries
    adv_idx = tuple(range(n_adv))
    is_adv = jnp.arange(spec.n_agents) < n_adv
    sample_actions, _ = make_action_sampler(env, spec)
    scripted = make_collect_policy(env, spec, "pursuit", 0.0, sample_actions)

    students = {}
    curves = {}
    for name, central, width in (
        ("student_dec", False, 128),
        ("student_cen", True, 128),
        ("student_cen_w256", True, 256),
    ):
        behavior_cfg(exp.cfg, updates)
        exp.cfg.behavior.hidden = (width, width)
        exp.cfg.behavior.centralized = central
        res = _retry(lambda: train_behavior(exp, key=jax.random.PRNGKey(7)),
                     label=name)
        students[name] = (res, central)
        curves[name] = [{k: float(v) for k, v in m.items()}
                        for m in res.curve[-3:]]
        log(f"{name} trained: agree={curves[name][-1]['teacher_agree']:.3f}")
    exp.cfg.behavior.centralized = False

    def arm_random(obs, state, k):
        return sample_actions(k)

    def arm_pursuit(obs, state, k):
        k1, k2 = jax.random.split(k)
        return jnp.where(is_adv, scripted(state, k1), sample_actions(k2))

    arms = {"random": arm_random, "oracle:pursuit": arm_pursuit}
    for name, (res, central) in students.items():
        for mode, greedy in (("greedy", True), ("sample", False)):
            actor = make_policy_actor(res.policy, res.params, env, spec,
                                      adv_idx, greedy=greedy,
                                      centralized=central)

            def arm_pol(obs, state, k, actor=actor):
                k1, k2 = jax.random.split(k)
                return jnp.where(is_adv, actor(obs, k1), sample_actions(k2))

            arms[f"{name}:{mode}"] = arm_pol

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
        "study": "centralized-observation student: information vs search "
                 "decomposition of the amortization wall",
        "hold": HOLD, "epochs": epochs, "updates": updates,
        "anchors_prior": {
            "distill_control sampled (dec, w128, 1k upd)": 56721.1,
            "pushed student (dec, w256, 3k upd, control_loop.json)": 52200.0,
            "cem_warm:i2 (WM0)": 177229.7,
            "cem_uniform:i3 (WM0)": 191957.8,
            "oracle": 209132.8, "random": 36843.75,
        },
        "distill_curve_tails": curves,
        "arms": results,
    }))


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:6]])
