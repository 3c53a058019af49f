#!/usr/bin/env python
"""The spread actor-critic dose-response: is the residual gap the OBJECTIVE?

PARITY.md's breadth section dissected the simple_spread actor-critic
negative down to a hypothesis: with the critic fixed (symlog) and the
bootstrap stabilized (EMA target), the remaining gap to the Monte-Carlo
algorithms (−72.9 vs REINFORCE −57.1 / distill −56.4) is the
discounted-INFINITE-horizon objective disagreeing with the task's
25-step finite team return.  That was asserted from the dissection, not
measured.  This study measures it as a dose-response on the bootstrap's
weight:

  arm            gamma  lam   bootstrap_tail   objective
  ac_boot_g95    0.95   0.95  yes              the dissected baseline (−72.9)
  ac_boot_g80    0.80   0.95  yes              tail down-weighted
  ac_boot_g50    0.50   0.95  yes              tail nearly gone
  ac_finite_mc   1.00   1.00  NO               exact finite H-step MC return
                                               + learned state-value baseline
  reinforce      —      —     —                MC comparator (per-start baseline)

If the hypothesis is right, real-env team return improves monotonically
as the infinite-horizon tail shrinks, and ac_finite_mc lands at
REINFORCE's level — the critic machinery exonerated, the objective
convicted.  If ac_finite_mc stays at −73, the objective claim is wrong
and the PARITY paragraph gets rewritten.

Run on the TPU env: python scripts/spread_objective_study.py
    [n_episodes] [chunks] [epochs] [updates]
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
from mfvae_tpu.config import ExperimentConfig  # noqa: E402
from mfvae_tpu.imagination import make_policy_actor  # noqa: E402
from mfvae_tpu.planning import eval_joint_policy  # noqa: E402
from mfvae_tpu.training.experiment import Experiment  # noqa: E402
from mfvae_tpu.training.trainer import make_action_sampler  # noqa: E402

from dreamer_iteration_study import _retry  # noqa: E402

HOLD = 0.9
EP_LEN = 25


def main(n_episodes: int = 64, chunks: int = 2, epochs: int = 256,
         updates: int = 1000):
    t0 = time.time()
    cfg = ExperimentConfig()
    cfg.env.name = "MPE_simple_spread_v3"
    cfg.env.num_good_agents = 5
    cfg.env.max_steps = EP_LEN
    cfg.model.det_features = 128
    cfg.model.residual_state = True
    cfg.model.state_skip = True
    cfg.model.decoder_layernorm = True
    cfg.model.fused_decoders = False
    cfg.loss.s_weight = 300.0
    cfg.buffer.max_size = 10240
    cfg.train.unroll_steps = 8
    cfg.train.grad_clip = 10.0
    cfg.train.epoch_num = epochs
    cfg.train.collect_policy = "sticky"
    cfg.train.collect_mix_frac = HOLD
    cfg.train.epochs_per_dispatch = 32
    cfg.train.run_name = "spread_objective"
    cfg.train.log_dir = "/tmp/spread_objective"
    cfg.train.checkpoint_dir = "/tmp/spread_objective/ck"
    cfg.train.resume = True
    cfg.behavior.score = "reward"
    cfg.behavior.plan_agents = "all"
    cfg.behavior.horizon = 8
    cfg.behavior.updates = updates
    cfg.behavior.n_starts = 64
    cfg.behavior.m_rollouts = 24
    cfg.behavior.visit_steps = 3
    cfg.validate()
    exp = Experiment(cfg).setup()
    exp.run()
    env, spec = exp.env, exp.spec
    sample_actions, _ = make_action_sampler(env, spec)
    print(f"[{time.time()-t0:.0f}s] spread WM ready "
          f"({spec.n_agents} agents)", flush=True)

    def arm_random(obs, state, k):
        return sample_actions(k)

    arms = {"random": arm_random}
    curves = {}
    # (name, algo, gamma, lam, bootstrap_tail) — symlog+target fixed at
    # the dissected-best stack for every actor-critic arm
    for name, algo, gamma, lam, boot in (
        ("reinforce", "reinforce", None, None, None),
        ("ac_boot_g95", "actor_critic", 0.95, 0.95, True),
        ("ac_boot_g80", "actor_critic", 0.80, 0.95, True),
        ("ac_boot_g50", "actor_critic", 0.50, 0.95, True),
        ("ac_finite_mc", "actor_critic", 1.00, 1.00, False),
    ):
        cfg.behavior.algo = algo
        if algo == "actor_critic":
            cfg.behavior.gamma = gamma
            cfg.behavior.lam = lam
            cfg.behavior.bootstrap_tail = boot
            cfg.behavior.target_ema = 0.05
            cfg.behavior.critic_symlog = True
        res = _retry(
            lambda: train_behavior(exp, key=jax.random.PRNGKey(7)),
            label=name,
        )
        curves[name] = res.curve[-1]
        actor = make_policy_actor(res.policy, res.params, env, spec,
                                  res.plan_agents, greedy=False)

        def arm_pol(obs, state, k, actor=actor):
            return actor(obs, k)

        arms[f"{name}:sample"] = arm_pol
        print(f"[{time.time()-t0:.0f}s] {name} trained: {res.curve[-1]}",
              flush=True)

    results = {}
    for name, pol in arms.items():
        rets = []
        for c in range(chunks):
            rewards = eval_joint_policy(
                env, spec, pol, n_episodes=n_episodes, ep_len=EP_LEN,
                key=jax.random.PRNGKey(1234 + c),
            )
            rets.append(np.asarray(jnp.sum(jnp.mean(rewards, axis=2), axis=1)))
        r = np.concatenate(rets)
        results[name] = {
            "team_return_mean": float(r.mean()),
            "team_return_sem": float(r.std(ddof=1) / np.sqrt(len(r))),
            "n_episodes": int(len(r)),
        }
        print(f"[{time.time()-t0:.0f}s] {name}: {json.dumps(results[name])}",
              flush=True)

    out = {
        "study": "spread AC objective dose-response (bootstrap weight -> return)",
        "epochs": epochs, "updates": updates, "ep_len": EP_LEN,
        "n_agents": int(spec.n_agents),
        "arms": results, "final_curves": curves,
    }
    path = Path(__file__).resolve().parents[1] / "results/r4/spread_objective.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:5]])
