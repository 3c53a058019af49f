#!/usr/bin/env python
"""Behavior-surface breadth #2: simple_spread with plan_agents='all'.

Third scenario family for imagination training (after tag and
adversary), exercising the 'all'-agents path: every agent is controlled
by the shared policy, the objective is the model's predicted reward for
ALL agents (spread's shaped reward is dense and shared: -min-distance
coverage of the landmarks minus collision penalties), zero
scenario-specific code.  Anchor: uniform random (the scripted pursuit
policy supports tag + adversary only).

Run on the TPU env: python scripts/behavior_spread_study.py
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
    cfg.env.num_good_agents = 5  # -> num_agents (envs/mpe.py _KWARG_MAP)
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
    cfg.train.run_name = "behavior_spread"
    cfg.train.log_dir = "/tmp/behavior_spread"
    cfg.train.checkpoint_dir = "/tmp/behavior_spread/ck"
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
    # (name, algo, target_ema): the target-critic arm measures whether
    # the Dreamer stabilizer fixes the online-critic collapse
    for name, algo, ema, sym in (
        ("reinforce", "reinforce", 0.0, False),
        ("actor_critic", "actor_critic", 0.0, False),
        ("actor_critic_target", "actor_critic", 0.05, False),
        ("actor_critic_symlog", "actor_critic", 0.0, True),
        ("actor_critic_symlog_target", "actor_critic", 0.05, True),
        ("distill", "distill", 0.0, False),
    ):
        cfg.behavior.algo = algo
        cfg.behavior.target_ema = ema
        cfg.behavior.critic_symlog = sym
        res = _retry(
            lambda: train_behavior(exp, key=jax.random.PRNGKey(7)),
            label=name,
        )
        curves[name] = res.curve[-1]
        actor = make_policy_actor(res.policy, res.params, env, spec,
                                  res.plan_agents, greedy=False)

        def arm_pol(obs, state, k, actor=actor):
            return actor(obs, k)  # ALL agents from the policy

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
            # shared team reward: mean over agents, summed over time
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
        "study": "behavior surface on simple_spread (plan_agents='all', reward score)",
        "epochs": epochs, "updates": updates, "ep_len": EP_LEN,
        "n_agents": int(spec.n_agents),
        "arms": results, "final_curves": curves,
    }
    path = Path(__file__).resolve().parents[1] / "results/r4/behavior_spread.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:5]])
