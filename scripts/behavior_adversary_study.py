#!/usr/bin/env python
"""Behavior-surface breadth: does imagination training generalize beyond
simple_tag with ZERO scenario-specific code?

simple_adversary (physical deception): one adversary seeks a goal
landmark it cannot identify from its own observation (only good agents
see the goal).  Dense shaped reward (-dist(adversary, goal)) means the
env-agnostic ``behavior.score='reward'`` objective — the model's
predicted-reward head — carries real signal here, unlike tag's sparse
contacts (PARITY.md reward-head chapter).  This study trains all three
imagination algorithms through the SAME config surface
(mfvae_tpu/behavior.py) on a world model of the adversary env and scores
real adversary return against:

  random     the uniform anchor
  pursuit    the scripted goal-seek oracle — it READS the goal from env
             state, which the adversary's observation hides, so it is an
             upper anchor no observation policy can reach

Ceiling note: with random-acting good agents there is no behavioral cue
to infer the goal from, so the best an obs-policy can do is centroid
seeking — expect policy returns between random and oracle.

Run on the TPU env: python scripts/behavior_adversary_study.py
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
from mfvae_tpu.envs.policies import make_collect_policy  # noqa: E402

from dreamer_iteration_study import _retry  # noqa: E402

HOLD = 0.9
EP_LEN = 25


def main(n_episodes: int = 64, chunks: int = 2, epochs: int = 256,
         updates: int = 1000):
    t0 = time.time()
    cfg = ExperimentConfig()
    cfg.env.name = "MPE_simple_adversary_v3"
    cfg.env.num_good_agents = 3
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
    cfg.train.run_name = "behavior_adversary"
    cfg.train.log_dir = "/tmp/behavior_adversary"
    cfg.train.checkpoint_dir = "/tmp/behavior_adversary/ck"
    cfg.train.resume = True
    # env-agnostic objective: the model's own predicted-reward head
    cfg.behavior.score = "reward"
    cfg.behavior.plan_agents = "adversaries"
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
    scripted = make_collect_policy(env, spec, "pursuit", 0.0, sample_actions)
    is_adv = jnp.arange(spec.n_agents) < 1
    print(f"[{time.time()-t0:.0f}s] adversary WM ready", flush=True)

    def arm_random(obs, state, k):
        return sample_actions(k)

    def arm_pursuit(obs, state, k):
        k1, k2 = jax.random.split(k)
        return jnp.where(is_adv, scripted(state, k1), sample_actions(k2))

    arms = {"random": arm_random, "pursuit_oracle": arm_pursuit}
    curves = {}
    for algo in ("reinforce", "actor_critic", "distill"):
        cfg.behavior.algo = algo
        res = _retry(
            lambda: train_behavior(exp, key=jax.random.PRNGKey(7)),
            label=algo,
        )
        curves[algo] = res.curve[-1]
        actor = make_policy_actor(res.policy, res.params, env, spec,
                                  res.plan_agents, greedy=False)

        def arm_pol(obs, state, k, actor=actor):
            k1, k2 = jax.random.split(k)
            return jnp.where(is_adv, actor(obs, k1), sample_actions(k2))

        arms[f"{algo}:sample"] = arm_pol
        print(f"[{time.time()-t0:.0f}s] {algo} trained: {res.curve[-1]}",
              flush=True)

    results = {}
    for name, pol in arms.items():
        rets = []
        for c in range(chunks):
            rewards = eval_joint_policy(
                env, spec, pol, n_episodes=n_episodes, ep_len=EP_LEN,
                key=jax.random.PRNGKey(1234 + c),
            )
            rets.append(np.asarray(jnp.sum(rewards[:, :, 0], axis=1)))
        r = np.concatenate(rets)
        results[name] = {
            "adv_return_mean": float(r.mean()),
            "adv_return_sem": float(r.std(ddof=1) / np.sqrt(len(r))),
            "n_episodes": int(len(r)),
        }
        print(f"[{time.time()-t0:.0f}s] {name}: {json.dumps(results[name])}",
              flush=True)

    out = {
        "study": "behavior surface on simple_adversary (reward score, zero scenario code)",
        "epochs": epochs, "updates": updates, "ep_len": EP_LEN,
        "arms": results, "final_curves": curves,
    }
    path = Path(__file__).resolve().parents[1] / "results/r4/behavior_adversary.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:5]])
