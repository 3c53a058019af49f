"""Open-loop imagination accuracy: score WorldModel.rollout as a WORLD MODEL.

The reference's model exists to predict the next global state and per-agent
rewards (reference jax_ver/model.py:184-192), yet it only ever scores
one-step reconstruction on held-out batches (jax_ver/main.py:209-227).
This module measures what the "world model" name promises: roll the model
forward k steps open-loop — feeding its own predictions back, conditioned
only on the logged action sequence — and compare against the ground-truth
environment trajectory at each horizon.

Everything is one compiled program per (policy, horizon-set):

  1. ground truth: B env trajectories of ``burn_in + T`` steps under the
     chosen action policy (random / scripted pursuit), via a vmapped
     ``lax.scan`` over the pure-JAX env — burn-in decorrelates start states
     from the reset distribution;
  2. imagination: ONE batched ``WorldModel.rollout`` from the B post-burn-in
     states under the logged [T, B] action plan;
  3. scoring: Huber(state), Huber(reward) at each horizon k (the training
     loss family, so k=1 is directly comparable to the held-out s_loss),
     plus two naive baselines that calibrate the numbers — a *frozen-world*
     predictor (state never changes from s_0, reward predicted zero) and a
     *previous-step oracle* (persistence at horizon k predicts the true
     state at k-1; the strongest model-free baseline).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mfvae_tpu.inference import WorldModel
from mfvae_tpu.models.losses import huber
from mfvae_tpu.models.mavae import AgentSpec
from mfvae_tpu.training.trainer import make_action_sampler


def _agent_slot_map(spec: AgentSpec) -> Tuple[Tuple[int, int], ...]:
    """agent index -> (group, position-in-group)."""
    slot = {}
    for g, ((_, _), idxs) in enumerate(spec.groups):
        for pos, i in enumerate(idxs):
            slot[i] = (g, pos)
    return tuple(slot[i] for i in range(spec.n_agents))


def flatten_global_state(spec: AgentSpec, obs_groups) -> jnp.ndarray:
    """Per-group obs tensors [..., A_g, od] -> global state [..., Σobs] in
    AGENT order — the exact layout the decoder reconstructs (the state
    target is the agent-order concat of next observations,
    data/transitions.vae_batch_from_grouped) and WorldModel._state_to_grouped
    re-splits."""
    slots = _agent_slot_map(spec)
    cols = [obs_groups[g][..., pos, :] for (g, pos) in slots]
    return jnp.concatenate(cols, axis=-1)


def make_rollout_accuracy_fn(
    wm: WorldModel,
    env,
    spec: AgentSpec,
    horizons: Sequence[int] = (1, 5, 25),
    n_starts: int = 256,
    burn_in: int = 32,
    policy: str = "random",
    collect_epsilon: float = 0.1,
    collect_mix_frac: float = 0.5,
):
    """Build the compiled evaluator ``fn(key) -> metrics dict``.

    Metrics (each a scalar f32, keyed per horizon k):
      state_huber/k, reward_huber/k            — the model,
      state_huber_frozen/k, reward_huber_zero/k — frozen-world baseline,
      state_huber_persist/k                     — previous-step persistence
                                                  (true state at k-1).
    A world model earns its name by beating `frozen` at every k and
    `persist` wherever the dynamics move faster than its own error grows.
    """
    horizons = tuple(int(k) for k in horizons)
    T = max(horizons)
    sample_actions, group_actions = make_action_sampler(env, spec)
    if policy == "random":
        pol = None
    else:
        from mfvae_tpu.envs.policies import make_collect_policy

        pol = make_collect_policy(
            env, spec, policy, collect_epsilon, sample_actions,
            mix_frac=collect_mix_frac,
        )
    # stateful policies (sticky, episode_mix) thread their carry through
    # the ground-truth scan; the model itself never sees the carry — only
    # the logged action sequence
    stateful = hasattr(pol, "init_carry")

    def one_traj(key):
        k_reset, k_burn, k_roll = jax.random.split(key, 3)
        obs, state = env.reset_stacked(k_reset)
        pol_c = pol.init_carry() if stateful else ()

        def step(c, k):
            obs_c, state_c, pc = c
            k_act, k_step = jax.random.split(k)
            if pol is None:
                actions = sample_actions(k_act)
            elif stateful:
                pc, actions = pol.step(pc, obs_c, state_c, k_act)
            else:
                actions = pol(state_c, k_act)
            next_obs, next_state, rewards, done, _ = env.step_stacked(
                k_step, state_c, actions
            )
            return (next_obs, next_state, pc), (actions, rewards, next_obs)

        (obs, state, pol_c), _ = jax.lax.scan(
            step, (obs, state, pol_c), jax.random.split(k_burn, burn_in)
        )
        start_obs = obs
        _, (actions, rewards, next_obs_seq) = jax.lax.scan(
            step, (obs, state, pol_c), jax.random.split(k_roll, T)
        )
        # start_obs: StackedObs; actions [T, A(, act)], rewards [T, A],
        # next_obs_seq: StackedObs with leading [T]
        return start_obs, actions, rewards, next_obs_seq

    def evaluate(key):
        start_obs, actions, rewards, next_obs_seq = jax.vmap(one_traj)(
            jax.random.split(key, n_starts)
        )
        # vmap puts B first: actions [B, T, ...] -> time-major [T, B, ...]
        actions = jnp.moveaxis(actions, 0, 1)
        gt_rewards = jnp.moveaxis(rewards, 0, 1)  # [T, B, A]
        obs0_g = tuple(start_obs)  # per-group [B, A_g, od]
        gt_states = flatten_global_state(
            spec, tuple(jnp.moveaxis(t, 0, 1) for t in next_obs_seq)
        )  # [T, B, Σobs]
        plan_g = group_actions(actions)  # per-group [T, B, A_g(, act)]
        pred_states, pred_rewards = wm._rollout(obs0_g, plan_g)

        s0 = flatten_global_state(spec, obs0_g)  # [B, Σobs]
        out = {}
        for k in horizons:
            i = k - 1
            out[f"state_huber/{k}"] = huber(pred_states[i], gt_states[i])
            out[f"reward_huber/{k}"] = huber(pred_rewards[i], gt_rewards[i])
            out[f"state_huber_frozen/{k}"] = huber(s0, gt_states[i])
            out[f"reward_huber_zero/{k}"] = huber(
                jnp.zeros_like(gt_rewards[i]), gt_rewards[i]
            )
            prev = gt_states[i - 1] if i > 0 else s0
            out[f"state_huber_persist/{k}"] = huber(prev, gt_states[i])
        return out

    return jax.jit(evaluate)


def rollout_accuracy(
    wm: WorldModel,
    env,
    spec: AgentSpec,
    key,
    horizons: Sequence[int] = (1, 5, 25),
    n_starts: int = 256,
    burn_in: int = 32,
    policy: str = "random",
    collect_epsilon: float = 0.1,
    collect_mix_frac: float = 0.5,
) -> Dict[str, float]:
    """One-call wrapper: build, run, and fetch to host floats (single
    device_get — per-scalar float() would pay the tunnel RTT per metric)."""
    fn = make_rollout_accuracy_fn(
        wm, env, spec, horizons, n_starts, burn_in, policy, collect_epsilon,
        collect_mix_frac,
    )
    out = jax.device_get(fn(key))
    return {k: float(v) for k, v in out.items()}
