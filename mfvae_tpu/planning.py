"""Model-predictive control through the serving surface.

The third consumer of the world model (after learned-policy collection and
Dyna imagination): plan actions by imagining candidate futures with
``WorldModel.rollout`` and executing the first action of the best one.
The reference pickles its model params and never loads them (SURVEY §5.4)
— planning is the capability the "world model" name promises and the
reference never cashes.

Random-shooting MPC, fully compiled:

  1. sample N candidate joint action plans of horizon H from the env's own
     action spaces (the trainer's make_action_sampler — so the planner's
     implicit opponent model is uniform-random, which is EXACT when the
     uncontrolled agents really do act uniformly, as in the eval harness);
  2. imagine all N futures in ONE batched posterior-mean rollout
     ([H, N] action plan -> [H, N, A] predicted rewards);
  3. score each candidate by the predicted return of the controlled agents
     and return the argmax plan's first joint action.

Everything is jit/vmap/scan-compatible: the actor runs inside the eval
scan (planning-in-the-loop), so a T-step episode with N candidates and
horizon H compiles to one program of T sequential steps each doing an
[N]-batched H-step imagination.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from mfvae_tpu.inference import WorldModel
from mfvae_tpu.models.mavae import AgentSpec
from mfvae_tpu.training.trainer import make_action_sampler, stacked_to_grouped


def make_mpc_actor(
    wm: WorldModel,
    env,
    spec: AgentSpec,
    horizon: int = 8,
    n_candidates: int = 64,
    plan_agents: Optional[Sequence[int]] = None,
    score_fn=None,
):
    """Build ``act(stacked_obs, key) -> joint actions [A(, act_dim)]``.

    ``plan_agents``: agent indices whose predicted reward is maximized
    (default: all).  The returned joint action carries random components
    for the other agents — callers overwrite those with the opponents'
    real policy (scripts/mpc_study.py).

    ``score_fn(states, rewards) -> [N]`` replaces the default
    predicted-reward objective (sum of plan_agents' rewards over the
    horizon) with a custom objective over the imagined futures —
    ``states`` [H, N, Σobs], ``rewards`` [H, N, A].  This is the planning
    hook that lets accurate STATE dynamics drive control even where the
    reward head is coarse (e.g. a distance-to-prey potential,
    scripts/mpc_study.py)."""
    sample_actions, group_actions = make_action_sampler(env, spec)
    idx = jnp.asarray(
        tuple(plan_agents) if plan_agents is not None else tuple(range(spec.n_agents))
    )
    if score_fn is None:
        def score_fn(states, rewards):
            return jnp.sum(rewards[..., idx], axis=(0, 2))

    def act(stacked_obs, key):
        plans = sample_actions(key, (horizon, n_candidates))  # [H, N, A(, d)]
        obs_g = tuple(
            jnp.broadcast_to(o[None], (n_candidates,) + o.shape)
            for o in stacked_to_grouped(spec, stacked_obs)
        )
        states, rewards = wm._rollout(obs_g, group_actions(plans))
        score = score_fn(states, rewards)  # [N]
        return plans[0, jnp.argmax(score)]

    return act


def eval_joint_policy(
    env,
    spec: AgentSpec,
    joint_policy,
    n_episodes: int = 16,
    ep_len: int = 64,
    key: Optional[jax.Array] = None,
):
    """Roll ``n_episodes`` real-env episodes under
    ``joint_policy(stacked_obs, env_state, key) -> actions [A]`` and return
    the reward tensor [E, T, A] (one compiled program; episodes vmapped).
    No mid-episode resets — tag episodes are fixed-length."""
    key = jax.random.PRNGKey(0) if key is None else key

    def one_ep(k):
        k0, kr = jax.random.split(k)
        obs, state = env.reset_stacked(k0)

        def step(c, kt):
            obs_c, state_c = c
            ka, ks = jax.random.split(kt)
            actions = joint_policy(obs_c, state_c, ka)
            nobs, nstate, rewards, _, _ = env.step_stacked(ks, state_c, actions)
            return (nobs, nstate), rewards

        _, rewards = jax.lax.scan(step, (obs, state), jax.random.split(kr, ep_len))
        return rewards  # [T, A]

    return jax.jit(jax.vmap(one_ep))(jax.random.split(key, n_episodes))
