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
from mfvae_tpu.models.mavae import AgentSpec, agent_order_concat
from mfvae_tpu.training.trainer import make_action_sampler, stacked_to_grouped


class EnvDynamicsModel:
    """The REAL env wrapped in the planner's imagination contract — the
    true-dynamics control arm that decomposes the planning gap to the
    scripted oracle into model error vs planner limitation (the question
    the learned-model results alone cannot answer: if the same planner
    through TRUE dynamics reaches the oracle, the learned model binds; if
    it doesn't, the planner's horizon/budget/score does).

    ``needs_state = True``: planners built on this plan from the live env
    state (a diagnostic upper bound, not a servable actor — real agents
    only have observations) and pass STACKED action plans [H, N, A(, d)]
    straight through, no grouping.  ``_rollout(state, plans)`` returns
    ``(states [H, N, Σobs], rewards [H, N, A])`` in exactly
    ``WorldModel._rollout``'s output layout (flat next-obs in grouped
    agent order via agent_order_concat, models/mavae.py), so every
    score_fn written for the learned model scores the true futures
    unchanged.  The env step key is fixed — MPE dynamics are
    deterministic (envs/mpe.py), so all candidates share common random
    numbers by construction."""

    needs_state = True

    def __init__(self, env, spec: AgentSpec):
        self.env = env
        self.spec = spec

        def _flat_obs(stacked_obs):
            grouped = tuple(
                g[None] for g in stacked_to_grouped(spec, stacked_obs)
            )
            return agent_order_concat(spec, grouped)[0]  # [Σobs]

        @jax.jit
        def _rollout(state0, plans):
            # plans: stacked [H, N, A(, d)] — one candidate per column
            def one(plan):  # [H, A(, d)]
                def step(s, a_t):
                    nobs, ns, rew, _, _ = env.step_stacked(
                        jax.random.PRNGKey(0), s, a_t
                    )
                    return ns, (_flat_obs(nobs), rew)

                _, (states, rewards) = jax.lax.scan(step, state0, plan)
                return states, rewards  # [H, Σobs], [H, A]

            return jax.vmap(one, in_axes=1, out_axes=1)(plans)

        self._rollout = _rollout


def make_mpc_actor(
    wm: WorldModel,
    env,
    spec: AgentSpec,
    horizon: int = 8,
    n_candidates: int = 64,
    plan_agents: Optional[Sequence[int]] = None,
    score_fn=None,
    factorized: bool = False,
    candidate_mode: str = "random",
):
    """Build ``act(stacked_obs, key) -> joint actions [A(, act_dim)]``.

    ``plan_agents``: agent indices whose predicted reward is maximized
    (default: all).  The returned joint action carries random components
    for the other agents — callers overwrite those with the opponents'
    real policy (scripts/mpc_study.py).

    ``score_fn(states, rewards)`` replaces the default predicted-reward
    objective over the imagined futures — ``states`` [H, N, Σobs],
    ``rewards`` [H, N, A].  It must return [N] (joint mode) or
    [N, len(plan_agents)] per-agent scores (factorized mode).  This is the
    planning hook that lets accurate STATE dynamics drive control even
    where the reward head is coarse (e.g. a distance-to-prey potential,
    scripts/mpc_study.py).

    ``factorized=True`` selects PER PLAN AGENT: agent j executes the first
    action of the candidate that maximizes ITS OWN score column.  Joint
    argmax over a many-agent team is statistically dead — the sum of ~30
    agents' outcomes over random joint plans concentrates (CLT), so the
    argmax of N candidates is noise (measured: joint MPC lands exactly on
    the random baseline, results/r4/mpc_study.json).  Factorized selection
    gives every agent its own N-way tournament.  The executed joint action
    stitches winners from different candidates — exact when agents'
    outcomes are independent, an approximation under interaction.

    ``candidate_mode='repeat'`` samples ONE action per (candidate, agent)
    and holds it for the whole horizon (constant-action plans) — the
    candidate set becomes "which direction should I commit to for H
    steps", concentrating selection pressure on direction instead of
    averaging over random walks.

    A ``wm`` with ``needs_state=True`` (EnvDynamicsModel) imagines from
    the live env state instead of the observation: call the actor as
    ``act(stacked_obs, key, state)``."""
    assert candidate_mode in ("random", "repeat"), candidate_mode
    needs_state = getattr(wm, "needs_state", False)
    sample_actions, group_actions = make_action_sampler(env, spec)
    idx = jnp.asarray(
        tuple(plan_agents) if plan_agents is not None else tuple(range(spec.n_agents))
    )
    if score_fn is None:
        if factorized:
            def score_fn(states, rewards):
                return jnp.sum(rewards[..., idx], axis=0)  # [N, P]
        else:
            def score_fn(states, rewards):
                return jnp.sum(rewards[..., idx], axis=(0, 2))  # [N]

    def act(stacked_obs, key, state=None):
        if candidate_mode == "repeat":
            first = sample_actions(key, (n_candidates,))  # [N, A(, d)]
            plans = jnp.broadcast_to(
                first[None], (horizon,) + first.shape
            )  # [H, N, A(, d)]
        else:
            plans = sample_actions(key, (horizon, n_candidates))
        if needs_state:
            assert state is not None, (
                "this planner imagines through the true dynamics "
                "(EnvDynamicsModel): call act(stacked_obs, key, state)"
            )
            states, rewards = wm._rollout(state, plans)
        else:
            obs_g = tuple(
                jnp.broadcast_to(o[None], (n_candidates,) + o.shape)
                for o in stacked_to_grouped(spec, stacked_obs)
            )
            states, rewards = wm._rollout(obs_g, group_actions(plans))
        score = score_fn(states, rewards)
        first_acts = plans[0]  # [N, A(, d)]
        if not factorized:
            return first_acts[jnp.argmax(score)]
        assert score.ndim == 2, (
            "factorized=True needs per-agent scores [N, len(plan_agents)]"
        )
        best = jnp.argmax(score, axis=0)  # [P]
        # candidate row per agent: non-plan agents take candidate 0
        n_for_agent = jnp.zeros((spec.n_agents,), jnp.int32).at[idx].set(best)
        return first_acts[n_for_agent, jnp.arange(spec.n_agents)]

    return act


def make_cem_actor(
    wm: WorldModel,
    env,
    spec: AgentSpec,
    horizon: int = 8,
    n_candidates: int = 64,
    plan_agents: Optional[Sequence[int]] = None,
    score_fn=None,
    iters: int = 3,
    elite_frac: float = 0.125,
    proposal_fn=None,
):
    """Cross-entropy-method planner (discrete actions): iteratively refit
    per-(step, agent) categorical action distributions to the elite
    candidates, re-imagine, and execute each plan agent's best-seen first
    action.  Selection is factorized per agent throughout (the joint-argmax
    pathology measured in results/r4/mpc_study.json applies to CEM too),
    so ``score_fn(states, rewards)`` must return per-agent scores
    [N, len(plan_agents)] (default: per-agent predicted-reward sums).
    Everything — ``iters`` rollout rounds included — compiles into the
    enclosing jit, so the actor drops into eval_joint_policy unchanged.

    ``proposal_fn(stacked_obs) -> [P, K] logits`` warm-starts the
    categoricals (broadcast over the horizon) instead of the uniform
    init — e.g. a distilled policy's logits (imagination.py), so the
    planner starts its search where the amortized policy already is and
    can spend fewer refit iterations per served step."""
    if not getattr(env, "discrete_actions", True):
        raise NotImplementedError(
            "make_cem_actor currently implements the discrete-action "
            "categorical CEM; use make_mpc_actor for continuous envs"
        )
    needs_state = getattr(wm, "needs_state", False)
    sample_actions, group_actions = make_action_sampler(env, spec)
    idx = jnp.asarray(
        tuple(plan_agents) if plan_agents is not None else tuple(range(spec.n_agents))
    )
    P = int(idx.shape[0])
    n_elite = max(int(n_candidates * elite_frac), 1)
    if score_fn is None:
        def score_fn(states, rewards):
            return jnp.sum(rewards[..., idx], axis=0)  # [N, P]
    # per-plan-agent action-space sizes (heterogeneous spaces: invalid
    # action ids are masked to -inf in the categorical logits)
    act_dims = jnp.asarray(spec.act_dims)[idx]  # [P]
    K = int(max(spec.act_dims))
    valid = jnp.arange(K)[None, :] < act_dims[:, None]  # [P, K]
    neg_inf = jnp.finfo(jnp.float32).min

    def act(stacked_obs, key, state=None):
        if needs_state:
            assert state is not None, (
                "this planner imagines through the true dynamics "
                "(EnvDynamicsModel): call act(stacked_obs, key, state)"
            )
            obs_g = None
        else:
            obs_g = tuple(
                jnp.broadcast_to(o[None], (n_candidates,) + o.shape)
                for o in stacked_to_grouped(spec, stacked_obs)
            )
        if proposal_fn is None:
            logits0 = jnp.where(valid[None], 0.0, neg_inf)  # [1, P, K]
        else:
            prop = jax.nn.log_softmax(proposal_fn(stacked_obs), axis=-1)
            logits0 = jnp.where(valid[None], prop[None], neg_inf)
        logits0 = jnp.broadcast_to(logits0, (horizon, P, K))

        def one_iter(i, carry):
            logits, best_score, best_first = carry
            k_i = jax.random.fold_in(key, i)
            k_plan, k_other = jax.random.split(k_i)
            # plan agents from the current categoricals: [H, N, P]
            plan_acts = jax.random.categorical(
                k_plan, logits[:, None, :, :], axis=-1,
                shape=(horizon, n_candidates, P),
            )
            # other agents stay uniform random (the eval harness's true
            # opponent process)
            full = sample_actions(k_other, (horizon, n_candidates))
            full = full.at[:, :, idx].set(plan_acts)
            if needs_state:
                states, rewards = wm._rollout(state, full)
            else:
                states, rewards = wm._rollout(obs_g, group_actions(full))
            scores = score_fn(states, rewards)  # [N, P]
            # per-agent elites -> refit that agent's [H, K] categoricals
            _, elite_n = jax.lax.top_k(scores.T, n_elite)  # [P, E]
            # elite actions for agent p: plan_acts[:, elite_n[p], p] -> [H, P, E]
            elite_acts = jnp.take_along_axis(
                jnp.moveaxis(plan_acts, 2, 1),  # [H, P, N]
                elite_n[None], axis=2,
            )
            counts = jax.nn.one_hot(elite_acts, K).sum(axis=2)  # [H, P, K]
            new_logits = jnp.where(
                valid[None], jnp.log(counts / n_elite + 1e-4), neg_inf
            )
            # track each agent's best-seen first action across iterations
            col_best = jnp.max(scores, axis=0)  # [P]
            col_arg = jnp.argmax(scores, axis=0)  # [P]
            first = plan_acts[0][col_arg, jnp.arange(P)]  # [P]
            improved = col_best > best_score
            best_score = jnp.where(improved, col_best, best_score)
            best_first = jnp.where(improved, first, best_first)
            return new_logits, best_score, best_first

        init = (
            logits0,
            jnp.full((P,), neg_inf),
            jnp.zeros((P,), jnp.int32),
        )
        _, _, best_first = jax.lax.fori_loop(0, iters, one_iter, init)
        # non-plan agents execute a uniform draw (callers overwrite anyway)
        out = sample_actions(jax.random.fold_in(key, iters))
        return out.at[idx].set(best_first)

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
