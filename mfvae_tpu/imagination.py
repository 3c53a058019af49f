"""Behavior learned INSIDE the world model: amortized imagination policies.

The planners in planning.py buy real-env return at a steep serving price —
random-shooting MPC imagines N(=256) futures per env step and the CEM
planner 3N.  This module closes the loop the other way: train a
decentralized policy network entirely inside ``WorldModel`` imagination
(REINFORCE over policy-in-the-loop imagined rollouts, per-start baselines,
no new environment interaction beyond the start states the world model was
already trained on), then serve it as ONE forward pass per step.  This is
the Dreamer recipe (learn behavior in the learned model, execute in the
real env) rebuilt on this framework's serving surface; the reference has
no inference path at all, let alone imagination training
(jax_ver/main.py:239-240 pickles params and never loads them).

Design notes (TPU-first):
- the whole update — policy-in-the-loop imagination (a ``lax.scan`` whose
  body is the jitted one-step posterior-mean predict), scoring, REINFORCE
  gradient, Adam — is ONE compiled program; start states are tiled to
  [S starts x N rollouts] so the leave-one-mean baseline is a reshape;
- actions are sampled per imagined step from the policy's categorical
  (``jax.random.categorical``), gradients flow through the log-probs only
  (score-function estimator) — no model surgery for discrete actions;
- non-plan agents act uniformly at random inside imagination, matching
  the eval harness's true opponent process (planning.py's convention).
"""

from __future__ import annotations

import warnings
from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from mfvae_tpu.inference import WorldModel
from mfvae_tpu.models.mavae import AgentSpec, GroupedBatch
from mfvae_tpu.training.trainer import make_action_sampler, stacked_to_grouped


class PolicyMLP(nn.Module):
    """Per-agent decentralized policy: own observation row -> action logits.
    Parameters are shared across the plan agents (they are homogeneous in
    every MPE family here), so one apply vectorizes over [B, P, od]."""

    hidden: Tuple[int, ...] = (128, 128)
    act_dim: int = 5

    @nn.compact
    def __call__(self, obs):
        x = obs.astype(jnp.float32)
        x = nn.LayerNorm()(x)
        for h in self.hidden:
            x = nn.relu(nn.Dense(h)(x))
        return nn.Dense(self.act_dim)(x)


class GaussianPolicyMLP(nn.Module):
    """Continuous-action policy head: obs row -> (mu, log_std) of a
    pre-squash Gaussian; actions are tanh-squashed and affinely mapped to
    the env's Box bounds (the SAC/Dreamer continuous-control convention).
    Shared across plan agents like PolicyMLP."""

    hidden: Tuple[int, ...] = (128, 128)
    act_dim: int = 5
    log_std_min: float = -5.0
    log_std_max: float = 1.0

    @nn.compact
    def __call__(self, obs):
        x = obs.astype(jnp.float32)
        x = nn.LayerNorm()(x)
        for h in self.hidden:
            x = nn.relu(nn.Dense(h)(x))
        mu = nn.Dense(self.act_dim)(x)
        log_std = jnp.clip(
            nn.Dense(self.act_dim)(x), self.log_std_min, self.log_std_max
        )
        return mu, log_std


def _tanh_affine(u, lo: float, hi: float):
    return lo + (hi - lo) * 0.5 * (jnp.tanh(u) + 1.0)


def tanh_gaussian_sample(mu, log_std, key, lo: float, hi: float):
    """Sample a = affine(tanh(u)), u ~ N(mu, std); returns (a, logp) with
    the change-of-variables correction summed over action dims."""
    std = jnp.exp(log_std)
    u = mu + std * jax.random.normal(key, mu.shape)
    a = _tanh_affine(u, lo, hi)
    base = -0.5 * (((u - mu) / std) ** 2 + 2.0 * log_std + jnp.log(2 * jnp.pi))
    # d a / d u = (hi-lo)/2 * (1 - tanh(u)^2); numerically stable form
    log_jac = (
        jnp.log((hi - lo) * 0.5)
        + 2.0 * (jnp.log(2.0) - u - jax.nn.softplus(-2.0 * u))
    )
    return a, jnp.sum(base - log_jac, axis=-1)


def gaussian_entropy(log_std):
    """Pre-squash Gaussian entropy summed over dims (the standard
    continuous entropy bonus; the squash jacobian is omitted as a
    state-independent-enough regularizer)."""
    return jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e), axis=-1)


def _box_bounds(env) -> Tuple[float, float]:
    space = env.action_space(env.agents[0])
    return float(space.low), float(space.high)


def _plan_prefix(spec: AgentSpec, plan_agents: Sequence[int]) -> int:
    """The imagination trainer assumes the plan agents are the leading
    prefix of group 0 (true for every adversary team here: agents 0..P-1
    share the adversary obs/act dims, mpe.py group layout)."""
    p = len(plan_agents)
    assert tuple(plan_agents) == tuple(range(p)), (
        "plan_agents must be the leading agent prefix (0..P-1)"
    )
    g0 = spec.groups[0][1]
    assert tuple(g0[:p]) == tuple(range(p)), (
        "plan agents must sit at the head of spec group 0"
    )
    return p


def make_obs_builder(
    spec: AgentSpec,
    plan_agents: Sequence[int],
    centralized: bool = False,
) -> Tuple[Callable, int]:
    """Policy-input builder: ``obs_fn(obs_g) -> [B, P, D]`` rows + D.

    Decentralized (default, the CTDE execution contract): each plan
    agent's own observation row, D = obs_dims[0].  ``centralized=True``
    appends the FULL flattened joint observation (every agent's row, all
    groups — the same information the planners' per-state search
    conditions on) to each agent's own row, D = obs_dims[0] + Σ obs_dims.
    The lever that causally separates the two halves of the measured
    amortization wall (PARITY.md last-mile chapter): if a centralized
    student closes the distill→search gap, the wall was the
    decentralized observation INTERFACE; if it stays flat, the wall is
    the per-state search computation itself.  Serving a centralized
    policy requires the joint observation at execution time (a
    centralized-execution deployment, or a communication channel)."""
    P = _plan_prefix(spec, plan_agents)
    od0 = int(spec.obs_dims[0])
    if not centralized:
        return (lambda obs_g: obs_g[0][:, :P]), od0
    joint_dim = int(sum(spec.obs_dims))

    def obs_fn(obs_g):
        b = obs_g[0].shape[0]
        joint = jnp.concatenate(
            [o.reshape(b, -1) for o in obs_g], axis=-1
        )  # [B, Σobs]
        joint = jnp.broadcast_to(joint[:, None, :], (b, P, joint_dim))
        return jnp.concatenate([obs_g[0][:, :P], joint], axis=-1)

    return obs_fn, od0 + joint_dim


def make_imagination_rollout(
    wm: WorldModel,
    env,
    spec: AgentSpec,
    plan_agents: Sequence[int],
    horizon: int = 8,
    obs_fn: Optional[Callable] = None,
):
    """Policy-in-the-loop imagination.  Returns
    ``rollout(params, policy_apply, obs_g, key) ->
    (states [H, B, Σobs], rewards [H, B, A], logp [H, B, P], ent [H, B, P])``
    — fully scan-compiled; gradients reach ``params`` through ``logp``/
    ``ent`` only (discrete actions).  ``obs_fn`` maps the grouped obs
    tuple to the policy's input rows [B, P, D] (default: each plan
    agent's own row; see make_obs_builder)."""
    sample_actions, group_actions = make_action_sampler(env, spec)
    P = _plan_prefix(spec, plan_agents)
    if obs_fn is None:
        obs_fn, _ = make_obs_builder(spec, plan_agents)
    discrete = getattr(env, "discrete_actions", True)
    if not discrete:
        lo, hi = _box_bounds(env)

    def rollout(params, policy_apply, obs_g, key):
        b = obs_g[0].shape[0]

        def step(carry_obs, k_t):
            k_plan, k_other = jax.random.split(k_t)
            if discrete:
                logits = policy_apply(params, obs_fn(carry_obs))  # [B,P,K]
                logits = jax.nn.log_softmax(logits, axis=-1)
                acts_p = jax.random.categorical(k_plan, logits)  # [B, P]
                logp = jnp.take_along_axis(
                    logits, acts_p[..., None], axis=-1
                )[..., 0]  # [B, P]
                ent = -jnp.sum(jnp.exp(logits) * logits, axis=-1)  # [B, P]
            else:
                mu, log_std = policy_apply(params, obs_fn(carry_obs))
                acts_p, logp = tanh_gaussian_sample(mu, log_std, k_plan,
                                                    lo, hi)
                ent = gaussian_entropy(log_std)
            full = sample_actions(k_other, (b,))  # [B, A(, d)]
            full = full.at[:, :P].set(acts_p)
            ns, rw = wm._predict(
                GroupedBatch(obs=carry_obs, actions=group_actions(full))
            )
            return wm._state_to_grouped(ns), (ns, rw, logp, ent)

        _, (states, rewards, logp, ent) = jax.lax.scan(
            step, obs_g, jax.random.split(key, horizon)
        )
        return states, rewards, logp, ent

    return rollout


def make_imagination_trainer(
    wm: WorldModel,
    env,
    spec: AgentSpec,
    plan_agents: Sequence[int],
    score_fn: Optional[Callable] = None,
    horizon: int = 8,
    n_rollouts: int = 16,
    learning_rate: float = 3e-4,
    entropy_coef: float = 1e-2,
    hidden: Tuple[int, ...] = (128, 128),
    centralized: bool = False,
) -> Tuple[PolicyMLP, Callable, Callable]:
    """Build the compiled REINFORCE update over imagined futures.

    ``score_fn(states [H, B, Σobs], rewards [H, B, A]) -> [B, P]`` per-agent
    scores (default: each plan agent's predicted-reward sum — use a
    distance potential where the reward head is coarse, scripts/
    mpc_study.py's lesson).  Each optimizer step tiles S start states
    ``n_rollouts`` times, imagines S*N futures under the current policy,
    and ascends d/dθ E[score]: advantage = per-start score minus the
    per-start mean over the N rollouts (leave-one-mean baseline),
    normalized per start, times the trajectory log-prob, plus an entropy
    bonus.

    Returns ``(policy, init_fn, update_fn)``:
      init_fn(key, example_obs_row [od]) -> (params, opt_state)
      update_fn(params, opt_state, obs_starts_g, key)
        -> (params, opt_state, metrics) — obs_starts_g is a per-group
        tuple [S, A_g, od] of REAL start observations (e.g. from the same
        collection the world model trained on)."""
    P = _plan_prefix(spec, plan_agents)
    act_dim = int(spec.act_dims[0])
    if getattr(env, "discrete_actions", True):
        policy = PolicyMLP(hidden=tuple(hidden), act_dim=act_dim)
    else:
        policy = GaussianPolicyMLP(hidden=tuple(hidden), act_dim=act_dim)
    obs_fn, obs_dim = make_obs_builder(spec, plan_agents, centralized)
    rollout = make_imagination_rollout(
        wm, env, spec, plan_agents, horizon, obs_fn=obs_fn
    )
    idx = jnp.arange(P)
    if score_fn is None:
        def score_fn(states, rewards):
            return jnp.sum(rewards[..., idx], axis=0)  # [B, P]

    tx = optax.adam(learning_rate)

    def init_fn(key, example_obs_row):
        if centralized:
            # param shapes depend on the centralized input width, not the
            # caller's per-agent example row (init values are row-agnostic)
            example_obs_row = jnp.zeros((obs_dim,), jnp.float32)
        params = policy.init(key, example_obs_row[None, None, :])
        return params, tx.init(params)

    def loss_fn(params, obs_g, key):
        states, rewards, logp, ent = rollout(params, policy.apply, obs_g, key)
        score = score_fn(states, rewards)  # [B=S*N, P]
        s = score.shape[0] // n_rollouts
        score = score.reshape(s, n_rollouts, P)
        adv = score - jnp.mean(score, axis=1, keepdims=True)
        adv = adv / (jnp.std(score, axis=1, keepdims=True) + 1e-6)
        logp_sum = jnp.sum(logp, axis=0).reshape(s, n_rollouts, P)
        pg = -jnp.mean(jax.lax.stop_gradient(adv) * logp_sum)
        ent_mean = jnp.mean(ent)
        return pg - entropy_coef * ent_mean, {
            "score_mean": jnp.mean(score),
            "entropy": ent_mean,
            "pg_loss": pg,
        }

    @jax.jit
    def update_fn(params, opt_state, obs_starts_g, key):
        # tile each start n_rollouts times: [S, ...] -> [S*N, ...]
        obs_g = tuple(
            jnp.repeat(o, n_rollouts, axis=0) for o in obs_starts_g
        )
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, obs_g, key
        )
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, metrics

    return policy, init_fn, update_fn


def make_selfplay_rollout(
    wm: WorldModel,
    env,
    spec: AgentSpec,
    horizon: int = 8,
):
    """Two-TEAM policy-in-the-loop imagination (round 5): every agent acts
    from its own team's policy — no random placeholders — so adversarial
    behavior can be learned inside the same world model from both sides.
    Teams are the spec's two agent groups (simple_tag: group 0 =
    adversaries, group 1 = good agents); each policy reads its own group's
    observations.  Discrete actions only.

    Returns ``rollout(params_a, apply_a, params_b, apply_b, obs_g, key) ->
    (states [H, B, Σobs], rewards [H, B, A],
     (logp_a [H, B, Ga], ent_a), (logp_b [H, B, Gb], ent_b))`` —
    fully scan-compiled; each team's gradients reach its params through
    its own logp/ent only."""
    assert len(spec.groups) == 2, (
        f"self-play imagination needs exactly two agent groups (teams), "
        f"spec has {len(spec.groups)}"
    )
    assert getattr(env, "discrete_actions", True), (
        "self-play imagination is discrete-actions only"
    )
    _, group_actions = make_action_sampler(env, spec)
    idx_a = jnp.asarray(spec.groups[0][1])
    idx_b = jnp.asarray(spec.groups[1][1])
    n_agents = spec.n_agents

    def _team_step(apply_fn, params, obs_team, k):
        logits = jax.nn.log_softmax(apply_fn(params, obs_team), axis=-1)
        acts = jax.random.categorical(k, logits)  # [B, G]
        logp = jnp.take_along_axis(logits, acts[..., None], axis=-1)[..., 0]
        ent = -jnp.sum(jnp.exp(logits) * logits, axis=-1)
        return acts, logp, ent

    def rollout(params_a, apply_a, params_b, apply_b, obs_g, key):
        b = obs_g[0].shape[0]

        def step(carry_obs, k_t):
            k_a, k_b = jax.random.split(k_t)
            acts_a, logp_a, ent_a = _team_step(
                apply_a, params_a, carry_obs[0], k_a
            )
            acts_b, logp_b, ent_b = _team_step(
                apply_b, params_b, carry_obs[1], k_b
            )
            stacked = (
                jnp.zeros((b, n_agents), jnp.int32)
                .at[:, idx_a].set(acts_a)
                .at[:, idx_b].set(acts_b)
            )
            ns, rw = wm._predict(
                GroupedBatch(obs=carry_obs, actions=group_actions(stacked))
            )
            return wm._state_to_grouped(ns), (
                ns, rw, logp_a, ent_a, logp_b, ent_b
            )

        _, (states, rewards, logp_a, ent_a, logp_b, ent_b) = jax.lax.scan(
            step, obs_g, jax.random.split(key, horizon)
        )
        return states, rewards, (logp_a, ent_a), (logp_b, ent_b)

    return rollout


def make_selfplay_trainer(
    wm: WorldModel,
    env,
    spec: AgentSpec,
    score_a_fn: Callable,
    score_b_fn: Callable,
    horizon: int = 8,
    n_rollouts: int = 16,
    learning_rate: float = 3e-4,
    entropy_coef: float = 1e-2,
    hidden: Tuple[int, ...] = (128, 128),
):
    """Alternating best-response REINFORCE for BOTH teams inside the same
    imagination (round 5 stretch: the capability no reference leg hints
    at).  Each update trains ONE team's policy while the other is frozen
    (the frozen side still acts — only the training side's log-probs carry
    gradient).  Same leave-one-mean baseline + per-start normalization as
    make_imagination_trainer.

    ``score_X_fn(states [H, B, Σobs], rewards [H, B, A]) -> [B, G_X]``
    per-agent scores for team X (A-team = group 0, B-team = group 1; on
    tag: adversaries minimize prey distance, prey maximize it).

    Returns ``(policy_a, policy_b, init_fn, update_a_fn, update_b_fn)``:
      init_fn(key, obs_row_a [od_a], obs_row_b [od_b])
        -> ((params_a, opt_a), (params_b, opt_b))
      update_X_fn(params_X, opt_X, params_other, obs_starts_g, key)
        -> (params_X, opt_X, metrics)"""
    act_a = int(spec.act_dims[spec.groups[0][1][0]])
    act_b = int(spec.act_dims[spec.groups[1][1][0]])
    policy_a = PolicyMLP(hidden=tuple(hidden), act_dim=act_a)
    policy_b = PolicyMLP(hidden=tuple(hidden), act_dim=act_b)
    rollout = make_selfplay_rollout(wm, env, spec, horizon)
    tx = optax.adam(learning_rate)

    def init_fn(key, obs_row_a, obs_row_b):
        k1, k2 = jax.random.split(key)
        pa = policy_a.init(k1, obs_row_a[None, None, :])
        pb = policy_b.init(k2, obs_row_b[None, None, :])
        return (pa, tx.init(pa)), (pb, tx.init(pb))

    def _pg_loss(score, logp, ent):
        # score [B, G], logp [H, B, G] -> leave-one-mean REINFORCE
        s = score.shape[0] // n_rollouts
        g = score.shape[-1]
        score = score.reshape(s, n_rollouts, g)
        adv = score - jnp.mean(score, axis=1, keepdims=True)
        adv = adv / (jnp.std(score, axis=1, keepdims=True) + 1e-6)
        logp_sum = jnp.sum(logp, axis=0).reshape(s, n_rollouts, g)
        pg = -jnp.mean(jax.lax.stop_gradient(adv) * logp_sum)
        ent_mean = jnp.mean(ent)
        return pg - entropy_coef * ent_mean, {
            "score_mean": jnp.mean(score),
            "entropy": ent_mean,
            "pg_loss": pg,
        }

    def _make_update(train_a: bool):
        def loss_fn(params_train, params_frozen, obs_g, key):
            if train_a:
                states, rewards, (logp, ent), _ = rollout(
                    params_train, policy_a.apply,
                    jax.lax.stop_gradient(params_frozen), policy_b.apply,
                    obs_g, key,
                )
                score = score_a_fn(states, rewards)
            else:
                states, rewards, _, (logp, ent) = rollout(
                    jax.lax.stop_gradient(params_frozen), policy_a.apply,
                    params_train, policy_b.apply,
                    obs_g, key,
                )
                score = score_b_fn(states, rewards)
            return _pg_loss(score, logp, ent)

        @jax.jit
        def update_fn(params_train, opt_state, params_frozen, obs_starts_g,
                      key):
            obs_g = tuple(
                jnp.repeat(o, n_rollouts, axis=0) for o in obs_starts_g
            )
            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params_train, params_frozen, obs_g, key)
            updates, new_opt = tx.update(grads, opt_state, params_train)
            return optax.apply_updates(params_train, updates), new_opt, metrics

        return update_fn

    return policy_a, policy_b, init_fn, _make_update(True), _make_update(False)


def make_team_actor(
    policy: PolicyMLP,
    params,
    spec: AgentSpec,
    group: int,
    greedy: bool = False,
):
    """Serve ONE team's self-play policy: ``act(stacked_obs, key) ->
    [G_group]`` actions for that group's agents from its own observations
    (discrete).  Compose per team inside an eval_joint_policy arm — e.g.
    adversaries from the self-play A policy, prey from B or scripted."""

    def act(stacked_obs, key):
        obs_g = stacked_to_grouped(spec, stacked_obs)
        logits = policy.apply(params, obs_g[group][None])[0]  # [G, K]
        if greedy:
            return jnp.argmax(logits, axis=-1)
        return jax.random.categorical(key, logits)

    return act


class ValueMLP(nn.Module):
    """Per-agent value head: own observation row -> scalar V̂ (shared
    params across the homogeneous plan agents, like PolicyMLP)."""

    hidden: Tuple[int, ...] = (128, 128)

    @nn.compact
    def __call__(self, obs):
        x = obs.astype(jnp.float32)
        x = nn.LayerNorm()(x)
        for h in self.hidden:
            x = nn.relu(nn.Dense(h)(x))
        return nn.Dense(1)(x)[..., 0]


def symlog(x):
    return jnp.sign(x) * jnp.log1p(jnp.abs(x))


def symexp(x):
    return jnp.sign(x) * jnp.expm1(jnp.abs(x))


def lambda_returns(rewards, values_next, gamma: float, lam: float):
    """TD(λ) targets over an imagined trajectory, scanned from the end.

    ``rewards`` [H, ...] = r_t for transitions t = 0..H-1;
    ``values_next`` [H, ...] = V̂(s_{t+1}) (the LAST entry bootstraps the
    tail beyond the imagination horizon).  Returns G [H, ...] with
    G_t = r_t + γ[(1-λ)·V̂(s_{t+1}) + λ·G_{t+1}], G_{H-1} = r_{H-1} +
    γ·V̂(s_H) — the Dreamer behavior-learning target, which is what lets
    an H-step imagination see past H steps."""

    def step(g_next, rv):
        r_t, v_t1 = rv
        g_t = r_t + gamma * ((1.0 - lam) * v_t1 + lam * g_next)
        return g_t, g_t

    g_last = rewards[-1] + gamma * values_next[-1]
    _, gs = jax.lax.scan(
        step, g_last, (rewards[:-1], values_next[:-1]), reverse=True
    )
    return jnp.concatenate([gs, g_last[None]], axis=0)


def make_actor_critic_trainer(
    wm: WorldModel,
    env,
    spec: AgentSpec,
    plan_agents: Sequence[int],
    step_score_fn: Optional[Callable] = None,
    horizon: int = 8,
    n_rollouts: int = 16,
    learning_rate: float = 3e-4,
    entropy_coef: float = 1e-2,
    value_coef: float = 0.5,
    gamma: float = 0.95,
    lam: float = 0.95,
    hidden: Tuple[int, ...] = (128, 128),
    target_ema: float = 0.0,
    critic_symlog: bool = False,
    bootstrap_tail: bool = True,
    critic_time_feature: bool = False,
    centralized: bool = False,
) -> Tuple[PolicyMLP, ValueMLP, Callable, Callable]:
    """Dreamer-style actor-critic entirely inside imagination.

    The REINFORCE trainer's per-start Monte-Carlo baseline caps the
    policy's sight at the rollout horizon (and the planners' search does
    too); a learned critic bootstraps the value of the horizon's LAST
    imagined state into every step's target, so H=8 imagination trains
    against an effectively infinite discounted objective.  Per update
    (one compiled program): policy-in-the-loop rollout from tiled real
    start states → per-step per-agent rewards via ``step_score_fn(states
    [H,B,Σobs], rewards [H,B,A]) -> [H,B,P]`` (default: the plan agents'
    predicted-reward columns; use a dense distance potential where the
    reward head is coarse) → TD(λ) targets (``lambda_returns``) →
    REINFORCE on batch-normalized advantages + entropy bonus + critic
    Huber regression, one Adam over both networks.

    ``target_ema > 0`` adds a TARGET critic (EMA of the online critic at
    that rate) used for the λ-return bootstrap and the advantage
    baseline — the Dreamer stabilizer for the measured failure mode where
    the online critic's bias feeds back through its own bootstrap and
    the policy collapses onto over-valued states (simple_spread honest
    negative, PARITY.md breadth section).

    ``critic_symlog`` regresses the critic in symlog space
    (v̂ predicts symlog(G), decoded by symexp for bootstrapping) — the
    DreamerV3 remedy for dense large-magnitude returns, where a δ=1
    Huber on raw returns (|G| ~ 100 on spread) saturates to a constant
    gradient and the critic never learns to ORDER states.

    ``bootstrap_tail=False`` zeroes the γ·V̂(s_H) tail beyond the
    imagination horizon, making the objective the FINITE H-step
    (discounted) return while keeping the learned critic as a
    variance-reduction baseline.  With ``gamma=1, lam=1`` this is
    exactly REINFORCE's Monte-Carlo objective with a state-value
    baseline — the arm that isolates whether an actor-critic failure is
    the infinite-horizon OBJECTIVE (the spread hypothesis, PARITY.md
    breadth section) or the critic machinery itself.  NOTE: with
    ``lam < 1`` the intermediate (1−λ)·V̂ terms still bootstrap from the
    critic, so the objective is NOT the pure finite-horizon return —
    set ``lam=1`` for that (warned at construction).

    ``critic_time_feature`` appends normalized time-remaining
    ((H−t)/H) to the critic's input.  Under ``bootstrap_tail=False``
    the regression target for the same state differs by its position in
    the horizon (the remaining H−t step return), which a
    time-independent critic can only fit as a per-state mean over
    horizons; the extra feature lets it represent the finite-horizon
    value exactly.  Default off: it changes the critic's input width
    (saved 'v' params are not interchangeable across the flag).

    Returns ``(policy, value, init_fn, update_fn)``; ``init_fn(key,
    example_obs_row) -> (params, opt_state)`` with params =
    {'pi': ..., 'v': ...} (+ 'v_target' when target_ema > 0);
    ``update_fn(params, opt_state, obs_starts_g, key) -> (params,
    opt_state, metrics)`` — same surface as the other imagination
    trainers, so make_policy_actor serves params['pi'] unchanged."""
    if not bootstrap_tail and lam < 1.0:
        warnings.warn(
            "bootstrap_tail=False with lam<1 is NOT the pure finite-"
            "horizon objective: intermediate (1-lam)*V terms still "
            "bootstrap from the critic. Set lam=1 for the Monte-Carlo "
            "finite-H return (the spread-study MC arm does)."
        )
    P = _plan_prefix(spec, plan_agents)
    act_dim = int(spec.act_dims[0])
    if getattr(env, "discrete_actions", True):
        policy = PolicyMLP(hidden=tuple(hidden), act_dim=act_dim)
    else:
        policy = GaussianPolicyMLP(hidden=tuple(hidden), act_dim=act_dim)
    value = ValueMLP(hidden=tuple(hidden))
    obs_fn, obs_dim = make_obs_builder(spec, plan_agents, centralized)

    def _critic_obs(obs_seq):
        # [H+1, B, P, od] -> optionally append normalized time remaining
        # ((H-t)/H: 1 at the start state, 0 at the horizon's last state)
        if not critic_time_feature:
            return obs_seq
        hp1 = obs_seq.shape[0]
        tr = jnp.arange(hp1 - 1, -1, -1, dtype=obs_seq.dtype) / max(hp1 - 1, 1)
        tr = jnp.broadcast_to(
            tr[:, None, None, None], obs_seq.shape[:-1] + (1,)
        )
        return jnp.concatenate([obs_seq, tr], axis=-1)
    rollout = make_imagination_rollout(
        wm, env, spec, plan_agents, horizon, obs_fn=obs_fn
    )
    if step_score_fn is None:
        idx = jnp.arange(P)

        def step_score_fn(states, rewards):
            return rewards[..., idx]  # [H, B, P]

    tx = optax.adam(learning_rate)

    def init_fn(key, example_obs_row):
        k_pi, k_v = jax.random.split(key)
        if centralized:
            example_obs_row = jnp.zeros((obs_dim,), jnp.float32)
        row = example_obs_row[None, None, :]
        v_row = row
        if critic_time_feature:
            v_row = jnp.concatenate(
                [row, jnp.ones(row.shape[:-1] + (1,), row.dtype)], axis=-1
            )
        params = {
            "pi": policy.init(k_pi, row),
            "v": value.init(k_v, v_row),
        }
        if target_ema > 0.0:
            params["v_target"] = jax.tree.map(jnp.copy, params["v"])
        return params, tx.init(params)

    def _plan_obs_rows(states_flat):
        # [T*B, Σobs] -> plan agents' policy-input rows [T*B, P, D]
        # (own row, or own row + flattened joint obs when centralized —
        # a centralized CRITIC is the standard CTDE shape anyway)
        return obs_fn(wm._state_to_grouped(states_flat))

    def loss_fn(params, obs_starts_g, key):
        states, rewards, logp, ent = rollout(
            params["pi"], policy.apply, obs_starts_g, key
        )
        h, b = states.shape[:2]
        r = step_score_fn(states, rewards)  # [H, B, P]
        obs0 = obs_fn(obs_starts_g)  # [B, P, D]
        obs_next = _plan_obs_rows(states.reshape(h * b, -1)).reshape(
            h, b, P, -1
        )
        obs_seq = _critic_obs(jnp.concatenate([obs0[None], obs_next], axis=0))
        decode = symexp if critic_symlog else (lambda x: x)
        v_all = decode(value.apply(params["v"], obs_seq))  # [H+1, B, P]
        if target_ema > 0.0:
            # bootstrap + baseline from the slow critic: the online
            # critic's bias cannot feed back through its own targets
            v_boot = decode(value.apply(params["v_target"], obs_seq))
        else:
            v_boot = v_all
        v_next = v_boot[1:]
        if not bootstrap_tail:
            # finite-horizon objective: no value estimate past s_H (the
            # intermediate (1-λ)·V̂ mixing still applies; set lam=1 for
            # a pure Monte-Carlo target)
            v_next = v_next.at[-1].set(0.0)
        g = lambda_returns(r, jax.lax.stop_gradient(v_next), gamma, lam)
        adv = jax.lax.stop_gradient(g - v_boot[:-1])
        adv = (adv - jnp.mean(adv)) / (jnp.std(adv) + 1e-6)
        pg = -jnp.mean(adv * logp)
        if critic_symlog:
            v_loss = jnp.mean(
                optax.huber_loss(
                    value.apply(params["v"], obs_seq)[:-1],
                    jax.lax.stop_gradient(symlog(g)),
                )
            )
        else:
            v_loss = jnp.mean(
                optax.huber_loss(v_all[:-1], jax.lax.stop_gradient(g))
            )
        ent_mean = jnp.mean(ent)
        loss = pg + value_coef * v_loss - entropy_coef * ent_mean
        return loss, {
            "score_mean": jnp.mean(r),
            "return_mean": jnp.mean(g),
            "value_loss": v_loss,
            "pg_loss": pg,
            "entropy": ent_mean,
        }

    @jax.jit
    def update_fn(params, opt_state, obs_starts_g, key):
        obs_g = tuple(
            jnp.repeat(o, n_rollouts, axis=0) for o in obs_starts_g
        )
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, obs_g, key
        )
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        if target_ema > 0.0:
            new_params["v_target"] = jax.tree.map(
                lambda t, o: (1.0 - target_ema) * t + target_ema * o,
                new_params["v_target"], new_params["v"],
            )
        return new_params, new_opt, metrics

    return policy, value, init_fn, update_fn


def make_cem_teacher(
    wm: WorldModel,
    env,
    spec: AgentSpec,
    plan_agents: Sequence[int],
    score_fn: Optional[Callable] = None,
    horizon: int = 8,
    n_candidates: int = 64,
    iters: int = 2,
    elite_frac: float = 0.125,
    soft_temperature: Optional[float] = None,
):
    """Batched CEM planning for distillation targets.

    The serving-time CEM actor (planning.make_cem_actor) plans ONE state at
    a time; the distillation loop needs expert actions at a BATCH of
    imagined states per update, so this reimplements the same
    per-(step, agent) categorical refitting with a leading state axis:
    ``plan(obs_g [S, A_g, od] per group, key) -> actions [S, P]`` — every
    state gets its own ``n_candidates``-way tournament, all ``iters``
    refit rounds compile into the enclosing jit.  Built on ``wm._predict``
    (not ``wm._rollout``) so stub world models in tests plug in unchanged.

    ``soft_temperature`` switches the teacher from argmax labels to SOFT
    targets: one uniform-shooting round (``iters`` is ignored), candidate
    scores standardized per (state, agent) and advantage-weighted
    (softmax over candidates at this temperature), returned as first-action
    distributions ``plan(obs_g, key) -> [S, P, K]``.  This is the right
    teacher when the planner's argmax is key-inconsistent: measured on the
    sticky(0.9) world model, CEM self-agrees only 0.21-0.32 vs 0.20 chance
    (results/r4/teacher_consistency.json) because many first actions score
    within rollout noise of each other — winner-take-all labels destroy
    the per-step tilt that actually earns the planner's return, while the
    population-weighted distribution preserves it (and its estimation
    noise averages out ACROSS distillation updates, which an argmax's
    cannot)."""
    assert getattr(env, "discrete_actions", True), (
        "the CEM teacher refits per-action categoricals (discrete only); "
        "use the REINFORCE/actor-critic trainers for continuous envs"
    )
    sample_actions, group_actions = make_action_sampler(env, spec)
    P = _plan_prefix(spec, plan_agents)
    n_elite = max(int(n_candidates * elite_frac), 1)
    act_dims = jnp.asarray(spec.act_dims)[:P]  # [P]
    K = int(max(spec.act_dims))
    valid = jnp.arange(K)[None, :] < act_dims[:, None]  # [P, K]
    neg_inf = jnp.finfo(jnp.float32).min
    if score_fn is None:
        idx = jnp.arange(P)

        def score_fn(states, rewards):
            return jnp.sum(rewards[..., idx], axis=0)  # [B, P]

    def imagine(obs_g, full_plan):
        """obs_g per-group [B, ...]; full_plan [H, B, A] joint actions ->
        (states [H, B, Σobs], rewards [H, B, A])."""

        def step(carry_obs, acts_t):
            ns, rw = wm._predict(
                GroupedBatch(obs=carry_obs, actions=group_actions(acts_t))
            )
            return wm._state_to_grouped(ns), (ns, rw)

        _, out = jax.lax.scan(step, obs_g, full_plan)
        return out

    if soft_temperature is not None:
        tau = float(soft_temperature)

        def plan_soft(obs_g, key):
            s = obs_g[0].shape[0]
            obs_t = tuple(jnp.repeat(o, n_candidates, axis=0) for o in obs_g)
            full = sample_actions(key, (horizon, s * n_candidates))
            states, rewards = imagine(obs_t, full)
            scores = score_fn(states, rewards).reshape(s, n_candidates, P)
            z = (scores - jnp.mean(scores, axis=1, keepdims=True)) / (
                jnp.std(scores, axis=1, keepdims=True) + 1e-6
            )
            w = jax.nn.softmax(z / tau, axis=1)  # [S, N, P]
            first = full[0][:, :P].reshape(s, n_candidates, P)
            onehot = jax.nn.one_hot(first, K)  # [S, N, P, K]
            return jnp.einsum("snp,snpk->spk", w, onehot)

        return plan_soft

    def plan(obs_g, key):
        s = obs_g[0].shape[0]
        obs_t = tuple(jnp.repeat(o, n_candidates, axis=0) for o in obs_g)
        logits0 = jnp.where(valid[None, None], 0.0, neg_inf)  # [1, 1, P, K]
        logits0 = jnp.broadcast_to(logits0, (s, horizon, P, K))

        def one_iter(i, carry):
            logits, best_score, best_first = carry
            k_i = jax.random.fold_in(key, i)
            k_plan, k_other = jax.random.split(k_i)
            # [S, H, N, P] draws from each state's current categoricals
            plan_acts = jax.random.categorical(
                k_plan, logits[:, :, None], axis=-1,
                shape=(s, horizon, n_candidates, P),
            )
            full = sample_actions(k_other, (horizon, s * n_candidates))
            pa = jnp.transpose(plan_acts, (1, 0, 2, 3)).reshape(
                horizon, s * n_candidates, P
            )
            full = full.at[:, :, :P].set(pa)
            states, rewards = imagine(obs_t, full)
            scores = score_fn(states, rewards).reshape(s, n_candidates, P)
            # per-(state, agent) elites -> refit that agent's categoricals
            _, elite_n = jax.lax.top_k(
                jnp.transpose(scores, (0, 2, 1)), n_elite
            )  # [S, P, E]
            elite_acts = jnp.take_along_axis(
                jnp.transpose(plan_acts, (0, 1, 3, 2)),  # [S, H, P, N]
                elite_n[:, None], axis=3,
            )  # [S, H, P, E]
            counts = jax.nn.one_hot(elite_acts, K).sum(axis=3)  # [S, H, P, K]
            new_logits = jnp.where(
                valid[None, None], jnp.log(counts / n_elite + 1e-4), neg_inf
            )
            col_best = jnp.max(scores, axis=1)  # [S, P]
            col_arg = jnp.argmax(scores, axis=1)  # [S, P]
            first = jnp.take_along_axis(
                plan_acts[:, 0], col_arg[:, None, :], axis=1
            )[:, 0]  # [S, P]
            improved = col_best > best_score
            best_score = jnp.where(improved, col_best, best_score)
            best_first = jnp.where(improved, first, best_first)
            return new_logits, best_score, best_first

        init = (
            logits0,
            jnp.full((s, P), neg_inf),
            jnp.zeros((s, P), jnp.int32),
        )
        _, _, best_first = jax.lax.fori_loop(0, iters, one_iter, init)
        return best_first

    return plan


def make_enumerated_teacher(
    wm: WorldModel,
    env,
    spec: AgentSpec,
    plan_agents: Sequence[int],
    score_fn: Optional[Callable] = None,
    horizon: int = 8,
    m_rollouts: int = 24,
    temperature: float = 0.5,
    continuation: str = "hold",
    return_q: bool = False,
):
    """First-action Q evaluation by enumeration + common random numbers.

    The shooting/CEM teachers label with the argmax (or weighted histogram)
    of RANDOM candidate plans — and through this world model both are
    measured near-uniform labelers (results/r4/teacher_consistency.json;
    the stalled distillation curves): over an 8-step imagined future of
    ~30 random-acting agents, the score variance is dominated by the
    CONTINUATION, not the first action being scored.  This teacher
    removes that variance instead of averaging over it:

      for each action a in 0..K-1:             (enumerated, not sampled)
        roll M futures where every plan agent's FIRST action is a and
        steps 1..H-1 are ``continuation`` actions SHARED across the K
        arms (common random numbers — per m, arm a and arm a' differ in
        the first action ONLY);
      Q[s, p, a] = mean_m score;  targets = softmax over a of
      per-(state, agent) standardized Q / temperature.

    ``continuation='hold'`` keeps each plan agent repeating its arm's
    action for the whole horizon (scores direction COMMITMENT — the
    signal the winning shooting arms used); ``'random'`` draws shared
    uniform continuations (scores the first step alone).  Non-plan agents
    are always uniform-random, shared across arms.

    Correlation caveat, accepted and documented: all plan agents take
    the SAME arm action a within one rollout, so agent p's Q[a] is
    estimated under "teammates also play a".  With distance-potential
    scores (each agent's own geometry) the cross-term is second order,
    and the CRN variance reduction is what makes the labels consistent
    at all.  Returns ``plan(obs_g, key) -> [S, P, K]`` soft targets
    (or (targets, Q) when ``return_q``)."""
    assert continuation in ("hold", "random"), continuation
    assert getattr(env, "discrete_actions", True), (
        "the enumerated teacher enumerates a finite action set (discrete "
        "only); use the REINFORCE/actor-critic trainers for continuous envs"
    )
    sample_actions, group_actions = make_action_sampler(env, spec)
    P = _plan_prefix(spec, plan_agents)
    act_dims = set(int(d) for d in jnp.asarray(spec.act_dims)[:P].tolist())
    assert len(act_dims) == 1, (
        "enumerated teacher needs homogeneous plan-agent action spaces"
    )
    K = act_dims.pop()
    if score_fn is None:
        idx = jnp.arange(P)

        def score_fn(states, rewards):
            return jnp.sum(rewards[..., idx], axis=0)

    def imagine(obs_g, full_plan):
        def step(carry_obs, acts_t):
            ns, rw = wm._predict(
                GroupedBatch(obs=carry_obs, actions=group_actions(acts_t))
            )
            return wm._state_to_grouped(ns), (ns, rw)

        _, out = jax.lax.scan(step, obs_g, full_plan)
        return out

    def plan(obs_g, key):
        s = obs_g[0].shape[0]
        m = m_rollouts
        n = m * K  # candidate index = (mm * K + a), a fastest
        obs_t = tuple(jnp.repeat(o, n, axis=0) for o in obs_g)
        k_first, k_cont = jax.random.split(key)
        # shared-across-arms randomness: drawn per (state, m), repeated K x
        base_first = sample_actions(k_first, (s * m,))  # [S*M, A]
        base_cont = sample_actions(k_cont, (horizon - 1, s * m))
        first = jnp.repeat(base_first, K, axis=0)  # [S*M*K, A]
        cont = jnp.repeat(base_cont, K, axis=1)  # [H-1, S*M*K, A]
        arm = jnp.tile(jnp.arange(K, dtype=first.dtype), s * m)  # [S*M*K]
        first = first.at[:, :P].set(arm[:, None])
        if continuation == "hold":
            cont = cont.at[:, :, :P].set(arm[None, :, None])
        full = jnp.concatenate([first[None], cont], axis=0)  # [H, n, A]
        states, rewards = imagine(obs_t, full)
        scores = score_fn(states, rewards).reshape(s, m, K, P)
        q = jnp.transpose(jnp.mean(scores, axis=1), (0, 2, 1))  # [S, P, K]
        z = (q - jnp.mean(q, axis=-1, keepdims=True)) / (
            jnp.std(q, axis=-1, keepdims=True) + 1e-6
        )
        targets = jax.nn.softmax(z / temperature, axis=-1)
        return (targets, q) if return_q else targets

    return plan


def make_distillation_trainer(
    wm: WorldModel,
    env,
    spec: AgentSpec,
    plan_agents: Sequence[int],
    score_fn: Optional[Callable] = None,
    horizon: int = 8,
    n_candidates: int = 64,
    cem_iters: int = 2,
    elite_frac: float = 0.125,
    visit_steps: int = 3,
    learning_rate: float = 3e-4,
    hidden: Tuple[int, ...] = (128, 128),
    target_mode: str = "argmax",
    temperature: float = 0.5,
    teacher_mode: str = "cem",
    m_rollouts: int = 24,
    continuation: str = "hold",
    centralized: bool = False,
) -> Tuple[PolicyMLP, Callable, Callable]:
    """DAgger-style planner distillation, entirely inside imagination.

    The CEM planner earns its real-env return at 3x256 imagined rollouts
    per served step; REINFORCE's amortized policy serves at ONE forward
    pass but leaves ~26%% of CEM's return on the table
    (results/r4/{mpc_sticky90,imagination_policy}.json).  This trainer
    closes the gap the imitation way: each update (one compiled program)

      1. rolls the CURRENT policy ``visit_steps`` steps inside the world
         model from real start states (on-policy visitation — DAgger's
         fix for compounding imitation error),
      2. runs the batched CEM teacher at every visited state to get
         per-agent expert first actions,
      3. descends the cross-entropy between the policy's logits and the
         teacher's actions.

    Serving stays one forward pass; the planner's search cost is paid at
    training time only.  Returns ``(policy, init_fn, update_fn)`` with the
    REINFORCE trainer's exact surface, so the study scripts swap trainers
    without touching the eval harness.

    ``target_mode='soft'`` distills the teacher's advantage-weighted
    first-action DISTRIBUTION (make_cem_teacher's soft_temperature path,
    ``temperature`` here) instead of argmax labels — required when the
    planner's per-key argmax is inconsistent (teacher_consistency.json):
    cross-entropy to soft targets recovers the population tilt whose
    estimation noise averages out across updates.

    ``teacher_mode='enumerated'`` (implies soft targets) swaps in
    make_enumerated_teacher — per-action Q by enumeration + common random
    numbers (``m_rollouts``, ``continuation``) — the labeler that stays
    consistent where both shooting histograms and CEM argmaxes are
    measured near-uniform (teacher_consistency.json)."""
    assert target_mode in ("argmax", "soft"), target_mode
    assert teacher_mode in ("cem", "enumerated"), teacher_mode
    if teacher_mode == "enumerated":
        target_mode = "soft"
    P = _plan_prefix(spec, plan_agents)
    act_dim = int(spec.act_dims[0])
    policy = PolicyMLP(hidden=tuple(hidden), act_dim=act_dim)
    obs_fn, obs_dim = make_obs_builder(spec, plan_agents, centralized)
    rollout = make_imagination_rollout(
        wm, env, spec, plan_agents, visit_steps, obs_fn=obs_fn
    )
    if teacher_mode == "enumerated":
        teacher = make_enumerated_teacher(
            wm, env, spec, plan_agents, score_fn=score_fn, horizon=horizon,
            m_rollouts=m_rollouts, temperature=temperature,
            continuation=continuation,
        )
    else:
        teacher = make_cem_teacher(
            wm, env, spec, plan_agents, score_fn=score_fn, horizon=horizon,
            n_candidates=n_candidates, iters=cem_iters, elite_frac=elite_frac,
            soft_temperature=temperature if target_mode == "soft" else None,
        )
    tx = optax.adam(learning_rate)

    def init_fn(key, example_obs_row):
        if centralized:
            example_obs_row = jnp.zeros((obs_dim,), jnp.float32)
        params = policy.init(key, example_obs_row[None, None, :])
        return params, tx.init(params)

    @jax.jit
    def update_fn(params, opt_state, obs_starts_g, key):
        k_visit, k_teach = jax.random.split(key)
        # 1. on-policy state visitation (no gradient through visitation)
        states, *_ = rollout(params, policy.apply, obs_starts_g, k_visit)
        v, s = states.shape[:2]
        visited_g = wm._state_to_grouped(states.reshape(v * s, -1))
        all_obs_g = tuple(
            jax.lax.stop_gradient(jnp.concatenate([o0, ov], axis=0))
            for o0, ov in zip(obs_starts_g, visited_g)
        )
        # 2. expert relabeling at every state: [B, P] labels (argmax mode)
        #    or [B, P, K] distributions (soft mode)
        targets = teacher(all_obs_g, k_teach)
        hard = targets if target_mode == "argmax" else jnp.argmax(targets, -1)

        # 3. behavior cloning on (state, expert action/distribution)
        def loss_fn(p):
            logits = policy.apply(p, obs_fn(all_obs_g))  # [B, P, K]
            logp = jax.nn.log_softmax(logits, axis=-1)
            if target_mode == "argmax":
                nll = -jnp.take_along_axis(
                    logp, targets[..., None], axis=-1
                )[..., 0]
            else:
                nll = -jnp.sum(targets * logp, axis=-1)  # [B, P]
            agree = jnp.mean(
                (jnp.argmax(logits, axis=-1) == hard).astype(jnp.float32)
            )
            ent = -jnp.mean(jnp.sum(jnp.exp(logp) * logp, axis=-1))
            return jnp.mean(nll), {
                "bc_loss": jnp.mean(nll),
                "teacher_agree": agree,
                "entropy": ent,
            }

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, metrics

    return policy, init_fn, update_fn


def make_policy_actor(
    policy: PolicyMLP,
    params,
    env,
    spec: AgentSpec,
    plan_agents: Sequence[int],
    greedy: bool = True,
    centralized: bool = False,
):
    """Serve the trained imagination policy with the planners' actor
    contract: ``act(stacked_obs, key) -> [A] joint actions`` (non-plan
    agents get uniform draws; callers overwrite them with the opponents'
    real policy) — drop-in for eval_joint_policy arms and ONE forward pass
    per step where MPC pays n_candidates imagined rollouts.
    ``centralized`` must match the trainer flag: the policy input then
    includes the full flattened joint observation (available here — the
    actor already receives the joint stacked obs)."""
    sample_actions, _ = make_action_sampler(env, spec)
    P = _plan_prefix(spec, plan_agents)
    obs_fn, _ = make_obs_builder(spec, plan_agents, centralized)
    discrete = getattr(env, "discrete_actions", True)
    if not discrete:
        lo, hi = _box_bounds(env)

    def act(stacked_obs, key):
        obs_g = stacked_to_grouped(spec, stacked_obs)
        rows = obs_fn(tuple(o[None] for o in obs_g))  # [1, P, D]
        k_p, k_o = jax.random.split(key)
        if discrete:
            logits = policy.apply(params, rows)[0]  # [P, K]
            if greedy:
                acts_p = jnp.argmax(logits, axis=-1)
            else:
                acts_p = jax.random.categorical(k_p, logits)
        else:
            mu, log_std = policy.apply(params, rows)
            if greedy:
                acts_p = _tanh_affine(mu[0], lo, hi)
            else:
                acts_p, _ = tanh_gaussian_sample(mu[0], log_std[0], k_p,
                                                 lo, hi)
        out = sample_actions(k_o)
        return out.at[:P].set(acts_p)

    return act
