"""Scripted collection policies — the data lever beyond random rollouts.

The reference fills its replay buffer exclusively with uniform-random
actions (torch_ver/main.py:69, jax_ver/main.py:155-156).  Under that data
the world model's held-out floor is the reward branch: simple_tag rewards
are driven by adversary-prey contacts, which random walks rarely produce
(PARITY.md capacity probe: an 8x model does not beat it).  A scripted
pursuit/evade policy makes contact events common, changing what the data
can teach — a *data* lever the reference has no counterpart for.

Everything here is jit-compatible (pure functions of env state + key) so
the policies run inside the compiled collection scan at zero host cost.
``collect_epsilon`` mixes uniform-random actions back in for coverage.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mfvae_tpu.envs.mpe import SimpleAdversaryEnv, SimpleTagEnv


def _toward_discrete(delta: jnp.ndarray) -> jnp.ndarray:
    """[N, 2] displacement -> discrete action moving along its dominant
    axis (1 -x, 2 +x, 3 -y, 4 +y — the shared MPE direction map); an
    agent already on its target (|delta| ~ 0) holds with the no-op
    instead of being pushed -x by the argmax/compare chain."""
    ax = jnp.argmax(jnp.abs(delta), axis=-1)  # 0 = x, 1 = y
    comp = jnp.take_along_axis(delta, ax[:, None], axis=-1)[:, 0]
    pos = comp > 0
    act_x = jnp.where(pos, 2, 1)
    act_y = jnp.where(pos, 4, 3)
    act = jnp.where(ax == 0, act_x, act_y)
    on_target = jnp.linalg.norm(delta, axis=-1) < 1e-6
    return jnp.where(on_target, 0, act).astype(jnp.int32)


def _toward_continuous(delta: jnp.ndarray) -> jnp.ndarray:
    """[N, 2] displacement -> unit-ish force in the Box(-1, 1, (2,))
    contract (normalized direction)."""
    norm = jnp.linalg.norm(delta, axis=-1, keepdims=True)
    return delta / jnp.maximum(norm, 1e-6)


def _tag_deltas(env: SimpleTagEnv, state) -> jnp.ndarray:
    """Per-agent pursuit/evade displacement: adversaries chase their
    nearest good agent; good agents flee their nearest adversary but turn
    back inside the arena edge (mirroring the env's own boundary penalty,
    which ramps from |x| = 0.9).  The wall term is what makes contacts
    happen at all: the prey is faster (max speed 1.3 vs 1.0), so a pure
    straight-line evader is never caught — hunters corner it at the
    walls (measured ~10x the contact rate of random rollouts)."""
    n_adv = env.num_adversaries
    adv = state.agent_pos[:n_adv]
    good = state.agent_pos[n_adv:]
    d = jnp.linalg.norm(adv[:, None, :] - good[None, :, :], axis=-1)
    chase = good[jnp.argmin(d, axis=1)] - adv  # toward nearest prey
    flee = good - adv[jnp.argmin(d, axis=0)]  # away from nearest hunter
    flee = flee / jnp.maximum(
        jnp.linalg.norm(flee, axis=-1, keepdims=True), 1e-6
    )
    wall_pull = -jnp.sign(good) * jnp.maximum(jnp.abs(good) - 0.8, 0.0) * 2.0
    return jnp.concatenate([chase, flee + wall_pull], axis=0)


def _adversary_deltas(env: SimpleAdversaryEnv, state) -> jnp.ndarray:
    """Good agents head for the goal landmark; the adversary (who cannot
    see the goal) heads for the nearest good agent (deception pressure)."""
    goal = state.landmark_pos[state.goal]
    adv = state.agent_pos[:1]
    good = state.agent_pos[1:]
    d = jnp.linalg.norm(adv[:, None, :] - good[None, :, :], axis=-1)
    chase = good[jnp.argmin(d, axis=1)] - adv
    seek = goal[None, :] - good
    return jnp.concatenate([chase, seek], axis=0)


_DELTA_FNS = {
    SimpleTagEnv: _tag_deltas,
    SimpleAdversaryEnv: _adversary_deltas,
}


# ---------------------------------------------------------------- host side
# numpy mirror of the scripted policies for the host collectors
# (envs/host_adapter.py AsyncCollector / NativeBatchedCollector), which
# step outside jit and read positions from the env's state accessors.

import numpy as _np


def host_pursuit_actions(
    kind: str,
    pos: "_np.ndarray",
    n_adv: int,
    rng: "_np.random.Generator",
    epsilon: float,
    discrete: bool = True,
    goal_pos=None,
):
    """Numpy pursuit actions.  ``kind``: 'tag' (chase/evade with
    wall-aware prey) or 'adversary' (goal-seek good agents, chasing
    goal-blind adversary, ``goal_pos`` required).  ``pos`` is [A, 2] for
    one env or [K, A, 2] batched (adversaries first either way;
    ``goal_pos`` then [2] or [K, 2]).  Returns [A] / [K, A] int32 or
    [A, 2] / [K, A, 2] float32; epsilon mixes uniform-random actions per
    agent.  Semantics mirror the jit policies above (tested equal at
    epsilon=0 for both kinds)."""
    pos = _np.asarray(pos, _np.float64)
    single = pos.ndim == 2
    p = pos[None] if single else pos  # [K, A, 2]
    adv, good = p[:, :n_adv], p[:, n_adv:]
    d = _np.linalg.norm(adv[:, :, None, :] - good[:, None, :, :], axis=-1)
    nearest_prey = _np.argmin(d, axis=2)  # [K, n_adv]
    chase = (
        _np.take_along_axis(good, nearest_prey[:, :, None], axis=1) - adv
    )
    if kind == "tag":
        nearest_hunter = _np.argmin(d, axis=1)  # [K, G]
        flee = good - _np.take_along_axis(
            adv, nearest_hunter[:, :, None], axis=1
        )
        flee = flee / _np.maximum(
            _np.linalg.norm(flee, axis=-1, keepdims=True), 1e-6
        )
        wall = -_np.sign(good) * _np.maximum(_np.abs(good) - 0.8, 0.0) * 2.0
        delta = _np.concatenate([chase, flee + wall], axis=1)
    elif kind == "adversary":
        gp = _np.asarray(goal_pos, _np.float64)
        if single:
            gp = gp[None]
        seek = gp[:, None, :] - good
        delta = _np.concatenate([chase, seek], axis=1)
    else:
        raise ValueError(f"unknown host pursuit kind {kind!r}")

    k, n = delta.shape[0], delta.shape[1]
    if discrete:
        ax = _np.argmax(_np.abs(delta), axis=-1)  # [K, A]
        comp = _np.take_along_axis(delta, ax[..., None], axis=-1)[..., 0]
        act = _np.where(ax == 0, _np.where(comp > 0, 2, 1),
                        _np.where(comp > 0, 4, 3))
        act = _np.where(_np.linalg.norm(delta, axis=-1) < 1e-6, 0, act)
        rand = rng.integers(0, 5, size=(k, n))
        take = rng.uniform(size=(k, n)) < epsilon
        out = _np.where(take, rand, act).astype(_np.int32)
        return out[0] if single else out
    norm = _np.maximum(_np.linalg.norm(delta, axis=-1, keepdims=True), 1e-6)
    act = delta / norm
    rand = rng.uniform(-1.0, 1.0, size=(k, n, 2))
    take = (rng.uniform(size=(k, n)) < epsilon)[..., None]
    out = _np.where(take, rand, act).astype(_np.float32)
    return out[0] if single else out


class EpisodeMixPolicy:
    """Per-EPISODE policy mixing: each episode is collected ENTIRELY under
    the scripted policy (probability ``mix_frac``) or entirely under uniform
    random actions — trajectory-level mixing, not action-level.

    Motivation (measured, PARITY.md round 4): mixing ACTIONS
    (collect_epsilon up to 0.7 inside pursuit) never recovers the
    random-rollout state distribution — eps-mixed pursuit still concentrates
    states in chase clusters, so every action-mixture point loses the
    random eval column by >6x.  Episode-level mixing makes the replay a true
    mixture of the two STATE distributions.

    Implements the stateful collect-policy protocol
    (baselines/collect_policy.py): carry = (fresh, use_scripted); the
    trainer resets the carry to init_carry() at episode end, which re-arms
    ``fresh`` so the next step redraws the episode's policy."""

    def __init__(self, scripted, sample_fn, mix_frac: float):
        self.scripted = scripted
        self.sample_fn = sample_fn
        self.mix_frac = float(mix_frac)

    def init_carry(self):
        return (jnp.bool_(True), jnp.bool_(False))

    def step(self, carry, stacked_obs, env_state, key):
        fresh, use_scripted = carry
        k_draw, k_s, k_r = jax.random.split(key, 3)
        use_scripted = jnp.where(
            fresh, jax.random.uniform(k_draw) < self.mix_frac, use_scripted
        )
        act = jnp.where(
            use_scripted, self.scripted(env_state, k_s), self.sample_fn(k_r)
        )
        return (jnp.zeros_like(fresh), use_scripted), act


class StickyRandomPolicy:
    """Sticky random actions: each agent REPEATS its previous action with
    probability ``sticky_prob`` and resamples uniformly otherwise
    (per-agent, per-step — the Atari sticky-actions scheme applied to
    collection).

    Motivation (measured, PARITY.md round 4 action-sensitivity probe): the
    per-step action effect on the state is ~1% of the step delta under
    uniform random walks, so a world model can reach 0.85 delta
    correlation while being ACTION-BLIND (action_effect_ratio 0.012) —
    every imagined future is identical and planning is impossible.  Sticky
    actions make action effects ACCUMULATE (a held direction displaces the
    agent ~0.5 units over 8 steps), so multi-step objectives
    (train.unroll_steps) see a large action-attributable error.

    Stateful collect-policy protocol: carry = (prev_actions, fresh); the
    trainer resets the carry at episode end, re-arming a full resample."""

    def __init__(self, env, spec, sample_fn, sticky_prob: float):
        self.sample_fn = sample_fn
        self.sticky_prob = float(sticky_prob)
        self.n_agents = spec.n_agents
        self.discrete = getattr(env, "discrete_actions", True)
        from mfvae_tpu.models.mavae import zero_actions_grouped

        # flat zero-action vector in agent order (init carry shape)
        if self.discrete:
            self._zero = jnp.zeros((spec.n_agents,), jnp.int32)
        else:
            ad = spec.act_dims[0]
            self._zero = jnp.zeros((spec.n_agents, ad), jnp.float32)

    def init_carry(self):
        return (self._zero, jnp.bool_(True))

    def step(self, carry, stacked_obs, env_state, key):
        prev, fresh = carry
        k_keep, k_rand = jax.random.split(key)
        rand = self.sample_fn(k_rand)
        keep = (
            jax.random.uniform(k_keep, (self.n_agents,)) < self.sticky_prob
        ) & ~fresh
        if not self.discrete:
            keep = keep[:, None]
        act = jnp.where(keep, prev, rand)
        return (act, jnp.zeros_like(fresh)), act


class ImaginationCollectPolicy:
    """Collection with a saved imagination policy (behavior.save_policy
    artifact): the policy's plan agents act from its SAMPLED distribution
    (the measured serving mode — PARITY.md distillation chapter) with an
    epsilon-uniform per-agent mixture; all other agents act uniformly.

    This closes the Dreamer iteration: train WM -> learn behavior in
    imagination -> collect WITH that behavior -> retrain the WM on its own
    policy's state distribution (scripts/dreamer_iteration_study.py).

    ``hold`` (reusing the collect_mix_frac knob, like sticky) keeps each
    agent's previous action with that probability — temporal persistence
    is what keeps the retrained model action-CONDITIONED (the sticky
    lesson, PARITY.md action-blindness chapter: per-step-resampled actions
    barely move the state, so a model trained on them goes action-blind;
    held actions accumulate displacement the unroll objective can see).
    Stateful collect-policy protocol (carry = previous actions + fresh
    flag, reset at episode end); the protocol gives it the stacked OBS,
    which scripted env-state policies don't need but this one does."""

    def __init__(self, env, spec, path: str, epsilon: float, sample_fn,
                 hold: float = 0.0):
        from mfvae_tpu.behavior import load_policy
        from mfvae_tpu.imagination import make_policy_actor

        policy, params, meta = load_policy(path)
        self._actor = make_policy_actor(
            policy, params, env, spec, tuple(meta["plan_agents"]),
            greedy=False, centralized=bool(meta.get("centralized", False)),
        )
        self.epsilon = float(epsilon)
        self.hold = float(hold)
        self.n_agents = spec.n_agents
        self.discrete = getattr(env, "discrete_actions", True)
        self.sample_fn = sample_fn
        if self.discrete:
            self._zero = jnp.zeros((spec.n_agents,), jnp.int32)
        else:
            self._zero = jnp.zeros(
                (spec.n_agents, spec.act_dims[0]), jnp.float32
            )

    def init_carry(self):
        return (self._zero, jnp.bool_(True))

    def step(self, carry, stacked_obs, env_state, key):
        prev, fresh = carry
        k_pol, k_hold, k_eps, k_rand = jax.random.split(key, 4)
        act = self._actor(stacked_obs, k_pol)
        if self.epsilon > 0.0:
            override = (
                jax.random.uniform(k_eps, (self.n_agents,)) < self.epsilon
            )
            if not self.discrete:
                override = override[:, None]
            act = jnp.where(override, self.sample_fn(k_rand), act)
        if self.hold > 0.0:
            keep = (
                jax.random.uniform(k_hold, (self.n_agents,)) < self.hold
            ) & ~fresh
            if not self.discrete:
                keep = keep[:, None]
            act = jnp.where(keep, prev, act)
        return (act, jnp.zeros_like(fresh)), act


def make_collect_policy(
    env, spec, name: str, epsilon: float, sample_fn, mix_frac: float = 0.5
):
    """Build a jit-compatible ``(state, key) -> actions`` collection
    policy, or return None for ``name='random'`` (the reference behavior).

    ``'pursuit'``: scripted chase/evade (tag) or goal-seek/chase
    (adversary) with an epsilon-uniform mixture.  Discrete envs get
    dominant-axis discrete moves; continuous envs get normalized force
    vectors.  ``sample_fn(key)`` supplies the uniform-random actions for
    the epsilon mixture — pass the trainer's ``make_action_sampler``
    sampler so the mixture uses the env's own action-space bounds rather
    than duplicating them here.

    ``'episode_mix'``: EpisodeMixPolicy — whole episodes alternate between
    the scripted pursuit policy (probability ``mix_frac``) and uniform
    random collection.

    ``'sticky'``: StickyRandomPolicy — per-agent sticky random actions
    (repeat probability ``mix_frac``; reuses the mix_frac knob as the hold
    probability).

    ``'imagination:<policy.msgpack>'``: ImaginationCollectPolicy — a saved
    behavior-module policy drives its plan agents (epsilon-uniform
    mixture; ``mix_frac`` again reused as the per-agent action-hold
    probability)."""
    if name == "random":
        return None
    if name.startswith("imagination:"):
        return ImaginationCollectPolicy(
            env, spec, name[len("imagination:"):], epsilon, sample_fn,
            hold=mix_frac,
        )
    if name == "episode_mix":
        scripted = make_collect_policy(env, spec, "pursuit", epsilon, sample_fn)
        return EpisodeMixPolicy(scripted, sample_fn, mix_frac)
    if name == "sticky":
        return StickyRandomPolicy(env, spec, sample_fn, mix_frac)
    if name != "pursuit":
        raise ValueError(f"unknown collect_policy {name!r}")
    delta_fn = next(
        (fn for cls, fn in _DELTA_FNS.items() if isinstance(env, cls)), None
    )
    if delta_fn is None:
        raise ValueError(
            f"collect_policy='pursuit' is not defined for {type(env).__name__}"
            " (supported: simple_tag, simple_adversary)"
        )
    discrete = getattr(env, "discrete_actions", True)
    n_agents = spec.n_agents

    def policy(state, key):
        k_mix, k_rand = jax.random.split(key)
        delta = delta_fn(env, state)
        scripted = (
            _toward_discrete(delta) if discrete else _toward_continuous(delta)
        )
        rand = sample_fn(k_rand)
        take_rand = jax.random.uniform(k_mix, (n_agents,)) < epsilon
        if not discrete:
            take_rand = take_rand[:, None]
        return jnp.where(take_rand, rand, scripted)

    return policy
