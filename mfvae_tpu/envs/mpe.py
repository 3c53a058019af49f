"""Pure-JAX MPE (multi-agent particle environment) — simple_tag.

The reference consumes MPE through two external stacks: PettingZoo on the
host (torch_ver/src/env.py:24-39) and JaxMARL on device
(jax_ver/main.py:59-62).  Neither is available here, and a host env would
serialize the device pipeline (SURVEY §3.2: host↔device crossing every env
step), so the framework ships its own fully-jittable implementation written
against the public MPE specification: same scenario parameters, physics
integrator, observation layout, and reward structure as
``mpe2/simple_tag``, so `env.step` composes into `lax.scan` rollouts and
vmaps over env batches on the TPU.

Everything is vectorized over entities — there are no per-agent Python loops
in step/reset; pairwise contact forces are one [N, N, 2] broadcast, and
observations for all agents of a class are assembled with one gather each.

API mirrors the JaxMARL surface the reference uses (jax_ver/main.py:78-84):
``reset(key) -> (obs_dict, state)``, ``step(key, state, action_dict) ->
(obs, state, rewards, dones, infos)``, ``env.agents``,
``env.action_space(agent)``, ``env.observation_space(agent)`` — plus
stacked-tensor variants (``reset_stacked`` / ``step_stacked``) that skip the
dict packing for the fully-compiled collection path.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import cached_property
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as _np

from mfvae_tpu.envs.spaces import Box, Discrete

# MPE scenario constants (public simple_tag spec):
#   adversaries: size .075, accel 3.0, max_speed 1.0
#   good agents: size .05,  accel 4.0, max_speed 1.3
#   landmarks:   size .2, static, collidable
#   world: dt .1, damping .25, contact_force 1e2, contact_margin 1e-3
DT = 0.1
DAMPING = 0.25
CONTACT_FORCE = 1e2
CONTACT_MARGIN = 1e-3
ADV_SIZE, GOOD_SIZE, LANDMARK_SIZE = 0.075, 0.05, 0.2
ADV_ACCEL, GOOD_ACCEL = 3.0, 4.0
ADV_MAX_SPEED, GOOD_MAX_SPEED = 1.0, 1.3
COLLISION_REWARD = 10.0
# 0 no-op, 1 -x, 2 +x, 3 -y, 4 +y (standard MPE discrete action map,
# shared by every scenario)
DISCRETE_DIRECTIONS = _np.array(
    [[0.0, 0.0], [-1.0, 0.0], [1.0, 0.0], [0.0, -1.0], [0.0, 1.0]],
    dtype=_np.float32,
)


class MPEState(NamedTuple):
    agent_pos: jnp.ndarray  # [A, 2] adversaries first, then good agents
    agent_vel: jnp.ndarray  # [A, 2]
    landmark_pos: jnp.ndarray  # [L, 2]
    step: jnp.ndarray  # int32


class StackedObs(NamedTuple):
    """Per-class observation tensors (adversaries see good-agent velocities;
    good agents see other good agents' velocities)."""

    adversary: jnp.ndarray  # [n_adv, obs_dim_adv]
    good: jnp.ndarray  # [n_good, obs_dim_good]


@dataclass(frozen=True)
class SimpleTagEnv:
    """simple_tag with the reference's population:
    10 good + 30 adversaries + 20 obstacles (jax_ver/main.py:59-62,
    torch_ver/src/env.py:27)."""

    num_good_agents: int = 10
    num_adversaries: int = 30
    num_obs: int = 20
    max_steps: int = 1000  # torch_ver/src/env.py:27 max_cycles
    discrete_actions: bool = True

    # ------------------------------------------------------------- metadata
    @cached_property
    def agents(self) -> Tuple[str, ...]:
        return tuple(f"adversary_{i}" for i in range(self.num_adversaries)) + tuple(
            f"agent_{i}" for i in range(self.num_good_agents)
        )

    @property
    def num_agents(self) -> int:
        return self.num_adversaries + self.num_good_agents

    # NOTE: these cached constants are numpy, not jnp — a cached jnp array
    # created inside a trace would cache a tracer and leak across jits.
    @cached_property
    def _sizes(self) -> _np.ndarray:
        return _np.concatenate(
            [
                _np.full((self.num_adversaries,), ADV_SIZE, _np.float32),
                _np.full((self.num_good_agents,), GOOD_SIZE, _np.float32),
            ]
        )

    @cached_property
    def _accels(self) -> _np.ndarray:
        return _np.concatenate(
            [
                _np.full((self.num_adversaries,), ADV_ACCEL, _np.float32),
                _np.full((self.num_good_agents,), GOOD_ACCEL, _np.float32),
            ]
        )

    @cached_property
    def _max_speeds(self) -> _np.ndarray:
        return _np.concatenate(
            [
                _np.full((self.num_adversaries,), ADV_MAX_SPEED, _np.float32),
                _np.full((self.num_good_agents,), GOOD_MAX_SPEED, _np.float32),
            ]
        )

    def obs_dim(self, adversary) -> int:
        # [self_vel(2), self_pos(2), landmark_rel(2L), other_rel(2(A-1)),
        #  good_vel(2 * visible good agents)]; accepts a bool or an agent
        # name (uniform surface with SimpleWorldCommEnv.obs_dim)
        if isinstance(adversary, str):
            adversary = adversary.startswith("adversary")
        base = 4 + 2 * self.num_obs + 2 * (self.num_agents - 1)
        return base + 2 * (
            self.num_good_agents if adversary else self.num_good_agents - 1
        )

    def prey_rel_slice(self) -> slice:
        """Columns of an ADVERSARY observation holding the relative-prey
        positions — see tag_prey_rel_slice."""
        return tag_prey_rel_slice(
            self.num_obs, self.num_adversaries, self.num_good_agents
        )

    def action_space(self, agent: str):
        if self.discrete_actions:
            return Discrete(5)
        return Box(-1.0, 1.0, (2,))

    def observation_space(self, agent: str):
        return Box(
            -jnp.inf, jnp.inf, (self.obs_dim(agent.startswith("adversary")),)
        )

    # ---------------------------------------------------------------- reset
    def reset_stacked(self, rng_key: jax.Array) -> Tuple[StackedObs, MPEState]:
        k_a, k_l = jax.random.split(rng_key)
        state = MPEState(
            agent_pos=jax.random.uniform(
                k_a, (self.num_agents, 2), minval=-1.0, maxval=1.0
            ),
            agent_vel=jnp.zeros((self.num_agents, 2)),
            landmark_pos=jax.random.uniform(
                k_l, (self.num_obs, 2), minval=-0.9, maxval=0.9
            ),
            step=jnp.int32(0),
        )
        return self._observe(state), state

    def reset(self, rng_key: jax.Array):
        obs, state = self.reset_stacked(rng_key)
        return self._obs_dict(obs), state

    # ----------------------------------------------------------------- step
    def step_stacked(
        self, rng_key: jax.Array, state: MPEState, actions: jnp.ndarray
    ) -> Tuple[StackedObs, MPEState, jnp.ndarray, jnp.ndarray, Dict]:
        """actions: [A] int (discrete) or [A, 2] float.  Returns stacked obs,
        new state, per-agent rewards [A], per-agent done flags [A] (+__all__
        appended by the dict wrapper), info."""
        del rng_key  # physics is deterministic; key kept for API parity
        u = self._action_force(actions)
        p_force = u * self._accels[:, None]
        p_force = p_force + self._contact_forces(state)

        vel = state.agent_vel * (1.0 - DAMPING) + p_force * DT  # unit mass
        speed = jnp.linalg.norm(vel, axis=-1, keepdims=True)
        scale = jnp.minimum(1.0, self._max_speeds[:, None] / jnp.maximum(speed, 1e-8))
        vel = vel * scale
        pos = state.agent_pos + vel * DT

        new_state = MPEState(
            agent_pos=pos,
            agent_vel=vel,
            landmark_pos=state.landmark_pos,
            step=state.step + 1,
        )
        rewards = self._rewards(new_state)
        done = jnp.full(
            (self.num_agents,), new_state.step >= self.max_steps, dtype=bool
        )
        return self._observe(new_state), new_state, rewards, done, {}

    def step(self, rng_key, state, actions: Dict[str, jnp.ndarray]):
        act = jnp.stack([actions[a] for a in self.agents], axis=0)
        obs, new_state, rewards, done, info = self.step_stacked(rng_key, state, act)
        rew_d = {a: rewards[i] for i, a in enumerate(self.agents)}
        done_d = {a: done[i] for i, a in enumerate(self.agents)}
        done_d["__all__"] = jnp.all(done)
        return self._obs_dict(obs), new_state, rew_d, done_d, info

    # ------------------------------------------------------------- dynamics
    def _action_force(self, actions: jnp.ndarray) -> jnp.ndarray:
        if self.discrete_actions:
            return jnp.asarray(DISCRETE_DIRECTIONS)[actions]
        return actions

    def _contact_forces(self, state: MPEState) -> jnp.ndarray:
        """Soft-penetration contact forces among all collidable entities,
        computed as one pairwise broadcast; only agents are movable so only
        agent rows receive force."""
        ent_pos = jnp.concatenate([state.agent_pos, state.landmark_pos], axis=0)
        ent_size = jnp.concatenate(
            [self._sizes, jnp.full((self.num_obs,), LANDMARK_SIZE)]
        )
        n = ent_pos.shape[0]
        delta = ent_pos[:, None, :] - ent_pos[None, :, :]  # [N, N, 2]
        dist = jnp.sqrt(jnp.sum(delta * delta, axis=-1) + 1e-12)
        dist_min = ent_size[:, None] + ent_size[None, :]
        # softplus penetration (smooth contact), per public MPE dynamics
        k = CONTACT_MARGIN
        penetration = jnp.logaddexp(0.0, -(dist - dist_min) / k) * k
        force_mag = CONTACT_FORCE * penetration / dist
        force = delta * force_mag[..., None]
        force = force * (1.0 - jnp.eye(n))[..., None]  # no self-force
        return jnp.sum(force, axis=1)[: self.num_agents]

    def _collision_matrix(self, state: MPEState) -> jnp.ndarray:
        """[n_adv, n_good] bool: adversary i touching good agent j."""
        adv = state.agent_pos[: self.num_adversaries]
        good = state.agent_pos[self.num_adversaries :]
        delta = adv[:, None, :] - good[None, :, :]
        dist = jnp.linalg.norm(delta, axis=-1)
        return dist < (ADV_SIZE + GOOD_SIZE)

    def _rewards(self, state: MPEState) -> jnp.ndarray:
        coll = self._collision_matrix(state)  # [n_adv, n_good]
        # Team reward: every adversary receives +10 per colliding
        # (adversary, good) pair; each good agent -10 per adversary touching
        # *it* — the public simple_tag reward structure.
        adv_rew = jnp.full(
            (self.num_adversaries,), COLLISION_REWARD * jnp.sum(coll)
        )
        good_rew = -COLLISION_REWARD * jnp.sum(coll, axis=0).astype(jnp.float32)
        # boundary penalty on good agents, per coordinate
        good_pos = state.agent_pos[self.num_adversaries :]
        x = jnp.abs(good_pos)
        bound = jnp.where(
            x < 0.9,
            0.0,
            jnp.where(x < 1.0, (x - 0.9) * 10.0, jnp.minimum(jnp.exp(2.0 * x - 2.0), 10.0)),
        )
        good_rew = good_rew - jnp.sum(bound, axis=-1)
        return jnp.concatenate([adv_rew, good_rew])

    # ---------------------------------------------------------- observation
    def _observe(self, state: MPEState) -> StackedObs:
        a, g, l = self.num_adversaries, self.num_good_agents, self.num_obs
        n = self.num_agents
        pos, vel = state.agent_pos, state.agent_vel

        landmark_rel = state.landmark_pos[None, :, :] - pos[:, None, :]  # [A, L, 2]
        other_rel = pos[None, :, :] - pos[:, None, :]  # [A, N, 2] includes self
        # drop self via a static (trace-time) gather -> [A, N-1, 2]
        keep_rows, keep_cols = _np.nonzero(~_np.eye(n, dtype=bool))
        other_rel = other_rel[keep_rows, keep_cols].reshape(n, n - 1, 2)

        good_vel = vel[a:]  # [G, 2]

        def build(idx_lo, idx_hi, include_all_good: bool):
            rows = slice(idx_lo, idx_hi)
            parts = [
                vel[rows],
                pos[rows],
                landmark_rel[rows].reshape(idx_hi - idx_lo, -1),
                other_rel[rows].reshape(idx_hi - idx_lo, -1),
            ]
            if include_all_good:
                gv = jnp.broadcast_to(
                    good_vel.reshape(-1)[None, :], (idx_hi - idx_lo, 2 * g)
                )
            else:
                # good agent i sees the other good agents' velocities
                rows, cols = _np.nonzero(~_np.eye(g, dtype=bool))
                gv = jnp.broadcast_to(good_vel[None], (g, g, 2))[rows, cols].reshape(
                    g, (g - 1) * 2
                )
            parts.append(gv)
            return jnp.concatenate(parts, axis=-1)

        return StackedObs(
            adversary=build(0, a, include_all_good=True),
            good=build(a, n, include_all_good=False),
        )

    def _obs_dict(self, obs: StackedObs) -> Dict[str, jnp.ndarray]:
        out = {}
        for i in range(self.num_adversaries):
            out[f"adversary_{i}"] = obs.adversary[i]
        for i in range(self.num_good_agents):
            out[f"agent_{i}"] = obs.good[i]
        return out


class SpreadObs(NamedTuple):
    """Homogeneous agents: one class tensor."""

    agent: jnp.ndarray  # [N, obs_dim]


SPREAD_AGENT_SIZE = 0.15
SPREAD_LANDMARK_SIZE = 0.05


@dataclass(frozen=True)
class SimpleSpreadEnv:
    """Cooperative MPE simple_spread: N agents cover N landmarks.

    Public scenario spec: agent size .15 (collidable), landmarks .05
    non-collidable targets; shared reward = -Σ_l min_a dist(a, l), plus a
    -1 per-collision local penalty; obs = [self_vel, self_pos,
    landmark_rel, other_rel, other_comm(zeros)].  Second env family proving
    the framework's env registry beyond simple_tag."""

    num_agents: int = 3
    max_steps: int = 25
    discrete_actions: bool = True

    @cached_property
    def agents(self) -> Tuple[str, ...]:
        return tuple(f"agent_{i}" for i in range(self.num_agents))

    @property
    def num_landmarks(self) -> int:
        return self.num_agents

    def obs_dim(self, adversary=False) -> int:
        # accepts a bool or an agent name (all spread agents are identical)
        n = self.num_agents
        # self_vel(2)+self_pos(2)+landmark_rel(2n)+other_rel(2(n-1))+comm(2(n-1))
        return 4 + 2 * n + 4 * (n - 1)

    def action_space(self, agent: str):
        if self.discrete_actions:
            return Discrete(5)
        return Box(-1.0, 1.0, (2,))

    def observation_space(self, agent: str):
        return Box(-jnp.inf, jnp.inf, (self.obs_dim(),))

    def reset_stacked(self, rng_key: jax.Array) -> Tuple[SpreadObs, MPEState]:
        k_a, k_l = jax.random.split(rng_key)
        state = MPEState(
            agent_pos=jax.random.uniform(
                k_a, (self.num_agents, 2), minval=-1.0, maxval=1.0
            ),
            agent_vel=jnp.zeros((self.num_agents, 2)),
            landmark_pos=jax.random.uniform(
                k_l, (self.num_landmarks, 2), minval=-0.9, maxval=0.9
            ),
            step=jnp.int32(0),
        )
        return self._observe(state), state

    def reset(self, rng_key: jax.Array):
        obs, state = self.reset_stacked(rng_key)
        return self._obs_dict(obs), state

    def step_stacked(self, rng_key, state: MPEState, actions: jnp.ndarray):
        del rng_key
        if self.discrete_actions:
            u = jnp.asarray(DISCRETE_DIRECTIONS)[actions]
        else:
            u = actions
        accel = 5.0  # MPE default sensitivity when accel unset
        p_force = u * accel + self._contact_forces(state)
        vel = state.agent_vel * (1.0 - DAMPING) + p_force * DT
        pos = state.agent_pos + vel * DT
        new_state = MPEState(
            agent_pos=pos,
            agent_vel=vel,
            landmark_pos=state.landmark_pos,
            step=state.step + 1,
        )
        rewards = self._rewards(new_state)
        done = jnp.full((self.num_agents,), new_state.step >= self.max_steps, bool)
        return self._observe(new_state), new_state, rewards, done, {}

    def step(self, rng_key, state, actions: Dict[str, jnp.ndarray]):
        act = jnp.stack([actions[a] for a in self.agents], axis=0)
        obs, new_state, rewards, done, info = self.step_stacked(rng_key, state, act)
        rew_d = {a: rewards[i] for i, a in enumerate(self.agents)}
        done_d = {a: done[i] for i, a in enumerate(self.agents)}
        done_d["__all__"] = jnp.all(done)
        return self._obs_dict(obs), new_state, rew_d, done_d, info

    def _contact_forces(self, state: MPEState) -> jnp.ndarray:
        # landmarks are non-collidable in spread: agents only
        pos = state.agent_pos
        n = self.num_agents
        delta = pos[:, None, :] - pos[None, :, :]
        dist = jnp.sqrt(jnp.sum(delta * delta, axis=-1) + 1e-12)
        dist_min = 2 * SPREAD_AGENT_SIZE
        k = CONTACT_MARGIN
        penetration = jnp.logaddexp(0.0, -(dist - dist_min) / k) * k
        force = delta * (CONTACT_FORCE * penetration / dist)[..., None]
        force = force * (1.0 - jnp.eye(n))[..., None]
        return jnp.sum(force, axis=1)

    def _rewards(self, state: MPEState) -> jnp.ndarray:
        # shared coverage reward
        d = jnp.linalg.norm(
            state.landmark_pos[:, None, :] - state.agent_pos[None, :, :], axis=-1
        )  # [L, N]
        coverage = -jnp.sum(jnp.min(d, axis=1))
        # local collision penalty: -1 per other agent in contact
        delta = state.agent_pos[:, None, :] - state.agent_pos[None, :, :]
        dist = jnp.linalg.norm(delta, axis=-1) + jnp.eye(self.num_agents) * 1e9
        coll = jnp.sum(dist < 2 * SPREAD_AGENT_SIZE, axis=1).astype(jnp.float32)
        return jnp.full((self.num_agents,), coverage) - coll

    def _observe(self, state: MPEState) -> SpreadObs:
        n = self.num_agents
        pos, vel = state.agent_pos, state.agent_vel
        landmark_rel = state.landmark_pos[None, :, :] - pos[:, None, :]
        other_rel = pos[None, :, :] - pos[:, None, :]
        rows, cols = _np.nonzero(~_np.eye(n, dtype=bool))
        other_rel = other_rel[rows, cols].reshape(n, n - 1, 2)
        comm = jnp.zeros((n, (n - 1) * 2))  # no communication channel
        obs = jnp.concatenate(
            [
                vel,
                pos,
                landmark_rel.reshape(n, -1),
                other_rel.reshape(n, -1),
                comm,
            ],
            axis=-1,
        )
        return SpreadObs(agent=obs)

    def _obs_dict(self, obs: SpreadObs) -> Dict[str, jnp.ndarray]:
        return {f"agent_{i}": obs.agent[i] for i in range(self.num_agents)}


class AdversaryState(NamedTuple):
    agent_pos: jnp.ndarray  # [A, 2] adversary first, then good agents
    agent_vel: jnp.ndarray  # [A, 2]
    landmark_pos: jnp.ndarray  # [L, 2]
    goal: jnp.ndarray  # int32 index of the goal landmark (chosen at reset)
    step: jnp.ndarray  # int32


ADVERSARY_AGENT_SIZE = 0.15
ADVERSARY_LANDMARK_SIZE = 0.08


@dataclass(frozen=True)
class SimpleAdversaryEnv:
    """MPE simple_adversary (physical deception), public scenario spec:

    1 adversary + N good agents + N landmarks, one of which is the goal
    (chosen uniformly at reset).  Good agents observe the goal-relative
    position; the adversary does not know which landmark is the goal.  No
    contact forces (``collide=False`` for every entity in the published
    scenario), accel 5.0 (the MPE default sensitivity), no speed cap.

    Shaped rewards (the published defaults):
      adversary:  -dist(adversary, goal)
      good (shared): -min_i dist(good_i, goal) + Σ_adv dist(adv, goal)
    Observations (world.agents order = adversary first):
      good:      [goal_rel(2), landmark_rel(2L), other_rel(2(A-1))]
      adversary: [landmark_rel(2L), other_rel(2(A-1))]
    Fourth env family in the registry (tag, spread, world_comm, adversary).
    """

    num_good_agents: int = 2
    max_steps: int = 25
    discrete_actions: bool = True

    @property
    def num_adversaries(self) -> int:
        return 1

    @property
    def num_agents(self) -> int:
        return self.num_good_agents + 1

    @property
    def num_landmarks(self) -> int:
        return self.num_good_agents

    @cached_property
    def agents(self) -> Tuple[str, ...]:
        return ("adversary_0",) + tuple(
            f"agent_{i}" for i in range(self.num_good_agents)
        )

    def obs_dim(self, adversary) -> int:
        if isinstance(adversary, str):
            adversary = adversary.startswith("adversary")
        base = 2 * self.num_landmarks + 2 * (self.num_agents - 1)
        return base if adversary else base + 2

    def action_space(self, agent: str):
        if self.discrete_actions:
            return Discrete(5)
        return Box(-1.0, 1.0, (2,))

    def observation_space(self, agent: str):
        return Box(-jnp.inf, jnp.inf, (self.obs_dim(agent),))

    def reset_stacked(self, rng_key: jax.Array) -> Tuple[StackedObs, AdversaryState]:
        k_a, k_l, k_g = jax.random.split(rng_key, 3)
        state = AdversaryState(
            agent_pos=jax.random.uniform(
                k_a, (self.num_agents, 2), minval=-1.0, maxval=1.0
            ),
            agent_vel=jnp.zeros((self.num_agents, 2)),
            landmark_pos=jax.random.uniform(
                k_l, (self.num_landmarks, 2), minval=-0.9, maxval=0.9
            ),
            goal=jax.random.randint(k_g, (), 0, self.num_landmarks),
            step=jnp.int32(0),
        )
        return self._observe(state), state

    def reset(self, rng_key: jax.Array):
        obs, state = self.reset_stacked(rng_key)
        return self._obs_dict(obs), state

    def step_stacked(self, rng_key, state: AdversaryState, actions: jnp.ndarray):
        del rng_key
        if self.discrete_actions:
            u = jnp.asarray(DISCRETE_DIRECTIONS)[actions]
        else:
            u = actions
        accel = 5.0  # MPE default sensitivity (agents carry no accel here)
        # collide=False for every entity in this scenario: pure kinematics
        vel = state.agent_vel * (1.0 - DAMPING) + u * accel * DT
        pos = state.agent_pos + vel * DT
        new_state = AdversaryState(
            agent_pos=pos,
            agent_vel=vel,
            landmark_pos=state.landmark_pos,
            goal=state.goal,
            step=state.step + 1,
        )
        rewards = self._rewards(new_state)
        done = jnp.full((self.num_agents,), new_state.step >= self.max_steps, bool)
        return self._observe(new_state), new_state, rewards, done, {}

    def step(self, rng_key, state, actions: Dict[str, jnp.ndarray]):
        act = jnp.stack([actions[a] for a in self.agents], axis=0)
        obs, new_state, rewards, done, info = self.step_stacked(rng_key, state, act)
        rew_d = {a: rewards[i] for i, a in enumerate(self.agents)}
        done_d = {a: done[i] for i, a in enumerate(self.agents)}
        done_d["__all__"] = jnp.all(done)
        return self._obs_dict(obs), new_state, rew_d, done_d, info

    def _rewards(self, state: AdversaryState) -> jnp.ndarray:
        goal = state.landmark_pos[state.goal]
        d = jnp.linalg.norm(state.agent_pos - goal[None, :], axis=-1)  # [A]
        adv_d = d[0]
        good_d = d[1:]
        adv_rew = -adv_d
        good_rew = -jnp.min(good_d) + adv_d  # shared shaped reward
        return jnp.concatenate(
            [adv_rew[None], jnp.full((self.num_good_agents,), good_rew)]
        )

    def _observe(self, state: AdversaryState) -> StackedObs:
        n = self.num_agents
        pos = state.agent_pos
        landmark_rel = state.landmark_pos[None, :, :] - pos[:, None, :]  # [A, L, 2]
        other_rel = pos[None, :, :] - pos[:, None, :]  # [A, A, 2]
        rows, cols = _np.nonzero(~_np.eye(n, dtype=bool))
        other_rel = other_rel[rows, cols].reshape(n, n - 1, 2)
        goal_rel = state.landmark_pos[state.goal][None, :] - pos  # [A, 2]
        adv = jnp.concatenate(
            [landmark_rel[:1].reshape(1, -1), other_rel[:1].reshape(1, -1)],
            axis=-1,
        )
        good = jnp.concatenate(
            [
                goal_rel[1:],
                landmark_rel[1:].reshape(n - 1, -1),
                other_rel[1:].reshape(n - 1, -1),
            ],
            axis=-1,
        )
        return StackedObs(adversary=adv, good=good)

    def _obs_dict(self, obs: StackedObs) -> Dict[str, jnp.ndarray]:
        out = {"adversary_0": obs.adversary[0]}
        for i in range(self.num_good_agents):
            out[f"agent_{i}"] = obs.good[i]
        return out


class WorldCommState(NamedTuple):
    agent_pos: jnp.ndarray  # [A, 2] leader, adversaries, good agents
    agent_vel: jnp.ndarray  # [A, 2]
    landmark_pos: jnp.ndarray  # [E, 2] obstacles, food, forests
    leader_comm: jnp.ndarray  # [C] the one non-silent agent's channel
    step: jnp.ndarray  # int32


class WorldCommObs(NamedTuple):
    """Per-class observation tensors (widths differ per class)."""

    lead: jnp.ndarray  # [1, obs_dim_lead]
    adversary: jnp.ndarray  # [n_adv-1, obs_dim_adv]
    good: jnp.ndarray  # [n_good, obs_dim_good]


GOOD_SIZE_WC = 0.045
FOOD_SIZE, FOREST_SIZE = 0.03, 0.3
WC_COLLISION_REWARD = 5.0
FOOD_REWARD = 2.0
BOUNDARY_EXIT_PENALTY = 10.0


@dataclass(frozen=True)
class SimpleWorldCommEnv:
    """simple_world_comm — the scenario the reference's only executable
    self-check runs (jax_ver/jax_buffer.py:151).

    Published scenario structure: 4 adversaries (index 0 is the leader, the
    only non-silent agent, with a dim_c=4 broadcast channel; size .075,
    accel 3.0, max_speed 1.0), 2 good agents (size .045, accel 4.0, max
    speed 1.3), 1 collidable obstacle (size .2), 2 food landmarks (.03,
    non-collidable, +2 to a good agent touching them), 2 forests (.3,
    non-collidable) that hide occupants from everyone outside the same
    forest except the leader.  Rewards: adversaries get +5 per
    (adversary, good) colliding pair plus a -0.1 * min-distance-to-prey
    shaping term; good agents get -5 per adversary touching them, -2*bound
    per coordinate (same bound() as simple_tag), +2 per food touched, and
    the published +0.05 * min-distance-to-food shaping quirk (positive —
    kept as published); everyone gets -10 while outside the unit box.
    Observation widths at the default population: leader 34, adversary 34,
    good agent 28, matching the published spaces; the exact concatenation
    order within a class follows the published per-agent loops (entities,
    then masked others, then good velocities, then forest indicators, then
    the leader channel).

    Discrete actions only (the reference path): non-leader agents Discrete(5)
    movement; the leader Discrete(20) = movement (a % 5) x comm (a // 5)
    exactly as the published action splitter decomposes its MultiDiscrete.
    """

    num_good_agents: int = 2
    num_adversaries: int = 4  # includes the leader (index 0)
    num_obs: int = 1
    num_food: int = 2
    num_forests: int = 2
    dim_c: int = 4
    max_steps: int = 25
    discrete_actions: bool = True

    @cached_property
    def agents(self) -> Tuple[str, ...]:
        return (
            ("leadadversary_0",)
            + tuple(f"adversary_{i}" for i in range(self.num_adversaries - 1))
            + tuple(f"agent_{i}" for i in range(self.num_good_agents))
        )

    @property
    def num_agents(self) -> int:
        return self.num_adversaries + self.num_good_agents

    @property
    def num_landmarks(self) -> int:
        return self.num_obs + self.num_food + self.num_forests

    # landmark layout inside landmark_pos: [obstacles | food | forests]
    @property
    def _food_slice(self) -> slice:
        return slice(self.num_obs, self.num_obs + self.num_food)

    @property
    def _forest_slice(self) -> slice:
        return slice(self.num_obs + self.num_food, self.num_landmarks)

    @cached_property
    def _sizes(self) -> _np.ndarray:
        return _np.concatenate(
            [
                _np.full((self.num_adversaries,), ADV_SIZE, _np.float32),
                _np.full((self.num_good_agents,), GOOD_SIZE_WC, _np.float32),
            ]
        )

    @cached_property
    def _accels(self) -> _np.ndarray:
        return _np.concatenate(
            [
                _np.full((self.num_adversaries,), ADV_ACCEL, _np.float32),
                _np.full((self.num_good_agents,), GOOD_ACCEL, _np.float32),
            ]
        )

    @cached_property
    def _max_speeds(self) -> _np.ndarray:
        return _np.concatenate(
            [
                _np.full((self.num_adversaries,), ADV_MAX_SPEED, _np.float32),
                _np.full((self.num_good_agents,), GOOD_MAX_SPEED, _np.float32),
            ]
        )

    def obs_dim(self, agent: str) -> int:
        e, a, g = self.num_landmarks, self.num_agents, self.num_good_agents
        base = 4 + 2 * e + 2 * (a - 1)
        if agent.startswith("leadadversary"):
            return base + 2 * g + self.num_forests + self.dim_c
        if agent.startswith("adversary"):
            return base + 2 * g + g + self.dim_c
        return base + 2 * (g - 1) + self.num_forests

    def action_space(self, agent: str):
        if not self.discrete_actions:
            raise ValueError(
                "simple_world_comm supports discrete actions only (the "
                "reference path, jax_ver/jax_buffer.py:151)"
            )
        if agent.startswith("leadadversary"):
            return Discrete(5 * self.dim_c)  # move x comm
        return Discrete(5)

    def observation_space(self, agent: str):
        return Box(-jnp.inf, jnp.inf, (self.obs_dim(agent),))

    # ---------------------------------------------------------------- reset
    def reset_stacked(self, rng_key: jax.Array) -> Tuple[WorldCommObs, WorldCommState]:
        k_a, k_l = jax.random.split(rng_key)
        state = WorldCommState(
            agent_pos=jax.random.uniform(
                k_a, (self.num_agents, 2), minval=-1.0, maxval=1.0
            ),
            agent_vel=jnp.zeros((self.num_agents, 2)),
            landmark_pos=jax.random.uniform(
                k_l, (self.num_landmarks, 2), minval=-0.9, maxval=0.9
            ),
            leader_comm=jnp.zeros((self.dim_c,)),
            step=jnp.int32(0),
        )
        return self._observe(state), state

    def reset(self, rng_key: jax.Array):
        obs, state = self.reset_stacked(rng_key)
        return self._obs_dict(obs), state

    # ----------------------------------------------------------------- step
    def step_stacked(
        self, rng_key: jax.Array, state: WorldCommState, actions: jnp.ndarray
    ) -> Tuple[WorldCommObs, WorldCommState, jnp.ndarray, jnp.ndarray, Dict]:
        """actions: [A] int; leader entry in [0, 5*dim_c), rest in [0, 5)."""
        del rng_key
        directions = jnp.asarray(DISCRETE_DIRECTIONS)
        move = actions % 5  # published splitter: movement = a % 5
        u = directions[move]
        p_force = u * self._accels[:, None] + self._contact_forces(state)

        vel = state.agent_vel * (1.0 - DAMPING) + p_force * DT
        speed = jnp.linalg.norm(vel, axis=-1, keepdims=True)
        scale = jnp.minimum(1.0, self._max_speeds[:, None] / jnp.maximum(speed, 1e-8))
        vel = vel * scale
        pos = state.agent_pos + vel * DT

        comm_idx = jnp.clip(actions[0] // 5, 0, self.dim_c - 1)
        leader_comm = jax.nn.one_hot(comm_idx, self.dim_c)

        new_state = WorldCommState(
            agent_pos=pos,
            agent_vel=vel,
            landmark_pos=state.landmark_pos,
            leader_comm=leader_comm,
            step=state.step + 1,
        )
        rewards = self._rewards(new_state)
        done = jnp.full(
            (self.num_agents,), new_state.step >= self.max_steps, dtype=bool
        )
        return self._observe(new_state), new_state, rewards, done, {}

    def step(self, rng_key, state, actions: Dict[str, jnp.ndarray]):
        act = jnp.stack([actions[a] for a in self.agents], axis=0)
        obs, new_state, rewards, done, info = self.step_stacked(rng_key, state, act)
        rew_d = {a: rewards[i] for i, a in enumerate(self.agents)}
        done_d = {a: done[i] for i, a in enumerate(self.agents)}
        done_d["__all__"] = jnp.all(done)
        return self._obs_dict(obs), new_state, rew_d, done_d, info

    # ------------------------------------------------------------- dynamics
    def _contact_forces(self, state: WorldCommState) -> jnp.ndarray:
        """Collidable entities: agents + obstacles (food/forests pass
        through).  Same soft-penetration model as simple_tag."""
        obstacle_pos = state.landmark_pos[: self.num_obs]
        ent_pos = jnp.concatenate([state.agent_pos, obstacle_pos], axis=0)
        ent_size = jnp.concatenate(
            [self._sizes, jnp.full((self.num_obs,), LANDMARK_SIZE)]
        )
        n = ent_pos.shape[0]
        delta = ent_pos[:, None, :] - ent_pos[None, :, :]
        dist = jnp.sqrt(jnp.sum(delta * delta, axis=-1) + 1e-12)
        dist_min = ent_size[:, None] + ent_size[None, :]
        k = CONTACT_MARGIN
        penetration = jnp.logaddexp(0.0, -(dist - dist_min) / k) * k
        force = delta * (CONTACT_FORCE * penetration / dist)[..., None]
        force = force * (1.0 - jnp.eye(n))[..., None]
        return jnp.sum(force, axis=1)[: self.num_agents]

    def _rewards(self, state: WorldCommState) -> jnp.ndarray:
        n_adv, n_good = self.num_adversaries, self.num_good_agents
        adv_pos = state.agent_pos[:n_adv]
        good_pos = state.agent_pos[n_adv:]

        d_ag = jnp.linalg.norm(
            adv_pos[:, None, :] - good_pos[None, :, :], axis=-1
        )  # [n_adv, n_good]
        coll = d_ag < (ADV_SIZE + GOOD_SIZE_WC)

        # adversaries: +5 per colliding pair (every adversary gets the team
        # total) - 0.1 * own min distance to a prey (shaping, shape=True in
        # the published adversary_reward)
        adv_rew = WC_COLLISION_REWARD * jnp.sum(coll) - 0.1 * jnp.min(d_ag, axis=1)

        # good agents: -5 per adversary touching them, -2*bound per coord,
        # +2 per food touched, +0.05 * min distance to food (published
        # sign quirk)
        good_rew = -WC_COLLISION_REWARD * jnp.sum(coll, axis=0).astype(jnp.float32)
        x = jnp.abs(good_pos)
        bound = jnp.where(
            x < 0.9,
            0.0,
            jnp.where(
                x < 1.0, (x - 0.9) * 10.0, jnp.minimum(jnp.exp(2.0 * x - 2.0), 10.0)
            ),
        )
        good_rew = good_rew - 2.0 * jnp.sum(bound, axis=-1)
        food_pos = state.landmark_pos[self._food_slice]
        d_food = jnp.linalg.norm(
            good_pos[:, None, :] - food_pos[None, :, :], axis=-1
        )  # [n_good, n_food]
        good_rew = good_rew + FOOD_REWARD * jnp.sum(
            d_food < (GOOD_SIZE_WC + FOOD_SIZE), axis=1
        )
        good_rew = good_rew + 0.05 * jnp.min(d_food, axis=1)

        rewards = jnp.concatenate([adv_rew, good_rew])
        # -10 while outside the unit box (applies to every agent)
        outside = jnp.any(jnp.abs(state.agent_pos) > 1.0, axis=-1)
        return rewards - BOUNDARY_EXIT_PENALTY * outside.astype(jnp.float32)

    # ---------------------------------------------------------- observation
    def _forest_membership(self, state: WorldCommState) -> jnp.ndarray:
        """[A, n_forests] bool: agent inside forest (collision test against
        the forest disc)."""
        forest_pos = state.landmark_pos[self._forest_slice]
        d = jnp.linalg.norm(
            state.agent_pos[:, None, :] - forest_pos[None, :, :], axis=-1
        )
        return d < (self._sizes[:, None] + FOREST_SIZE)

    def _observe(self, state: WorldCommState) -> WorldCommObs:
        n_adv, n_good, n = self.num_adversaries, self.num_good_agents, self.num_agents
        pos, vel = state.agent_pos, state.agent_vel

        entity_rel = state.landmark_pos[None, :, :] - pos[:, None, :]  # [A, E, 2]

        in_f = self._forest_membership(state)  # [A, F] bool
        in_any = jnp.any(in_f, axis=-1)  # [A]
        # visibility of j to observer i: same forest, both outside all
        # forests, or observer is the leader
        same_forest = jnp.einsum("if,jf->ij", in_f, in_f) > 0
        both_out = (~in_any)[:, None] & (~in_any)[None, :]
        vis = same_forest | both_out
        vis = vis.at[0, :].set(True)  # leader sees everyone
        visf = vis.astype(jnp.float32)

        other_rel = (pos[None, :, :] - pos[:, None, :]) * visf[..., None]
        good_vel_seen = vel[None, n_adv:, :] * visf[:, n_adv:, None]  # [A, G, 2]

        keep_rows, keep_cols = _np.nonzero(~_np.eye(n, dtype=bool))
        other_rel = other_rel[keep_rows, keep_cols].reshape(n, n - 1, 2)

        # prey indicators (1 / -1 encoding like the published scenario)
        pm = lambda b: jnp.where(b, 1.0, -1.0)
        prey_forest = pm(in_any[n_adv:])  # [G] per-prey any-forest
        prey_forest_lead = pm(jnp.any(in_f[n_adv:], axis=0))  # [F] per-forest
        comm = state.leader_comm  # [C]

        def rows(lo, hi):
            return (
                vel[lo:hi],
                pos[lo:hi],
                entity_rel[lo:hi].reshape(hi - lo, -1),
                other_rel[lo:hi].reshape(hi - lo, -1),
            )

        def tile(v, count):
            return jnp.broadcast_to(v[None, :], (count, v.shape[0]))

        # leader: [vel, pos, entities, others, good vels, per-forest prey
        # flag, own channel]
        lv, lp, le, lo = rows(0, 1)
        lead = jnp.concatenate(
            [lv, lp, le, lo, good_vel_seen[0:1].reshape(1, -1),
             tile(prey_forest_lead, 1), tile(comm, 1)],
            axis=-1,
        )
        # non-lead adversaries: per-prey forest flag instead
        av, ap, ae, ao = rows(1, n_adv)
        adv = jnp.concatenate(
            [av, ap, ae, ao, good_vel_seen[1:n_adv].reshape(n_adv - 1, -1),
             tile(prey_forest, n_adv - 1), tile(comm, n_adv - 1)],
            axis=-1,
        )
        # good agents: own in-forest flags; see other good agents'
        # velocities (self dropped), no channel
        gv, gp, ge, go = rows(n_adv, n)
        grows, gcols = _np.nonzero(~_np.eye(n_good, dtype=bool))
        gv_others = good_vel_seen[n_adv:][grows, gcols].reshape(
            n_good, (n_good - 1) * 2
        )
        good = jnp.concatenate(
            [gv, gp, ge, pm(in_f[n_adv:]), go, gv_others], axis=-1
        )
        return WorldCommObs(lead=lead, adversary=adv, good=good)

    def _obs_dict(self, obs: WorldCommObs) -> Dict[str, jnp.ndarray]:
        out = {"leadadversary_0": obs.lead[0]}
        for i in range(self.num_adversaries - 1):
            out[f"adversary_{i}"] = obs.adversary[i]
        for i in range(self.num_good_agents):
            out[f"agent_{i}"] = obs.good[i]
        return out


_REGISTRY = {
    "MPE_simple_tag_v3": SimpleTagEnv,
    "MPE_simple_spread_v3": SimpleSpreadEnv,
    "MPE_simple_world_comm_v3": SimpleWorldCommEnv,
    "MPE_simple_adversary_v3": SimpleAdversaryEnv,
}

# population-style kwargs accepted per env (reference surface passes
# num_good_agents/num_adversaries/num_obs unconditionally, jax_ver/main.py:59)
_KWARG_MAP = {
    "MPE_simple_spread_v3": {"num_good_agents": "num_agents"},
}


def tag_prey_rel_slice(num_obs: int, n_adv: int, n_good: int) -> slice:
    """Columns of an ADVERSARY's simple_tag observation holding the
    relative-prey positions — the exact subspace the true tag reward
    reads.  Single source of truth for the offset into
    SimpleTagEnv._observe's layout [self_vel(2), self_pos(2),
    landmark_rel(2L), other_adv_rel(2(n_adv-1)), prey_rel(2*n_good),
    good_vel...]; the loss-side prey_dist_weight lever
    (trainer.build_s_col_weight) derives from this instead of re-deriving
    the formula."""
    off = 4 + 2 * num_obs + 2 * (n_adv - 1)
    return slice(off, off + 2 * n_good)


def make(name: str, **kwargs):
    """Factory with the jaxmarl surface the reference calls
    (jax_ver/main.py:59-62: make('MPE_simple_tag_v3', num_good_agents=...,
    num_adversaries=..., num_obs=...))."""
    if name not in _REGISTRY:
        raise ValueError(f"unknown env {name!r}; available: {sorted(_REGISTRY)}")
    cls = _REGISTRY[name]
    remap = _KWARG_MAP.get(name, {})
    fields = {f.name for f in dataclasses.fields(cls)}
    clean = {}
    for k, v in kwargs.items():
        k = remap.get(k, k)
        if k in fields:
            clean[k] = v
    return cls(**clean)
