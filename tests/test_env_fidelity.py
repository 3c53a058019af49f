"""Bit-level environment fidelity vs the published MPE dynamics.

The reference trains on PettingZoo / JaxMARL MPE simple_tag
(torch_ver/src/env.py:27, jax_ver/main.py:59-62).  Neither library ships in
this image, so fidelity is established against an independent ORACLE written
here: a per-entity-loop, numpy transcription of the published MPE
specification (world integrator, soft contact forces, scenario rewards, and
observation layouts as defined by the multiagent-particle-envs world model
that both PettingZoo and JaxMARL implement).  The oracle deliberately shares
no code or structure with mfvae_tpu.envs.mpe — it loops over entities and
pairs exactly the way the published implementation does, while the framework
env is fully vectorized — so agreement is meaningful evidence.

On top of the oracle diff there are literal hand-computed goldens: closed-form
single-agent kinematics, boundary-penalty values, and collision-reward counts
at hand-placed positions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfvae_tpu.envs.mpe import (
    MPEState,
    SimpleSpreadEnv,
    SimpleTagEnv,
    SimpleWorldCommEnv,
    WorldCommState,
)

DT, DAMPING = 0.1, 0.25
CONTACT_FORCE, CONTACT_MARGIN = 1e2, 1e-3


class Entity:
    def __init__(self, size, accel, max_speed, movable, collide, adversary=False):
        self.size = size
        self.accel = accel
        self.max_speed = max_speed
        self.movable = movable
        self.collide = collide
        self.adversary = adversary
        self.pos = np.zeros(2)
        self.vel = np.zeros(2)
        self.u = np.zeros(2)


class SimpleTagOracle:
    """Published simple_tag, per-entity loops.

    Scenario constants: adversaries size .075 / accel 3.0 / max_speed 1.0;
    good agents .05 / 4.0 / 1.3; landmarks size .2, collidable, static.
    World: dt .1, damping .25, contact_force 1e2, contact_margin 1e-3.
    Agent order: adversaries first, then good agents.
    """

    def __init__(self, n_adv, n_good, n_land):
        self.agents = [
            Entity(0.075, 3.0, 1.0, True, True, adversary=True)
            for _ in range(n_adv)
        ] + [Entity(0.05, 4.0, 1.3, True, True) for _ in range(n_good)]
        self.landmarks = [
            Entity(0.2, None, None, False, True) for _ in range(n_land)
        ]

    @property
    def entities(self):
        return self.agents + self.landmarks

    def set_state(self, agent_pos, agent_vel, landmark_pos):
        for a, p, v in zip(self.agents, agent_pos, agent_vel):
            a.pos, a.vel = np.array(p, np.float64), np.array(v, np.float64)
        for l, p in zip(self.landmarks, landmark_pos):
            l.pos = np.array(p, np.float64)

    def set_discrete_actions(self, actions):
        # published discrete map: 1 -> -x, 2 -> +x, 3 -> -y, 4 -> +y,
        # scaled by sensitivity (= accel when set)
        for agent, act in zip(self.agents, actions):
            u = np.zeros(2)
            if act == 1:
                u[0] = -1.0
            elif act == 2:
                u[0] = +1.0
            elif act == 3:
                u[1] = -1.0
            elif act == 4:
                u[1] = +1.0
            sensitivity = agent.accel if agent.accel is not None else 5.0
            agent.u = u * sensitivity

    def _collision_force(self, ea, eb):
        if (not ea.collide) or (not eb.collide) or ea is eb:
            return None, None
        delta = ea.pos - eb.pos
        dist = np.sqrt(np.sum(delta * delta))
        dist_min = ea.size + eb.size
        k = CONTACT_MARGIN
        penetration = np.logaddexp(0, -(dist - dist_min) / k) * k
        force = CONTACT_FORCE * delta / dist * penetration
        fa = +force if ea.movable else None
        fb = -force if eb.movable else None
        return fa, fb

    def world_step(self):
        ents = self.entities
        p_force = [None] * len(ents)
        # action forces
        for i, e in enumerate(ents):
            if e.movable:
                p_force[i] = e.u.copy()
        # environment (contact) forces, each unordered pair once
        for i, ea in enumerate(ents):
            for j, eb in enumerate(ents):
                if j <= i:
                    continue
                fa, fb = self._collision_force(ea, eb)
                if fa is not None:
                    p_force[i] = (0.0 if p_force[i] is None else p_force[i]) + fa
                if fb is not None:
                    p_force[j] = (0.0 if p_force[j] is None else p_force[j]) + fb
        # integrate (unit mass)
        for i, e in enumerate(ents):
            if not e.movable:
                continue
            e.vel = e.vel * (1 - DAMPING)
            if p_force[i] is not None:
                e.vel = e.vel + p_force[i] * DT
            if e.max_speed is not None:
                speed = np.sqrt(np.sum(e.vel**2))
                if speed > e.max_speed:
                    e.vel = e.vel / speed * e.max_speed
            e.pos = e.pos + e.vel * DT

    @staticmethod
    def _is_collision(a, b):
        dist = np.sqrt(np.sum((a.pos - b.pos) ** 2))
        return dist < a.size + b.size

    @staticmethod
    def _bound(x):
        if x < 0.9:
            return 0.0
        if x < 1.0:
            return (x - 0.9) * 10
        return min(np.exp(2 * x - 2), 10)

    def rewards(self):
        good = [a for a in self.agents if not a.adversary]
        advs = [a for a in self.agents if a.adversary]
        out = []
        for agent in self.agents:
            rew = 0.0
            if agent.adversary:
                for ag in good:
                    for adv in advs:
                        if self._is_collision(ag, adv):
                            rew += 10
            else:
                for adv in advs:
                    if self._is_collision(adv, agent):
                        rew -= 10
                for p in range(2):
                    rew -= self._bound(abs(agent.pos[p]))
            out.append(rew)
        return np.array(out)

    def observe(self, agent):
        entity_pos = [l.pos - agent.pos for l in self.landmarks]
        other_pos, other_vel = [], []
        for other in self.agents:
            if other is agent:
                continue
            other_pos.append(other.pos - agent.pos)
            if not other.adversary:
                other_vel.append(other.vel)
        return np.concatenate(
            [agent.vel, agent.pos] + entity_pos + other_pos + other_vel
        )

    def observations(self):
        """(adversary rows, good rows) — widths differ per class: good
        agents see one fewer good-velocity block (self excluded)."""
        adv = [self.observe(a) for a in self.agents if a.adversary]
        good = [self.observe(a) for a in self.agents if not a.adversary]
        return np.stack(adv), np.stack(good)


class SimpleSpreadOracle:
    """Published simple_spread: N agents (size .15, collidable, sensitivity
    5.0, no max_speed) cover N landmarks (size .05, non-collidable); reward =
    shared -sum_l min_a dist + local -1 per colliding other agent; obs =
    [self_vel, self_pos, landmark_rel, other_rel, comm zeros]."""

    def __init__(self, n):
        self.agents = [Entity(0.15, None, None, True, True) for _ in range(n)]
        self.landmarks = [Entity(0.05, None, None, False, False) for _ in range(n)]

    set_state = SimpleTagOracle.set_state
    set_discrete_actions = SimpleTagOracle.set_discrete_actions
    _collision_force = SimpleTagOracle._collision_force
    world_step = SimpleTagOracle.world_step
    _is_collision = staticmethod(SimpleTagOracle._is_collision)

    @property
    def entities(self):
        return self.agents + self.landmarks

    def rewards(self):
        glob = 0.0
        for lm in self.landmarks:
            glob -= min(
                np.sqrt(np.sum((a.pos - lm.pos) ** 2)) for a in self.agents
            )
        out = []
        for agent in self.agents:
            rew = glob
            for a in self.agents:
                if a is not agent and self._is_collision(a, agent):
                    rew -= 1.0
            out.append(rew)
        return np.array(out)

    def observations(self):
        out = []
        for agent in self.agents:
            lm = [l.pos - agent.pos for l in self.landmarks]
            other = [o.pos - agent.pos for o in self.agents if o is not agent]
            comm = [np.zeros(2) for o in self.agents if o is not agent]
            out.append(np.concatenate([agent.vel, agent.pos] + lm + other + comm))
        return np.stack(out)


def random_state(rng, n_agents, n_land, spread_vel=0.5):
    return (
        rng.uniform(-1, 1, (n_agents, 2)),
        rng.uniform(-spread_vel, spread_vel, (n_agents, 2)),
        rng.uniform(-0.9, 0.9, (n_land, 2)),
    )


class TestSimpleTagFidelity:
    @pytest.mark.parametrize("pop", [(3, 2, 2), (6, 2, 4)])
    def test_rollout_matches_oracle(self, pop):
        """Multi-step rollouts from random states with random discrete
        actions: positions, velocities, rewards, and full observation
        vectors must match the per-entity-loop oracle."""
        n_adv, n_good, n_land = pop
        env = SimpleTagEnv(
            num_good_agents=n_good, num_adversaries=n_adv, num_obs=n_land
        )
        oracle = SimpleTagOracle(n_adv, n_good, n_land)
        rng = np.random.default_rng(0)
        n = n_adv + n_good

        pos, vel, lpos = random_state(rng, n, n_land)
        # Deterministic collision: adversary 0 and good agent 0 start
        # 0.16 apart closing at 1.0 — after one damped step they sit 0.085
        # apart (< 0.125 contact distance), firing both the collision reward
        # and the contact force.  Placed far from the others so the
        # interaction is isolated (their actions are forced to no-op below).
        pos[0], vel[0] = [10.16, 10.0], [-0.5, 0.0]
        pos[n_adv], vel[n_adv] = [10.0, 10.0], [0.5, 0.0]
        oracle.set_state(pos, vel, lpos)
        state = MPEState(
            agent_pos=jnp.asarray(pos, jnp.float32),
            agent_vel=jnp.asarray(vel, jnp.float32),
            landmark_pos=jnp.asarray(lpos, jnp.float32),
            step=jnp.int32(0),
        )
        step = jax.jit(env.step_stacked)
        saw_collision_reward = False
        for t in range(12):
            actions = rng.integers(0, 5, size=n)
            actions[0] = actions[n_adv] = 0  # keep the staged pair ballistic
            oracle.set_discrete_actions(actions)
            oracle.world_step()
            want_rew = oracle.rewards()
            want_adv_obs, want_good_obs = oracle.observations()

            obs, state, rewards, done, _ = step(
                jax.random.PRNGKey(t), state, jnp.asarray(actions)
            )
            got_pos = np.asarray(state.agent_pos)
            got_vel = np.asarray(state.agent_vel)
            np.testing.assert_allclose(
                got_pos, np.stack([a.pos for a in oracle.agents]),
                rtol=1e-4, atol=1e-5,
            )
            np.testing.assert_allclose(
                got_vel, np.stack([a.vel for a in oracle.agents]),
                rtol=1e-4, atol=1e-5,
            )
            np.testing.assert_allclose(
                np.asarray(obs.adversary), want_adv_obs, rtol=1e-4, atol=1e-5
            )
            np.testing.assert_allclose(
                np.asarray(obs.good), want_good_obs, rtol=1e-4, atol=1e-5
            )
            np.testing.assert_allclose(
                np.asarray(rewards), want_rew, rtol=1e-4, atol=1e-5
            )
            if np.any(want_rew > 0):
                saw_collision_reward = True
        assert saw_collision_reward, "rollout never exercised collision rewards"

    def test_single_agent_kinematics_closed_form(self):
        """Hand-computed golden: one adversary far from everything, action
        +x.  vel' = vel*(1-0.25) + accel*dt = 0.75*vel + 3.0*0.1;
        pos' = pos + vel'*dt."""
        env = SimpleTagEnv(num_good_agents=1, num_adversaries=1, num_obs=1)
        pos = np.array([[0.0, 0.0], [50.0, 50.0]], np.float32)  # far apart
        vel = np.array([[0.2, -0.1], [0.0, 0.0]], np.float32)
        lpos = np.array([[-50.0, -50.0]], np.float32)
        state = MPEState(jnp.asarray(pos), jnp.asarray(vel),
                         jnp.asarray(lpos), jnp.int32(0))
        _, new_state, _, _, _ = env.step_stacked(
            jax.random.PRNGKey(0), state, jnp.array([2, 0])
        )
        want_vel = np.array([0.75 * 0.2 + 3.0 * 0.1, 0.75 * -0.1])  # [.45,-.075]
        np.testing.assert_allclose(
            np.asarray(new_state.agent_vel)[0], want_vel, rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(new_state.agent_pos)[0], want_vel * 0.1, rtol=1e-6
        )

    def test_max_speed_clamp(self):
        """Adversary max_speed 1.0: from vel (2, 0) with no force, damped
        vel 1.5 exceeds the cap and is renormalized to exactly 1.0."""
        env = SimpleTagEnv(num_good_agents=1, num_adversaries=1, num_obs=1)
        pos = np.array([[0.0, 0.0], [50.0, 50.0]], np.float32)
        vel = np.array([[2.0, 0.0], [0.0, 0.0]], np.float32)
        state = MPEState(jnp.asarray(pos), jnp.asarray(vel),
                         jnp.asarray(np.full((1, 2), -50.0, np.float32)),
                         jnp.int32(0))
        _, new_state, _, _, _ = env.step_stacked(
            jax.random.PRNGKey(0), state, jnp.array([0, 0])
        )
        np.testing.assert_allclose(
            np.asarray(new_state.agent_vel)[0], [1.0, 0.0], rtol=1e-6
        )

    def test_boundary_penalty_golden(self):
        """bound(x): 0 below 0.9; (x-0.9)*10 in [0.9, 1); min(exp(2x-2), 10)
        beyond.  Good agent at (0.95, 1.1) -> penalty 0.5 + exp(0.2)."""
        env = SimpleTagEnv(num_good_agents=1, num_adversaries=1, num_obs=1)
        pos = np.array([[50.0, 50.0], [0.95, 1.1]], np.float32)
        state = MPEState(jnp.asarray(pos), jnp.zeros((2, 2), jnp.float32),
                         jnp.asarray(np.full((1, 2), -50.0, np.float32)),
                         jnp.int32(0))
        rew = np.asarray(env._rewards(state))
        want = -(0.5 + np.exp(2 * 1.1 - 2))
        np.testing.assert_allclose(rew[1], want, rtol=1e-5)
        assert rew[0] == 0.0

    def test_collision_reward_counting(self):
        """2 adversaries both touching good agent 0 (dist < .075+.05), one
        also touching good agent 1: 3 colliding pairs -> every adversary
        +30; good 0 gets -20, good 1 gets -10."""
        env = SimpleTagEnv(num_good_agents=2, num_adversaries=2, num_obs=1)
        g0, g1 = np.array([0.0, 0.0]), np.array([0.1, 0.0])
        adv0 = g0 + [0.06, 0.0]  # touches g0 (.06 < .125) and g1 (.04 < .125)
        adv1 = g0 - [0.06, 0.0]  # touches g0 only (dist to g1 = .16 > .125)
        pos = np.stack([adv0, adv1, g0, g1]).astype(np.float32)
        state = MPEState(jnp.asarray(pos), jnp.zeros((4, 2), jnp.float32),
                         jnp.asarray(np.full((1, 2), -50.0, np.float32)),
                         jnp.int32(0))
        rew = np.asarray(env._rewards(state))
        np.testing.assert_allclose(rew[:2], [30.0, 30.0])
        np.testing.assert_allclose(rew[2:], [-20.0, -10.0])

    def test_contact_force_hand_computed(self):
        """Two overlapping adversaries at distance .1 (dist_min .15):
        penetration = logaddexp(0, (dist_min-dist)/k)*k with k=1e-3, force
        magnitude 100*penetration, along +/-x."""
        env = SimpleTagEnv(num_good_agents=1, num_adversaries=2, num_obs=1)
        pos = np.array([[0.0, 0.0], [0.1, 0.0], [50.0, 50.0]], np.float32)
        state = MPEState(jnp.asarray(pos), jnp.zeros((3, 2), jnp.float32),
                         jnp.asarray(np.full((1, 2), -50.0, np.float32)),
                         jnp.int32(0))
        f = np.asarray(env._contact_forces(state))
        pen = np.logaddexp(0.0, (0.15 - 0.1) / 1e-3) * 1e-3
        want = 100.0 * pen  # delta/dist is a unit vector along x
        np.testing.assert_allclose(f[0], [-want, 0.0], rtol=1e-4)
        np.testing.assert_allclose(f[1], [+want, 0.0], rtol=1e-4)

    def test_obs_layout_reference_population(self):
        """Obs widths at the reference population (30 adv + 10 good + 20
        landmarks): adversary 4 + 40 + 78 + 20 = 142, good agent
        4 + 40 + 78 + 18 = 140 — matching get_space_size over the published
        Box spaces (torch_ver/src/env.py:6-21 consumes these)."""
        env = SimpleTagEnv()
        assert env.obs_dim(adversary=True) == 142
        assert env.obs_dim(adversary=False) == 140
        obs, _ = env.reset_stacked(jax.random.PRNGKey(0))
        assert obs.adversary.shape == (30, 142)
        assert obs.good.shape == (10, 140)


class TestSimpleSpreadFidelity:
    def test_rollout_matches_oracle(self):
        n = 4
        env = SimpleSpreadEnv(num_agents=n)
        oracle = SimpleSpreadOracle(n)
        rng = np.random.default_rng(3)
        pos, vel, lpos = random_state(rng, n, n)
        pos[1] = pos[0] + np.array([0.2, 0.0])  # overlapping pair (< .3)
        oracle.set_state(pos, vel, lpos)
        state = MPEState(
            agent_pos=jnp.asarray(pos, jnp.float32),
            agent_vel=jnp.asarray(vel, jnp.float32),
            landmark_pos=jnp.asarray(lpos, jnp.float32),
            step=jnp.int32(0),
        )
        step = jax.jit(env.step_stacked)
        for t in range(10):
            actions = rng.integers(0, 5, size=n)
            oracle.set_discrete_actions(actions)
            oracle.world_step()
            obs, state, rewards, done, _ = step(
                jax.random.PRNGKey(t), state, jnp.asarray(actions)
            )
            np.testing.assert_allclose(
                np.asarray(state.agent_pos),
                np.stack([a.pos for a in oracle.agents]),
                rtol=1e-4, atol=1e-5,
            )
            np.testing.assert_allclose(
                np.asarray(obs.agent), oracle.observations(),
                rtol=1e-4, atol=1e-5,
            )
            np.testing.assert_allclose(
                np.asarray(rewards), oracle.rewards(), rtol=1e-4, atol=1e-5
            )


class WorldCommOracle:
    """simple_world_comm per-agent loops: 1 leader + 3 adversaries (size
    .075/accel 3/max 1.0) + 2 good (size .045/accel 4/max 1.3); landmarks =
    [obstacle(.2, collide), food x2(.03), forest x2(.3)]; leader has a
    dim_c=4 one-hot channel; forests hide occupants from everyone outside
    except the leader."""

    def __init__(self):
        self.agents = [Entity(0.075, 3.0, 1.0, True, True, adversary=True)
                       for _ in range(4)] + \
                      [Entity(0.045, 4.0, 1.3, True, True) for _ in range(2)]
        self.obstacles = [Entity(0.2, None, None, False, True)]
        self.food = [Entity(0.03, None, None, False, False) for _ in range(2)]
        self.forests = [Entity(0.3, None, None, False, False) for _ in range(2)]
        self.comm = np.zeros(4)

    @property
    def landmarks(self):
        return self.obstacles + self.food + self.forests

    @property
    def entities(self):
        return self.agents + self.obstacles  # collidable only

    set_state = SimpleTagOracle.set_state
    _collision_force = SimpleTagOracle._collision_force
    world_step = SimpleTagOracle.world_step
    _is_collision = staticmethod(SimpleTagOracle._is_collision)
    _bound = staticmethod(SimpleTagOracle._bound)

    def set_landmarks(self, landmark_pos):
        for l, p in zip(self.landmarks, landmark_pos):
            l.pos = np.array(p, np.float64)

    def set_discrete_actions(self, actions):
        for agent, act in zip(self.agents, actions):
            move = act % 5
            u = np.zeros(2)
            if move == 1:
                u[0] = -1.0
            elif move == 2:
                u[0] = +1.0
            elif move == 3:
                u[1] = -1.0
            elif move == 4:
                u[1] = +1.0
            agent.u = u * agent.accel
        self.comm = np.zeros(4)
        self.comm[min(int(actions[0]) // 5, 3)] = 1.0

    def rewards(self):
        advs, good = self.agents[:4], self.agents[4:]
        pairs = sum(
            self._is_collision(a, g) for a in advs for g in good
        )
        out = []
        for i, agent in enumerate(self.agents):
            if agent.adversary:
                rew = 5.0 * pairs
                rew -= 0.1 * min(
                    np.sqrt(np.sum((g.pos - agent.pos) ** 2)) for g in good
                )
            else:
                rew = -5.0 * sum(self._is_collision(a, agent) for a in advs)
                for p in range(2):
                    rew -= 2 * self._bound(abs(agent.pos[p]))
                for f in self.food:
                    if self._is_collision(agent, f):
                        rew += 2
                rew += 0.05 * min(
                    np.sqrt(np.sum((f.pos - agent.pos) ** 2)) for f in self.food
                )
            if any(abs(agent.pos[p]) > 1.0 for p in range(2)):
                rew -= 10.0
            out.append(rew)
        return np.array(out)

    def _in_forest(self, e):
        return [self._is_collision(e, f) for f in self.forests]

    def observe(self, idx):
        agent = self.agents[idx]
        leader = idx == 0
        entity_pos = [l.pos - agent.pos for l in self.landmarks]
        inf = self._in_forest(agent)
        other_pos, other_vel = [], []
        for j, other in enumerate(self.agents):
            if other is agent:
                continue
            of = self._in_forest(other)
            visible = (
                (inf[0] and of[0]) or (inf[1] and of[1])
                or (not any(inf) and not any(of)) or leader
            )
            other_pos.append(other.pos - agent.pos if visible else np.zeros(2))
            if not other.adversary:
                other_vel.append(other.vel if visible else np.zeros(2))
        good = self.agents[4:]
        pm = lambda b: 1.0 if b else -1.0
        if leader:
            tail = [np.array([pm(any(self._is_collision(g, f) for g in good))
                              for f in self.forests]), self.comm]
        elif agent.adversary:
            tail = [np.array([pm(any(self._in_forest(g))) for g in good]),
                    self.comm]
        else:
            return np.concatenate(
                [agent.vel, agent.pos] + entity_pos
                + [np.array([pm(x) for x in inf])] + other_pos + other_vel
            )
        return np.concatenate(
            [agent.vel, agent.pos] + entity_pos + other_pos + other_vel + tail
        )


class TestWorldCommFidelity:
    def test_rollout_matches_oracle(self):
        env = SimpleWorldCommEnv()
        oracle = WorldCommOracle()
        rng = np.random.default_rng(11)
        n = 6
        pos = rng.uniform(-1, 1, (n, 2))
        vel = rng.uniform(-0.5, 0.5, (n, 2))
        lpos = rng.uniform(-0.9, 0.9, (5, 2))
        # stage interactions: adversary 1 approaching good agent 0 head-on;
        # good agent 1 inside forest 0; good agent 0 next to food 0
        pos[1], vel[1] = [5.16, 5.0], [-0.5, 0.0]
        pos[4], vel[4] = [5.0, 5.0], [0.5, 0.0]
        pos[5] = lpos[3] + np.array([0.05, 0.0])  # forest 0 (landmark idx 3)
        lpos[1] = pos[4] + np.array([0.05, 0.0])  # food 0 near good 0
        oracle.set_state(pos, vel, lpos[:0])  # positions set below
        for a, p, v in zip(oracle.agents, pos, vel):
            a.pos, a.vel = p.astype(np.float64), v.astype(np.float64)
        oracle.set_landmarks(lpos)
        state = WorldCommState(
            agent_pos=jnp.asarray(pos, jnp.float32),
            agent_vel=jnp.asarray(vel, jnp.float32),
            landmark_pos=jnp.asarray(lpos, jnp.float32),
            leader_comm=jnp.zeros(4),
            step=jnp.int32(0),
        )
        step = jax.jit(env.step_stacked)
        saw_pair_collision = saw_forest = False
        for t in range(12):
            actions = rng.integers(0, 5, size=n)
            actions[0] = rng.integers(0, 20)  # leader: move x comm
            actions[1] = actions[4] = 0  # keep staged pair ballistic
            oracle.set_discrete_actions(actions)
            oracle.world_step()
            want_rew = oracle.rewards()
            want_obs = [oracle.observe(i) for i in range(n)]

            obs, state, rewards, done, _ = step(
                jax.random.PRNGKey(t), state, jnp.asarray(actions)
            )
            np.testing.assert_allclose(
                np.asarray(state.agent_pos),
                np.stack([a.pos for a in oracle.agents]),
                rtol=1e-4, atol=1e-5,
            )
            got_obs = list(np.asarray(obs.lead)) + list(
                np.asarray(obs.adversary)
            ) + list(np.asarray(obs.good))
            for i in range(n):
                np.testing.assert_allclose(
                    got_obs[i], want_obs[i], rtol=1e-4, atol=1e-5,
                    err_msg=f"agent {i} step {t}",
                )
            np.testing.assert_allclose(
                np.asarray(rewards), want_rew, rtol=1e-4, atol=1e-5
            )
            if np.any(want_rew > 4.0):
                saw_pair_collision = True
            if any(oracle._in_forest(oracle.agents[5])):
                saw_forest = True
        assert saw_pair_collision and saw_forest

    def test_reference_smoke_block(self):
        """Replicates the reference's only executable self-check
        (jax_ver/jax_buffer.py:143-188): build MPE_simple_world_comm_v3,
        run 100 random steps through create_joint_transition into a
        JaxFbxBuffer, sample, check the per-agent key layout."""
        from mfvae_tpu.data.compat import TransitionBuffer
        from mfvae_tpu.data.transitions import create_joint_transition
        from mfvae_tpu.envs.mpe import make

        key = jax.random.PRNGKey(0)
        key, key_reset, key_act, key_step, key_sample = jax.random.split(key, 5)
        env = make("MPE_simple_world_comm_v3")
        obs, state = env.reset(key_reset)
        keys = jax.random.split(key_act, env.num_agents)
        actions = {
            a: env.action_space(a).sample(keys[i])
            for i, a in enumerate(env.agents)
        }
        next_obs, state, reward, done, infos = env.step(key_step, state, actions)
        create_joint_transition(obs, reward, actions, next_obs, done)
        buffer = TransitionBuffer(
            max_length=80, min_length=64, batch_size=64, add_batch=False
        )
        buffer.init_buffer(obs, reward, actions, next_obs, done)
        obs = next_obs
        for t in range(100):
            actions = {
                a: env.action_space(a).sample(keys[i])
                for i, a in enumerate(env.agents)
            }
            next_obs, state, reward, done, infos = env.step(
                jax.random.fold_in(key_step, t), state, actions
            )
            buffer.add_trans(obs, reward, actions, next_obs, done)
            obs = next_obs
        batch = buffer.sample(key_sample)
        # the reference's create_joint_transition reshapes every per-agent
        # field to (-1, 1) (jax_buffer.py:30-44), so sampled leaves carry a
        # trailing singleton — shape parity with the reference smoke output
        assert batch.experience["adversary_1_next_obs"].shape == (64, 34, 1)
        assert batch.experience["agent_0_obs"].shape == (64, 28, 1)


class SimpleAdversaryOracle:
    """Published simple_adversary (physical deception), per-agent loops:
    1 adversary + N good agents (size .15, accel 5.0 MPE default, no speed
    cap, collide=False — no contact forces anywhere) + N landmarks (.08,
    non-collidable), one being the goal.  Shaped rewards: adversary
    -dist(adv, goal); good (shared) -min_i dist(good_i, goal) +
    dist(adv, goal).  Obs: good [goal_rel, landmark_rel..., other_rel...],
    adversary [landmark_rel..., other_rel...] (world.agents order =
    adversary first)."""

    def __init__(self, n_good):
        self.n_good = n_good
        self.agents = [
            Entity(0.15, 5.0, None, True, False, adversary=True)
        ] + [Entity(0.15, 5.0, None, True, False) for _ in range(n_good)]
        self.landmark_pos = np.zeros((n_good, 2))
        self.goal = 0

    def set_state(self, agent_pos, agent_vel, landmark_pos, goal):
        for a, p, v in zip(self.agents, agent_pos, agent_vel):
            a.pos = np.array(p, dtype=np.float64)
            a.vel = np.array(v, dtype=np.float64)
        self.landmark_pos = np.array(landmark_pos, dtype=np.float64)
        self.goal = int(goal)

    def set_discrete_actions(self, actions):
        dirs = np.array(
            [[0.0, 0.0], [-1.0, 0.0], [1.0, 0.0], [0.0, -1.0], [0.0, 1.0]]
        )
        for a, act in zip(self.agents, actions):
            a.u = dirs[int(act)]

    def world_step(self):
        # per-agent integrator, no contact forces (nothing collides)
        for a in self.agents:
            force = a.u * a.accel
            a.vel = a.vel * (1.0 - DAMPING) + force * DT
            a.pos = a.pos + a.vel * DT

    def rewards(self):
        goal_p = self.landmark_pos[self.goal]
        adv_d = np.sqrt(np.sum((self.agents[0].pos - goal_p) ** 2))
        good_d = [
            np.sqrt(np.sum((a.pos - goal_p) ** 2)) for a in self.agents[1:]
        ]
        good_rew = -min(good_d) + adv_d
        return np.array([-adv_d] + [good_rew] * self.n_good)

    def observe(self, i):
        me = self.agents[i]
        landmark_rel = [lp - me.pos for lp in self.landmark_pos]
        other_rel = [
            o.pos - me.pos for j, o in enumerate(self.agents) if j != i
        ]
        if i == 0:  # adversary: no goal knowledge
            return np.concatenate(landmark_rel + other_rel)
        goal_rel = self.landmark_pos[self.goal] - me.pos
        return np.concatenate([goal_rel] + landmark_rel + other_rel)

    def observations(self):
        adv = np.stack([self.observe(0)])
        good = np.stack([self.observe(i) for i in range(1, len(self.agents))])
        return adv, good


class TestSimpleAdversaryFidelity:
    def test_rollout_matches_oracle(self):
        from mfvae_tpu.envs.mpe import AdversaryState, SimpleAdversaryEnv

        n_good = 3
        env = SimpleAdversaryEnv(num_good_agents=n_good)
        oracle = SimpleAdversaryOracle(n_good)
        rng = np.random.default_rng(5)
        pos, vel, lpos = random_state(rng, n_good + 1, n_good)
        goal = 2
        oracle.set_state(pos, vel, lpos, goal)
        state = AdversaryState(
            agent_pos=jnp.asarray(pos, jnp.float32),
            agent_vel=jnp.asarray(vel, jnp.float32),
            landmark_pos=jnp.asarray(lpos, jnp.float32),
            goal=jnp.int32(goal),
            step=jnp.int32(0),
        )
        step = jax.jit(env.step_stacked)
        for t in range(10):
            actions = rng.integers(0, 5, size=n_good + 1)
            oracle.set_discrete_actions(actions)
            oracle.world_step()
            obs, state, rewards, done, _ = step(
                jax.random.PRNGKey(t), state, jnp.asarray(actions)
            )
            np.testing.assert_allclose(
                np.asarray(state.agent_pos),
                np.stack([a.pos for a in oracle.agents]),
                rtol=1e-4, atol=1e-5,
            )
            want_adv, want_good = oracle.observations()
            np.testing.assert_allclose(
                np.asarray(obs.adversary), want_adv, rtol=1e-4, atol=1e-5
            )
            np.testing.assert_allclose(
                np.asarray(obs.good), want_good, rtol=1e-4, atol=1e-5
            )
            np.testing.assert_allclose(
                np.asarray(rewards), oracle.rewards(), rtol=1e-4, atol=1e-5
            )

    def test_reward_golden_hand_computed(self):
        """Hand-placed positions: adversary at (0.6, 0.8) from goal at the
        origin -> dist exactly 1.0; best good agent at (0.3, 0.4) -> 0.5.
        adversary reward = -1.0; shared good reward = -0.5 + 1.0 = 0.5."""
        from mfvae_tpu.envs.mpe import AdversaryState, SimpleAdversaryEnv

        env = SimpleAdversaryEnv(num_good_agents=2)
        state = AdversaryState(
            agent_pos=jnp.asarray(
                [[0.6, 0.8], [0.3, 0.4], [5.0, 5.0]], jnp.float32
            ),
            agent_vel=jnp.zeros((3, 2)),
            landmark_pos=jnp.asarray([[9.0, 9.0], [0.0, 0.0]], jnp.float32),
            goal=jnp.int32(1),
            step=jnp.int32(0),
        )
        rewards = env._rewards(state)
        np.testing.assert_allclose(
            np.asarray(rewards), [-1.0, 0.5, 0.5], rtol=1e-6
        )

    def test_goal_hidden_from_adversary(self):
        """The adversary's observation must be invariant to which landmark
        is the goal (physical deception: only good agents know)."""
        from mfvae_tpu.envs.mpe import AdversaryState, SimpleAdversaryEnv

        env = SimpleAdversaryEnv(num_good_agents=2)
        rng = np.random.default_rng(0)
        pos, vel, lpos = random_state(rng, 3, 2)
        obs = []
        for goal in (0, 1):
            state = AdversaryState(
                agent_pos=jnp.asarray(pos, jnp.float32),
                agent_vel=jnp.asarray(vel, jnp.float32),
                landmark_pos=jnp.asarray(lpos, jnp.float32),
                goal=jnp.int32(goal),
                step=jnp.int32(0),
            )
            obs.append(env._observe(state))
        np.testing.assert_array_equal(
            np.asarray(obs[0].adversary), np.asarray(obs[1].adversary)
        )
        assert not np.allclose(
            np.asarray(obs[0].good), np.asarray(obs[1].good)
        )
