"""Host (PettingZoo) environment path.

Capability parity with the reference's torch stack: ``create_env``
(torch_ver/src/env.py:24-39), space-size introspection (env.py:6-21), and a
``MultiAgentHostBuffer`` replacing ``MultiAgentCPPRB``
(torch_ver/src/replay_buffer.py:53-115) on top of the native C++ ring
(data/host_buffer.py).  A background collector thread overlaps host env
stepping with device training — the host→device pipeline the reference
serializes (SURVEY §3.1: the 128-step host env loop blocks training).

PettingZoo is optional; everything degrades to a clear ImportError message.
"""

from __future__ import annotations

import threading
from typing import Dict, Optional

import numpy as np

from mfvae_tpu.data.host_buffer import HostRingBuffer


def get_space_size(space) -> int:
    """Discrete/MultiBinary/Box introspection (torch_ver/src/env.py:6-21)."""
    import gymnasium

    if isinstance(space, gymnasium.spaces.Discrete):
        return int(space.n)
    if isinstance(space, gymnasium.spaces.MultiBinary):
        return int(np.prod(space.shape))
    if isinstance(space, gymnasium.spaces.Box):
        return int(space.shape[0])
    raise NotImplementedError(type(space))


class LocalHostEnv:
    """PettingZoo parallel-API wrapper over the in-repo pure-JAX MPE envs
    (envs/mpe.py — all four scenario families), for when neither
    `pettingzoo.mpe` nor `mpe2` ships the MPE family (PettingZoo >=1.25
    moved it out) and the native C++ engine is unavailable (no g++).  Same
    surface the reference consumes: reset(seed)->(obs, infos),
    step(actions)->(obs, rewards, terminations, truncations, infos),
    agents, observation_space/action_space."""

    def __init__(
        self, env_name, num_good, num_adversaries, num_obstacles, max_cycles,
        discrete=True,
    ):
        import jax

        from mfvae_tpu.envs.mpe import make as make_jax_env

        self._jax = jax
        self._env = make_jax_env(
            f"MPE_{env_name}",
            num_good_agents=num_good,
            num_adversaries=num_adversaries,
            num_obs=num_obstacles,
            max_steps=max_cycles,
            discrete_actions=discrete,
        )
        self.agents = list(self._env.agents)
        self._step_jit = jax.jit(self._env.step)
        self._reset_jit = jax.jit(self._env.reset)
        self._state = None
        self._key = jax.random.PRNGKey(0)

    def observation_space(self, agent):
        import gymnasium

        d = int(self._env.observation_space(agent).shape[0])
        return gymnasium.spaces.Box(-np.inf, np.inf, (d,), np.float32)

    def action_space(self, agent):
        import gymnasium

        space = self._env.action_space(agent)
        if hasattr(space, "n"):
            return gymnasium.spaces.Discrete(space.n)
        return gymnasium.spaces.Box(
            float(space.low), float(space.high), tuple(space.shape), np.float32
        )

    def reset(self, seed: Optional[int] = None):
        if seed is not None:
            self._key = self._jax.random.PRNGKey(seed)
        self._key, k = self._jax.random.split(self._key)
        obs, self._state = self._reset_jit(k)
        return {a: np.asarray(o) for a, o in obs.items()}, {a: {} for a in self.agents}

    def step(self, actions):
        import jax.numpy as jnp

        self._key, k = self._jax.random.split(self._key)
        acts = {a: jnp.asarray(v) for a, v in actions.items()}
        obs, self._state, rew, done, info = self._step_jit(k, self._state, acts)
        obs = {a: np.asarray(o) for a, o in obs.items()}
        rewards = {a: float(rew[a]) for a in self.agents}
        truncs = {a: bool(done[a]) for a in self.agents}  # time-limit only
        terms = {a: False for a in self.agents}
        return obs, rewards, terms, truncs, {a: {} for a in self.agents}

    def pursuit_inputs(self):
        """Host pursuit-policy inputs (envs/policies.py
        host_pursuit_actions) from the wrapped JAX env's state, or None
        for scenarios without a scripted policy."""
        from mfvae_tpu.envs.mpe import SimpleAdversaryEnv, SimpleTagEnv

        if self._state is None:
            return None
        pos = np.asarray(self._state.agent_pos)
        if isinstance(self._env, SimpleTagEnv):
            return "tag", pos, self._env.num_adversaries, None
        if isinstance(self._env, SimpleAdversaryEnv):
            lmk = np.asarray(self._state.landmark_pos)
            return "adversary", pos, 1, lmk[int(self._state.goal)]
        return None


def create_env(
    env_name: str = "simple_tag_v3",
    num_good: int = 10,
    num_adversaries: int = 30,
    num_obstacles: int = 20,
    max_cycles: int = 1000,
    seed: int = 42,
    discrete: bool = True,
    scripted_policy: bool = False,
):
    """Host env factory (torch_ver/src/env.py:24-39 surface: returns
    (env, obs_dims, act_dims, obs, infos); ``discrete`` is the reference's
    action-mode switch, torch_ver/src/env.py:27).  Uses PettingZoo's MPE
    when installed (pettingzoo.mpe, or the split-out mpe2 package);
    otherwise the first-party native C++ engine (envs/native_engine.py —
    microsecond host steps, fidelity-tested against the JAX env); last
    resort is the jitted-JAX LocalHostEnv (pays device dispatch per host
    step, covers all four scenarios).

    Supports simple_tag_v3 (the reference's scenario), simple_spread_v3
    (num_good becomes the agent count), simple_world_comm_v3
    (discrete-only, matching the reference path), and simple_adversary_v3
    (num_good good agents + 1 adversary).  The non-tag scenarios
    always use the in-repo engines, NOT PettingZoo: PettingZoo's
    simple_spread defaults to local_ratio=0.5 (reward = half global + half
    local) where the in-repo envs use the full coverage-minus-collisions
    sum — mixing backends would silently train on differently-scaled
    reward targets.  ``discrete=False`` also skips PettingZoo: the in-repo
    continuous contract is the JAX envs' 2-d force Box(-1, 1, (2,)), not
    PettingZoo's 5-channel Box(0, 1, (5,)).  ``scripted_policy=True``
    (collect_policy != 'random') likewise skips PettingZoo — the pursuit
    policy needs the in-repo envs' state accessors (``pursuit_inputs``),
    which the fidelity-equivalent native/Local envs provide."""
    if env_name not in (
        "simple_tag_v3", "simple_spread_v3", "simple_world_comm_v3",
        "simple_adversary_v3",
    ):
        raise NotImplementedError(env_name)
    spread = env_name == "simple_spread_v3"
    world_comm = env_name == "simple_world_comm_v3"
    adversary = env_name == "simple_adversary_v3"
    if world_comm and not discrete:
        raise NotImplementedError(
            "simple_world_comm is discrete-only (matching the reference "
            "path; the leader's communication channel has no continuous "
            "form)"
        )
    env = None
    if (not spread and not world_comm and not adversary and discrete
            and not scripted_policy):
        for modname in ("pettingzoo.mpe", "mpe2"):
            try:
                import importlib

                mod = importlib.import_module(f"{modname}.{env_name}")
                env = mod.parallel_env(
                    num_good=num_good,
                    num_adversaries=num_adversaries,
                    num_obstacles=num_obstacles,
                    max_cycles=max_cycles,
                    continuous_actions=False,
                )
                break
            except ImportError:
                continue
    if env is None:
        from mfvae_tpu.envs.native_engine import (
            NativeAdversaryHostEnv,
            NativeHostEnv,
            NativeSpreadHostEnv,
            NativeWorldCommHostEnv,
            native_engine_available,
        )

        if native_engine_available():
            if adversary:
                env = NativeAdversaryHostEnv(
                    num_good, max_cycles, seed=seed, continuous=not discrete
                )
            elif spread:
                env = NativeSpreadHostEnv(
                    num_good, max_cycles, seed=seed, continuous=not discrete
                )
            elif world_comm:
                env = NativeWorldCommHostEnv(
                    num_good, num_adversaries, num_obstacles, max_cycles,
                    seed=seed,
                )
            else:
                env = NativeHostEnv(
                    num_good, num_adversaries, num_obstacles, max_cycles,
                    seed=seed, continuous=not discrete,
                )
        else:
            env = LocalHostEnv(
                env_name, num_good, num_adversaries, num_obstacles,
                max_cycles, discrete=discrete,
            )
    obs, infos = env.reset(seed=seed)
    obs_dims = {a: get_space_size(env.observation_space(a)) for a in env.agents}
    act_dims = {a: get_space_size(env.action_space(a)) for a in env.agents}
    return env, obs_dims, act_dims, obs, infos


def create_transition(obs, action, next_obs, done, rew):
    """Stack per-agent dicts into arrays (torch_ver/src/env.py:42-57
    surface: returns (obs_all, action_all, next_obs_all, done_all, rew)).
    Requires homogeneous obs widths across agents (np.array stacking)."""
    agents = list(obs.keys())
    obs_all = np.array([obs[a] for a in agents])
    action_all = np.array([action[a] for a in agents])
    next_obs_all = np.array([next_obs[a] for a in agents])
    done_all = any(bool(v) for v in done.values())
    return obs_all, action_all, next_obs_all, done_all, rew


class MultiAgentHostBuffer:
    """Per-agent transition store over the native ring
    (torch_ver/src/replay_buffer.py schema: {agent}_observations /
    _next_observations / _actions / _rewards / _terminals / _truncations +
    mask)."""

    def __init__(self, env, max_size: int = 10_000, batch_size: int = 128, seed: int = 0):
        import gymnasium

        self.batch_size = batch_size
        self.agents = list(env.agents)
        # action storage follows the env's action space: Discrete -> scalar
        # int64, Box (continuous mode) -> float32 vector
        self._act_dtypes = {}
        schema = {}
        for a in self.agents:
            od = get_space_size(env.observation_space(a))
            aspace = env.action_space(a)
            if isinstance(aspace, gymnasium.spaces.Box):
                act_shape, act_dtype = (int(aspace.shape[0]),), np.float32
            else:
                act_shape, act_dtype = (), np.int64
            self._act_dtypes[a] = act_dtype
            schema[f"{a}_observations"] = ((od,), np.float32)
            schema[f"{a}_next_observations"] = ((od,), np.float32)
            schema[f"{a}_actions"] = (act_shape, act_dtype)
            schema[f"{a}_rewards"] = ((1,), np.float32)
            schema[f"{a}_terminals"] = ((1,), np.float32)
            schema[f"{a}_truncations"] = ((1,), np.float32)
        schema["mask"] = ((1,), np.float32)
        self.buffer = HostRingBuffer(schema, capacity=max_size, seed=seed)

    def add(self, obs, actions, rewards, next_obs, terminals, truncations) -> None:
        item = {}
        for a in self.agents:
            item[f"{a}_observations"] = np.asarray(obs[a], np.float32)
            item[f"{a}_next_observations"] = np.asarray(next_obs[a], np.float32)
            item[f"{a}_actions"] = np.asarray(actions[a], self._act_dtypes[a])
            item[f"{a}_rewards"] = np.asarray([rewards[a]], np.float32)
            item[f"{a}_terminals"] = np.asarray([float(terminals[a])], np.float32)
            item[f"{a}_truncations"] = np.asarray([float(truncations[a])], np.float32)
        item["mask"] = np.asarray([1.0], np.float32)
        self.buffer.add(item)

    def sample(self) -> Dict[str, np.ndarray]:
        return self.buffer.sample(self.batch_size)

    def add_batch(self, obs, actions, rewards, next_obs, truncations) -> None:
        """Vectorized add: every argument is {agent: [K, ...]} (or [K] for
        scalars) — K transitions land in the ring with one native call.
        Terminals are always False on the MPE host path (time-limit
        truncation only, matching AsyncCollector)."""
        k = len(next(iter(truncations.values())))
        item = {}
        for a in self.agents:
            item[f"{a}_observations"] = np.asarray(obs[a], np.float32)
            item[f"{a}_next_observations"] = np.asarray(next_obs[a], np.float32)
            item[f"{a}_actions"] = np.asarray(actions[a], self._act_dtypes[a])
            item[f"{a}_rewards"] = np.asarray(rewards[a], np.float32).reshape(k, 1)
            item[f"{a}_terminals"] = np.zeros((k, 1), np.float32)
            item[f"{a}_truncations"] = np.asarray(
                truncations[a], np.float32
            ).reshape(k, 1)
        item["mask"] = np.ones((k, 1), np.float32)
        self.buffer.add(item)

    def on_episode_end(self) -> None:
        """Episode-boundary hook (reference surface:
        torch_ver/src/replay_buffer.py:104-105, where cpprb flushes n-step
        staging).  The flat ring stores complete transitions, so this is a
        no-op kept for API compatibility."""

    def __len__(self) -> int:
        return len(self.buffer)


class _CollectorLoop:
    """Shared collect/start/stop machinery; subclasses implement
    ``_one_step`` (which must advance ``self._steps``)."""

    def __init__(self):
        self._stop = threading.Event()
        self._steps = 0
        self._thread: Optional[threading.Thread] = None

    def _one_step(self):  # pragma: no cover - abstract
        raise NotImplementedError

    def collect(self, n_steps: int) -> int:
        """Synchronous collection of at least n_steps transitions."""
        target = self._steps + n_steps
        while self._steps < target:
            self._one_step()
        return self._steps

    def start(self, max_steps: Optional[int] = None):
        def loop():
            while not self._stop.is_set():
                if max_steps is not None and self._steps >= max_steps:
                    break
                self._one_step()

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=10)

    @property
    def steps(self) -> int:
        return self._steps


class AsyncCollector(_CollectorLoop):
    """Background thread stepping a host env with random (or scripted
    pursuit) actions and feeding the buffer, so device train steps never
    wait on host physics.

    ``policy='pursuit'`` uses the numpy pursuit policy
    (envs/policies.py host_pursuit_actions) driven by the env's
    ``pursuit_inputs()`` state accessor; envs without one (PettingZoo,
    spread, world_comm) raise a clear error."""

    def __init__(self, env, buffer: MultiAgentHostBuffer, seed: int = 0,
                 policy: str = "random", epsilon: float = 0.1,
                 mix_frac: float = 0.5):
        super().__init__()
        self.env = env
        self.buffer = buffer
        self.rng = np.random.default_rng(seed)
        self.policy = policy
        self.epsilon = float(epsilon)
        self.mix_frac = float(mix_frac)
        self._q_policy = None
        if policy.startswith("vdn:"):
            from mfvae_tpu.baselines.collect_policy import HostQCollectPolicy

            if not hasattr(env.action_space(env.agents[0]), "n"):
                raise ValueError(
                    "learned Q-policy collection needs discrete actions"
                )
            self._q_policy = HostQCollectPolicy(
                policy[len("vdn:"):],
                env.agents,
                {a: int(np.prod(env.observation_space(a).shape))
                 for a in env.agents},
                epsilon,
                self.rng,
            )
        elif policy not in ("random", "pursuit", "episode_mix"):
            raise ValueError(f"unknown collect policy {policy!r}")
        self._obs, _ = env.reset(seed=seed)
        if policy in ("pursuit", "episode_mix") and (
            not hasattr(env, "pursuit_inputs") or env.pursuit_inputs() is None
        ):
            raise ValueError(
                f"{type(env).__name__} has no host pursuit policy "
                "(supported: simple_tag, simple_adversary on the native "
                "engine or LocalHostEnv)"
            )
        # episode_mix: whole episodes alternate scripted/random (the host
        # mirror of envs/policies.EpisodeMixPolicy); drawn at every reset.
        # The draw is guarded so other policies' seeded streams stay
        # bit-identical to earlier versions.
        self._ep_scripted = (
            bool(self.rng.random() < self.mix_frac)
            if policy == "episode_mix"
            else False
        )
        # immutable per env; avoids a fresh space object per collected step
        self._discrete = hasattr(env.action_space(env.agents[0]), "n")
        # uniform random-rollout sampler per agent, by space type (the
        # reference calls action_space.sample(), torch_ver/main.py:69)
        self._samplers = {}
        for a in env.agents:
            space = env.action_space(a)
            if hasattr(space, "n"):
                self._samplers[a] = (
                    lambda n=int(space.n): int(self.rng.integers(0, n))
                )
            else:
                lo, hi, shape = space.low, space.high, space.shape
                self._samplers[a] = (
                    lambda lo=lo, hi=hi, shape=shape: self.rng.uniform(
                        lo, hi, size=shape
                    ).astype(np.float32)
                )

    def _one_step(self):
        env = self.env
        if self._q_policy is not None:
            acts = self._q_policy.actions(self._obs)[0]  # [N]
            actions = {a: int(acts[i]) for i, a in enumerate(env.agents)}
            return self._finish_step(actions)
        scripted_now = self.policy == "pursuit" or (
            self.policy == "episode_mix" and self._ep_scripted
        )
        if scripted_now:
            from mfvae_tpu.envs.policies import host_pursuit_actions

            kind, pos, n_adv, goal_pos = env.pursuit_inputs()
            acts = host_pursuit_actions(
                kind, pos, n_adv, self.rng, self.epsilon,
                discrete=self._discrete, goal_pos=goal_pos,
            )
            actions = {
                a: (int(acts[i]) if self._discrete else acts[i])
                for i, a in enumerate(env.agents)
            }
        else:
            actions = {a: self._samplers[a]() for a in env.agents}
        self._finish_step(actions)

    def _finish_step(self, actions):
        env = self.env
        next_obs, rewards, terms, truncs, _ = env.step(actions)
        self.buffer.add(self._obs, actions, rewards, next_obs, terms, truncs)
        self._obs = next_obs
        self._steps += 1
        if any(terms.values()) or any(truncs.values()) or not env.agents:
            self._obs, _ = env.reset()
            if self.policy == "episode_mix":
                self._ep_scripted = bool(self.rng.random() < self.mix_frac)
            if self._q_policy is not None:
                self._q_policy.reset()


class NativeBatchedCollector(_CollectorLoop):
    """Vectorized host collection on the native C++ engine
    (envs/native_engine.py): K environments stepped as ONE batched native
    call per iteration, K transitions landing in the ring with one batched
    add — the host-side analog of the device path's vmapped env batch.

    Works with any batched native env (tag/spread/world_comm) through the
    shared ``named_obs`` / ``action_highs`` surface; pass ``env=`` to use a
    pre-built one, or the tag population kwargs to build simple_tag.

    Exposes the AsyncCollector surface (collect/start/stop/steps, with
    ``steps`` counting env-transitions so HostExperiment's per-epoch
    sample targets mean the same thing at any K)."""

    def __init__(
        self,
        buffer: MultiAgentHostBuffer,
        n_envs: Optional[int] = None,
        num_good: Optional[int] = None,
        num_adversaries: Optional[int] = None,
        num_obstacles: Optional[int] = None,
        max_cycles: Optional[int] = None,
        seed: int = 0,
        n_threads: Optional[int] = None,
        env=None,
        continuous: bool = False,
        collect_policy: str = "random",
        epsilon: float = 0.1,
        mix_frac: float = 0.5,
    ):
        super().__init__()
        self.continuous = continuous
        self.collect_policy = collect_policy
        self.epsilon = float(epsilon)
        self.mix_frac = float(mix_frac)
        pop_kwargs = dict(
            n_envs=n_envs, num_good=num_good, num_adversaries=num_adversaries,
            num_obstacles=num_obstacles, max_cycles=max_cycles,
            n_threads=n_threads,
        )
        if env is not None:
            given = [k for k, v in pop_kwargs.items() if v is not None]
            if given:
                raise ValueError(
                    f"env= and population kwargs are mutually exclusive "
                    f"(got env plus {given}); configure the env instance "
                    "instead"
                )
            if env.auto_reset:
                raise ValueError(
                    "NativeBatchedCollector requires auto_reset=False "
                    "(the terminal obs must be recorded as next_obs BEFORE "
                    "the reset; auto-reset would substitute the new "
                    "episode's first obs)"
                )
        else:
            from mfvae_tpu.envs.native_engine import NativeSimpleTagEnv

            env = NativeSimpleTagEnv(
                n_envs=16 if n_envs is None else n_envs,
                num_good_agents=10 if num_good is None else num_good,
                num_adversaries=30 if num_adversaries is None else num_adversaries,
                num_obs=20 if num_obstacles is None else num_obstacles,
                max_steps=1000 if max_cycles is None else max_cycles,
                seed=seed,
                n_threads=0 if n_threads is None else n_threads,
                auto_reset=False,
            )
        self.env = env
        self.buffer = buffer
        self.n_envs = env.n_envs
        self.rng = np.random.default_rng(seed)
        self._pursuit_kind = None
        self._q_policy = None
        if collect_policy.startswith("vdn:"):
            if continuous:
                raise ValueError(
                    "learned Q-policy collection needs discrete actions"
                )
        elif collect_policy in ("pursuit", "episode_mix"):
            from mfvae_tpu.envs.native_engine import (
                NativeSimpleAdversaryEnv,
                NativeSimpleTagEnv,
            )

            if isinstance(env, NativeSimpleAdversaryEnv):
                self._pursuit_kind, self._pursuit_n_adv = "adversary", 1
            elif isinstance(env, NativeSimpleTagEnv):
                self._pursuit_kind = "tag"
                self._pursuit_n_adv = env.num_adversaries
            else:
                raise ValueError(
                    f"{type(env).__name__} has no host pursuit policy "
                    "(supported: simple_tag, simple_adversary)"
                )
        elif collect_policy != "random":
            raise ValueError(f"unknown collect policy {collect_policy!r}")
        # immutable per-env-instance values, cached off the hot loop
        self._agents = tuple(env.agents)
        self._action_highs = np.array(env.action_highs)[None, :]
        self._obs = self.env.reset().copy()
        if collect_policy.startswith("vdn:"):
            from mfvae_tpu.baselines.collect_policy import HostQCollectPolicy

            named = env.named_obs(self._obs)  # per-agent widths, no reset
            self._q_policy = HostQCollectPolicy(
                collect_policy[len("vdn:"):],
                env.agents,
                {a: int(v.shape[1]) for a, v in named.items()},
                epsilon,
                self.rng,
                n_envs=env.n_envs,
            )
        if collect_policy == "episode_mix":
            # per-env flags, redrawn wherever an episode resets (the
            # batched host mirror of envs/policies.EpisodeMixPolicy); the
            # draw happens only for this policy so other policies' seeded
            # action streams stay bit-identical to earlier versions
            self._ep_scripted = self.rng.random(self.n_envs) < self.mix_frac

    def _pursuit_actions(self) -> np.ndarray:
        env = self.env
        from mfvae_tpu.envs.policies import host_pursuit_actions

        # batched accessors: one native call each, vectorized policy
        # over [K, A, 2] — no per-env Python loop on the hot path
        pos = env.get_positions()
        goal_pos = None
        if self._pursuit_kind == "adversary":
            lmk = env.get_landmarks()  # [K, L, 2]
            goals = env.get_goals()  # [K]
            goal_pos = lmk[np.arange(self.n_envs), goals]
        return host_pursuit_actions(
            self._pursuit_kind, pos, self._pursuit_n_adv,
            self.rng, self.epsilon, discrete=not self.continuous,
            goal_pos=goal_pos,
        )

    def _random_actions(self) -> np.ndarray:
        env = self.env
        if self.continuous:
            # uniform in the Box(-1, 1, (2,)) force contract
            # (envs/mpe.py action_space, native step_continuous)
            return self.rng.uniform(
                -1.0, 1.0, size=(self.n_envs, env.num_agents, 2)
            ).astype(np.float32)
        return self.rng.integers(
            0, self._action_highs, size=(self.n_envs, env.num_agents)
        ).astype(np.int32)

    def _sample_actions(self) -> np.ndarray:
        if self._q_policy is not None:
            return self._q_policy.actions(self.env.named_obs(self._obs))
        if self.collect_policy == "episode_mix":
            scripted = self._pursuit_actions()
            rand = self._random_actions()
            flags = self._ep_scripted.reshape(
                (self.n_envs,) + (1,) * (scripted.ndim - 1)
            )
            return np.where(flags, scripted, rand).astype(scripted.dtype)
        if self._pursuit_kind is not None:
            return self._pursuit_actions()
        return self._random_actions()

    def _one_step(self):
        env = self.env
        agents = self._agents
        acts = self._sample_actions()
        if self.continuous:
            next_obs, rew, done = env.step_continuous(
                np.ascontiguousarray(acts, np.float32)
            )
        else:
            acts = np.ascontiguousarray(acts, np.int32)
            next_obs, rew, done = env.step(acts)
        self.buffer.add_batch(
            obs=env.named_obs(self._obs),
            actions={a: acts[:, i] for i, a in enumerate(agents)},
            rewards={a: rew[:, i] for i, a in enumerate(agents)},
            next_obs=env.named_obs(next_obs),
            truncations={a: done.astype(np.float32) for a in agents},
        )
        if done.any():
            env.reset_where(done.astype(np.uint8))
            self._obs = env.observe().copy()
            if self.collect_policy == "episode_mix":
                redraw = self.rng.random(self.n_envs) < self.mix_frac
                self._ep_scripted = np.where(done, redraw, self._ep_scripted)
            if self._q_policy is not None:
                self._q_policy.reset(done_mask=done)
        else:
            self._obs = next_obs.copy()
        self._steps += self.n_envs
