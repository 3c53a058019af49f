"""Learned-policy collection: a trained Q-learning agent drives the world
model's replay collection.

The reference repo contains a world model (jax_ver/model.py:100-199) and a
learned policy (jax_ver/baselines/QLearning/vdn.py:133-527) side by side, but
they never touch: the model trains exclusively on uniform-random rollouts
(jax_ver/main.py:154-161).  This module closes that loop — the greedy policy
of a trained VDN/IQL-family agent (baselines/vdn.py VdnNetwork) becomes a
``train.collect_policy`` for the VAE experiment, so the world model learns
from the state distribution an actual *policy* visits.

Protocol (consumed by training/trainer.make_phase_fns):

  stateful policy := object with
    .init_carry() -> pytree                 (recurrent state; zeros)
    .step(carry, stacked_obs, env_state, key) -> (carry, actions)

The trainer threads the carry through the compiled collection scan and
resets it to ``init_carry()`` on episode end — matching the hidden-state
reset the Q-agent trained with (baselines/vdn.py env_step done-masking).
Scripted policies (envs/policies.py) stay plain ``(state, key) -> actions``
callables; ``load_collect_policy`` is the config-surface entry for
``train.collect_policy: "vdn:<path.npz>"``.
"""

from __future__ import annotations

import json
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mfvae_tpu.models.mavae import AgentSpec


def save_policy(
    path: str,
    params,
    *,
    hidden_dim: int,
    param_share: bool,
    action_dim: int,
    n_agents: int,
) -> None:
    """Self-contained policy artifact: one .npz with flattened param arrays
    plus a JSON meta record (enough to rebuild VdnNetwork without the
    training config)."""
    from flax.traverse_util import flatten_dict

    flat = {
        "/".join(k): np.asarray(v)
        for k, v in flatten_dict(
            jax.tree.map(np.asarray, params), sep=None
        ).items()
    }
    meta = json.dumps(
        {
            "hidden_dim": int(hidden_dim),
            "param_share": bool(param_share),
            "action_dim": int(action_dim),
            "n_agents": int(n_agents),
        }
    )
    np.savez(
        path, __meta__=np.frombuffer(meta.encode("utf-8"), np.uint8), **flat
    )


def load_policy(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Inverse of save_policy -> (params pytree, meta dict)."""
    from flax.traverse_util import unflatten_dict

    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode("utf-8"))
        flat = {
            tuple(k.split("/")): jnp.asarray(z[k])
            for k in z.files
            if k != "__meta__"
        }
    return unflatten_dict(flat), meta


class QCollectPolicy:
    """Greedy (epsilon-mixed) actions from a trained VdnNetwork, runnable
    inside the VAE experiment's compiled collection scan.

    Observation packing mirrors baselines/vdn._pack_obs — zero-pad every
    agent's obs to the max width and append a one-hot agent id — but starts
    from the experiment's StackedObs class tensors instead of a dict, so the
    whole thing stays jit-compatible with zero host work."""

    def __init__(
        self,
        env,
        spec: AgentSpec,
        params,
        meta: Dict[str, Any],
        epsilon: float,
        sample_fn,
    ):
        if not getattr(env, "discrete_actions", True):
            raise ValueError(
                "learned Q-policy collection needs discrete actions "
                "(VdnNetwork outputs per-action Q-values)"
            )
        if meta["n_agents"] != spec.n_agents:
            raise ValueError(
                f"policy was trained for {meta['n_agents']} agents but the "
                f"experiment population has {spec.n_agents}"
            )
        from mfvae_tpu.baselines.vdn import VdnNetwork

        self.spec = spec
        self.epsilon = float(epsilon)
        self.sample_fn = sample_fn
        self.params = params
        self.hidden_dim = int(meta["hidden_dim"])
        self.network = VdnNetwork(
            action_dim=int(meta["action_dim"]),
            n_agents=spec.n_agents,
            hidden_dim=self.hidden_dim,
            param_share=bool(meta["param_share"]),
        )
        # agent index -> (group, position): static gather plan for packing
        slot = {}
        for g, ((_, _), idxs) in enumerate(spec.groups):
            for pos, i in enumerate(idxs):
                slot[i] = (g, pos)
        self._slots = tuple(slot[i] for i in range(spec.n_agents))
        self._d_pad = max(od for (od, _), _ in spec.groups)

    def init_carry(self):
        return jnp.zeros((1, self.spec.n_agents, self.hidden_dim))

    def _pack(self, stacked_obs) -> jnp.ndarray:
        """StackedObs ([A_g, od] per class) -> [1, N, d_pad + N]."""
        from mfvae_tpu.training.trainer import stacked_to_grouped

        obs_g = stacked_to_grouped(self.spec, stacked_obs)
        rows = []
        for g, pos in self._slots:
            o = obs_g[g][pos]
            pad = self._d_pad - o.shape[-1]
            rows.append(jnp.pad(o, (0, pad)) if pad else o)
        obs = jnp.stack(rows, axis=0)  # [N, d_pad]
        onehot = jnp.eye(self.spec.n_agents, dtype=obs.dtype)
        return jnp.concatenate([obs, onehot], axis=-1)[None]

    def step(self, carry, stacked_obs, env_state, key):
        del env_state  # learned policies act on observations
        obs = self._pack(stacked_obs)  # [1, N, D]
        hidden, q = self.network.apply(
            self.params, carry, obs[None], jnp.zeros((1, 1), bool)
        )
        greedy = jnp.argmax(q[0, 0], axis=-1).astype(jnp.int32)  # [N]
        k_mix, k_rand = jax.random.split(key)
        rand = self.sample_fn(k_rand)
        take = jax.random.uniform(k_mix, (self.spec.n_agents,)) < self.epsilon
        return hidden, jnp.where(take, rand, greedy)


def load_collect_policy(
    path: str, env, spec: AgentSpec, epsilon: float, sample_fn
) -> QCollectPolicy:
    """Config-surface loader for ``train.collect_policy: "vdn:<path>"``."""
    params, meta = load_policy(path)
    return QCollectPolicy(env, spec, params, meta, epsilon, sample_fn)


class HostQCollectPolicy:
    """Host-collector mirror of QCollectPolicy: greedy (epsilon-mixed)
    actions from the saved policy artifact, for AsyncCollector and
    NativeBatchedCollector (envs/host_adapter.py).

    The recurrent forward runs as ONE jitted CPU program per collected
    step, batched over the K host envs; obs packing from the collectors'
    named-obs dicts happens in numpy.  Episode resets zero the hidden rows
    of the affected envs (the same done-masking the agent trained with)."""

    def __init__(
        self,
        path: str,
        agents,
        obs_dims: Dict[str, int],
        epsilon: float,
        rng: np.random.Generator,
        n_envs: int = 1,
    ):
        from mfvae_tpu.baselines.vdn import VdnNetwork

        params, meta = load_policy(path)
        self.agents = list(agents)
        n = len(self.agents)
        if meta["n_agents"] != n:
            raise ValueError(
                f"policy was trained for {meta['n_agents']} agents but the "
                f"host env has {n}"
            )
        self.epsilon = float(epsilon)
        self.rng = rng
        self.n_envs = int(n_envs)
        self.action_dim = int(meta["action_dim"])
        self.hidden_dim = int(meta["hidden_dim"])
        self._d_pad = max(int(obs_dims[a]) for a in self.agents)
        network = VdnNetwork(
            action_dim=self.action_dim,
            n_agents=n,
            hidden_dim=self.hidden_dim,
            param_share=bool(meta["param_share"]),
        )
        self._cpu = jax.devices("cpu")[0]

        def fwd(h, obs):  # h [B, N, H]; obs [B, N, D] -> greedy [B, N]
            h, q = network.apply(
                params, h, obs[None], jnp.zeros((1, obs.shape[0]), bool)
            )
            return h, jnp.argmax(q[0], axis=-1).astype(jnp.int32)

        self._fwd = jax.jit(fwd)
        self.reset()

    def reset(self, done_mask: np.ndarray | None = None) -> None:
        """Zero the hidden state — everywhere, or only where done."""
        n = len(self.agents)
        if done_mask is None or self._hidden_is_fresh():
            self._h = np.zeros(
                (self.n_envs, n, self.hidden_dim), np.float32
            )
        else:
            h = np.array(self._h)  # np.asarray of a jax array is read-only
            h[np.asarray(done_mask, bool)] = 0.0
            self._h = h

    def _hidden_is_fresh(self) -> bool:
        return not hasattr(self, "_h")

    def _pack(self, obs: Dict[str, np.ndarray]) -> np.ndarray:
        """named obs (each [od] or [K, od]) -> [B, N, d_pad + N]."""
        b = self.n_envs
        n = len(self.agents)
        out = np.zeros((b, n, self._d_pad + n), np.float32)
        for i, a in enumerate(self.agents):
            v = np.asarray(obs[a], np.float32).reshape(b, -1)
            out[:, i, : v.shape[1]] = v
            out[:, i, self._d_pad + i] = 1.0
        return out

    def actions(self, obs: Dict[str, np.ndarray]) -> np.ndarray:
        """Greedy eps-mixed actions [B, N] int32 from the named obs."""
        packed = self._pack(obs)
        with jax.default_device(self._cpu):
            self._h, greedy = self._fwd(self._h, packed)
        acts = np.asarray(greedy)
        take = self.rng.random(acts.shape) < self.epsilon
        rand = self.rng.integers(0, self.action_dim, size=acts.shape)
        return np.where(take, rand, acts).astype(np.int32)
