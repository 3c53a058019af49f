#!/usr/bin/env python
"""BASELINE.json acceptance metric, discharged literally: "ELBO matching
reference to 1e-2 after 10k steps".

Imports the ACTUAL reference source (/root/reference/jax_ver/model.py +
trainer.py), initializes the real reference MAVAE at the canonical
40-agent population (jax_ver/main.py:59-62 dims), restacks its params into
our layout via import_reference_params, then trains BOTH implementations
in lockstep for 10,000 Adam steps on the same synthetic data stream and
the same per-step rng keys — each side as scanned chunks on device.

Pass criterion = |converged ELBO difference| < 1e-2, where "converged" is
the mean over the final 500 steps.  Per-step max deviation is reported as
a diagnostic but is NOT the criterion: Adam near-sign-normalizes small
gradients, so f32-level noise between the two implementations produces
O(lr) twin-trajectory divergence per step even though any single step
from shared params matches to 1e-3
(tests/test_reference_source_parity.py).

Run on the TPU env:  python scripts/elbo_parity_10k.py [n_steps]
"""

import importlib.util
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402
from flax.training.train_state import TrainState  # noqa: E402

from mfvae_tpu.config import LossConfig, ModelConfig, TrainConfig  # noqa: E402
from mfvae_tpu.data.transitions import VaeBatch  # noqa: E402
from mfvae_tpu.envs.mpe import SimpleTagEnv  # noqa: E402
from mfvae_tpu.models.import_reference import import_reference_params  # noqa: E402
from mfvae_tpu.models.mavae import AgentSpec, GroupedBatch, MAVAE  # noqa: E402
from mfvae_tpu.training.trainer import create_train_state, make_train_step  # noqa: E402

REF_DIR = "/root/reference/jax_ver"
BATCH = 128
LR = 1e-3


def _load(name, filename):
    spec = importlib.util.spec_from_file_location(name, f"{REF_DIR}/{filename}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def main(n_steps: int = 10_000, chunk: int = 500):
    ref_model_mod = _load("ref_jax_model", "model.py")
    ref_trainer = _load("ref_jax_trainer", "trainer.py")

    env = SimpleTagEnv(num_good_agents=10, num_adversaries=30, num_obs=20)
    agents = list(env.agents)
    obs_dim = {a: env.obs_dim(a.startswith("adversary")) for a in agents}
    act_dim = {a: 5 for a in agents}
    spec = AgentSpec.from_dicts(agents, obs_dim, act_dim)

    ref = ref_model_mod.MAVAE(
        idx_features=64, obs_features=64, action_features=64,
        descrete_act=True, agents=agents, obs_dim=obs_dim, action_dim=act_dim,
    )
    model = MAVAE.from_config(
        ModelConfig(
            compute_dtype="float32", fused_decoders=False, rng_mode="reference"
        ),
        spec,
    )

    def make_data(key):
        """Same data stream for both sides, generated on device."""
        ks = jax.random.split(key, 4)
        idx_state, actions = {}, {}
        ko = jax.random.split(ks[0], len(agents))
        ka = jax.random.split(ks[1], len(agents))
        for i, a in enumerate(agents):
            obs = jax.random.normal(ko[i], (BATCH, obs_dim[a]))
            idx_col = jnp.full((BATCH, 1), float(i))
            idx_state[a] = jnp.concatenate([idx_col, obs], axis=1)
            actions[a] = jax.random.randint(ka[i], (BATCH,), 0, act_dim[a])
        next_state = jax.random.normal(ks[2], (BATCH, sum(obs_dim.values())))
        rewards = jax.random.normal(ks[3], (BATCH, len(agents)))
        return idx_state, actions, next_state, rewards

    def to_grouped(idx_state, actions):
        obs_g = tuple(
            jnp.stack([idx_state[spec.agents[i]][:, 1:] for i in idxs], axis=1)
            for (_, _), idxs in spec.groups
        )
        act_g = tuple(
            jnp.stack([actions[spec.agents[i]] for i in idxs], axis=1)
            for (_, _), idxs in spec.groups
        )
        return GroupedBatch(obs=obs_g, actions=act_g)

    # init both sides from the SAME reference param tree
    d0 = make_data(jax.random.PRNGKey(0))
    ref_vars = ref.init(jax.random.PRNGKey(5), d0[0], d0[1], jax.random.PRNGKey(6))
    ref_state = TrainState.create(
        apply_fn=ref.apply, params=ref_vars["params"], tx=optax.adam(LR)
    )
    # deep-copy: import_reference_params aliases some reference buffers
    # (jnp.asarray is a no-op on device arrays), and the donating chunk
    # jits below would otherwise delete them out from under the other side
    variables = jax.tree.map(
        lambda x: jnp.array(x, copy=True),
        import_reference_params(ref_vars["params"], spec),
    )
    state = create_train_state(
        model, variables, TrainConfig(lr=LR, lr_schedule="constant", grad_clip=0.0)
    )
    our_step = make_train_step(LossConfig(family="jax"), mode="Adam")

    def ref_chunk(rs, keys):
        def body(s, key):
            idx_state, actions, next_state, rewards = make_data(
                jax.random.fold_in(key, 1)
            )
            s, loss, *_ = ref_trainer.train_step(
                s, idx_state, actions, next_state, rewards, key
            )
            return s, loss
        return jax.lax.scan(body, rs, keys)

    def our_chunk(s, keys):
        def body(s, key):
            idx_state, actions, next_state, rewards = make_data(
                jax.random.fold_in(key, 1)
            )
            vb = VaeBatch(
                inputs=to_grouped(idx_state, actions),
                next_state=next_state, rewards=rewards,
            )
            s, outs = our_step(s, vb, key)
            return s, outs.loss
        return jax.lax.scan(body, s, keys)

    ref_jit = jax.jit(ref_chunk, donate_argnums=0)
    our_jit = jax.jit(our_chunk, donate_argnums=0)

    max_dev, dev_at, first = 0.0, -1, None
    ref_all, our_all = [], []
    done = 0
    while done < n_steps:
        k = min(chunk, n_steps - done)
        keys = jax.vmap(
            lambda i: jax.random.fold_in(jax.random.PRNGKey(99), i)
        )(jnp.arange(done, done + k))
        ref_state, ref_losses = ref_jit(ref_state, keys)
        state, our_losses = our_jit(state, keys)
        r = np.asarray(ref_losses, np.float64)
        o = np.asarray(our_losses, np.float64)
        ref_all.append(r)
        our_all.append(o)
        dev = np.abs(r - o)
        if dev.max() > max_dev:
            max_dev, dev_at = float(dev.max()), done + int(dev.argmax())
        if first is None:
            first = (float(o[0]), float(r[0]))
        done += k
        print(
            f"step {done}: ours {o[-1]:.6f} ref {r[-1]:.6f} "
            f"max_dev_so_far {max_dev:.3e}",
            flush=True,
        )

    r = np.concatenate(ref_all)
    o = np.concatenate(our_all)
    tail = min(500, n_steps // 2)
    ref_final = float(r[-tail:].mean())
    our_final = float(o[-tail:].mean())
    out = {
        "criterion": (
            "|converged ELBO difference| < 1e-2 after lockstep training vs "
            "the actual reference source"
        ),
        "n_steps": n_steps,
        "batch": BATCH,
        "population": "40-agent canonical (10 good + 30 adversaries)",
        "converged_elbo": {"ours": our_final, "ref": ref_final,
                           "tail_steps": tail},
        "converged_abs_dev": abs(our_final - ref_final),
        "per_step_max_abs_dev": max_dev,
        "per_step_max_dev_at": dev_at,
        "first_step_loss": {"ours": first[0], "ref": first[1]},
        "tolerance": 1e-2,
        "pass": bool(abs(our_final - ref_final) < 1e-2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10_000)
