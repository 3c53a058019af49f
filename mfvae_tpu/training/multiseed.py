"""Multi-seed training as ONE vmapped XLA program.

The reference trains its VDN baseline over NUM_SEEDS with
``jax.jit(jax.vmap(train))`` (jax_ver/baselines/QLearning/vdn.py:570-573)
but its VAE pipeline is strictly single-seed.  Here the fused epoch program
(training/trainer.make_epoch_fn) is vmapped over a seed axis: N independent
replicas — independent env rollouts, buffers, params, optimizer and PopArt
state — advance in lockstep on one chip, which turns a seed sweep (e.g. the
parity seed-spread study, scripts/seed_spread.py) from N sequential runs
into one program whose batched matmuls are N× larger (better MXU shapes at
small per-seed batch).

Seed semantics match the single-seed driver exactly: replica i's carry and
epoch keys are derived through the same ``make_streams(seed_i)`` consumption
order as ``Experiment.setup``/``run`` (reset.next, model.next,
train.at(epoch)), so ``run_multiseed(cfg, seeds=[s])`` reproduces
``Experiment(cfg with seed=s).run()`` bit-for-bit (tested).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mfvae_tpu.config import ExperimentConfig
from mfvae_tpu.rng import make_streams
from mfvae_tpu.training.experiment import Experiment
from mfvae_tpu.training.trainer import init_policy_carry, make_epoch_fn


def run_multiseed(
    cfg: ExperimentConfig,
    seeds: Sequence[int],
    epochs_per_dispatch: Optional[int] = None,
    replica_batch: Optional[int] = None,
    tail_metrics: bool = False,
) -> dict:
    """Train len(seeds) independent replicas of the experiment in one
    vmapped program.  Returns per-seed final losses and the spread summary.

    Uses the fused single-env epoch program (cfg.train.n_envs must be 1 —
    the batched multi-env program already owns the leading axis for DP).

    HBM note: each replica carries its own replay buffers (2 x
    buffer.max_size transitions), so memory scales linearly with the seed
    count — at the canonical 40-agent scale ~4 replicas fit one 16G v5e
    chip.  ``replica_batch`` partitions a larger sweep into sequential
    vmapped programs of that many replicas each.
    """
    assert cfg.train.n_envs == 1, "multiseed vmaps the single-env epoch program"
    seeds = list(seeds)
    if replica_batch and replica_batch < len(seeds):
        parts = [
            run_multiseed(cfg, seeds[i : i + replica_batch],
                          epochs_per_dispatch, tail_metrics=tail_metrics)
            for i in range(0, len(seeds), replica_batch)
        ]
        train_final = np.asarray(sum((p["loss_train"] for p in parts), []))
        out = {
            "seeds": sum((p["seeds"] for p in parts), []),
            "loss_train": [float(x) for x in train_final],
            "loss_test": sum((p["loss_test"] for p in parts), []),
            "train_mean": float(train_final.mean()),
            "train_std": float(train_final.std()),
            "train_min": float(train_final.min()),
            "train_max": float(train_final.max()),
            "epochs": int(cfg.train.epoch_num),
            "n_seeds": len(train_final),
        }
        if tail_metrics:
            out["test_loss_tail"] = sum(
                (p["test_loss_tail"] for p in parts), []
            )
        return out
    seeds = jnp.asarray(list(seeds), jnp.int32)
    n = seeds.shape[0]
    K = epochs_per_dispatch or max(cfg.train.epochs_per_dispatch, 1)

    # Static objects (env, spec, model, buffers) are seed-independent.
    exp = Experiment(cfg)
    epoch_fn = make_epoch_fn(exp.env, exp.spec, exp.buffer, exp.test_buffer, cfg)

    def build_carry(seed):
        """Replicates Experiment.setup's stream consumption for one seed."""
        from mfvae_tpu.training.trainer import EnvCarry, EpochCarry, create_train_state

        streams = make_streams(seed, bug_compat=cfg.train.bug_compat_rng)
        k_reset, _ = streams["reset"].next()
        obs, env_state = exp.env.reset_stacked(k_reset)
        example = exp._example_transition(obs, env_state)
        buffer_state = exp.buffer.init(example)
        test_buffer_state = exp.test_buffer.init(example)
        k_model, _ = streams["model"].next()
        variables = exp.model.init(
            k_model, exp._fake_batch(cfg.train.batch_size), None, k_model
        )
        train_state = create_train_state(exp.model, variables, cfg.train)
        return (
            EpochCarry(
                train_state=train_state,
                buffer_state=buffer_state,
                test_buffer_state=test_buffer_state,
                env=EnvCarry(
                    obs=obs,
                    state=env_state,
                    policy=init_policy_carry(exp.env, exp.spec, cfg),
                ),
            ),
            streams["train"].base,
        )

    carries, train_bases = jax.jit(jax.vmap(build_carry))(seeds)

    bug_compat = cfg.train.bug_compat_rng

    def chunk(carry, base, epoch_idx):
        def body(c, e):
            k = base if bug_compat else jax.random.fold_in(base, e)
            return epoch_fn(c, k)

        return jax.lax.scan(body, carry, epoch_idx)

    vchunk = jax.jit(jax.vmap(chunk, in_axes=(0, 0, None)), donate_argnums=0)

    metrics = None
    epoch = 0
    while epoch < cfg.train.epoch_num:
        k = min(K, cfg.train.epoch_num - epoch)
        if metrics is not None:
            # depth-1 pipelining: bound the donated-dispatch queue and free
            # the previous chunk's stacked metrics before the next dispatch
            jax.device_get(metrics.train.loss)
        carries, metrics = vchunk(carries, train_bases, jnp.arange(epoch, epoch + k))
        epoch += k

    # Final-epoch losses per seed from the last chunk ([N, k, ...]).
    final = jax.device_get(metrics)
    train_final = np.asarray(final.train.loss)[:, -1]
    test_final = np.asarray(final.test.loss)[:, -1]
    out = {
        "seeds": [int(s) for s in np.asarray(seeds)],
        "loss_train": [float(x) for x in train_final],
        "loss_test": [float(x) for x in test_final],
        "train_mean": float(train_final.mean()),
        "train_std": float(train_final.std()),
        "train_min": float(train_final.min()),
        "train_max": float(train_final.max()),
        "epochs": int(cfg.train.epoch_num),
        "n_seeds": int(n),
    }
    if tail_metrics:
        # per-seed per-epoch held-out losses of the LAST dispatch chunk
        # ([N, k]) — enough for last-k-mean quality CIs without storing the
        # whole training history on device
        out["test_loss_tail"] = np.asarray(final.test.loss).tolist()
    return out
