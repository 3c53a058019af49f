"""Fused train/test steps and the fully-compiled epoch program.

Design deltas vs the reference (SURVEY §3.2 vs §3.4):

- ONE forward per train step via ``value_and_grad(has_aux=True)`` — the
  reference runs the forward twice (once for metrics, once under grad,
  jax_ver/trainer.py:80-83).
- Optimizer mode 'Adam' | 'ART' | 'POPART' (torch_ver/trainer.py:50) with
  PopArt executed *inside* the jit as pure TrainState maps.
- The whole epoch — collect `sample_num` env steps into the HBM buffer,
  run `train_num` train steps, collect + evaluate the held-out test phase —
  is ONE jitted, scan-based program (`make_epoch_fn`), the pattern the
  reference only applies to its VDN baseline (vdn.py:522-524) while its VAE
  path round-trips to Python every env and train step
  (jax_ver/main.py:154-186).
- Test losses are averaged over ``test_num`` (the reference divides by
  train_num — jax_ver/main.py:228-231); ``train.bug_compat_rng`` restores
  the reference averaging (and frozen epoch keys) for curve replication.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.training import train_state as flax_train_state

from mfvae_tpu.config import ExperimentConfig, LossConfig, TrainConfig
from mfvae_tpu.data.buffer import BufferState, ItemBuffer
from mfvae_tpu.data.transitions import GroupedTransition, VaeBatch, vae_batch_from_grouped
from mfvae_tpu.models.losses import LossOutputs, elbo_losses
from mfvae_tpu.models.mavae import AgentSpec, MAVAE
from mfvae_tpu.training.popart import (
    PopArtState,
    art,
    init_popart,
    normalize,
    pop_rescale_head,
)


class VaeTrainState(flax_train_state.TrainState):
    """flax TrainState + PopArt statistics (kept even in Adam mode so the
    pytree structure is mode-independent)."""

    popart: PopArtState = struct.field(pytree_node=True, default=None)


def make_lr(cfg: TrainConfig):
    """LR schedule factory.  'cosine_periodic' is the torch-parity choice
    (CosineAnnealingLR semantics: oscillates with period 2*lr_t_max,
    torch_ver/main.py:52-53,98); 'cosine' is a one-shot decay that clamps
    at lr*lr_min_ratio after lr_t_max steps."""
    if cfg.lr_schedule == "constant":
        return cfg.lr
    if cfg.lr_schedule == "cosine":
        return optax.cosine_decay_schedule(
            cfg.lr, decay_steps=cfg.lr_t_max, alpha=cfg.lr_min_ratio
        )
    if cfg.lr_schedule == "cosine_periodic":
        # torch.optim.lr_scheduler.CosineAnnealingLR semantics: the closed
        # form eta_min + (lr - eta_min)*(1 + cos(pi*t/T_max))/2 keeps
        # oscillating with period 2*T_max after the first descent — unlike
        # optax.cosine_decay_schedule, which clamps at the floor.  With the
        # torch reference's T_max=50 stepped per batch over 512 steps
        # (torch_ver/main.py:53,98) the two diverge after step 50, so this
        # is the LR-faithful choice for the torch-parity configs.
        eta_min = cfg.lr * cfg.lr_min_ratio
        t_max = max(cfg.lr_t_max, 1)

        def periodic_cosine(step):
            frac = (1.0 + jnp.cos(jnp.pi * step / t_max)) / 2.0
            return eta_min + (cfg.lr - eta_min) * frac

        return periodic_cosine
    if cfg.lr_schedule == "warmup_cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=cfg.lr,
            warmup_steps=max(cfg.lr_warmup_steps, 1),
            decay_steps=max(cfg.lr_t_max, cfg.lr_warmup_steps + 1),
            end_value=cfg.lr * cfg.lr_min_ratio,
        )
    raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")


def create_train_state(
    model: MAVAE,
    params,
    cfg: TrainConfig,
) -> VaeTrainState:
    tx = optax.adam(make_lr(cfg))
    if cfg.grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    state = VaeTrainState.create(
        apply_fn=model.apply,
        params=params,
        tx=tx,
        popart=init_popart(model.spec.n_agents),
    )
    # TrainState.create leaves step as a weak-typed Python int; one train
    # step turns it into a strong int32, changing the input avals of any jit
    # carrying the state and forcing a silent full retrace (10+ min remote
    # compile on axon).  Pin it up front.
    return state.replace(step=jnp.asarray(0, jnp.int32))


def _kl_scale(loss_cfg: LossConfig, step: jnp.ndarray) -> Optional[jnp.ndarray]:
    if loss_cfg.kl_anneal_steps and loss_cfg.kl_anneal_steps > 0:
        return jnp.minimum(1.0, step.astype(jnp.float32) / loss_cfg.kl_anneal_steps)
    return None


def make_train_step(
    loss_cfg: LossConfig,
    mode: str = "Adam",
    popart_beta: float = 3e-4,
    use_pallas: bool = False,
    s_col_weight=None,
) -> Callable:
    """Build the fused train step.  Signature:
    (state, batch: VaeBatch, rng_key) -> (state, LossOutputs).

    use_pallas routes the forward through MAVAE.fused_call (Pallas
    reparam+KL kernel) and the recon losses through the Pallas huber
    reduction.  ``s_col_weight`` ([Σobs], from build_s_col_weight) routes
    the state branch through the weighted column mean — the
    contact-sharpness lever."""
    assert mode in ("Adam", "ART", "POPART"), mode
    use_art = mode in ("ART", "POPART")
    use_pop = mode == "POPART"
    if use_pallas:
        assert loss_cfg.free_bits == 0.0, "pallas path has no free-bits support"
        assert loss_cfg.use_huber, "pallas path implements the huber family"
        assert s_col_weight is None and loss_cfg.contact_weight == 0.0, (
            "the pallas fused path has no weighted-state-branch support "
            "(loss.contact_weight / loss.prey_dist_weight)"
        )
    if use_art:
        assert loss_cfg.contact_weight == 0.0, (
            "loss.contact_weight reads raw reward targets; ART/POPART "
            "normalization is unsupported — use train.mode='Adam'"
        )

    def train_step(
        state: VaeTrainState, batch: VaeBatch, rng_key
    ) -> Tuple[VaeTrainState, LossOutputs]:
        params = state.params
        pa = state.popart
        reward_targets = batch.rewards
        if use_art:
            pa_new = art(pa, reward_targets, popart_beta)
            if use_pop:
                params = pop_rescale_head(params, pa, pa_new, ("params", "reward_linear"))
            pa = pa_new
            reward_targets = normalize(pa, batch.rewards)

        kl_scale = _kl_scale(loss_cfg, state.step)

        if use_pallas:
            from mfvae_tpu.models.losses import combine_losses
            from mfvae_tpu.ops.fused_elbo import huber_mean

            def loss_fn(p):
                recon_s, recon_r, kl_rows = state.apply_fn(
                    p, batch.inputs, None, rng_key, method="fused_call"
                )
                s_loss = huber_mean(batch.next_state, recon_s, loss_cfg.huber_delta)
                r_loss = huber_mean(reward_targets, recon_r, loss_cfg.huber_delta)
                kl_loss = jnp.mean(jnp.sum(kl_rows, axis=1))
                out = combine_losses(s_loss, r_loss, kl_loss, loss_cfg, kl_scale)
                return out.loss, out

        else:

            def loss_fn(p):
                recon_s, recon_r, mu, logvar = state.apply_fn(
                    p, batch.inputs, None, rng_key
                )
                out = elbo_losses(
                    recon_s, recon_r, batch.next_state, reward_targets,
                    mu, logvar, loss_cfg, kl_scale=kl_scale,
                    s_col_weight=s_col_weight,
                )
                return out.loss, out

        (_, outs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt_state = state.tx.update(grads, state.opt_state, params)
        new_params = optax.apply_updates(params, updates)
        state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            popart=pa,
        )
        return state, outs

    return train_step


def make_test_step(
    loss_cfg: LossConfig, mode: str = "Adam", s_col_weight=None
) -> Callable:
    """Eval step: forward + losses, no gradient (jax_ver/trainer.py:86-90).
    Under ART/POPART the reward loss is computed against normalized targets,
    consistent with training."""
    use_art = mode in ("ART", "POPART")

    def test_step(state: VaeTrainState, batch: VaeBatch, rng_key) -> LossOutputs:
        reward_targets = batch.rewards
        if use_art:
            reward_targets = normalize(state.popart, batch.rewards)
        recon_s, recon_r, mu, logvar = state.apply_fn(
            state.params, batch.inputs, None, rng_key
        )
        return elbo_losses(
            recon_s, recon_r, batch.next_state, reward_targets, mu, logvar,
            loss_cfg, s_col_weight=s_col_weight,
        )

    return test_step


def build_s_col_weight(spec, cfg) -> Optional["jnp.ndarray"]:
    """Column-weight vector [Σobs] for loss.prey_dist_weight: each
    adversary's relative-prey observation dims — the exact columns the
    true tag reward reads (envs/mpe.py SimpleTagEnv._observe layout:
    self_vel(2), self_pos(2), landmark_rel(2L), other_adv_rel(2(n_adv-1)),
    prey_rel(2·n_good)) — count (1 + prey_dist_weight)x in the state
    branch.  None when the lever is off."""
    if cfg.loss.prey_dist_weight <= 0.0:
        return None
    assert "simple_tag" in cfg.env.name, (
        f"loss.prey_dist_weight knows the simple_tag obs layout only, "
        f"got env {cfg.env.name!r}"
    )
    from mfvae_tpu.envs.mpe import tag_prey_rel_slice

    n_adv = cfg.env.num_adversaries
    od_adv = spec.obs_dims[0]
    sl = tag_prey_rel_slice(
        cfg.env.num_obs, n_adv, cfg.env.num_good_agents
    )
    w = np.ones(sum(spec.obs_dims), np.float32)
    for a in range(n_adv):
        base = a * od_adv
        w[base + sl.start : base + sl.stop] += cfg.loss.prey_dist_weight
    return jnp.asarray(w)


# ---------------------------------------------------------------------------
# Fully-compiled epoch: collect -> train -> test-collect -> test-eval
# ---------------------------------------------------------------------------


class EnvCarry(NamedTuple):
    obs: Any  # stacked obs pytree from env.reset_stacked
    state: Any  # env state
    # stateful collect-policy carry (QCollectPolicy hidden, EpisodeMixPolicy
    # episode flag) — persists across collect phases and epochs so an
    # episode spanning phase boundaries keeps its policy state; () for
    # stateless policies.  Reset to init_carry() at episode end in-scan.
    policy: Any = ()


class EpochCarry(NamedTuple):
    train_state: VaeTrainState
    buffer_state: BufferState
    test_buffer_state: BufferState
    env: EnvCarry


class EpochMetrics(NamedTuple):
    train: LossOutputs
    test: LossOutputs


def stacked_to_grouped(spec: AgentSpec, stacked_obs) -> Tuple[jnp.ndarray, ...]:
    """Map an env's StackedObs (one tensor per agent class) onto the spec's
    group order.  Valid when classes and spec groups coincide (true for
    simple_tag: adversaries then good agents)."""
    fields = tuple(stacked_obs)
    assert len(fields) == len(spec.groups), (
        f"env has {len(fields)} agent classes but spec has {len(spec.groups)} groups"
    )
    for t, ((obs_dim, _), idxs) in zip(fields, spec.groups):
        assert t.shape[-2:] == (len(idxs), obs_dim), (
            f"class tensor {t.shape} vs group ({len(idxs)}, {obs_dim})"
        )
    return fields


def make_action_sampler(env, spec: AgentSpec):
    """Uniform random-rollout action sampling — the reference fills its
    buffer with ``action_space.sample()`` rollouts (torch_ver/main.py:69,
    jax_ver/main.py:155-156), for both the discrete and the continuous
    (``discrete=False``, torch_ver/src/env.py:27) action modes.

    Returns ``(sample, group_actions)``:
    - ``sample(key, leading=())`` -> [*leading, A] int32 (discrete; uniform
      within each agent's own range — simple_world_comm's leader is
      Discrete(20) vs Discrete(5)) or [*leading, A, act_dim] float uniform
      in the Box bounds (continuous).
    - ``group_actions(actions)`` -> per-spec-group tuple, slicing the agent
      axis wherever it sits."""
    discrete = getattr(env, "discrete_actions", True)
    n_agents = spec.n_agents
    if discrete:
        act_dims_arr = jnp.asarray(spec.act_dims, jnp.float32)

        def sample(key, leading=()):
            u = jax.random.uniform(key, (*leading, n_agents))
            return jnp.minimum(
                (u * act_dims_arr).astype(jnp.int32),
                act_dims_arr.astype(jnp.int32) - 1,
            )

        def group_actions(actions):
            return tuple(
                jnp.take(actions, jnp.asarray(idxs), axis=-1)
                for (_, _), idxs in spec.groups
            )

    else:
        act_dims = set(spec.act_dims)
        assert len(act_dims) == 1, (
            f"continuous stepping needs one common act_dim, got {spec.act_dims}"
        )
        act_dim = act_dims.pop()
        space = env.action_space(env.agents[0])
        lo, hi = float(space.low), float(space.high)

        def sample(key, leading=()):
            return jax.random.uniform(
                key, (*leading, n_agents, act_dim), minval=lo, maxval=hi
            )

        def group_actions(actions):
            return tuple(
                jnp.take(actions, jnp.asarray(idxs), axis=-2)
                for (_, _), idxs in spec.groups
            )

    return sample, group_actions


def _resolve_collect_policy(
    env, spec: AgentSpec, cfg: ExperimentConfig, sample_fn
):
    """None for the reference's random rollouts; a stateless scripted policy
    (envs/policies.py); or, for ``collect_policy="vdn:<path.npz>"``, a
    stateful learned Q-policy (baselines/collect_policy.py) whose recurrent
    carry the collection scan threads and resets on episode end.
    ``sample_fn`` is the make_action_sampler uniform sampler, reused for the
    epsilon mixture."""
    name = cfg.train.collect_policy
    if name.startswith("vdn:"):
        from mfvae_tpu.baselines.collect_policy import load_collect_policy

        return load_collect_policy(
            name[len("vdn:"):], env, spec, cfg.train.collect_epsilon,
            sample_fn,
        )
    from mfvae_tpu.envs.policies import make_collect_policy

    return make_collect_policy(
        env, spec, name, cfg.train.collect_epsilon, sample_fn,
        mix_frac=cfg.train.collect_mix_frac,
    )


def init_policy_carry(env, spec: AgentSpec, cfg: ExperimentConfig, n_envs: int = 1):
    """The initial EnvCarry.policy for a fresh experiment: () for stateless
    collection, the policy's init_carry() (broadcast over n_envs for the
    batched path) otherwise.  Seeding this at setup keeps the epoch
    program's carry structure CONSTANT — required by the scan-of-epochs
    dispatch (lax.scan needs identical carry structure in and out)."""
    sample_fn, _ = make_action_sampler(env, spec)
    policy = _resolve_collect_policy(env, spec, cfg, sample_fn)
    if not hasattr(policy, "init_carry"):
        return ()
    carry = policy.init_carry()
    if n_envs > 1:
        carry = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n_envs,) + x.shape), carry
        )
    return carry


def make_phase_fns(
    env,
    spec: AgentSpec,
    buffer: ItemBuffer,
    test_buffer: ItemBuffer,
    cfg: ExperimentConfig,
):
    """Build the three phase programs (collect / train / test-eval) used by
    both the fused single-jit epoch and the split per-phase jits.

    The split mode exists because one fused epoch is a large XLA program
    (slow first compile, especially with axon remote compilation); split
    phases compile faster and the collect program is REUSED for the train
    and test collection phases (identical avals).  Steady-state cost is
    just 4 host dispatches per epoch.
    """
    W = cfg.train.unroll_steps
    if W > 1:
        from mfvae_tpu.training.unroll import make_unroll_train_step

        assert buffer.max_length % cfg.train.sample_num == 0, (
            f"unroll_steps > 1 needs buffer.max_size ({buffer.max_length}) "
            f"divisible by train.sample_num ({cfg.train.sample_num}) so "
            f"windows never straddle collection phases"
        )
        unroll_step = make_unroll_train_step(
            spec, cfg.loss, W, cfg.train.mode,
            use_pallas=cfg.model.use_pallas,
            stop_gradient=cfg.train.unroll_stop_gradient,
            mean_feedback=cfg.train.unroll_mean_feedback,
            s_col_weight=build_s_col_weight(spec, cfg),
        )
    else:
        train_step = make_train_step(
            cfg.loss, cfg.train.mode, cfg.train.popart_beta,
            use_pallas=cfg.model.use_pallas,
            s_col_weight=build_s_col_weight(spec, cfg),
        )
    test_step = make_test_step(
        cfg.loss, cfg.train.mode, s_col_weight=build_s_col_weight(spec, cfg)
    )
    sample_actions, group_actions = make_action_sampler(env, spec)
    collect_policy = _resolve_collect_policy(env, spec, cfg, sample_actions)

    stateful_policy = hasattr(collect_policy, "init_carry")

    def collect(carry: Tuple[EnvCarry, BufferState], key, which_buffer: ItemBuffer):
        def body(c, k):
            env_c, buf_state, pol_c = c
            k_act, k_step = jax.random.split(k)
            if collect_policy is None:
                actions = sample_actions(k_act)
            elif stateful_policy:
                pol_c, actions = collect_policy.step(
                    pol_c, env_c.obs, env_c.state, k_act
                )
            else:
                actions = collect_policy(env_c.state, k_act)
            obs_g = stacked_to_grouped(spec, env_c.obs)
            act_groups = group_actions(actions)
            next_obs, env_state, rewards, done, _ = env.step_stacked(
                k_step, env_c.state, actions
            )
            next_g = stacked_to_grouped(spec, next_obs)
            tr = GroupedTransition(
                obs=obs_g,
                actions=act_groups,
                next_obs=next_g,
                rewards=rewards,
                done=jnp.max(done.astype(jnp.float32)),
            )
            buf_state = which_buffer.add(buf_state, tr)
            # auto-reset at episode end (jax_ver/main.py:159-161)
            k_reset = jax.random.fold_in(k, 2)
            reset_obs, reset_state = env.reset_stacked(k_reset)
            done_all = jnp.all(done)
            new_obs = jax.tree.map(
                lambda a, b: jnp.where(done_all, a, b), reset_obs, next_obs
            )
            new_state = jax.tree.map(
                lambda a, b: jnp.where(done_all, a, b), reset_state, env_state
            )
            if stateful_policy:
                # recurrent policy state restarts with the episode — the
                # same done-masking the Q-agent trained under
                # (baselines/vdn.py env_step)
                pol_c = jax.tree.map(
                    lambda i, p: jnp.where(done_all, i, p),
                    collect_policy.init_carry(), pol_c,
                )
            return (EnvCarry(obs=new_obs, state=new_state), buf_state, pol_c), ()

        keys = jax.random.split(key, cfg.train.sample_num)
        # the policy carry RESUMES from the previous phase/epoch (EnvCarry
        # .policy) so episodes spanning phase boundaries keep their policy
        # state; only a fresh experiment (empty carry) initializes it
        if stateful_policy:
            # structure check, not value check: an empty carry means a
            # fresh experiment (EnvCarry.policy defaults to ())
            pol_init = (
                carry[0].policy
                if jax.tree.leaves(carry[0].policy)
                else collect_policy.init_carry()
            )
        else:
            pol_init = ()
        # the in-scan EnvCarry rides with policy=() (body rebuilds it);
        # the live policy state travels as the scan tuple's third element
        (env_c, buf_state, pol_c), _ = jax.lax.scan(
            body, (carry[0]._replace(policy=()), carry[1], pol_init), keys
        )
        env_c = env_c._replace(policy=pol_c)
        return env_c, buf_state

    def train_phase(train_state, buf_state, key):
        def body(ts, k):
            k_sample, k_model = jax.random.split(k)
            if W > 1:
                wb = buffer.sample_window(
                    buf_state, k_sample, W, block=cfg.train.sample_num
                )
                return unroll_step(ts, wb.experience, k_model)
            batch = buffer.sample(buf_state, k_sample)
            vb = vae_batch_from_grouped(spec, batch.experience)
            ts, outs = train_step(ts, vb, k_model)
            return ts, outs

        keys = jax.random.split(key, cfg.train.train_num)
        train_state, outs = jax.lax.scan(body, train_state, keys)
        mean_outs = jax.tree.map(lambda x: jnp.mean(x), outs)
        return train_state, mean_outs

    def test_phase(train_state, buf_state, key):
        def one(k):
            k_sample, k_model = jax.random.split(k)
            batch = test_buffer.sample(buf_state, k_sample)
            vb = vae_batch_from_grouped(spec, batch.experience)
            return test_step(train_state, vb, k_model)

        keys = jax.random.split(key, cfg.train.test_num)
        # Eval steps are independent given train_state, so vmap batches the
        # test_num forwards into MXU-sized matmuls (effective batch
        # test_num x batch_size) instead of a sequential scan of small ones.
        # Keys, samples, and per-step metrics are identical either way;
        # eval_vmap=False keeps the scan's minimal memory footprint.
        if cfg.train.eval_vmap:
            outs = jax.vmap(one)(keys)
        else:
            _, outs = jax.lax.scan(lambda _, k: ((), one(k)), (), keys)
        if cfg.train.bug_compat_rng:
            # reference divides test sums by train_num (jax_ver/main.py:228-231)
            denom = cfg.train.train_num
            return jax.tree.map(lambda x: jnp.sum(x) / denom, outs)
        return jax.tree.map(lambda x: jnp.mean(x), outs)

    return collect, train_phase, test_phase


def make_batched_epoch_fn(
    env,
    spec: AgentSpec,
    buffer: ItemBuffer,
    test_buffer: ItemBuffer,
    cfg: ExperimentConfig,
):
    """Epoch program with a leading env-shard axis E = cfg.train.n_envs.

    Every env/buffer structure carries [E, ...]: E env instances step in
    lockstep (one vmapped physics program), each feeds its own buffer shard
    [E, cap, ...], and each train step draws batch/E samples from every
    shard (stratified global batch).  Data parallelism is then pure layout:
    shard the E axis over the mesh 'data' axis (P('data') on env carry,
    buffer state, and sampled batch; params replicated) and the XLA SPMD
    partitioner inserts the psums for the loss/grad reductions over ICI —
    collection, buffers, and training all scale with zero host changes
    (BASELINE.json config 5 structure).
    """
    W = cfg.train.unroll_steps
    if W > 1:
        from mfvae_tpu.training.unroll import make_unroll_train_step

        unroll_step = make_unroll_train_step(
            spec, cfg.loss, W, cfg.train.mode,
            use_pallas=cfg.model.use_pallas,
            stop_gradient=cfg.train.unroll_stop_gradient,
            mean_feedback=cfg.train.unroll_mean_feedback,
            s_col_weight=build_s_col_weight(spec, cfg),
        )
    else:
        train_step = make_train_step(
            cfg.loss, cfg.train.mode, cfg.train.popart_beta,
            use_pallas=cfg.model.use_pallas,
            s_col_weight=build_s_col_weight(spec, cfg),
        )
    test_step = make_test_step(
        cfg.loss, cfg.train.mode, s_col_weight=build_s_col_weight(spec, cfg)
    )
    sample_actions, group_actions = make_action_sampler(env, spec)
    collect_policy = _resolve_collect_policy(env, spec, cfg, sample_actions)
    E = cfg.train.n_envs
    assert cfg.buffer.batch_size % E == 0, (cfg.buffer.batch_size, E)
    local_bs = cfg.buffer.batch_size // E

    # shards SPLIT the global capacity (E shards of max_size/E each) — a
    # full-capacity buffer per shard would multiply HBM use by E
    local_buffer = ItemBuffer(
        max_length=max(buffer.max_length // E, local_bs),
        min_length=max(buffer.min_length // E, 1),
        sample_batch_size=local_bs,
    )
    if W > 1:
        # each SHARD is its own sequential stream (one env feeds it), so
        # windows sample per shard with the same phase-block alignment as
        # the single-env path
        assert local_buffer.max_length % cfg.train.sample_num == 0, (
            f"unroll_steps > 1 with n_envs={E} needs the per-shard capacity "
            f"({local_buffer.max_length} = max(max_size // n_envs, "
            f"batch_size // n_envs)) divisible by train.sample_num "
            f"({cfg.train.sample_num}) so windows never straddle "
            f"collection phases"
        )

    stateful_policy = hasattr(collect_policy, "init_carry")

    def collect(carry, key):
        """carry: (EnvCarry [E,...], BufferState [E,...])."""

        def body(c, k):
            env_c, buf_state, pol_c = c
            k_act, k_step = jax.random.split(k)
            if collect_policy is None:
                actions = sample_actions(k_act, (E,))
            elif stateful_policy:
                pol_c, actions = jax.vmap(collect_policy.step)(
                    pol_c, env_c.obs, env_c.state, jax.random.split(k_act, E)
                )
            else:
                actions = jax.vmap(collect_policy)(
                    env_c.state, jax.random.split(k_act, E)
                )
            obs_g = tuple(env_c.obs)  # StackedObs fields, [E, A_g, D_g]
            act_groups = group_actions(actions)
            step_keys = jax.random.split(k_step, E)
            next_obs, env_state, rewards, done, _ = jax.vmap(env.step_stacked)(
                step_keys, env_c.state, actions
            )
            next_g = tuple(next_obs)
            tr = GroupedTransition(
                obs=obs_g,
                actions=act_groups,
                next_obs=next_g,
                rewards=rewards,
                done=jnp.max(done.astype(jnp.float32), axis=-1),
            )
            buf_state = jax.vmap(local_buffer.add)(buf_state, tr)
            reset_keys = jax.random.split(jax.random.fold_in(k, 2), E)
            reset_obs, reset_state = jax.vmap(env.reset_stacked)(reset_keys)
            done_all = jnp.all(done, axis=-1)  # [E]

            def pick(a, b):
                shape = (E,) + (1,) * (a.ndim - 1)
                return jnp.where(done_all.reshape(shape), a, b)

            new_obs = jax.tree.map(pick, reset_obs, next_obs)
            new_state = jax.tree.map(pick, reset_state, env_state)
            if stateful_policy:
                pol_c = jax.tree.map(
                    lambda i, p: pick(jnp.broadcast_to(i, p.shape), p),
                    collect_policy.init_carry(), pol_c,
                )
            return (EnvCarry(obs=new_obs, state=new_state), buf_state, pol_c), ()

        keys = jax.random.split(key, cfg.train.sample_num)
        # resume the per-env policy carry from the previous phase/epoch
        # (see make_phase_fns.collect); broadcast a fresh one otherwise
        if stateful_policy:
            # structure check, not value check (see make_phase_fns.collect)
            pol_init = (
                carry[0].policy
                if jax.tree.leaves(carry[0].policy)
                else jax.tree.map(
                    lambda x: jnp.broadcast_to(x, (E,) + x.shape),
                    collect_policy.init_carry(),
                )
            )
        else:
            pol_init = ()
        (env_c, buf_state, pol_c), _ = jax.lax.scan(
            body, (carry[0]._replace(policy=()), carry[1], pol_init), keys
        )
        return env_c._replace(policy=pol_c), buf_state

    def sample_global(buf_state, key):
        keys = jax.random.split(key, E)
        batch = jax.vmap(local_buffer.sample)(buf_state, keys)
        # [E, local_bs, ...] -> [E*local_bs, ...]; axis 0 stays data-sharded
        flat = jax.tree.map(
            lambda x: x.reshape((E * local_bs,) + x.shape[2:]), batch.experience
        )
        return flat

    def sample_global_windows(buf_state, key):
        keys = jax.random.split(key, E)
        batch = jax.vmap(
            lambda s, k: local_buffer.sample_window(
                s, k, W, block=cfg.train.sample_num
            )
        )(buf_state, keys)
        # [E, local_bs, W, ...] -> [E*local_bs, W, ...]
        return jax.tree.map(
            lambda x: x.reshape((E * local_bs,) + x.shape[2:]), batch.experience
        )

    def train_phase(train_state, buf_state, key):
        def body(ts, k):
            k_sample, k_model = jax.random.split(k)
            if W > 1:
                wb = sample_global_windows(buf_state, k_sample)
                return unroll_step(ts, wb, k_model)
            vb = vae_batch_from_grouped(spec, sample_global(buf_state, k_sample))
            return train_step(ts, vb, k_model)

        keys = jax.random.split(key, cfg.train.train_num)
        train_state, outs = jax.lax.scan(body, train_state, keys)
        return train_state, jax.tree.map(jnp.mean, outs)

    def test_phase(train_state, buf_state, key):
        def one(k):
            k_sample, k_model = jax.random.split(k)
            vb = vae_batch_from_grouped(spec, sample_global(buf_state, k_sample))
            return test_step(train_state, vb, k_model)

        keys = jax.random.split(key, cfg.train.test_num)
        # independent eval steps -> vmap into one batched forward (see
        # make_phase_fns.test_phase); eval_vmap=False keeps the scan
        if cfg.train.eval_vmap:
            outs = jax.vmap(one)(keys)
        else:
            _, outs = jax.lax.scan(lambda _, k: ((), one(k)), (), keys)
        return jax.tree.map(jnp.mean, outs)

    def epoch(carry: EpochCarry, epoch_key) -> Tuple[EpochCarry, EpochMetrics]:
        k_collect, k_train, k_tcollect, k_test = jax.random.split(epoch_key, 4)
        env_c, buf_state = collect((carry.env, carry.buffer_state), k_collect)
        train_state, train_metrics = train_phase(carry.train_state, buf_state, k_train)
        env_c, test_buf_state = collect((env_c, carry.test_buffer_state), k_tcollect)
        test_metrics = test_phase(train_state, test_buf_state, k_test)
        return (
            EpochCarry(
                train_state=train_state,
                buffer_state=buf_state,
                test_buffer_state=test_buf_state,
                env=env_c,
            ),
            EpochMetrics(train=train_metrics, test=test_metrics),
        )

    return epoch


def make_epoch_fn(
    env,
    spec: AgentSpec,
    buffer: ItemBuffer,
    test_buffer: ItemBuffer,
    cfg: ExperimentConfig,
):
    """One compiled program per epoch (jit this; donate the carry).

    Mirrors the reference epoch structure (jax_ver/main.py:151-235):
    sample_num env steps -> train_num train steps -> sample_num test env
    steps -> test_num eval steps, with correct RNG splitting per step and
    correct test averaging.
    """
    collect, train_phase, test_phase = make_phase_fns(
        env, spec, buffer, test_buffer, cfg
    )

    def epoch(carry: EpochCarry, epoch_key) -> Tuple[EpochCarry, EpochMetrics]:
        k_collect, k_train, k_tcollect, k_test = jax.random.split(epoch_key, 4)
        env_c, buf_state = collect((carry.env, carry.buffer_state), k_collect, buffer)
        train_state, train_metrics = train_phase(carry.train_state, buf_state, k_train)
        env_c, test_buf_state = collect(
            (env_c, carry.test_buffer_state), k_tcollect, test_buffer
        )
        test_metrics = test_phase(train_state, test_buf_state, k_test)
        new_carry = EpochCarry(
            train_state=train_state,
            buffer_state=buf_state,
            test_buffer_state=test_buf_state,
            env=env_c,
        )
        return new_carry, EpochMetrics(train=train_metrics, test=test_metrics)

    return epoch
