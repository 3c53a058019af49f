"""Config system: one dataclass tree, YAML-loadable.

The reference hardcodes every hyperparameter as module-level constants
(reference jax_ver/main.py:37-52, torch_ver/main.py:20-34) and loss weights as
module globals (jax_ver/trainer.py:42-43, torch_ver/model.py:5-6). Here the
same names map 1:1 onto dataclass fields so existing experiment configs
translate mechanically, and everything can be overridden from YAML or CLI
dotted-path flags (``train.lr=3e-4``).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, fields, is_dataclass
from typing import Any, Dict, List, Optional, Tuple

import yaml


@dataclass
class ModelConfig:
    """MAVAE architecture.  Widths mirror the reference exactly:
    encoder [64, 64, 256] (jax_ver/model.py:15), action encoder [64]
    (model.py:40), decoder [1024, 256, 64, 256, 1024] (model.py:68),
    64-d idx/obs/act features (jax_ver/main.py:47-49)."""

    idx_features: int = 64
    obs_features: int = 64
    action_features: int = 64
    discrete_act: bool = True  # reference spells it DESCRETE_ACT (main.py:50)
    encoder_hidden: Tuple[int, ...] = (64, 64, 256)
    action_encoder_hidden: Tuple[int, ...] = (64,)
    decoder_hidden: Tuple[int, ...] = (1024, 256, 64, 256, 1024)
    # 'lecun' = flax default (jax_ver parity: model.py:136 nn.Dense default);
    # 'popart' = all-ones weight / zero bias like torch_ver/model.py:131-132.
    reward_head_init: str = "lecun"
    # Compute dtype for matmuls; params always f32. bf16 feeds the MXU at
    # full rate; reductions stay f32.
    compute_dtype: str = "bfloat16"
    # 'vectorized' draws eps for all agents from one key;
    # 'reference' replays the reference's sequential per-agent key splits
    # (jax_ver/model.py:161) for parity runs.
    rng_mode: str = "vectorized"
    remat: bool = False  # jax.checkpoint the decoders (memory vs FLOPs)
    # route the train step through the Pallas fused reparam+KL kernel and
    # huber reductions (ops/fused_elbo.py)
    use_pallas: bool = False
    # 'private' (reference structure) | 'shared_private' (BASELINE.json
    # config 3): per-agent Gaussian experts product-of-expert'd into one
    # shared latent the decoders also condition on
    latent_structure: str = "private"
    shared_latent: int = 32
    # per-agent deterministic encoder->decoder feature width (0 = off,
    # reference structure).  The RSSM-style deterministic+stochastic split:
    # carries state info to the decoders without paying KL, preventing the
    # measured posterior-collapse quality loss (PARITY.md).
    det_features: int = 0
    # decode next state as a RESIDUAL on the current state instead of an
    # absolute reconstruction (false = reference structure).  Removes the
    # latent bottleneck's ~0.4-0.6 Huber reconstruction floor that keeps
    # the absolute decoder below the frozen-world baseline at state
    # prediction (PARITY.md round 4, open-loop rollout accuracy); adds no
    # parameters.
    residual_state: bool = False
    # feed the CURRENT global state to the decoders as a skip input
    # (condition p(next|current, action, z) on current directly).  Measured
    # (PARITY.md round 4): residual_state alone cannot learn dynamics at
    # any loss weight or decoder width — the decoder would have to cancel
    # the base state to ~0.0065 huber through an encoder code that only
    # reconstructs it at ~0.29.  Pair with residual_state + loss.s_weight.
    state_skip: bool = False
    # LayerNorm before every decoder Dense.  Measured necessity (PARITY.md
    # round 4): at canonical input width the raw observation concat is so
    # ill-conditioned that Adam never recovers the linearly-recoverable
    # delta signal (pure-MLP repro pinned at the zero-delta floor; with
    # LayerNorm the same budget reaches delta corr ~0.9).  The dynamics
    # recipe is residual_state + state_skip + decoder_layernorm +
    # loss.s_weight.  Off = reference structure.
    decoder_layernorm: bool = False
    # run the state and reward decoders (identical hidden widths) as ONE
    # stacked batched-einsum trunk.  Perf-neutral under honest device
    # timing (scripts/perf_matrix.py: 234k vs 237k samples/s at b256 — the
    # earlier +15-19% claim was a sync artifact); kept as default for the
    # smaller executable.  False restores the reference's separate
    # state_decoder/reward_decoder parameter structure.
    fused_decoders: bool = True
    # reward head output: 'linear' (reference structure: scalar per agent,
    # huber/mse loss) | 'twohot' (categorical over reward_bins symlog-spaced
    # bins, two-hot cross-entropy loss, expectation at serving).  The tag
    # reward is +10-per-collision sparse (envs/mpe.py:50); a scalar head
    # regresses it toward the near-zero mean, which is why reward-scored MPC
    # measured null (PARITY.md round 4).  Two-hot keeps the spike mass as a
    # mode instead of averaging it away.  Requires train.mode='Adam' and
    # use_pallas=false (guarded at Experiment.setup).
    reward_head_mode: str = "linear"
    reward_bins: int = 65
    # reward decoder input: 'latent' (reference structure: the same
    # [z, action-emb, ...] concat the state decoder eats) | 'pred_state'
    # (the PREDICTED next state — stop-gradient — plus the current state
    # and action embeddings).  Measured motivation (PARITY.md round 4,
    # reward-head study): contact events are a simple function of
    # next-step geometry, which the state path predicts at 0.009 huber,
    # yet BOTH reward head modes are near-chance at event detection
    # through the latent input (AUC 0.51-0.60) — the signal exists in the
    # model but not on the reward branch's input.  Requires
    # fused_decoders=false (the fused trunk shares one input).
    reward_head_input: str = "latent"
    # Direct action->own-obs-delta pathway (round 5): zero-initialized
    # per-group linear from each agent's action embedding to its OWN
    # observation slice, added to the decoded state.  Motivation: the
    # oracle-decomposition control arm (results/r5/oracle_decomposition
    # .json) proved the learned model is the ENTIRE planning gap
    # (true-dynamics CEM = the scripted oracle), and the action signal
    # otherwise reaches the state only through the shared trunk where the
    # passive dynamics dominate the gradient.  Composes with
    # residual_state; default off (reference structure).
    action_delta_head: bool = False


@dataclass
class LossConfig:
    """Two divergent loss families exist in the reference (SURVEY §2.2):

    - family='jax':   loss = s*(1-r_weight) + r*r_weight + kl*kl_weight with
      r_weight=0.5, kl_weight=0.1 (jax_ver/trainer.py:42-43,64-70)
    - family='torch': loss = s + r*r_weight + kl*kl_weight with
      r_weight=0.005, kl_weight=0.0025 (torch_ver/model.py:5-6,34-39)

    Both use KL = mean over batch of the summed-over-all-latent-dims KL
    (the torch per-agent sum and the jax concatenated sum are numerically
    identical).  Huber delta = 1.0 (jax_ver/trainer.py:48).
    """

    family: str = "jax"
    use_huber: bool = True
    huber_delta: float = 1.0
    kl_weight: Optional[float] = None  # None -> family default
    r_weight: Optional[float] = None  # None -> family default
    # beta-VAE extensions (BASELINE.json config 4); 0/None disables.
    kl_anneal_steps: int = 0  # linear KL warmup over this many steps
    free_bits: float = 0.0  # per-dim KL floor (nats)
    # multiplier on the state branch in the combined loss (1.0 = reference
    # weighting; reported s_loss metrics stay unweighted).  Needed by
    # model.residual_state: the per-step delta's huber (~0.0065) is ~300x
    # smaller than the reward branch on random-collection data, so with
    # s_weight=1 the delta head gets no gradient pull and collapses to
    # zero (measured, PARITY.md round 4) — s_weight~300 equalizes the
    # branch magnitudes without touching the reward scale.
    s_weight: float = 1.0
    # Contact-sharpness levers (round 5, PARITY.md): the reward-oracle
    # probe bounds ANY reward head at the sharpness of the predicted
    # geometry at the contact radius (0.125), so these aim the state loss
    # at exactly that subspace.  Both default off (= reference objective).
    #
    # >0: per-SAMPLE weight on the state branch — transitions where any
    # agent's reward exceeds contact_threshold (tag contacts pay +/-10)
    # count (1 + contact_weight)x in the state loss (weighted mean, so
    # the branch scale is unchanged; the gradient shifts toward contact
    # geometry).  Works in both the one-step and unroll objectives.
    contact_weight: float = 0.0
    contact_threshold: float = 0.5
    # >0: per-COLUMN weight on the state branch — each adversary's
    # relative-prey observation dims (the exact columns the true reward
    # function reads) count (1 + prey_dist_weight)x in the per-sample
    # state loss (weighted column mean).  simple_tag layout only; the
    # trainer derives the column vector from the env config.
    prey_dist_weight: float = 0.0

    def resolved_weights(self) -> Tuple[float, float]:
        if self.family == "jax":
            kw = 0.1 if self.kl_weight is None else self.kl_weight
            rw = 0.5 if self.r_weight is None else self.r_weight
        elif self.family == "torch":
            kw = 0.0025 if self.kl_weight is None else self.kl_weight
            rw = 0.005 if self.r_weight is None else self.r_weight
        else:
            raise ValueError(f"unknown loss family {self.family!r}")
        return kw, rw


@dataclass
class BufferConfig:
    """Replay buffer (reference: jax_ver/main.py:41-44, jax_buffer.py:80-91)."""

    max_size: int = 10_000
    min_size: int = 64
    batch_size: int = 128
    # 'item' = flashbax make_item_buffer equivalent; 'trajectory' for VDN.
    kind: str = "item"


@dataclass
class TrainConfig:
    """Training loop (reference jax_ver/main.py:37-45)."""

    epoch_num: int = 256
    sample_num: int = 128  # env steps collected per epoch (per env)
    # parallel env instances; >1 switches to the batched epoch program whose
    # leading env axis shards over the mesh 'data' axis (DP).  batch_size
    # must be divisible by n_envs (per-shard stratified sampling).
    n_envs: int = 1
    batch_size: int = 128
    train_num: int = 10  # train steps per epoch
    test_num: int = 64  # eval steps per epoch
    lr: float = 1e-3
    # LR schedule: 'constant' (jax_ver parity) | 'cosine' (single cosine
    # decay, clamps at lr*lr_min_ratio) | 'cosine_periodic' (torch_ver
    # parity: CosineAnnealingLR semantics, oscillates with period 2*lr_t_max
    # — the reference steps it per batch with T_max=50, torch_ver/
    # main.py:52-53,98) | 'warmup_cosine'
    lr_schedule: str = "constant"
    lr_t_max: int = 50  # cosine horizon in train steps (torch_ver/main.py:53)
    lr_warmup_steps: int = 0
    lr_min_ratio: float = 0.0  # eta_min / lr
    # 'Adam' | 'ART' | 'POPART' (torch_ver/trainer.py:50); POPART applies
    # reward-target normalization with output-preserving head rescale.
    mode: str = "Adam"
    popart_beta: float = 3e-4
    grad_clip: float = 0.0  # 0 disables (vdn.py uses 10.0)
    seed: int = 0
    # Collection policy: 'random' (the reference's uniform rollouts,
    # torch_ver/main.py:69), 'pursuit' (scripted chase/evade,
    # envs/policies.py — contact-rich data the random walk rarely
    # produces), 'sticky' / 'episode_mix' (temporal / trajectory-level
    # mixing), 'vdn:<policy.npz>' (a trained Q-policy), or
    # 'imagination:<policy.msgpack>' (a behavior-module policy — the
    # Dreamer iteration's collection leg).  Device path runs it inside
    # the compiled collect scan; host collectors run the numpy mirror off
    # the env's state accessors (tag + adversary scenarios; vdn only).
    collect_policy: str = "random"
    collect_epsilon: float = 0.1  # uniform-random mixture for coverage
    # collect_policy='episode_mix': probability an EPISODE is collected
    # under the scripted policy (else uniform random) — trajectory-level
    # distribution mixing (PARITY.md round 4: action-level epsilon mixing
    # never recovers the random state distribution)
    collect_mix_frac: float = 0.5
    # >1: train on windows of this many CONSECUTIVE transitions, rolled
    # open-loop — the model's predicted state feeds back as the next input
    # and the ELBO applies at every horizon (BPTT; training/unroll.py).
    # Optimizes the error that compounds at serving time
    # (WorldModel.rollout); 1 = the reference's i.i.d. one-step objective.
    # Requires mode='Adam', no pallas, and (per-shard) buffer capacity
    # divisible by sample_num; composes with the batched/DP epoch program
    # (windows sample per env shard).
    unroll_steps: int = 1
    # unroll_steps > 1 only: detach the fed-back prediction
    # (scheduled-sampling-style exposure instead of full BPTT).  The model
    # still trains on its own-prediction input distribution at every
    # horizon, but gradients stop at each step boundary — the measured
    # rescue for the W=8 BPTT divergence (PARITY.md round 4).
    unroll_stop_gradient: bool = False
    # unroll_steps > 1 only: feed back the posterior-MEAN prediction (the
    # exact serving path, MAVAE.mean_call) instead of the sampled
    # reconstruction — aligns the training-time feedback distribution with
    # WorldModel.rollout at the cost of a second decode per step.
    unroll_mean_feedback: bool = False
    # replicate the reference's never-resplit key bug for curve parity
    # (jax_ver/main.py:154-158,169,210)
    bug_compat_rng: bool = False
    log_dir: str = "results"
    run_name: str = ""
    checkpoint_dir: str = "model_save"  # '' disables checkpointing
    checkpoint_every: int = 0  # epochs; 0 = only at end
    resume: bool = False
    # dev-mode numerical guard (SURVEY §5.2: the TPU-native stand-in for
    # sanitizers): recompile with NaN checks on every op
    debug_nans: bool = False
    # True: the whole epoch (collect+train+test) is ONE compiled program
    # (fastest steady state). False: per-phase jits — much faster first
    # compile (collect program reused for both collection phases), 4 host
    # dispatches per epoch.
    fused_epoch: bool = True
    # >1: lax.scan K epochs into ONE dispatch (the reference's own vdn.py
    # whole-training-in-one-XLA-program pattern, SURVEY §3.4, applied to
    # the VAE pipeline).  Removes all per-epoch host dispatch; metrics for
    # the chunk come back stacked.  Checkpoint/preemption granularity
    # becomes the chunk.  Requires fused_epoch (or n_envs > 1).
    epochs_per_dispatch: int = 1
    # emit a jax.profiler trace (viewable in TensorBoard) covering epochs
    # [1, 1+profile_epochs) — 0 disables.  With epochs_per_dispatch > 1 the
    # trace covers the first dispatched chunk instead.
    profile_epochs: int = 0
    # True: the test_num eval steps (independent given the train state) run
    # as ONE vmapped batched forward — MXU-sized matmuls, but peak eval
    # memory scales with test_num x batch_size.  False: sequential scan
    # (reference shape, minimal memory).
    eval_vmap: bool = True


@dataclass
class EnvConfig:
    """MPE simple_tag_v3 (reference jax_ver/main.py:59-62)."""

    name: str = "MPE_simple_tag_v3"
    num_good_agents: int = 10
    num_adversaries: int = 30
    num_obs: int = 20  # obstacles
    max_steps: int = 1000  # torch_ver/src/env.py:27 max_cycles
    # False -> Box action spaces; pair with model.discrete_act=False
    # (reference 'discrete' switch, torch_ver/src/env.py:27 + the
    # continuous action-MLP branch, torch_ver/model.py:119-124)
    discrete_actions: bool = True
    backend: str = "jax"  # 'jax' (on-device) | 'host' (PettingZoo adapter)
    # host backend only: >1 collects with the native C++ engine stepping
    # n_host_envs environments per batched call (NativeBatchedCollector);
    # 1 keeps the single-env AsyncCollector over whatever create_env picked
    n_host_envs: int = 1


@dataclass
class BehaviorConfig:
    """Behavior learned inside the trained world model (mfvae_tpu/
    behavior.py): train a decentralized policy entirely in imagination —
    REINFORCE, Dreamer-style actor-critic (TD(λ) bootstrapped), or
    planner distillation from the enumerated+CRN teacher — then serve it
    at one forward pass per env step.  The reference pickles its model
    params and never loads them (jax_ver/main.py:239-240); this is the
    surface that cashes the 'world model' name.  Shipped defaults are the
    measured round-4 recipe (PARITY.md distillation chapter)."""

    algo: str = "distill"  # 'reinforce' | 'actor_critic' | 'distill'
    # which agents the policy controls: 'adversaries' (the env's
    # adversary team prefix) or 'all'
    plan_agents: str = "adversaries"
    # imagined-future objective: 'prey_distance' (simple_tag distance
    # potential, the measured planning signal) or 'reward' (the model's
    # predicted-reward head — near-chance on sparse tag contacts,
    # PARITY.md reward-head chapter, but env-agnostic)
    score: str = "prey_distance"
    horizon: int = 8
    updates: int = 1500
    learning_rate: float = 3e-4
    hidden: tuple = (128, 128)
    # start-state pool: real states from the WM's own collection process
    start_pool: int = 4096
    start_burn_in: int = 32
    n_starts: int = 256  # starts per update (distill: 32 is the recipe)
    # reinforce / actor_critic
    n_rollouts: int = 16
    entropy_coef: float = 1e-2
    value_coef: float = 0.5
    gamma: float = 0.95
    lam: float = 0.95
    # >0: EMA target critic for the TD(λ) bootstrap + baseline (the
    # Dreamer stabilizer for the measured critic-bias collapse on
    # spread, PARITY.md); 0 = online critic only
    target_ema: float = 0.0
    # regress the critic in symlog space (DreamerV3) — required when
    # imagined returns are dense and large-magnitude (spread |G|~100),
    # where raw delta-1 huber saturates and the critic can't order states
    critic_symlog: bool = False
    # False: drop the gamma*V(s_H) tail past the imagination horizon —
    # the objective becomes the FINITE H-step return with the critic as
    # a baseline only.  NOTE: pure finite-horizon needs lam=1 too (with
    # lam<1 the intermediate (1-lam)*V terms still bootstrap from the
    # critic; construction warns); gamma=lam=1 is REINFORCE's MC
    # objective + learned state-value baseline.  The lever that
    # separates objective-mismatch failures from critic failures.
    # Guidance (measured, PARITY.md spread dose-response): on short
    # finite-horizon dense-reward tasks set bootstrap_tail=false + lam=1
    # (or drop gamma to ~0.5) — the gamma=0.95 bootstrapped objective
    # cost 15 return points on spread; keep the default on long-horizon
    # sparse tasks (tag: AC beats REINFORCE)
    bootstrap_tail: bool = True
    # append normalized time-remaining ((H-t)/H) to the critic input so
    # a finite-horizon (bootstrap_tail=false) critic can represent the
    # horizon-position-dependent value exactly instead of a per-state
    # mean over horizons.  Changes the critic input width (saved 'v'
    # params are not interchangeable across this flag)
    critic_time_feature: bool = False
    # feed each plan agent's policy (and the AC critic) the FULL flattened
    # joint observation alongside its own row, instead of the own row
    # alone (decentralized default).  The causal probe for the measured
    # amortization wall (PARITY.md last-mile chapter) and a legitimate
    # centralized-execution serving mode — serving then needs the joint
    # obs at execution time (make_policy_actor gets it; a deployed
    # decentralized controller would not).  Saved policies record the
    # flag in their sidecar meta and rebuild correctly
    centralized: bool = False
    # distill (enumerated+CRN teacher)
    m_rollouts: int = 24
    continuation: str = "hold"  # 'hold' | 'random'
    temperature: float = 0.5
    visit_steps: int = 3
    # outputs
    save_path: str = ""  # policy params (msgpack) + .json meta sidecar
    eval_episodes: int = 0  # >0: real-env return vs the random anchor
    eval_ep_len: int = 128


@dataclass
class MeshConfig:
    """Device mesh: ('data', 'model') axes. data -> DP via shard_map+psum
    over ICI; model -> TP for the joint decoders + stacked agent params."""

    data_axis: int = -1  # -1 = all devices on data axis
    model_axis: int = 1
    enable: bool = False


@dataclass
class ExperimentConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    buffer: BufferConfig = field(default_factory=BufferConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    env: EnvConfig = field(default_factory=EnvConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    behavior: BehaviorConfig = field(default_factory=BehaviorConfig)

    def validate(self) -> "ExperimentConfig":
        """Cross-field consistency, checked by the experiment drivers
        BEFORE any env/model construction (configs are mutable, so this
        runs at use time, not at dataclass init)."""
        if self.env.discrete_actions != self.model.discrete_act:
            raise ValueError(
                "env.discrete_actions and model.discrete_act must agree "
                f"(got env={self.env.discrete_actions}, "
                f"model={self.model.discrete_act})"
            )
        self.loss.resolved_weights()  # raises on unknown loss.family
        cp = self.train.collect_policy
        if cp not in ("random", "pursuit", "episode_mix", "sticky") and not (
            cp.startswith("vdn:") or cp.startswith("imagination:")
        ):
            raise ValueError(
                f"unknown collect_policy {cp!r} (expected 'random', "
                "'pursuit', 'episode_mix', 'sticky', 'vdn:<policy.npz>', "
                "or 'imagination:<policy.msgpack>')"
            )
        if not 0.0 <= self.train.collect_epsilon <= 1.0:
            raise ValueError(
                f"collect_epsilon must be in [0, 1]; got "
                f"{self.train.collect_epsilon}"
            )
        if not 0.0 <= self.train.collect_mix_frac <= 1.0:
            raise ValueError(
                f"collect_mix_frac must be in [0, 1]; got "
                f"{self.train.collect_mix_frac}"
            )
        b = self.behavior
        if b.algo not in ("reinforce", "actor_critic", "distill"):
            raise ValueError(
                f"unknown behavior.algo {b.algo!r} (expected 'reinforce', "
                "'actor_critic', or 'distill')"
            )
        if b.plan_agents not in ("adversaries", "all"):
            raise ValueError(
                f"unknown behavior.plan_agents {b.plan_agents!r} "
                "(expected 'adversaries' or 'all')"
            )
        if b.score not in ("prey_distance", "reward"):
            raise ValueError(
                f"unknown behavior.score {b.score!r} (expected "
                "'prey_distance' or 'reward')"
            )
        if b.continuation not in ("hold", "random"):
            raise ValueError(
                f"unknown behavior.continuation {b.continuation!r} "
                "(expected 'hold' or 'random')"
            )
        return self


def _to_dict(obj: Any) -> Any:
    if is_dataclass(obj):
        return {f.name: _to_dict(getattr(obj, f.name)) for f in fields(obj)}
    if isinstance(obj, (list, tuple)):
        return [_to_dict(v) for v in obj]
    return obj


def _from_dict(cls, data: Dict[str, Any]):
    kwargs = {}
    for f in fields(cls):
        if f.name not in data:
            continue
        v = data[f.name]
        if is_dataclass(f.type) if isinstance(f.type, type) else False:
            kwargs[f.name] = _from_dict(f.type, v)
        elif f.name in _NESTED.get(cls, {}):
            kwargs[f.name] = _from_dict(_NESTED[cls][f.name], v)
        else:
            # restore tuples for Tuple-typed fields
            default = f.default_factory() if f.default_factory is not dataclasses.MISSING else f.default  # type: ignore
            if isinstance(default, tuple) and isinstance(v, list):
                v = tuple(v)
            kwargs[f.name] = v
    return cls(**kwargs)


_NESTED = {
    ExperimentConfig: {
        "model": ModelConfig,
        "loss": LossConfig,
        "buffer": BufferConfig,
        "train": TrainConfig,
        "env": EnvConfig,
        "mesh": MeshConfig,
        "behavior": BehaviorConfig,
    }
}


def save_config(cfg: Any, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(_to_dict(cfg), f, sort_keys=False)


def load_config(path: str, overrides: Optional[List[str]] = None) -> ExperimentConfig:
    with open(path) as f:
        data = yaml.safe_load(f) or {}
    cfg = _from_dict(ExperimentConfig, data)
    if overrides:
        apply_overrides(cfg, overrides)
    return cfg


def apply_overrides(cfg: Any, overrides: List[str]) -> None:
    """Apply ``a.b.c=value`` dotted-path overrides in place."""
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override {ov!r} must look like path.to.field=value")
        path, raw = ov.split("=", 1)
        parts = path.split(".")
        obj = cfg
        for p in parts[:-1]:
            obj = getattr(obj, p)
        name = parts[-1]
        cur = getattr(obj, name)
        setattr(obj, name, _coerce(raw, cur))


def _coerce(raw: str, like: Any) -> Any:
    if isinstance(like, bool):
        return raw.lower() in ("1", "true", "yes", "on")
    if isinstance(like, int) and not isinstance(like, bool):
        return int(raw)
    if isinstance(like, float):
        return float(raw)
    if isinstance(like, tuple):
        return tuple(int(x) for x in raw.strip("()[] ").split(",") if x)
    if like is None:
        try:
            return float(raw)
        except ValueError:
            return raw
    return raw
