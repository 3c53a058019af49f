"""MAVAE — multi-agent factorized VAE world model, TPU-native.

Capability parity with the reference MAVAE (jax_ver/model.py:100-199,
torch_ver/model.py:101-173): per-agent Gaussian encoders over
(agent-index-embedding ‖ observation), per-agent action embeddings, joint
state decoder predicting the concatenated next global state, and a joint
reward decoder + linear PopArt head predicting the per-agent reward vector.

TPU-first re-design (NOT a translation):

- The reference unrolls a 40-agent Python loop of tiny [B,·]×[·,64] matmuls
  into the jit trace (jax_ver/model.py:149-181).  Here agents with identical
  (obs_dim, act_dim) are *grouped* and their parameters stacked on a leading
  agent axis, so each encoder layer is ONE batched contraction
  [B,A,i]×[A,i,o] -> [B,A,o] — MXU-shaped, and shardable along A.
- Activations run in bf16 (configurable); reductions and params are f32.
- eps-sampling for the reparameterization is one fused draw [B, A, F]
  (``rng_mode='vectorized'``); ``rng_mode='reference'`` replays the
  reference's sequential per-agent key splits (jax_ver/model.py:161) for
  parity runs.

The public call contract is the reference's exactly: dict inputs keyed by
agent name, returns (recon_state [B, Σobs], recon_reward [B, A],
mu_all [B, A·F], logvar_all [B, A·F]) in agent order.  A tensorized
``GroupedBatch`` input path skips dict assembly for fully-scanned training.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property
from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from mfvae_tpu.config import ModelConfig
from mfvae_tpu.models.layers import (
    Embedding,
    MLP,
    StackedEmbedding,
    StackedMLP,
)


@dataclass(frozen=True)
class AgentSpec:
    """Static description of the agent population.

    ``groups`` partitions agents by (obs_dim, act_dim) preserving first-seen
    order; heterogeneous populations (MPE adversaries vs good agents have
    different obs widths — dims derived at runtime in the reference,
    jax_ver/main.py:101-107) become one stacked-parameter module per group."""

    agents: Tuple[str, ...]
    obs_dims: Tuple[int, ...]
    act_dims: Tuple[int, ...]

    @classmethod
    def from_dicts(
        cls, agents: Sequence[str], obs_dim: Dict[str, int], act_dim: Dict[str, int]
    ) -> "AgentSpec":
        agents = tuple(agents)
        return cls(
            agents=agents,
            obs_dims=tuple(int(obs_dim[a]) for a in agents),
            act_dims=tuple(int(act_dim[a]) for a in agents),
        )

    @property
    def n_agents(self) -> int:
        return len(self.agents)

    @property
    def obs_dim_map(self) -> Dict[str, int]:
        return dict(zip(self.agents, self.obs_dims))

    @property
    def act_dim_map(self) -> Dict[str, int]:
        return dict(zip(self.agents, self.act_dims))

    @cached_property
    def groups(self) -> Tuple[Tuple[Tuple[int, int], Tuple[int, ...]], ...]:
        """((obs_dim, act_dim), member agent indices) per group."""
        order: List[Tuple[int, int]] = []
        members: Dict[Tuple[int, int], List[int]] = {}
        for i, (od, ad) in enumerate(zip(self.obs_dims, self.act_dims)):
            key = (od, ad)
            if key not in members:
                members[key] = []
                order.append(key)
            members[key].append(i)
        return tuple((k, tuple(members[k])) for k in order)

    @cached_property
    def perm_from_grouped(self) -> Tuple[int, ...]:
        """perm[i] = position of original agent i in the grouped concat."""
        grouped_order = [i for _, idxs in self.groups for i in idxs]
        inv = [0] * len(grouped_order)
        for pos, orig in enumerate(grouped_order):
            inv[orig] = pos
        return tuple(inv)

    @property
    def grouped_is_identity(self) -> bool:
        return self.perm_from_grouped == tuple(range(self.n_agents))


def zero_actions_grouped(
    spec: "AgentSpec", batch_size: Optional[int], discrete: bool
) -> Tuple[jnp.ndarray, ...]:
    """Per-group zero-action tensors in the model's input contract:
    int32 [B, A_g] (discrete) or float32 [B, A_g, act_dim_g] (continuous);
    ``batch_size=None`` drops the leading batch axis (single-transition
    form).  The one place the discrete/continuous action dtype+shape rule
    lives — used by every fake-batch/example-transition/zero-fill site."""
    lead = () if batch_size is None else (batch_size,)
    if discrete:
        return tuple(
            jnp.zeros(lead + (len(idxs),), jnp.int32)
            for (_, _), idxs in spec.groups
        )
    return tuple(
        jnp.zeros(lead + (len(idxs), ad), jnp.float32)
        for (_, ad), idxs in spec.groups
    )


class GroupedBatch(NamedTuple):
    """Tensorized model input, one entry per AgentSpec group (in group order).

    obs[g]:     [B, A_g, obs_dim_g] float
    actions[g]: [B, A_g] int (discrete) or [B, A_g, act_dim_g] float
    """

    obs: Tuple[jnp.ndarray, ...]
    actions: Tuple[jnp.ndarray, ...]


def group_dict_batch(
    spec: AgentSpec,
    idx_state: Dict[str, jnp.ndarray],
    actions: Dict[str, jnp.ndarray],
) -> Tuple[GroupedBatch, Tuple[jnp.ndarray, ...]]:
    """Stack the reference's per-agent dicts into grouped tensors.

    ``idx_state[agent]`` is [B, 1+obs_dim] with the agent index as column 0
    (the reference's create_dataset contract, jax_ver/trainer.py:23).
    Returns the grouped batch plus per-group [B, A_g] integer agent indices
    read from the data (reference reads them via floor+int cast,
    jax_ver/model.py:152-153)."""
    obs_g, act_g, ids_g = [], [], []
    for (_, _), idxs in spec.groups:
        names = [spec.agents[i] for i in idxs]
        obs_g.append(jnp.stack([idx_state[a][:, 1:] for a in names], axis=1))
        ids_g.append(
            jnp.stack(
                [jnp.floor(idx_state[a][:, 0]).astype(jnp.int32) for a in names],
                axis=1,
            )
        )
        act_g.append(jnp.stack([actions[a] for a in names], axis=1))
    return GroupedBatch(obs=tuple(obs_g), actions=tuple(act_g)), tuple(ids_g)


def agent_order_concat(
    spec: AgentSpec, grouped: Tuple[jnp.ndarray, ...]
) -> jnp.ndarray:
    """Concatenate per-group obs [B, A_g, D_g] into the agent-order flat
    global state [B, Σ obs_dims] — the exact layout of the decoder's state
    target (the reference's next_states concat order,
    jax_ver/trainer.py:27-28)."""
    b = grouped[0].shape[0]
    if spec.grouped_is_identity:
        return jnp.concatenate([g.reshape(b, -1) for g in grouped], axis=-1)
    parts = []
    group_of_agent = {}
    for g, ((_, _), idxs) in enumerate(spec.groups):
        for pos, agent_idx in enumerate(idxs):
            group_of_agent[agent_idx] = (g, pos)
    for i in range(spec.n_agents):
        g, pos = group_of_agent[i]
        parts.append(grouped[g][:, pos, :])
    return jnp.concatenate(parts, axis=-1)


def state_to_grouped(spec: AgentSpec, state: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """[B, Σobs] agent-order global state -> per-group obs tensors
    [B, A_g, od] — the static-slice inverse of agent_order_concat.  The ONE
    place the feedback re-split lives: serving rollouts
    (inference.WorldModel) and unroll training (training/unroll.py) must
    re-split identically or their state layouts silently diverge."""
    offsets = [0]
    for d in spec.obs_dims:
        offsets.append(offsets[-1] + d)
    obs_g = []
    for (od, _), idxs in spec.groups:
        cols = [state[:, offsets[i] : offsets[i] + od] for i in idxs]
        obs_g.append(jnp.stack(cols, axis=1))
    return tuple(obs_g)


class MAVAE(nn.Module):
    spec: AgentSpec
    idx_features: int = 64
    obs_features: int = 64
    action_features: int = 64
    discrete_act: bool = True
    encoder_hidden: Tuple[int, ...] = (64, 64, 256)
    action_encoder_hidden: Tuple[int, ...] = (64,)
    decoder_hidden: Tuple[int, ...] = (1024, 256, 64, 256, 1024)
    reward_head_init: str = "lecun"
    dtype: jnp.dtype = jnp.float32
    rng_mode: str = "vectorized"
    remat: bool = False
    fused_decoders: bool = False
    # 'private' = reference structure (one latent per agent);
    # 'shared_private' = factorized multimodal structure (BASELINE.json
    # config 3): each agent encoder additionally emits a Gaussian expert
    # over a SHARED latent, combined across agents by product-of-experts
    # with a unit prior (models/factorized.py semantics), and the decoders
    # condition on (private latents ... shared latent).
    latent_structure: str = "private"
    shared_latent: int = 32
    # Width of a per-agent DETERMINISTIC feature path from encoder to
    # decoder (0 = off, reference structure).  Motivation (measured,
    # PARITY.md): under the reference ELBO the posterior collapses to ~0
    # nats by epoch ~50 and held-out state loss degrades 0.46 -> 1.33 —
    # each nat of KL must buy >= 0.2 huber to be worth keeping, which tiny
    # latents can't.  A deterministic path (the RSSM deterministic+
    # stochastic split) carries state information to the decoders without
    # paying KL, so reconstruction no longer fights the prior.
    det_features: int = 0
    # Decode the state head as a RESIDUAL on the current global state
    # (recon_state = current_state + decoder output) instead of the
    # reference's absolute next-state reconstruction.  Motivation
    # (measured, PARITY.md round 4): open-loop rollout accuracy shows the
    # absolute decoder pays a ~0.4-0.6 Huber reconstruction floor through
    # the latent bottleneck while MPE states move only ~0.01 Huber/step —
    # the absolute architecture never beats the frozen-world baseline at
    # state prediction.  Predicting the DELTA removes the floor: identity
    # becomes the decoder's zero point, so state error starts at the
    # persistence baseline and the capacity is spent on actual dynamics.
    # Adds no parameters; default off (reference structure).
    residual_state: bool = False
    # Feed the CURRENT global state to the decoders as a skip input
    # (condition p(next|current, action, z) on current directly).
    # Measured motivation (PARITY.md round 4): residual_state alone cannot
    # learn dynamics at ANY loss weight or decoder width, because the
    # decoder only sees the encoder's lossy code — it would have to cancel
    # the base state to ~0.0065 huber through features that reconstruct it
    # at only ~0.29.  With the skip, the delta is computable from the
    # actual velocities in the input.  Widens the decoder input by Σobs
    # (new parameters); default off (reference structure).
    state_skip: bool = False
    # LayerNorm before every decoder Dense (layers.MLP.layernorm).
    # Measured necessity for learning dynamics at canonical scale
    # (PARITY.md round 4); off = reference structure.
    decoder_layernorm: bool = False
    # 'linear' = reference structure (scalar reward per agent through the
    # PopArt-rescalable reward_linear head); 'twohot' = categorical logits
    # over reward_bins symlog-spaced raw-space bins (losses.twohot_bins).
    # decode()/__call__/fused_call then return reward LOGITS [B, A, K] (the
    # loss layer detects the extra rank and scores two-hot cross-entropy);
    # mean_call converts to the expectation so every serving surface keeps
    # the scalar [B, A] contract.  Motivation: the tag reward is sparse
    # +10-per-contact — a scalar huber head regresses it toward the
    # near-zero conditional mean (measured: reward-scored MPC null,
    # PARITY.md round 4).
    reward_head_mode: str = "linear"
    reward_bins: int = 65
    # 'latent' = reference structure (reward decoder eats the same
    # [z, aemb, ...] concat as the state decoder); 'pred_state' = the
    # reward decoder eats [stop_grad(predicted next state), current state,
    # aemb] — contact geometry is a simple function of next-step positions
    # the state path already predicts well, while through the latent input
    # both reward head modes measure near-chance at event detection
    # (PARITY.md round 4 reward-head study).  stop_gradient keeps the
    # reward loss from distorting the state path.  Unfused decoders only.
    reward_head_input: str = "latent"
    # Direct action->own-obs-delta pathway (round 5): a zero-initialized
    # per-group linear from each agent's action embedding to its OWN
    # observation slice, ADDED to the decoded state.  Motivation: the
    # oracle-decomposition study proved the learned model is the entire
    # planning gap (true-dynamics CEM = the scripted oracle), and the
    # action signal otherwise reaches the state only through the shared
    # decoder trunk where the passive dynamics dominate the gradient.
    # This gives the optimizer a one-hop route from "agent a held LEFT"
    # to "agent a's position moved left".  Composes with residual_state
    # (the delta head then shapes the predicted delta directly); default
    # off (reference structure), zero-init so 'on' starts bit-identical.
    action_delta_head: bool = False

    @classmethod
    def from_config(cls, cfg: ModelConfig, spec: AgentSpec) -> "MAVAE":
        return cls(
            spec=spec,
            idx_features=cfg.idx_features,
            obs_features=cfg.obs_features,
            action_features=cfg.action_features,
            discrete_act=cfg.discrete_act,
            encoder_hidden=tuple(cfg.encoder_hidden),
            action_encoder_hidden=tuple(cfg.action_encoder_hidden),
            decoder_hidden=tuple(cfg.decoder_hidden),
            reward_head_init=cfg.reward_head_init,
            dtype=jnp.dtype(cfg.compute_dtype),
            rng_mode=cfg.rng_mode,
            remat=cfg.remat,
            fused_decoders=cfg.fused_decoders,
            latent_structure=cfg.latent_structure,
            shared_latent=cfg.shared_latent,
            det_features=cfg.det_features,
            residual_state=cfg.residual_state,
            state_skip=cfg.state_skip,
            decoder_layernorm=cfg.decoder_layernorm,
            reward_head_mode=cfg.reward_head_mode,
            reward_bins=cfg.reward_bins,
            reward_head_input=cfg.reward_head_input,
            action_delta_head=cfg.action_delta_head,
        )

    def setup(self):
        spec = self.spec
        n = spec.n_agents
        if self.latent_structure not in ("private", "shared_private"):
            raise ValueError(
                f"unknown latent_structure {self.latent_structure!r}"
            )
        shared_out = (
            2 * self.shared_latent
            if self.latent_structure == "shared_private"
            else 0
        )
        shared_out += self.det_features
        self.idx_emb = Embedding(n, self.idx_features, dtype=self.dtype)
        encoders = []
        action_encoders = []
        for (obs_dim, act_dim), idxs in spec.groups:
            a_g = len(idxs)
            encoders.append(
                StackedMLP(
                    stack=a_g,
                    hidden=self.encoder_hidden,
                    out_dim=2 * self.obs_features + shared_out,
                    dtype=self.dtype,
                    remat=self.remat,
                )
            )
            if self.discrete_act:
                action_encoders.append(
                    StackedEmbedding(
                        stack=a_g,
                        num_embeddings=act_dim,
                        features=self.action_features,
                        dtype=self.dtype,
                    )
                )
            else:
                action_encoders.append(
                    StackedMLP(
                        stack=a_g,
                        hidden=self.action_encoder_hidden,
                        out_dim=self.action_features,
                        dtype=self.dtype,
                        remat=self.remat,
                    )
                )
        self.encoders = encoders
        self.action_encoders = action_encoders

        if self.action_delta_head:
            # zero-init: the pathway starts as an exact no-op and only
            # grows where the state loss pulls it
            self.action_delta_heads = [
                nn.Dense(
                    obs_dim,
                    dtype=self.dtype,
                    kernel_init=nn.initializers.zeros,
                    name=f"action_delta_head_{g}",
                )
                for g, ((obs_dim, _), _) in enumerate(spec.groups)
            ]


        if self.reward_head_mode not in ("linear", "twohot"):
            raise ValueError(f"unknown reward_head_mode {self.reward_head_mode!r}")
        if self.reward_head_input not in ("latent", "pred_state"):
            raise ValueError(
                f"unknown reward_head_input {self.reward_head_input!r}"
            )
        if self.reward_head_input == "pred_state" and self.fused_decoders:
            raise ValueError(
                "reward_head_input='pred_state' needs fused_decoders=false "
                "(the fused trunk shares ONE input; the pred_state reward "
                "branch runs sequentially after the state decode)"
            )
        # two-hot mode widens the reward output to n_agents * n_bins logits
        # and skips the (PopArt-rescalable) reward_linear head, which only
        # makes sense for a scalar output.
        reward_out = n if self.reward_head_mode == "linear" else n * self.reward_bins
        if self.fused_decoders:
            # state+reward decoders share hidden widths: run both as ONE
            # stacked batched-einsum trunk (stack axis = decoder id) with
            # separate output heads — half the kernel launches of two MLPs
            # (the step is latency-bound at these sizes, not FLOPs-bound)
            self.decoder_trunk = StackedMLP(
                stack=2,
                hidden=self.decoder_hidden[:-1],
                out_dim=self.decoder_hidden[-1],
                dtype=self.dtype,
                remat=self.remat,
                layernorm=self.decoder_layernorm,
                name="decoder_trunk",
            )
            self.state_head = nn.Dense(
                sum(spec.obs_dims), dtype=self.dtype, name="state_head"
            )
            self.reward_head = nn.Dense(
                reward_out, dtype=self.dtype, name="reward_head"
            )
        else:
            self.state_decoder = MLP(
                hidden=self.decoder_hidden,
                out_dim=sum(spec.obs_dims),
                dtype=self.dtype,
                remat=self.remat,
                layernorm=self.decoder_layernorm,
                name="state_decoder",
            )
            self.reward_decoder = MLP(
                hidden=self.decoder_hidden,
                out_dim=reward_out,
                dtype=self.dtype,
                remat=self.remat,
                layernorm=self.decoder_layernorm,
                name="reward_decoder",
            )
        # PopArt output head.  torch parity uses all-ones weight / zero bias
        # (torch_ver/model.py:131-132); jax parity keeps the flax default
        # (jax_ver/model.py:136).
        if self.reward_head_init == "popart":
            kernel_init = nn.initializers.ones
        else:
            kernel_init = nn.initializers.lecun_normal()
        self.reward_linear = nn.Dense(
            n, dtype=self.dtype, kernel_init=kernel_init, name="reward_linear"
        )

    # ---------------------------------------------------------------- encode
    def encode(
        self,
        batch: GroupedBatch,
        agent_ids: Optional[Tuple[jnp.ndarray, ...]] = None,
    ) -> Tuple[
        jnp.ndarray, jnp.ndarray, jnp.ndarray,
        Optional[Tuple[jnp.ndarray, jnp.ndarray]], Optional[jnp.ndarray],
    ]:
        """Returns (mu, logvar, action_emb, shared_experts, det): the first
        three [B, A, ·] in *grouped* agent order (use
        spec.perm_from_grouped to recover agent order);
        ``shared_experts`` is None for latent_structure='private', else the
        per-agent (mu, logvar) experts [B, A, S] over the shared latent —
        PoE-order-independent, so grouped order is fine; ``det`` is None
        when det_features == 0, else the per-agent deterministic features
        [B, A, D] (grouped order, permute alongside mu)."""
        spec = self.spec
        f = self.obs_features
        shared = self.latent_structure == "shared_private"
        mus, logvars, aembs, smus, slvs, dets = [], [], [], [], [], []
        for g, ((_, _), idxs) in enumerate(spec.groups):
            obs = batch.obs[g]
            if agent_ids is None:
                ids = jnp.asarray(idxs, dtype=jnp.int32)[None, :]
                ids = jnp.broadcast_to(ids, (obs.shape[0], len(idxs)))
            else:
                ids = agent_ids[g]
            id_emb = self.idx_emb(ids)  # [B, A_g, idx_features]
            enc_in = jnp.concatenate([id_emb, obs.astype(self.dtype)], axis=-1)
            latent = self.encoders[g](enc_in)  # [B, A_g, 2F (+2S)]
            mus.append(latent[..., :f])
            logvars.append(latent[..., f : 2 * f])
            off = 2 * f
            if shared:
                s_ = self.shared_latent
                smus.append(latent[..., off : off + s_])
                slvs.append(latent[..., off + s_ : off + 2 * s_])
                off += 2 * s_
            if self.det_features:
                dets.append(latent[..., off :])
            act = batch.actions[g]
            if self.discrete_act:
                aembs.append(self.action_encoders[g](act.astype(jnp.int32)))
            else:
                aembs.append(self.action_encoders[g](act.astype(self.dtype)))
        mu = jnp.concatenate(mus, axis=1)
        logvar = jnp.concatenate(logvars, axis=1)
        aemb = jnp.concatenate(aembs, axis=1)
        if shared:
            experts = (jnp.concatenate(smus, axis=1), jnp.concatenate(slvs, axis=1))
        else:
            experts = None
        det = jnp.concatenate(dets, axis=1) if self.det_features else None
        return mu, logvar, aemb, experts, det

    # ---------------------------------------------------------- reparam/eps
    def _eps(self, rng_key, shape) -> jnp.ndarray:
        b, a, f = shape
        if self.rng_mode == "reference":
            # Replay the reference's sequential per-agent split order
            # (jax_ver/model.py:161: rng, sub = split(rng) per agent in dict
            # order == agent order here), then draw [B, F] per agent.
            keys = []
            k = rng_key
            for _ in range(a):
                k, sub = jax.random.split(k)
                keys.append(sub)
            eps = jax.vmap(lambda kk: jax.random.normal(kk, (b, f)))(
                jnp.stack(keys)
            )  # [A, B, F]
            return jnp.transpose(eps, (1, 0, 2))
        return jax.random.normal(rng_key, (b, a, f))

    def reparameterize(self, mu, logvar, rng_key):
        """z = mu + eps * exp(0.5*logvar) (jax_ver/model.py:53-57).
        Computed in f32 regardless of activation dtype."""
        mu32 = mu.astype(jnp.float32)
        std = jnp.exp(0.5 * logvar.astype(jnp.float32))
        eps = self._eps(rng_key, mu.shape)
        return mu32 + eps * std

    @staticmethod
    def poe(experts: Tuple[jnp.ndarray, jnp.ndarray]):
        """Product of the per-agent Gaussian experts [B, A, S] with a unit
        prior: precision T = 1 + sum_a exp(-lv_a), mu = sum_a mu_a
        exp(-lv_a) / T, logvar = -log T (models/factorized.py semantics,
        agent-order independent)."""
        mu_e, lv_e = experts
        prec = jnp.exp(-lv_e.astype(jnp.float32))
        total = 1.0 + jnp.sum(prec, axis=1)  # [B, S]
        mu = jnp.sum(mu_e.astype(jnp.float32) * prec, axis=1) / total
        return mu, -jnp.log(total)

    # ---------------------------------------------------------------- decode
    def decode(
        self,
        z: jnp.ndarray,
        aemb: jnp.ndarray,
        z_shared: Optional[jnp.ndarray] = None,
        det: Optional[jnp.ndarray] = None,
        base_state: Optional[jnp.ndarray] = None,
    ):
        """z, aemb: [B, A, F] in *agent* order; z_shared [B, S] when the
        shared_private structure is on; det [B, A, D] deterministic
        features when det_features > 0.  Joint decode of next global state
        and per-agent reward (jax_ver/model.py:184-192).

        When ``residual_state`` or ``state_skip`` is on, ``base_state``
        [B, Σobs] (the current global state in agent order,
        agent_order_concat) is REQUIRED: state_skip appends it to the
        decoder input; residual_state decodes the delta from it."""
        b = z.shape[0]
        parts = [z.reshape(b, -1), aemb.reshape(b, -1)]
        if z_shared is not None:
            parts.append(z_shared)
        if det is not None:
            parts.append(det.reshape(b, -1))
        if self.state_skip:
            if base_state is None:
                raise ValueError(
                    "state_skip=True: decode() needs base_state (the "
                    "current global state, agent_order_concat(spec, obs))"
                )
            parts.append(base_state)
        flat = jnp.concatenate(parts, axis=-1).astype(self.dtype)
        twohot = self.reward_head_mode == "twohot"

        def _add_action_delta(recon):
            # direct action->own-obs-delta pathway (see action_delta_head)
            deltas = tuple(
                self.action_delta_heads[g](aemb[:, jnp.asarray(idxs), :])
                for g, ((_, _), idxs) in enumerate(self.spec.groups)
            )
            return recon + agent_order_concat(self.spec, deltas).astype(
                recon.dtype
            )

        if self.fused_decoders:
            both = jnp.broadcast_to(flat[:, None, :], (b, 2) + flat.shape[-1:])
            h = nn.relu(self.decoder_trunk(both))  # [B, 2, last_hidden]
            recon_state = self.state_head(h[:, 0])
            if self.action_delta_head:
                recon_state = _add_action_delta(recon_state)
            recon_reward = self.reward_head(h[:, 1])
            if not twohot:
                recon_reward = self.reward_linear(recon_reward)
        else:
            recon_state = self.state_decoder(flat)
            if self.action_delta_head:
                recon_state = _add_action_delta(recon_state)
            if self.reward_head_input == "pred_state":
                # reward from PREDICTED GEOMETRY: the finished next-state
                # prediction (stop-grad: the reward loss must not distort
                # the state path), the current state, and the action embs
                ns = recon_state.astype(jnp.float32)
                if self.residual_state:
                    assert base_state is not None
                    ns = ns + base_state.astype(jnp.float32)
                parts_r = [jax.lax.stop_gradient(ns), aemb.reshape(b, -1)]
                if base_state is not None:
                    parts_r.append(base_state)
                r_in = jnp.concatenate(parts_r, axis=-1).astype(self.dtype)
            else:
                r_in = flat
            recon_reward = self.reward_decoder(r_in)
            if not twohot:
                recon_reward = self.reward_linear(recon_reward)
        if twohot:
            # reward LOGITS [B, A, K]; callers detect the extra rank
            recon_reward = recon_reward.reshape(
                b, self.spec.n_agents, self.reward_bins
            )
        recon_state = recon_state.astype(jnp.float32)
        if self.residual_state:
            if base_state is None:
                raise ValueError(
                    "residual_state=True: decode() needs base_state (the "
                    "current global state, agent_order_concat(spec, obs))"
                )
            recon_state = recon_state + base_state.astype(jnp.float32)
        return recon_state, recon_reward.astype(jnp.float32)

    # --------------------------------------------------------- fused (Pallas)
    def fused_call(
        self,
        batch: GroupedBatch,
        agent_ids: Optional[Tuple[jnp.ndarray, ...]],
        rng_key: jax.Array,
    ):
        """Forward pass with the Pallas fused reparameterize+KL kernel
        (ops/fused_elbo.py): one HBM round-trip for the latent tensors and
        the per-row KL computed in-kernel.  Returns
        (recon_state, recon_reward, kl_rows [B, A]) — the train step combines
        kl via mean_B(sum_A) which equals kl_gaussian on [B, A, F]."""
        from mfvae_tpu.ops.fused_elbo import fused_reparam_kl

        spec = self.spec
        mu_g, logvar_g, aemb_g, experts, det = self.encode(batch, agent_ids)
        eps = self._eps(rng_key, mu_g.shape)
        z_g, kl_rows = fused_reparam_kl(
            mu_g.astype(jnp.float32), logvar_g.astype(jnp.float32), eps
        )
        if spec.grouped_is_identity:
            z, aemb = z_g, aemb_g
        else:
            perm = jnp.asarray(spec.perm_from_grouped)
            z = jnp.take(z_g, perm, axis=1)
            aemb = jnp.take(aemb_g, perm, axis=1)
            if det is not None:
                det = jnp.take(det, perm, axis=1)
        z_shared = None
        if experts is not None:
            mu_s, logvar_s = self.poe(experts)
            eps_s = jax.random.normal(
                jax.random.fold_in(rng_key, 1), mu_s.shape
            )
            z_shared = mu_s + eps_s * jnp.exp(0.5 * logvar_s)
            # shared KL appended as one extra column so the caller's
            # mean_B(sum_axis1) contract covers it
            kl_s = -0.5 * jnp.sum(
                1.0 + logvar_s - mu_s * mu_s - jnp.exp(logvar_s), axis=-1
            )
            kl_rows = jnp.concatenate([kl_rows, kl_s[:, None]], axis=1)
        base = (
            agent_order_concat(spec, batch.obs)
            if (self.residual_state or self.state_skip)
            else None
        )
        recon_state, recon_reward = self.decode(z, aemb, z_shared, det, base)
        return recon_state, recon_reward, kl_rows

    # ------------------------------------------------------------- mean call
    def mean_call(
        self,
        batch: GroupedBatch,
        agent_ids: Optional[Tuple[jnp.ndarray, ...]] = None,
    ):
        """Deterministic posterior-MEAN forward: z = mu (and the PoE
        posterior mean for the shared latent).  This is the serving
        prediction (inference.WorldModel.predict/rollout) and the
        serving-consistent feedback for unroll training's
        ``unroll_mean_feedback``.  Returns (recon_state, recon_reward) with
        recon_reward ALWAYS scalar [B, A] — under the two-hot head the
        categorical logits are collapsed to their expectation here, so the
        serving surfaces (inference.WorldModel and everything built on it)
        keep one contract across head modes."""
        spec = self.spec
        mu_g, _, aemb_g, experts, det = self.encode(batch, agent_ids)
        if spec.grouped_is_identity:
            mu, aemb = mu_g, aemb_g
        else:
            perm = jnp.asarray(spec.perm_from_grouped)
            mu = jnp.take(mu_g, perm, axis=1)
            aemb = jnp.take(aemb_g, perm, axis=1)
            if det is not None:
                det = jnp.take(det, perm, axis=1)
        z_shared = None
        if experts is not None:
            z_shared, _ = self.poe(experts)
        base = (
            agent_order_concat(spec, batch.obs)
            if (self.residual_state or self.state_skip)
            else None
        )
        recon_state, recon_reward = self.decode(
            mu.astype(jnp.float32), aemb, z_shared, det, base
        )
        if self.reward_head_mode == "twohot":
            from mfvae_tpu.models.losses import twohot_bins, twohot_expectation

            recon_reward = twohot_expectation(
                recon_reward, twohot_bins(self.reward_bins)
            )
        return recon_state, recon_reward

    # ------------------------------------------------------------------ call
    def __call__(
        self,
        idx_state: Union[Dict[str, jnp.ndarray], GroupedBatch],
        actions: Optional[Dict[str, jnp.ndarray]] = None,
        rng_key: Optional[jax.Array] = None,
    ):
        spec = self.spec
        if isinstance(idx_state, GroupedBatch):
            batch, agent_ids = idx_state, None
        else:
            batch, agent_ids = group_dict_batch(spec, idx_state, actions)

        mu_g, logvar_g, aemb_g, experts, det = self.encode(batch, agent_ids)
        z_g = self.reparameterize(mu_g, logvar_g, rng_key)
        base = (
            agent_order_concat(spec, batch.obs)
            if (self.residual_state or self.state_skip)
            else None
        )

        if spec.grouped_is_identity:
            mu, logvar, aemb, z = mu_g, logvar_g, aemb_g, z_g
        else:
            perm = jnp.asarray(spec.perm_from_grouped)
            mu = jnp.take(mu_g, perm, axis=1)
            logvar = jnp.take(logvar_g, perm, axis=1)
            aemb = jnp.take(aemb_g, perm, axis=1)
            z = jnp.take(z_g, perm, axis=1)
            if det is not None:
                det = jnp.take(det, perm, axis=1)

        b = mu.shape[0]
        if experts is not None:
            mu_s, logvar_s = self.poe(experts)
            std_s = jnp.exp(0.5 * logvar_s)
            # independent eps stream for the shared draw, leaving the
            # private draw identical to latent_structure='private'
            eps_s = jax.random.normal(
                jax.random.fold_in(rng_key, 1), mu_s.shape
            )
            z_shared = mu_s + eps_s * std_s
            recon_state, recon_reward = self.decode(z, aemb, z_shared, det, base)
            # contract extends the reference's [B, A*F] with the shared
            # dims appended: KL over the concatenation = KL(private) +
            # KL(shared)
            mu_all = jnp.concatenate(
                [mu.astype(jnp.float32).reshape(b, -1), mu_s], axis=-1
            )
            logvar_all = jnp.concatenate(
                [logvar.astype(jnp.float32).reshape(b, -1), logvar_s], axis=-1
            )
            return recon_state, recon_reward, mu_all, logvar_all

        recon_state, recon_reward = self.decode(z, aemb, None, det, base)
        # Reference contract: concatenated [B, A*F] in agent order
        # (jax_ver/model.py:195-197).
        return (
            recon_state,
            recon_reward,
            mu.astype(jnp.float32).reshape(b, -1),
            logvar.astype(jnp.float32).reshape(b, -1),
        )
