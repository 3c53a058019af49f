"""ELBO loss families.

Two divergent weighting schemes exist in the reference (SURVEY §2.2); both are
supported and selected by ``LossConfig.family``:

- 'jax'   (jax_ver/trainer.py:42-71):  ``s*(1-rw) + r*rw + kl*kw`` with
  rw=0.5, kw=0.1.
- 'torch' (torch_ver/model.py:19-40):  ``s + r*rw + kl*kw`` with rw=0.005,
  kw=0.0025.

KL is identical between the two: the torch version sums per-agent
``mean_B(sum_dims(...))`` terms over the agent list (torch_ver/model.py:36-37)
and the jax version takes ``mean_B`` of the sum over the concatenated
[B, A*F] dims (jax_ver/trainer.py:54-55,68) — same number.

All reductions are float32 even when activations are bf16.

beta-VAE extensions (BASELINE.json config 4): linear KL annealing and
free-bits (per-dim KL floor), both off by default.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from mfvae_tpu.config import LossConfig

# Symlog half-range of the two-hot reward grid (model.reward_head_mode=
# 'twohot').  Bins are symexp(linspace(-R, R, K)) — a fixed constant so the
# loss can reconstruct the grid from the logits' last dim alone; R=8 covers
# per-step rewards up to |r| ~ 1490, far beyond any MPE family here (tag
# contacts are +/-10 per collision, envs/mpe.py:50).
TWOHOT_SYMLOG_RANGE = 8.0


def symlog(x: jnp.ndarray) -> jnp.ndarray:
    """sign(x) * log(1 + |x|) — the bi-symmetric log squashing used to place
    reward bins (Dreamer-v3's trick for sparse/heavy-tailed targets)."""
    return jnp.sign(x) * jnp.log1p(jnp.abs(x))


def symexp(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of symlog."""
    return jnp.sign(x) * (jnp.exp(jnp.abs(x)) - 1.0)


def twohot_bins(n_bins: int) -> jnp.ndarray:
    """The [K] raw-space bin-center grid: uniform in symlog space, so
    resolution is fine near 0 (where most sparse rewards live) and coarse in
    the tails."""
    return symexp(jnp.linspace(-TWOHOT_SYMLOG_RANGE, TWOHOT_SYMLOG_RANGE, n_bins))


def twohot_targets(y: jnp.ndarray, bins: jnp.ndarray) -> jnp.ndarray:
    """Two-hot encode raw targets ``y`` [...] onto the (non-uniform) ``bins``
    [K]: weight split between the two neighbouring bins by linear
    interpolation IN RAW SPACE, so the encoding is exact:
    twohot(y) @ bins == clip(y, bins[0], bins[-1])."""
    k = bins.shape[0]
    y = jnp.clip(y.astype(jnp.float32), bins[0], bins[-1])
    lo_idx = jnp.clip(jnp.searchsorted(bins, y, side="right") - 1, 0, k - 2)
    lo, hi = bins[lo_idx], bins[lo_idx + 1]
    w_hi = jnp.clip((y - lo) / (hi - lo), 0.0, 1.0)
    one_lo = jax.nn.one_hot(lo_idx, k)
    one_hi = jax.nn.one_hot(lo_idx + 1, k)
    return one_lo * (1.0 - w_hi)[..., None] + one_hi * w_hi[..., None]


def twohot_expectation(logits: jnp.ndarray, bins: jnp.ndarray) -> jnp.ndarray:
    """Expected raw-space value of categorical reward logits [..., K]."""
    return jnp.sum(jax.nn.softmax(logits.astype(jnp.float32), axis=-1) * bins, axis=-1)


def twohot_ce_rows(logits: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Per-element cross-entropy of two-hot targets ``y`` [...] against
    ``logits`` [..., K] (the grid is reconstructed from K)."""
    bins = twohot_bins(logits.shape[-1])
    tgt = twohot_targets(y, bins)
    return -jnp.sum(tgt * jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1), axis=-1)


def mse(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error (jax_ver/trainer.py:45-46)."""
    d = (x - y).astype(jnp.float32)
    return jnp.mean(d * d)


def huber(x: jnp.ndarray, y: jnp.ndarray, delta: float = 1.0) -> jnp.ndarray:
    """Huber loss, delta=1.0 (jax_ver/trainer.py:48-52; matches
    torch F.huber_loss semantics used at torch_ver/model.py:26,31)."""
    abs_err = jnp.abs((x - y).astype(jnp.float32))
    quadratic = jnp.minimum(abs_err, delta)
    linear = abs_err - quadratic
    return jnp.mean(0.5 * quadratic * quadratic + delta * linear)


def _elem_loss(
    x: jnp.ndarray, y: jnp.ndarray, cfg: "LossConfig"
) -> jnp.ndarray:
    """Per-element huber/mse (no reduction) — the building block for the
    weighted state-branch variants (contact_weight / prey_dist_weight)."""
    d = (x - y).astype(jnp.float32)
    if not cfg.use_huber:
        return d * d
    abs_err = jnp.abs(d)
    quadratic = jnp.minimum(abs_err, cfg.huber_delta)
    linear = abs_err - quadratic
    return 0.5 * quadratic * quadratic + cfg.huber_delta * linear


def weighted_state_loss(
    recon_state: jnp.ndarray,
    next_state: jnp.ndarray,
    rewards: jnp.ndarray,
    cfg: "LossConfig",
    s_col_weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """State-branch loss with the contact-sharpness levers.

    Column weighting (``s_col_weight`` [D], built by the trainer from the
    env layout when cfg.prey_dist_weight > 0): weighted mean over columns
    per sample.  Sample weighting (cfg.contact_weight > 0): transitions
    whose max agent reward exceeds cfg.contact_threshold count
    (1 + contact_weight)x, normalized by the total weight so the branch
    scale is unchanged.  With both levers off this reduces exactly to
    mean(elem) = huber/mse, the reference objective."""
    elem = _elem_loss(next_state, recon_state, cfg)  # [B, D] (or [B*, D])
    if s_col_weight is not None:
        rows = jnp.sum(elem * s_col_weight, axis=-1) / jnp.sum(s_col_weight)
    else:
        rows = jnp.mean(elem, axis=-1)  # [B]
    if cfg.contact_weight > 0.0:
        contact = (
            jnp.max(rewards, axis=-1) > cfg.contact_threshold
        ).astype(jnp.float32)
        w = 1.0 + cfg.contact_weight * contact
        return jnp.sum(rows * w) / jnp.maximum(jnp.sum(w), 1e-9)
    return jnp.mean(rows)


def kl_gaussian(
    mu: jnp.ndarray,
    logvar: jnp.ndarray,
    free_bits: float = 0.0,
) -> jnp.ndarray:
    """KL(q(z|x) || N(0, I)) = mean over batch of the sum over latent dims
    (jax_ver/trainer.py:54-55).  ``mu``/``logvar`` may be [B, D] or [B, A, F];
    all non-batch axes are summed.

    free_bits clamps the *per-dim* KL at a floor before the sum
    (prevents posterior collapse; standard beta-VAE trick)."""
    mu = mu.astype(jnp.float32)
    logvar = logvar.astype(jnp.float32)
    per_dim = -0.5 * (1.0 + logvar - mu * mu - jnp.exp(logvar))
    if free_bits > 0.0:
        per_dim = jnp.maximum(per_dim, free_bits)
    axes = tuple(range(1, per_dim.ndim))
    return jnp.mean(jnp.sum(per_dim, axis=axes))


def legacy_vae_loss(
    y: jnp.ndarray,
    y_hat: jnp.ndarray,
    mu: jnp.ndarray,
    logvar: jnp.ndarray,
    kl_weight: float = 0.0025,
) -> jnp.ndarray:
    """The reference's legacy single-joint-decoder ELBO: MSE + weighted KL
    (torch_ver/model.py:8-16 loss_vae_fn)."""
    return mse(y, y_hat) + kl_gaussian(mu, logvar) * kl_weight


class LossOutputs(NamedTuple):
    loss: jnp.ndarray
    s_loss: jnp.ndarray
    r_loss: jnp.ndarray
    kl_loss: jnp.ndarray


def combine_losses(
    s_loss: jnp.ndarray,
    r_loss: jnp.ndarray,
    kl_loss: jnp.ndarray,
    cfg: LossConfig,
    kl_scale: Optional[jnp.ndarray] = None,
) -> LossOutputs:
    """Apply the family weighting to already-computed components (used by
    the Pallas fused path, where s/r/kl come from custom kernels)."""
    kw, rw = cfg.resolved_weights()
    sw = cfg.s_weight  # 1.0 = reference weighting; see LossConfig.s_weight
    if cfg.family == "jax":
        recons = sw * s_loss * (1.0 - rw) + r_loss * rw
    else:
        recons = sw * s_loss + r_loss * rw
    kl_term = kl_loss * kw
    if kl_scale is not None:
        kl_term = kl_term * kl_scale
    return LossOutputs(
        loss=recons + kl_term, s_loss=s_loss, r_loss=r_loss, kl_loss=kl_loss
    )


def elbo_losses(
    recon_state: jnp.ndarray,
    recon_reward: jnp.ndarray,
    next_state: jnp.ndarray,
    rewards: jnp.ndarray,
    mu: jnp.ndarray,
    logvar: jnp.ndarray,
    cfg: LossConfig,
    kl_scale: Optional[jnp.ndarray] = None,
    s_col_weight: Optional[jnp.ndarray] = None,
) -> LossOutputs:
    """Total training loss.  ``kl_scale`` (in [0,1]) is the annealing factor
    supplied by the trainer when ``cfg.kl_anneal_steps > 0``.

    Matches loss_s_r_vae_fn in both reference versions; argument order there
    is (recon, target) but both huber/mse are symmetric.

    When the model runs the two-hot reward head (``recon_reward`` arrives as
    logits [B, A, K] instead of scalars [B, A]), the reward term is the
    two-hot cross-entropy instead of huber/mse — detected by rank, so every
    train/test step works for both head modes unchanged.

    ``s_col_weight`` / cfg.contact_weight route the state branch through
    weighted_state_loss (the contact-sharpness levers); both off =
    reference objective, bit-identical."""
    twohot = recon_reward.ndim == rewards.ndim + 1
    weighted = s_col_weight is not None or cfg.contact_weight > 0.0
    if weighted:
        s_loss = weighted_state_loss(
            recon_state, next_state, rewards, cfg, s_col_weight
        )
    elif cfg.use_huber:
        s_loss = huber(next_state, recon_state, cfg.huber_delta)
    else:
        s_loss = mse(next_state, recon_state)
    if cfg.use_huber:
        r_loss = (
            jnp.mean(twohot_ce_rows(recon_reward, rewards))
            if twohot
            else huber(rewards, recon_reward, cfg.huber_delta)
        )
    else:
        r_loss = (
            jnp.mean(twohot_ce_rows(recon_reward, rewards))
            if twohot
            else mse(rewards, recon_reward)
        )
    kl_loss = kl_gaussian(mu, logvar, cfg.free_bits)
    return combine_losses(s_loss, r_loss, kl_loss, cfg, kl_scale)
