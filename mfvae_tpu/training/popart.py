"""PopArt reward-target normalization as a pure functional transform.

The reference implements PopArt imperatively on the torch side only
(torch_ver/trainer.py:48-103: `art` EMA stats, `pop` output-head rescale,
normalize/denormalize) and then bypasses it in the live loop
(torch_ver/main.py:54,78,83-98).  Here it is a first-class, *tested* option
that runs inside the compiled train step: statistics live in a PopArtState
pytree on the TrainState, and the head rescale is a pure params->params map
(no retrace; SURVEY §7 "PopArt under jit").

Per-output (per-agent) statistics.  Preserving predictions under a stats
update (μ,σ)→(μ',σ') requires, for head y_j = w_j·x + b_j:
    w'_j = w_j σ_j/σ'_j,   b'_j = (σ_j b_j + μ_j − μ'_j)/σ'_j
(the invariant behind torch_ver/trainer.py:71-74).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax.numpy as jnp

SIGMA_MIN, SIGMA_MAX = 1e-4, 1e6


class PopArtState(NamedTuple):
    mu: jnp.ndarray  # [n_outputs]
    nu: jnp.ndarray  # [n_outputs] second moment
    sigma: jnp.ndarray  # [n_outputs]


def init_popart(n_outputs: int) -> PopArtState:
    return PopArtState(
        mu=jnp.zeros((n_outputs,)),
        nu=jnp.ones((n_outputs,)),
        sigma=jnp.ones((n_outputs,)),
    )


def art(state: PopArtState, targets: jnp.ndarray, beta: float) -> PopArtState:
    """EMA stats update from a batch of targets [B, n_outputs]
    (the `art` step, torch_ver/trainer.py:66-69, done batched + per-output)."""
    t = targets.astype(jnp.float32)
    mu_new = (1.0 - beta) * state.mu + beta * jnp.mean(t, axis=0)
    nu_new = (1.0 - beta) * state.nu + beta * jnp.mean(t * t, axis=0)
    sigma_new = jnp.sqrt(jnp.clip(nu_new - mu_new * mu_new, SIGMA_MIN**2))
    sigma_new = jnp.clip(sigma_new, SIGMA_MIN, SIGMA_MAX)
    return PopArtState(mu=mu_new, nu=nu_new, sigma=sigma_new)


def pop_rescale_head(
    params: Dict[str, Any],
    old: PopArtState,
    new: PopArtState,
    head_path: Tuple[str, ...] = ("reward_linear",),
) -> Dict[str, Any]:
    """Rescale the output head so denormalized predictions are invariant
    under the stats update (the `pop` step, torch_ver/trainer.py:71-74)."""
    head = params
    for k in head_path:
        head = head[k]
    kernel, bias = head["kernel"], head["bias"]
    scale = old.sigma / new.sigma  # [n_out]
    new_kernel = kernel * scale[None, :]
    new_bias = (old.sigma * bias + old.mu - new.mu) / new.sigma

    def replace(tree, path, value):
        if not path:
            return value
        out = dict(tree)
        out[path[0]] = replace(tree[path[0]], path[1:], value)
        return out

    new_head = dict(head)
    new_head["kernel"] = new_kernel
    new_head["bias"] = new_bias
    return replace(params, head_path, new_head)


def normalize(state: PopArtState, y: jnp.ndarray) -> jnp.ndarray:
    return (y - state.mu) / state.sigma


def denormalize(state: PopArtState, y: jnp.ndarray) -> jnp.ndarray:
    return state.sigma * y + state.mu
