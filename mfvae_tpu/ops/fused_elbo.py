"""Pallas TPU kernels for the ELBO elementwise tail.

The reference computes reparameterization and KL as separate eager jnp ops
(jax_ver/model.py:53-57, trainer.py:54-55).  Under jit XLA fuses most of
this, but the fused kernel guarantees one HBM round-trip for the
[B, A·F] latent tensors: read (mu‖logvar, eps) once, write (z, per-sample
KL partial) once — including the backward pass via a custom VJP (see
pallas_guide.md "Patterns: Custom VJP").

Layout: latents arrive as [B, A, F] mu/logvar.  F = obs_features = 64 and
A = 40 for the flagship, so the flattened row dim B·A tiles cleanly into
(8,128)-aligned blocks with F on the lane axis after a reshape to
[B·A, F]; we pad rows to the block multiple.

All kernels run in interpret mode automatically on non-TPU backends so the
same code paths are exercised by the CPU test mesh.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 256


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_rows(x: jnp.ndarray, mult: int) -> Tuple[jnp.ndarray, int]:
    rows = x.shape[0]
    padded = (rows + mult - 1) // mult * mult
    if padded != rows:
        x = jnp.pad(x, ((0, padded - rows),) + ((0, 0),) * (x.ndim - 1))
    return x, rows


# ---------------------------------------------------------------------------
# forward kernel: z = mu + eps * exp(0.5 logvar);  kl_row = -.5 Σ_f (1 + lv - mu² - e^lv)
# ---------------------------------------------------------------------------


def _fwd_kernel(mu_ref, logvar_ref, eps_ref, z_ref, kl_ref):
    mu = mu_ref[:].astype(jnp.float32)
    lv = logvar_ref[:].astype(jnp.float32)
    eps = eps_ref[:]
    std = jnp.exp(0.5 * lv)
    z_ref[:] = mu + eps * std
    elv = std * std  # exp(logvar)
    kl = -0.5 * (1.0 + lv - mu * mu - elv)
    kl_ref[:] = jnp.sum(kl, axis=1, keepdims=True)


def _bwd_kernel(mu_ref, logvar_ref, eps_ref, gz_ref, gkl_ref, dmu_ref, dlv_ref):
    mu = mu_ref[:].astype(jnp.float32)
    lv = logvar_ref[:].astype(jnp.float32)
    eps = eps_ref[:]
    gz = gz_ref[:]
    gkl = gkl_ref[:]  # [rows, 1]
    std = jnp.exp(0.5 * lv)
    elv = std * std
    # dz/dmu = 1 ; dkl_row/dmu = mu
    dmu_ref[:] = gz + gkl * mu
    # dz/dlv = .5 eps std ; dkl_row/dlv = -.5 (1 - e^lv)
    dlv_ref[:] = gz * 0.5 * eps * std + gkl * (-0.5) * (1.0 - elv)


def _run_fwd(mu2d, lv2d, eps2d):
    rows, f = mu2d.shape
    grid = (rows // BLOCK_ROWS,)
    spec = pl.BlockSpec((BLOCK_ROWS, f), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kl_spec = pl.BlockSpec((BLOCK_ROWS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=[spec, kl_spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, f), jnp.float32),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(mu2d, lv2d, eps2d)


def _run_bwd(mu2d, lv2d, eps2d, gz2d, gkl2d):
    rows, f = mu2d.shape
    grid = (rows // BLOCK_ROWS,)
    spec = pl.BlockSpec((BLOCK_ROWS, f), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kl_spec = pl.BlockSpec((BLOCK_ROWS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[spec, spec, spec, spec, kl_spec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, f), jnp.float32),
            jax.ShapeDtypeStruct((rows, f), jnp.float32),
        ],
        interpret=_interpret(),
    )(mu2d, lv2d, eps2d, gz2d, gkl2d)


@jax.custom_vjp
def fused_reparam_kl(mu: jnp.ndarray, logvar: jnp.ndarray, eps: jnp.ndarray):
    """(z, kl_per_row) for row-major latents.

    mu/logvar/eps: [..., F] (leading axes flattened internally).
    Returns z [..., F] f32 and kl summed over F per row [...] f32:
    kl_row = -0.5 Σ_f (1 + logvar - mu² - e^logvar)  (jax_ver/trainer.py:54-55).
    """
    z, kl = _fused_fwd_impl(mu, logvar, eps)
    return z, kl


def _fused_fwd_impl(mu, logvar, eps):
    lead = mu.shape[:-1]
    f = mu.shape[-1]
    mu2d = mu.reshape(-1, f).astype(jnp.float32)
    lv2d = logvar.reshape(-1, f).astype(jnp.float32)
    eps2d = eps.reshape(-1, f).astype(jnp.float32)
    mu2d, rows = _pad_rows(mu2d, BLOCK_ROWS)
    lv2d, _ = _pad_rows(lv2d, BLOCK_ROWS)
    eps2d, _ = _pad_rows(eps2d, BLOCK_ROWS)
    z, kl = _run_fwd(mu2d, lv2d, eps2d)
    return z[:rows].reshape(*lead, f), kl[:rows, 0].reshape(lead)


def _fused_fwd(mu, logvar, eps):
    out = _fused_fwd_impl(mu, logvar, eps)
    return out, (mu, logvar, eps)


def _fused_bwd(res, grads):
    mu, logvar, eps = res
    gz, gkl = grads
    lead = mu.shape[:-1]
    f = mu.shape[-1]
    mu2d, rows = _pad_rows(mu.reshape(-1, f).astype(jnp.float32), BLOCK_ROWS)
    lv2d, _ = _pad_rows(logvar.reshape(-1, f).astype(jnp.float32), BLOCK_ROWS)
    eps2d, _ = _pad_rows(eps.reshape(-1, f).astype(jnp.float32), BLOCK_ROWS)
    gz2d, _ = _pad_rows(gz.reshape(-1, f).astype(jnp.float32), BLOCK_ROWS)
    gkl2d, _ = _pad_rows(gkl.reshape(-1, 1).astype(jnp.float32), BLOCK_ROWS)
    dmu, dlv = _run_bwd(mu2d, lv2d, eps2d, gz2d, gkl2d)
    dmu = dmu[:rows].reshape(*lead, f).astype(mu.dtype)
    dlv = dlv[:rows].reshape(*lead, f).astype(logvar.dtype)
    return dmu, dlv, None


fused_reparam_kl.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# huber mean with fused partial reduction
# ---------------------------------------------------------------------------


def _huber_kernel(x_ref, y_ref, delta_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[0, 0] = jnp.float32(0.0)

    delta = delta_ref[0]
    d = jnp.abs(x_ref[:].astype(jnp.float32) - y_ref[:].astype(jnp.float32))
    q = jnp.minimum(d, delta)
    acc_ref[0, 0] += jnp.sum(0.5 * q * q + delta * (d - q))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def huber_mean(x: jnp.ndarray, y: jnp.ndarray, delta: float = 1.0):
    """mean(huber(x - y)) over all elements (jax_ver/trainer.py:48-52
    semantics), computed as a single-pass Pallas reduction."""
    return _huber_impl(x, y, delta)


def _huber_impl(x, y, delta):
    n = x.size
    x2d = x.reshape(-1)[None, :]
    y2d = y.reshape(-1)[None, :]
    # pad lane dim to 128 multiple
    cols = x2d.shape[1]
    padded = (cols + 127) // 128 * 128
    if padded != cols:
        x2d = jnp.pad(x2d, ((0, 0), (0, padded - cols)))
        y2d = jnp.pad(y2d, ((0, 0), (0, padded - cols)))
    block = min(padded, 64 * 128)
    while padded % block:
        block //= 2
    grid = (padded // block,)
    spec = pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    total = pl.pallas_call(
        _huber_kernel,
        grid=grid,
        in_specs=[
            spec,
            spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=_interpret(),
    )(x2d, y2d, jnp.array([delta], jnp.float32))
    return total[0, 0] / n


def _huber_fwd(x, y, delta):
    return _huber_impl(x, y, delta), (x, y)


def _huber_bwd(delta, res, g):
    x, y = res
    n = x.size
    d = x.astype(jnp.float32) - y.astype(jnp.float32)
    grad = jnp.clip(d, -delta, delta) * (g / n)
    return grad.astype(x.dtype), (-grad).astype(y.dtype)


huber_mean.defvjp(_huber_fwd, _huber_bwd)
