"""Parity against the ACTUAL torch reference source
(/root/reference/torch_ver/model.py + trainer.py, imported and executed
with the installed torch-cpu).

- torch loss family: our LossConfig(family='torch') vs the real
  loss_s_r_vae_fn (torch_ver/model.py:19-40), and legacy_vae_loss vs the
  real loss_vae_fn (model.py:8-16), on shared tensors.
- PopArt: the real Trainer.art/pop/update_stats/normalize
  (torch_ver/trainer.py:66-86) vs our pure transforms on the scalar path
  where the reference math is well-defined.  (The reference's literal
  `art(y)` with a batched reward tensor broadcasts its scalar stats to
  [B, A] and then cannot rescale the head — ill-shaped, and bypassed by
  its own main loop, torch_ver/main.py:78,83-98.  Our per-output batched
  statistics are the intended semantics; on a scalar stream both must
  produce identical stats and identical rescaled heads.)
"""

import importlib.util
import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from mfvae_tpu.config import LossConfig
from mfvae_tpu.models.losses import elbo_losses, kl_gaussian, legacy_vae_loss
from mfvae_tpu.training.popart import (
    PopArtState,
    art,
    init_popart,
    normalize,
    pop_rescale_head,
)

REF_DIR = "/root/reference/torch_ver"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference source not present"
)


def _load(name: str, filename: str):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF_DIR, filename)
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_torch():
    return _load("ref_torch_model", "model.py"), _load("ref_torch_trainer", "trainer.py")


B, A, F = 6, 4, 3


def test_torch_loss_family_vs_source(ref_torch):
    """family='torch' must equal the real loss_s_r_vae_fn: s + 0.005*r +
    0.0025*KL, with the KL summed over the per-agent list
    (torch_ver/model.py:5-6,19-40)."""
    import torch

    ref_model, _ = ref_torch
    rng = np.random.default_rng(0)
    recon_s = rng.normal(size=(B, 20)).astype(np.float32) * 3
    recon_r = rng.normal(size=(B, A)).astype(np.float32) * 3
    s_hat = rng.normal(size=(B, 20)).astype(np.float32)
    r_hat = rng.normal(size=(B, A)).astype(np.float32)
    mus = [rng.normal(size=(B, F)).astype(np.float32) for _ in range(A)]
    lvs = [rng.normal(size=(B, F)).astype(np.float32) for _ in range(A)]

    t = torch.from_numpy
    want = ref_model.loss_s_r_vae_fn(
        t(recon_s), t(recon_r), t(s_hat), t(r_hat),
        [t(m) for m in mus], [t(l) for l in lvs], device="cpu",
    )
    got = elbo_losses(
        jnp.asarray(recon_s), jnp.asarray(recon_r),
        jnp.asarray(s_hat), jnp.asarray(r_hat),
        jnp.asarray(np.concatenate(mus, axis=1)),
        jnp.asarray(np.concatenate(lvs, axis=1)),
        LossConfig(family="torch"),
    )
    for g, w, name in zip(
        (got.loss, got.s_loss, got.r_loss, got.kl_loss), want,
        ("loss", "s_loss", "r_loss", "kl_loss"),
    ):
        np.testing.assert_allclose(
            float(g), float(w.detach()), rtol=1e-5, atol=1e-6, err_msg=name
        )


def test_legacy_vae_loss_vs_source(ref_torch):
    """loss_vae_fn (the unused legacy joint-decoder ELBO,
    torch_ver/model.py:8-16) vs our legacy_vae_loss."""
    import torch

    ref_model, _ = ref_torch
    rng = np.random.default_rng(1)
    y = rng.normal(size=(B, 10)).astype(np.float32)
    y_hat = rng.normal(size=(B, 10)).astype(np.float32)
    # the real fn iterates PER-AGENT LISTS of [B, F] (model.py:13-14)
    mus = [rng.normal(size=(B, F)).astype(np.float32) for _ in range(A)]
    lvs = [rng.normal(size=(B, F)).astype(np.float32) for _ in range(A)]

    t = torch.from_numpy
    want = ref_model.loss_vae_fn(
        t(y), t(y_hat), [t(m) for m in mus], [t(l) for l in lvs], device="cpu"
    )
    want_loss = want[0] if isinstance(want, tuple) else want
    got = legacy_vae_loss(
        jnp.asarray(y), jnp.asarray(y_hat),
        jnp.asarray(np.concatenate(mus, axis=1)),
        jnp.asarray(np.concatenate(lvs, axis=1)),
    )
    np.testing.assert_allclose(
        float(got), float(want_loss.detach()), rtol=1e-5, atol=1e-6
    )


class _HeadOnly:
    """Minimal stand-in model exposing reward_linear, the only module the
    reference Trainer touches in art/pop."""

    def __init__(self, n_out: int, seed: int = 0):
        import torch

        g = torch.Generator().manual_seed(seed)
        self.reward_linear = torch.nn.Linear(n_out, n_out)
        with torch.no_grad():
            self.reward_linear.weight.copy_(
                torch.randn(n_out, n_out, generator=g)
            )
            self.reward_linear.bias.copy_(torch.randn(n_out, generator=g))

    def parameters(self):
        return self.reward_linear.parameters()


def test_popart_scalar_path_vs_source(ref_torch):
    """Drive the REAL Trainer.art/pop/update_stats with a stream of scalar
    reward targets and our art/pop_rescale_head with the same stream
    ([1, 1]-shaped batches): stats (mu, sigma) and the rescaled head
    (weight, bias) must match at every step, and normalize() must agree."""
    import torch

    _, ref_trainer = ref_torch
    beta = 0.1
    n_out = 1
    model = _HeadOnly(n_out)
    tr = ref_trainer.Trainer(
        "POPART", model, lr=1e-3, loss_func=None, beta=beta, device="cpu"
    )

    # np.array(copy=True): .numpy() returns a VIEW of the torch tensor and
    # jnp.asarray can zero-copy it — the reference's in-place
    # weight.data.mul_ would then mutate our side too
    params = {
        "reward_linear": {
            "kernel": jnp.asarray(
                np.array(model.reward_linear.weight.detach().numpy().T, copy=True)
            ),
            "bias": jnp.asarray(
                np.array(model.reward_linear.bias.detach().numpy(), copy=True)
            ),
        }
    }
    st = init_popart(n_out)

    rng = np.random.default_rng(3)
    for step in range(20):
        y = float(rng.normal() * 2 + 1)
        # reference order (trainer.py:88-93): art -> pop -> update_stats
        tr.art(torch.tensor(y))
        tr.pop()
        tr.update_stats()

        new_st = art(st, jnp.asarray([[y]]), beta)
        params = pop_rescale_head(params, st, new_st, ("reward_linear",))
        st = new_st

        np.testing.assert_allclose(float(st.mu[0]), float(tr.mu), rtol=1e-5)
        np.testing.assert_allclose(
            float(st.sigma[0]), float(tr.sigma), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(params["reward_linear"]["kernel"]).T,
            model.reward_linear.weight.detach().numpy(),
            rtol=1e-4, atol=1e-6, err_msg=f"step {step} kernel",
        )
        np.testing.assert_allclose(
            np.asarray(params["reward_linear"]["bias"]),
            model.reward_linear.bias.detach().numpy(),
            rtol=1e-4, atol=1e-6, err_msg=f"step {step} bias",
        )
        # normalize agrees on fresh targets
        probe = float(rng.normal())
        np.testing.assert_allclose(
            float(normalize(st, jnp.asarray([[probe]]))[0, 0]),
            float(tr.normalize(torch.tensor(probe))),
            rtol=1e-5,
        )


def test_batched_popart_reduces_to_scalar_reference_on_constant_batches(
    ref_torch,
):
    """Our per-output batched art on a [B, 1] batch of IDENTICAL targets
    equals the reference's scalar EMA — the bridge between the intended
    batched semantics and the reference's scalar math."""
    import torch

    _, ref_trainer = ref_torch
    beta = 0.05
    model = _HeadOnly(1, seed=1)
    tr = ref_trainer.Trainer(
        "ART", model, lr=1e-3, loss_func=None, beta=beta, device="cpu"
    )
    st = init_popart(1)
    rng = np.random.default_rng(7)
    for _ in range(30):
        y = float(rng.normal())
        tr.art(torch.tensor(y))
        tr.update_stats()
        st = art(st, jnp.full((8, 1), y), beta)
    np.testing.assert_allclose(float(st.mu[0]), float(tr.mu), rtol=1e-5)
    np.testing.assert_allclose(float(st.sigma[0]), float(tr.sigma), rtol=1e-5)
