"""Pallas-fused train step equals the standard train step (same rng)."""

import jax
import jax.numpy as jnp
import numpy as np

from mfvae_tpu.config import LossConfig, ModelConfig, TrainConfig
from mfvae_tpu.data.transitions import VaeBatch
from mfvae_tpu.models.mavae import AgentSpec, GroupedBatch, MAVAE
from mfvae_tpu.training.trainer import create_train_state, make_train_step


def setup(B=8, F=8):
    agents = ("adversary_0", "adversary_1", "agent_0")
    spec = AgentSpec.from_dicts(
        agents, {"adversary_0": 10, "adversary_1": 10, "agent_0": 6},
        {a: 5 for a in agents},
    )
    model = MAVAE.from_config(
        ModelConfig(
            idx_features=F, obs_features=F, action_features=F,
            encoder_hidden=(16,), decoder_hidden=(32,), compute_dtype="float32",
        ),
        spec,
    )
    rng = np.random.default_rng(0)
    batch = VaeBatch(
        inputs=GroupedBatch(
            obs=(jnp.asarray(rng.normal(size=(B, 2, 10)), jnp.float32),
                 jnp.asarray(rng.normal(size=(B, 1, 6)), jnp.float32)),
            actions=(jnp.asarray(rng.integers(0, 5, size=(B, 2))),
                     jnp.asarray(rng.integers(0, 5, size=(B, 1)))),
        ),
        next_state=jnp.asarray(rng.normal(size=(B, 26)), jnp.float32),
        rewards=jnp.asarray(rng.normal(size=(B, 3)), jnp.float32),
    )
    variables = model.init(jax.random.PRNGKey(0), batch.inputs, None, jax.random.PRNGKey(1))
    state = create_train_state(model, variables, TrainConfig())
    return model, batch, state


class TestPallasTrainStep:
    def test_matches_standard_step(self):
        model, batch, state = setup()
        cfg = LossConfig()
        standard = jax.jit(make_train_step(cfg))
        pallas = jax.jit(make_train_step(cfg, use_pallas=True))
        key = jax.random.PRNGKey(5)
        s1, o1 = standard(state, batch, key)
        s2, o2 = pallas(state, batch, key)
        # same eps (same key through model._eps) -> identical losses
        np.testing.assert_allclose(float(o1.loss), float(o2.loss), rtol=1e-5)
        np.testing.assert_allclose(float(o1.kl_loss), float(o2.kl_loss), rtol=1e-4)
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            )

    def test_pallas_step_trains(self):
        model, batch, state = setup()
        step = jax.jit(make_train_step(LossConfig(), use_pallas=True))
        losses = []
        for i in range(15):
            state, outs = step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(outs.loss))
        assert losses[-1] < losses[0]
