"""Two-hot categorical reward head (model.reward_head_mode='twohot').

The reference's reward head is a scalar regression (jax_ver/model.py:136,
torch_ver/model.py:131) — under tag's sparse +10-per-collision reward
(envs/mpe.py:50) a huber head regresses toward the near-zero conditional
mean, which is why reward-scored MPC measured null (PARITY.md round 4).
The two-hot head keeps reward mass as a categorical mode.  These tests pin
the encoding math, the shape contracts across every forward surface, the
loss-layer rank dispatch, actual learning on a sparse synthetic target,
and the config guards.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfvae_tpu.config import ExperimentConfig, LossConfig, ModelConfig
from mfvae_tpu.models.losses import (
    elbo_losses,
    twohot_bins,
    twohot_ce_rows,
    twohot_expectation,
    twohot_targets,
)
from mfvae_tpu.models.mavae import AgentSpec, GroupedBatch, MAVAE


def tiny_twohot(bins=17):
    agents = ("adversary_0", "adversary_1", "agent_0")
    spec = AgentSpec.from_dicts(
        agents,
        {"adversary_0": 6, "adversary_1": 6, "agent_0": 4},
        {a: 5 for a in agents},
    )
    cfg = ModelConfig(
        idx_features=8, obs_features=8, action_features=8,
        encoder_hidden=(16,), decoder_hidden=(32,), compute_dtype="float32",
        reward_head_mode="twohot", reward_bins=bins,
    )
    model = MAVAE.from_config(cfg, spec)
    B = 4
    batch = GroupedBatch(
        obs=(jnp.ones((B, 2, 6)), jnp.ones((B, 1, 4))),
        actions=(jnp.zeros((B, 2), jnp.int32), jnp.zeros((B, 1), jnp.int32)),
    )
    variables = model.init(jax.random.PRNGKey(0), batch, None, jax.random.PRNGKey(1))
    return spec, model, variables, batch


class TestEncoding:
    def test_twohot_is_exact_on_grid_range(self):
        """twohot(y) @ bins == y for any y inside the grid (the raw-space
        linear interpolation is exact, including ON bin centers)."""
        bins = twohot_bins(33)
        y = jnp.array([0.0, 0.5, -0.5, 10.0, -10.0, 123.4, float(bins[4])])
        w = twohot_targets(y, bins)
        np.testing.assert_allclose(w @ bins, y, rtol=1e-5, atol=1e-5)
        # weights are a distribution with <= 2 nonzeros
        np.testing.assert_allclose(jnp.sum(w, axis=-1), 1.0, rtol=1e-6)
        assert int(jnp.max(jnp.sum(w > 1e-9, axis=-1))) <= 2

    def test_out_of_range_clips(self):
        bins = twohot_bins(17)
        w = twohot_targets(jnp.array([1e9, -1e9]), bins)
        np.testing.assert_allclose(w @ bins, jnp.array([bins[-1], bins[0]]), rtol=1e-6)

    def test_expectation_recovers_target_at_ce_optimum(self):
        """CE is minimized when softmax(logits) == twohot(y); there the
        expectation equals y exactly."""
        bins = twohot_bins(17)
        y = jnp.array([3.7, -9.9, 0.0])
        logits = jnp.log(twohot_targets(y, bins) + 1e-12)
        np.testing.assert_allclose(
            twohot_expectation(logits, bins), y, rtol=1e-4, atol=1e-4
        )
        # and the CE at the optimum equals the target entropy (<= log 2)
        rows = twohot_ce_rows(logits, y)
        assert float(jnp.max(rows)) <= float(jnp.log(2.0)) + 1e-4


class TestModelSurfaces:
    def test_call_returns_logits_mean_call_returns_scalars(self):
        spec, model, variables, batch = tiny_twohot()
        rs, rr, mu, lv = model.apply(variables, batch, None, jax.random.PRNGKey(2))
        assert rr.shape == (4, 3, 17)
        rs2, rr2 = model.apply(variables, batch, None, method="mean_call")
        assert rr2.shape == (4, 3)
        assert bool(jnp.all(jnp.isfinite(rr2)))
        # expectation lies inside the bin range by construction
        bins = twohot_bins(17)
        assert float(jnp.max(jnp.abs(rr2))) <= float(bins[-1]) + 1e-3

    def test_elbo_losses_dispatches_on_rank(self):
        spec, model, variables, batch = tiny_twohot()
        rs, rr, mu, lv = model.apply(variables, batch, None, jax.random.PRNGKey(2))
        tgt_s = jnp.zeros_like(rs)
        tgt_r = jnp.zeros((4, 3))
        out = elbo_losses(rs, rr, tgt_s, tgt_r, mu, lv, LossConfig())
        assert np.isfinite(float(out.loss))
        # CE of near-uniform logits vs a point mass ~ log K
        assert 0.0 < float(out.r_loss) < 3 * np.log(17)

    def test_worldmodel_serving_contract_unchanged(self):
        from mfvae_tpu.inference import WorldModel

        spec, model, variables, batch = tiny_twohot()
        wm = WorldModel(model, variables)
        ns, rw = wm._predict(batch)
        assert rw.shape == (4, 3) and ns.shape == (4, 16)
        plan = (
            jnp.zeros((5, 4, 2), jnp.int32),
            jnp.zeros((5, 4, 1), jnp.int32),
        )
        states, rewards = wm._rollout(batch.obs, plan)
        assert rewards.shape == (5, 4, 3)
        assert bool(jnp.all(jnp.isfinite(rewards)))


class TestLearning:
    def test_sparse_reward_learned_as_mode_not_mean(self):
        """Fixed batch where agent 0's reward is 10 exactly when its own
        action is 3 (and 0 otherwise): the two-hot head must put its
        expectation near the spike for the action-3 rows — the failure mode
        of the scalar head (predicting the ~x% conditional mean everywhere)
        is what this head exists to fix."""
        from mfvae_tpu.training.trainer import make_train_step, create_train_state
        from mfvae_tpu.config import TrainConfig
        from mfvae_tpu.data.transitions import VaeBatch

        spec, model, variables, batch0 = tiny_twohot()
        B = 64
        key = jax.random.PRNGKey(3)
        acts0 = jax.random.randint(key, (B, 2), 0, 5)
        acts1 = jax.random.randint(jax.random.fold_in(key, 1), (B, 1), 0, 5)
        obs = (
            jax.random.normal(jax.random.fold_in(key, 2), (B, 2, 6)),
            jax.random.normal(jax.random.fold_in(key, 3), (B, 1, 4)),
        )
        rewards = jnp.stack(
            [
                jnp.where(acts0[:, 0] == 3, 10.0, 0.0),
                jnp.zeros((B,)),
                jnp.zeros((B,)),
            ],
            axis=1,
        )
        batch = VaeBatch(
            inputs=GroupedBatch(obs=obs, actions=(acts0, acts1)),
            next_state=jnp.zeros((B, 16)),
            rewards=rewards,
        )
        tcfg = TrainConfig()
        tcfg.learning_rate = 1e-3
        state = create_train_state(
            model, model.init(jax.random.PRNGKey(0), batch.inputs, None,
                              jax.random.PRNGKey(1)), tcfg
        )
        step = jax.jit(make_train_step(LossConfig()))
        first = None
        for i in range(500):
            state, outs = step(state, batch, jax.random.fold_in(key, 100 + i))
            if first is None:
                first = float(outs.r_loss)
        assert float(outs.r_loss) < 0.5 * first
        # served expectation separates spike rows from zero rows
        rs, rr = model.apply(state.params, batch.inputs, None, method="mean_call")
        spike = rr[:, 0][acts0[:, 0] == 3]
        rest = rr[:, 0][acts0[:, 0] != 3]
        assert float(jnp.mean(spike)) > 5.0
        assert float(jnp.mean(rest)) < 2.0


class TestGuards:
    def test_popart_and_pallas_rejected(self):
        from mfvae_tpu.training.experiment import Experiment

        cfg = ExperimentConfig()
        cfg.model.reward_head_mode = "twohot"
        cfg.train.mode = "POPART"
        with pytest.raises(ValueError, match="twohot"):
            Experiment(cfg).setup()
        cfg2 = ExperimentConfig()
        cfg2.model.reward_head_mode = "twohot"
        cfg2.model.use_pallas = True
        with pytest.raises(ValueError, match="twohot"):
            Experiment(cfg2).setup()

    def test_unknown_mode_rejected(self):
        spec, model, variables, batch = tiny_twohot()
        bad = MAVAE.from_config(
            ModelConfig(reward_head_mode="nope"), spec
        )
        with pytest.raises(ValueError, match="reward_head_mode"):
            bad.init(jax.random.PRNGKey(0), batch, None, jax.random.PRNGKey(1))


class TestPredStateRewardInput:
    def _tiny(self, **model_kw):
        agents = ("adversary_0", "adversary_1", "agent_0")
        spec = AgentSpec.from_dicts(
            agents,
            {"adversary_0": 6, "adversary_1": 6, "agent_0": 4},
            {a: 5 for a in agents},
        )
        cfg = ModelConfig(
            idx_features=8, obs_features=8, action_features=8,
            encoder_hidden=(16,), decoder_hidden=(32,),
            compute_dtype="float32", fused_decoders=False,
            reward_head_input="pred_state", **model_kw,
        )
        model = MAVAE.from_config(cfg, spec)
        B = 4
        batch = GroupedBatch(
            obs=(jnp.ones((B, 2, 6)), jnp.ones((B, 1, 4))),
            actions=(jnp.zeros((B, 2), jnp.int32), jnp.zeros((B, 1), jnp.int32)),
        )
        variables = model.init(
            jax.random.PRNGKey(0), batch, None, jax.random.PRNGKey(1)
        )
        return spec, model, variables, batch

    def test_shapes_both_head_modes(self):
        for mode, r_shape in (("linear", (4, 3)), ("twohot", (4, 3, 9))):
            spec, model, variables, batch = self._tiny(
                reward_head_mode=mode, reward_bins=9
            )
            rs, rr, mu, lv = model.apply(
                variables, batch, None, jax.random.PRNGKey(2)
            )
            assert rr.shape == r_shape and rs.shape == (4, 16)
            rs2, rr2 = model.apply(variables, batch, None, method="mean_call")
            assert rr2.shape == (4, 3)

    def test_fused_decoders_rejected(self):
        spec, *_ , batch = self._tiny()
        bad = MAVAE.from_config(
            ModelConfig(reward_head_input="pred_state", fused_decoders=True),
            spec,
        )
        with pytest.raises(ValueError, match="pred_state"):
            bad.init(jax.random.PRNGKey(0), batch, None, jax.random.PRNGKey(1))

    def test_reward_loss_does_not_backprop_into_state_path(self):
        """stop_gradient contract: grads of the reward loss alone are zero
        on the state decoder's params."""
        spec, model, variables, batch = self._tiny()

        def r_only(v):
            _, rr, _, _ = model.apply(
                v, batch, None, jax.random.PRNGKey(2)
            )
            return jnp.sum(rr * rr)

        g = jax.grad(r_only)(variables)
        sd = g["params"]["state_decoder"]
        assert all(
            float(jnp.abs(x).max()) == 0.0 for x in jax.tree.leaves(sd)
        )
        rd = g["params"]["reward_decoder"]
        assert sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(rd)) > 0


class TestUnrollTwohot:
    def test_unroll_loss_runs_with_logit_head(self):
        from mfvae_tpu.training.unroll import make_unroll_loss_fn
        from mfvae_tpu.data.transitions import GroupedTransition

        spec, model, variables, _ = tiny_twohot()
        B, W = 4, 3
        key = jax.random.PRNGKey(7)
        ks = jax.random.split(key, 8)
        wbatch = GroupedTransition(
            obs=(jax.random.normal(ks[0], (B, W, 2, 6)),
                 jax.random.normal(ks[1], (B, W, 1, 4))),
            actions=(jax.random.randint(ks[2], (B, W, 2), 0, 5),
                     jax.random.randint(ks[3], (B, W, 1), 0, 5)),
            next_obs=(jax.random.normal(ks[4], (B, W, 2, 6)),
                      jax.random.normal(ks[5], (B, W, 1, 4))),
            rewards=jax.random.normal(ks[6], (B, W, 3)),
            done=jnp.zeros((B, W)),
        )
        loss_fn = make_unroll_loss_fn(spec, LossConfig(), W)
        loss, outs = loss_fn(model.apply, variables, wbatch, jax.random.PRNGKey(9))
        assert np.isfinite(float(loss)) and np.isfinite(float(outs.r_loss))
