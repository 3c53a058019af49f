"""Multi-step open-loop (unroll) training: window sampling, loss math,
masking, and the end-to-end epoch program (training/unroll.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfvae_tpu.config import ModelConfig, LossConfig
from mfvae_tpu.data.buffer import ItemBuffer
from mfvae_tpu.data.transitions import GroupedTransition
from mfvae_tpu.models.losses import elbo_losses
from mfvae_tpu.models.mavae import AgentSpec, GroupedBatch, MAVAE, agent_order_concat
from mfvae_tpu.training.unroll import (
    make_unroll_loss_fn,
    make_unroll_train_step,
    state_to_grouped,
)


# ---------------------------------------------------------------- sampling


class TestSampleWindow:
    def _fill(self, buf, n):
        state = buf.init({"i": jnp.int32(0)})
        for i in range(n):
            state = buf.add(state, {"i": jnp.int32(i)})
        return state

    def test_windows_are_consecutive_before_wrap(self):
        buf = ItemBuffer(max_length=32, min_length=1, sample_batch_size=64)
        state = self._fill(buf, 20)
        out = buf.sample_window(state, jax.random.PRNGKey(0), window=4)
        idx = np.asarray(out.experience["i"])  # [64, 4]
        assert idx.shape == (64, 4)
        assert (np.diff(idx, axis=1) == 1).all()
        assert idx.max() <= 19

    def test_windows_never_cross_the_seam_when_full(self):
        buf = ItemBuffer(max_length=16, min_length=1, sample_batch_size=256)
        state = self._fill(buf, 40)  # cursor = 40 % 16 = 8, oldest item = 24
        out = buf.sample_window(state, jax.random.PRNGKey(1), window=5)
        idx = np.asarray(out.experience["i"])
        # consecutive in TIME (values), even where the ring wraps
        assert (np.diff(idx, axis=1) == 1).all()
        assert idx.min() >= 24 and idx.max() <= 39

    def test_block_restriction(self):
        buf = ItemBuffer(max_length=32, min_length=1, sample_batch_size=512)
        state = self._fill(buf, 32)
        out = buf.sample_window(state, jax.random.PRNGKey(2), window=4, block=8)
        idx = np.asarray(out.experience["i"])
        assert (np.diff(idx, axis=1) == 1).all()
        # every window lies inside one aligned 8-block
        assert (idx[:, 0] // 8 == idx[:, -1] // 8).all()


# ------------------------------------------------------------- loss math


def tiny_model():
    agents = ("adversary_0", "adversary_1", "agent_0")
    spec = AgentSpec.from_dicts(
        agents,
        {"adversary_0": 6, "adversary_1": 6, "agent_0": 4},
        {a: 5 for a in agents},
    )
    cfg = ModelConfig(
        idx_features=8, obs_features=8, action_features=8,
        encoder_hidden=(16,), decoder_hidden=(32,), compute_dtype="float32",
    )
    model = MAVAE.from_config(cfg, spec)
    B = 4
    batch = GroupedBatch(
        obs=(jnp.ones((B, 2, 6)), jnp.ones((B, 1, 4))),
        actions=(jnp.zeros((B, 2), jnp.int32), jnp.zeros((B, 1), jnp.int32)),
    )
    variables = model.init(jax.random.PRNGKey(0), batch, None, jax.random.PRNGKey(1))
    return spec, model, variables


def window_batch(spec, key, B=4, W=3, done=None):
    ks = jax.random.split(key, 8)
    obs = (
        jax.random.normal(ks[0], (B, W, 2, 6)),
        jax.random.normal(ks[1], (B, W, 1, 4)),
    )
    next_obs = (
        jax.random.normal(ks[2], (B, W, 2, 6)),
        jax.random.normal(ks[3], (B, W, 1, 4)),
    )
    actions = (
        jax.random.randint(ks[4], (B, W, 2), 0, 5),
        jax.random.randint(ks[5], (B, W, 1), 0, 5),
    )
    rewards = jax.random.normal(ks[6], (B, W, 3))
    if done is None:
        done = jnp.zeros((B, W))
    return GroupedTransition(
        obs=obs, actions=actions, next_obs=next_obs, rewards=rewards, done=done
    )


class TestUnrollLoss:
    def test_w1_equals_one_step_elbo(self):
        """W=1, all slots valid: the pooled unroll loss IS the reference
        one-step loss (same key routing: the single per-step key is
        split(rng, 1)[0])."""
        spec, model, variables = tiny_model()
        loss_cfg = LossConfig(family="jax")
        wb = window_batch(spec, jax.random.PRNGKey(3), W=1)
        key = jax.random.PRNGKey(7)
        loss_fn = make_unroll_loss_fn(spec, loss_cfg, 1)
        _, out = loss_fn(model.apply, variables, wb, key)

        k0 = jax.random.split(key, 1)[0]
        gb = GroupedBatch(
            obs=tuple(o[:, 0] for o in wb.obs),
            actions=tuple(a[:, 0] for a in wb.actions),
        )
        recon_s, recon_r, mu, logvar = model.apply(variables, gb, None, k0)
        expected = elbo_losses(
            recon_s, recon_r,
            agent_order_concat(spec, tuple(o[:, 0] for o in wb.next_obs)),
            wb.rewards[:, 0], mu, logvar, loss_cfg,
        )
        for a, b in zip(out, expected):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

        # gradient equality too — the unroll path must be a drop-in
        # replacement for the one-step objective at W=1
        def one_step_loss(p):
            rs, rr, m, lv = model.apply(p, gb, None, k0)
            return elbo_losses(
                rs, rr,
                agent_order_concat(spec, tuple(o[:, 0] for o in wb.next_obs)),
                wb.rewards[:, 0], m, lv, loss_cfg,
            ).loss

        g_unroll = jax.grad(lambda p: loss_fn(model.apply, p, wb, key)[0])(variables)
        g_one = jax.grad(one_step_loss)(variables)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
            ),
            g_unroll, g_one,
        )

    def test_done_masks_later_steps(self):
        """done at step 0 for every row -> steps 1+ contribute nothing: the
        loss is invariant to their targets."""
        spec, model, variables = tiny_model()
        loss_cfg = LossConfig(family="jax")
        done = jnp.zeros((4, 3)).at[:, 0].set(1.0)
        wb = window_batch(spec, jax.random.PRNGKey(4), W=3, done=done)
        loss_fn = make_unroll_loss_fn(spec, loss_cfg, 3)
        key = jax.random.PRNGKey(9)
        _, out_a = loss_fn(model.apply, variables, wb, key)
        wb_b = wb._replace(
            next_obs=tuple(
                o.at[:, 1:].set(o[:, 1:] + 100.0) for o in wb.next_obs
            ),
            rewards=wb.rewards.at[:, 1:].set(-50.0),
        )
        _, out_b = loss_fn(model.apply, variables, wb_b, key)
        for a, b in zip(out_a, out_b):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    def test_feedback_couples_steps(self):
        """Open-loop: step-1 loss is computed on the model's OWN step-0
        prediction, so perturbing the step-0 INPUT obs changes the step-1
        contribution (unlike teacher forcing, where only stored obs[:, 1]
        would matter)."""
        spec, model, variables = tiny_model()
        loss_cfg = LossConfig(family="jax")
        wb = window_batch(spec, jax.random.PRNGKey(5), W=2)
        loss_fn = make_unroll_loss_fn(spec, loss_cfg, 2)
        key = jax.random.PRNGKey(11)
        loss_a, _ = loss_fn(model.apply, variables, wb, key)
        # obs[:, 1] is never read by the open-loop objective
        wb_c = wb._replace(
            obs=tuple(o.at[:, 1].set(o[:, 1] * 3.0 + 1.0) for o in wb.obs)
        )
        loss_c, _ = loss_fn(model.apply, variables, wb_c, key)
        np.testing.assert_allclose(np.asarray(loss_a), np.asarray(loss_c), rtol=1e-6)
        # but obs[:, 0] reaches every step through the feedback
        wb_d = wb._replace(
            obs=tuple(o.at[:, 0].set(o[:, 0] * 3.0 + 1.0) for o in wb.obs)
        )
        loss_d, _ = loss_fn(model.apply, variables, wb_d, key)
        assert not np.allclose(np.asarray(loss_a), np.asarray(loss_d))

    def test_stop_gradient_same_forward_different_grads(self):
        """Detaching the feedback must not change the LOSS (identical
        forward) but must change the GRADIENT (no path through the chain)."""
        spec, model, variables = tiny_model()
        loss_cfg = LossConfig(family="jax")
        wb = window_batch(spec, jax.random.PRNGKey(8), W=3)
        key = jax.random.PRNGKey(13)
        fn_bptt = make_unroll_loss_fn(spec, loss_cfg, 3, stop_gradient=False)
        fn_sg = make_unroll_loss_fn(spec, loss_cfg, 3, stop_gradient=True)
        l_bptt, _ = fn_bptt(model.apply, variables, wb, key)
        l_sg, _ = fn_sg(model.apply, variables, wb, key)
        np.testing.assert_allclose(np.asarray(l_bptt), np.asarray(l_sg), rtol=1e-6)
        g_bptt = jax.grad(lambda p: fn_bptt(model.apply, p, wb, key)[0])(variables)
        g_sg = jax.grad(lambda p: fn_sg(model.apply, p, wb, key)[0])(variables)
        diffs = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), g_bptt, g_sg
        )
        assert max(jax.tree.leaves(diffs)) > 0.0

    def test_mean_feedback_matches_serving_prediction(self):
        """mean_feedback=True must feed step 2 the SAME state the serving
        rollout would: WorldModel.predict (posterior-mean) on step 1's
        input.  Verified by replaying step 2's loss contribution by hand."""
        from mfvae_tpu.inference import WorldModel
        from mfvae_tpu.training.unroll import state_to_grouped

        spec, model, variables = tiny_model()
        loss_cfg = LossConfig(family="jax")
        wb = window_batch(spec, jax.random.PRNGKey(14), W=2)
        key = jax.random.PRNGKey(15)
        fn = make_unroll_loss_fn(spec, loss_cfg, 2, mean_feedback=True)
        _, out = fn(model.apply, variables, wb, key)

        wm = WorldModel(model, variables)
        k0, k1 = jax.random.split(key, 2)
        gb0 = GroupedBatch(
            obs=tuple(o[:, 0] for o in wb.obs),
            actions=tuple(a[:, 0] for a in wb.actions),
        )
        mean_next, _ = wm.predict(gb0, None)
        gb1 = GroupedBatch(
            obs=state_to_grouped(spec, mean_next),
            actions=tuple(a[:, 1] for a in wb.actions),
        )
        # replay both steps' losses by hand and pool
        parts = []
        for gb, t, kk in ((gb0, 0, k0), (gb1, 1, k1)):
            rs, rr, m, lv = model.apply(variables, gb, None, kk)
            parts.append(elbo_losses(
                rs, rr,
                agent_order_concat(spec, tuple(o[:, t] for o in wb.next_obs)),
                wb.rewards[:, t], m, lv, loss_cfg,
            ))
        pooled = [(np.asarray(a) + np.asarray(b)) / 2 for a, b in zip(*parts)]
        for got, want in zip(out, pooled):
            np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)

    def test_state_to_grouped_roundtrip(self):
        spec, _, _ = tiny_model()
        state = jax.random.normal(jax.random.PRNGKey(6), (5, sum(spec.obs_dims)))
        back = agent_order_concat(spec, state_to_grouped(spec, state))
        np.testing.assert_array_equal(np.asarray(back), np.asarray(state))

    def test_popart_and_pallas_rejected(self):
        spec, _, _ = tiny_model()
        with pytest.raises(NotImplementedError):
            make_unroll_train_step(spec, LossConfig(), 4, mode="POPART")
        with pytest.raises(NotImplementedError):
            make_unroll_train_step(spec, LossConfig(), 4, use_pallas=True)


# ------------------------------------------------------------ end-to-end


class TestUnrollExperiment:
    def test_trains_end_to_end(self, tmp_path):
        from tests.test_training import tiny_cfg
        from mfvae_tpu.training.experiment import Experiment

        cfg = tiny_cfg(tmp_path, epoch_num=3, unroll_steps=4)
        cfg.buffer.max_size = 64  # divisible by sample_num=8
        exp = Experiment(cfg).setup()
        metrics = exp.run()
        assert np.isfinite(metrics["loss_train"])
        assert np.isfinite(metrics["loss_test"])

    def test_batched_path_trains_with_unroll(self, tmp_path):
        """unroll composes with the batched (DP-layout) epoch program:
        per-shard window sampling, same phase-block alignment."""
        from tests.test_training import tiny_cfg
        from mfvae_tpu.training.experiment import Experiment

        cfg = tiny_cfg(tmp_path, epoch_num=2, unroll_steps=4, n_envs=2)
        cfg.buffer.max_size = 64  # per-shard 32, divisible by sample_num=8
        exp = Experiment(cfg).setup()
        metrics = exp.run()
        assert np.isfinite(metrics["loss_train"])

    def test_batched_path_rejects_bad_shard_capacity(self, tmp_path):
        from tests.test_training import tiny_cfg
        from mfvae_tpu.training.experiment import Experiment

        cfg = tiny_cfg(tmp_path, epoch_num=2, unroll_steps=4, n_envs=2,
                       sample_num=12)  # per-shard 32 not divisible by 12
        cfg.buffer.max_size = 64
        with pytest.raises(AssertionError, match="divisible"):
            Experiment(cfg).setup()
