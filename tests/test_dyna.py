"""Dyna imagination (baselines/dyna.py): the world model generates TD
training windows for the Q-learner — the second consumer of the model-based
loop (the reference's model and Q-learner never touch)."""

import jax
import jax.numpy as jnp
import numpy as np

from mfvae_tpu.baselines.dyna import make_dyna_train, make_imagine_fn
from mfvae_tpu.baselines.vdn import Timestep, VdnConfig, VdnNetwork, make_train
from mfvae_tpu.config import ExperimentConfig
from mfvae_tpu.inference import WorldModel
from mfvae_tpu.models.mavae import GroupedBatch
from mfvae_tpu.training.experiment import Experiment


def tiny_wm():
    cfg = ExperimentConfig()
    cfg.env.num_good_agents = 1
    cfg.env.num_adversaries = 2
    cfg.env.num_obs = 1
    cfg.model.idx_features = 8
    cfg.model.obs_features = 8
    cfg.model.action_features = 8
    cfg.model.encoder_hidden = (16,)
    cfg.model.action_encoder_hidden = (8,)
    cfg.model.decoder_hidden = (32,)
    cfg.model.compute_dtype = "float32"
    exp = Experiment(cfg)
    var = exp.model.init(
        jax.random.PRNGKey(0), exp._fake_batch(4), None, jax.random.PRNGKey(1)
    )
    return WorldModel(exp.model, var), exp


def tiny_vdn_cfg(**kw):
    base = dict(
        num_good_agents=1, num_adversaries=2, num_obs=1,
        num_updates=3, num_envs=2, buffer_size_time=64, min_buffer_time=8,
        batch_size=2, hidden_dim=8, sample_sequence_length=4,
        log_during_training=False, test_during_training=False,
    )
    base.update(kw)
    return VdnConfig(**base)


class TestImagineFn:
    def test_window_shapes_and_anchoring(self):
        wm, exp = tiny_wm()
        cfg = tiny_vdn_cfg()
        imagine = make_imagine_fn(wm, cfg, horizon=3, imagine_eps=0.0)

        n = wm.model.spec.n_agents
        d = max(od for (od, _), _ in wm.model.spec.groups) + n
        S, L = 2, 4
        net = VdnNetwork(action_dim=5, n_agents=n, hidden_dim=cfg.hidden_dim,
                         param_share=True)
        params = net.init(
            jax.random.PRNGKey(1), jnp.zeros((1, n, cfg.hidden_dim)),
            jnp.zeros((1, 1, n, d)), jnp.zeros((1, 1), bool),
        )
        real = Timestep(
            obs=jax.random.normal(jax.random.PRNGKey(2), (S, L, n, d)),
            actions=jnp.zeros((S, L, n), jnp.int32),
            rewards=jnp.zeros((S, L)),
            done=jnp.zeros((S, L), bool),
        )
        seq = jax.jit(imagine)(params, real, jax.random.PRNGKey(3))
        assert seq.obs.shape == (S, 4, n, d)  # horizon+1 windows
        assert seq.actions.shape == (S, 4, n)
        assert seq.actions.dtype == jnp.int32
        assert seq.rewards.shape == (S, 4)
        assert not bool(seq.done.any())  # fixed-horizon imagination
        # the imagined window is anchored at the REAL batch's start obs
        np.testing.assert_allclose(
            np.asarray(seq.obs[:, 0]), np.asarray(real.obs[:, 0]), rtol=1e-6
        )

    def test_reward_matches_world_model(self):
        """Step-0 imagined reward == reward_scale x team sum of the world
        model's per-agent prediction for (obs0, greedy actions)."""
        wm, exp = tiny_wm()
        cfg = tiny_vdn_cfg(reward_scale=0.5)
        imagine = make_imagine_fn(wm, cfg, horizon=1, imagine_eps=0.0)

        spec = wm.model.spec
        n = spec.n_agents
        d_pad = max(od for (od, _), _ in spec.groups)
        d = d_pad + n
        net = VdnNetwork(action_dim=5, n_agents=n, hidden_dim=cfg.hidden_dim,
                         param_share=True)
        params = net.init(
            jax.random.PRNGKey(1), jnp.zeros((1, n, cfg.hidden_dim)),
            jnp.zeros((1, 1, n, d)), jnp.zeros((1, 1), bool),
        )
        S = 2
        obs0 = jax.random.normal(jax.random.PRNGKey(2), (S, n, d))
        real = Timestep(
            obs=obs0[:, None],
            actions=jnp.zeros((S, 1, n), jnp.int32),
            rewards=jnp.zeros((S, 1)),
            done=jnp.zeros((S, 1), bool),
        )
        seq = imagine(params, real, jax.random.PRNGKey(3))

        # reproduce step 0 by hand: greedy actions (eps=0) from obs0
        h0 = jnp.zeros((S, n, cfg.hidden_dim))
        _, q = net.apply(params, h0, obs0[None], jnp.ones((1, S), bool))
        greedy = jnp.argmax(q[0], axis=-1)
        np.testing.assert_array_equal(
            np.asarray(seq.actions[:, 0]), np.asarray(greedy)
        )
        slot = {}
        for g, ((_, _), idxs) in enumerate(spec.groups):
            for pos, i in enumerate(idxs):
                slot[i] = (g, pos)
        obs_g = tuple(
            jnp.stack([obs0[:, i, :od] for i in idxs], axis=1)
            for (od, _), idxs in spec.groups
        )
        act_g = tuple(
            greedy[:, list(idxs)] for (_, _), idxs in spec.groups
        )
        _, rew = wm._predict(GroupedBatch(obs=obs_g, actions=act_g))
        np.testing.assert_allclose(
            np.asarray(seq.rewards[:, 0]),
            0.5 * np.asarray(rew.sum(-1)),
            rtol=1e-5,
        )


class TestDynaTraining:
    def test_trains_end_to_end(self):
        wm, _ = tiny_wm()
        cfg = tiny_vdn_cfg()
        train = make_dyna_train(wm=wm, config=cfg, horizon=3, imagine_weight=0.5)
        out = jax.jit(train)(jax.random.PRNGKey(0))
        loss = np.asarray(out["metrics"]["loss"])
        assert loss.shape == (cfg.num_updates,)
        assert np.isfinite(loss[-1])

    def test_plain_vdn_rng_unchanged(self):
        """Adding the hook must not move plain VDN's rng stream: the same
        config without imagine_fn reproduces the pre-hook trajectory (two
        runs of the unhooked path agree exactly)."""
        cfg = tiny_vdn_cfg()
        a = jax.jit(make_train(cfg))(jax.random.PRNGKey(0))
        b = jax.jit(make_train(cfg))(jax.random.PRNGKey(0))
        np.testing.assert_array_equal(
            np.asarray(a["metrics"]["loss"]), np.asarray(b["metrics"]["loss"])
        )
