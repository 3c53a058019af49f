"""WorldModel inference: deterministic predict, posterior sampling,
checkpoint loading."""

import jax
import jax.numpy as jnp
import numpy as np

from mfvae_tpu.config import ModelConfig
from mfvae_tpu.inference import WorldModel
from mfvae_tpu.models.mavae import AgentSpec, GroupedBatch, MAVAE


def build(tmp=None):
    agents = ("adversary_0", "adversary_1", "agent_0")
    spec = AgentSpec.from_dicts(
        agents, {"adversary_0": 6, "adversary_1": 6, "agent_0": 4},
        {a: 5 for a in agents},
    )
    cfg = ModelConfig(
        idx_features=8, obs_features=8, action_features=8,
        encoder_hidden=(16,), decoder_hidden=(32,), compute_dtype="float32",
    )
    model = MAVAE.from_config(cfg, spec)
    B = 3
    batch = GroupedBatch(
        obs=(jnp.ones((B, 2, 6)), jnp.ones((B, 1, 4))),
        actions=(jnp.zeros((B, 2), jnp.int32), jnp.zeros((B, 1), jnp.int32)),
    )
    variables = model.init(jax.random.PRNGKey(0), batch, None, jax.random.PRNGKey(1))
    return spec, cfg, model, batch, variables


class TestWorldModel:
    def test_predict_deterministic(self):
        spec, cfg, model, batch, variables = build()
        wm = WorldModel(model, variables)
        s1, r1 = wm.predict(batch, None)
        s2, r2 = wm.predict(batch, None)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        assert s1.shape == (3, 16) and r1.shape == (3, 3)

    def test_sample_varies_and_centers_on_predict(self):
        spec, cfg, model, batch, variables = build()
        wm = WorldModel(model, variables)
        ss, rs = wm.sample(batch, None, jax.random.PRNGKey(0), n=8)
        assert ss.shape == (8, 3, 16)
        assert not np.allclose(np.asarray(ss[0]), np.asarray(ss[1]))

    def test_dict_adapter(self):
        spec, cfg, model, batch, variables = build()
        wm = WorldModel(model, variables)
        obs = {
            "adversary_0": np.ones((3, 6), np.float32),
            "adversary_1": np.ones((3, 6), np.float32),
            "agent_0": np.ones((3, 4), np.float32),
        }
        acts = {a: np.zeros((3,), np.int32) for a in spec.agents}
        s, r = wm.predict(obs, acts)
        s2, _ = wm.predict(batch, None)
        np.testing.assert_allclose(np.asarray(s), np.asarray(s2), rtol=1e-6)

    def test_encode_shapes(self):
        spec, cfg, model, batch, variables = build()
        wm = WorldModel(model, variables)
        mu, lv = wm.encode(batch)
        assert mu.shape == (3, 3, 8) and lv.shape == (3, 3, 8)


class TestImaginationRollout:
    def test_rollout_shapes_and_first_step_matches_predict(self):
        spec, cfg, model, batch, variables = build()
        wm = WorldModel(model, variables)
        T, B = 5, 3
        plan = (
            jnp.zeros((T, B, 2), jnp.int32),
            jnp.zeros((T, B, 1), jnp.int32),
        )
        states, rewards = wm.rollout(batch, plan)
        assert states.shape == (T, B, sum(spec.obs_dims))
        assert rewards.shape == (T, B, spec.n_agents)
        assert np.isfinite(np.asarray(states)).all()
        # step 0 of the rollout == one-step predict from the same inputs
        s1, r1 = wm.predict(batch, None)
        np.testing.assert_allclose(np.asarray(states[0]), np.asarray(s1), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(rewards[0]), np.asarray(r1), rtol=1e-5)

    def test_rollout_feeds_predictions_back(self):
        """Step 1 must be predict() applied to step 0's reconstructed state
        (re-split into per-agent obs) — the closed loop, hand-checked."""
        spec, cfg, model, batch, variables = build()
        wm = WorldModel(model, variables)
        T, B = 2, 3
        plan = (
            jnp.ones((T, B, 2), jnp.int32),
            jnp.ones((T, B, 1), jnp.int32),
        )
        states, _ = wm.rollout(batch, plan)
        obs1 = wm._state_to_grouped(states[0])
        batch1 = GroupedBatch(obs=obs1, actions=(plan[0][1], plan[1][1]))
        s_want, _ = wm.predict(batch1, None)
        np.testing.assert_allclose(np.asarray(states[1]), np.asarray(s_want), rtol=1e-5)

    def test_rollout_dict_plan(self):
        spec, cfg, model, batch, variables = build()
        wm = WorldModel(model, variables)
        obs_dict = {
            "adversary_0": jnp.ones((3, 6)), "adversary_1": jnp.ones((3, 6)),
            "agent_0": jnp.ones((3, 4)),
        }
        plan = {a: jnp.zeros((4, 3), jnp.int32) for a in spec.agents}
        states, rewards = wm.rollout(obs_dict, plan)
        assert states.shape == (4, 3, sum(spec.obs_dims))

    def test_rollout_with_det_and_shared(self):
        agents = ("adversary_0", "adversary_1", "agent_0")
        spec = AgentSpec.from_dicts(
            agents, {"adversary_0": 6, "adversary_1": 6, "agent_0": 4},
            {a: 5 for a in agents},
        )
        cfg = ModelConfig(
            idx_features=8, obs_features=8, action_features=8,
            encoder_hidden=(16,), decoder_hidden=(32,), compute_dtype="float32",
            det_features=8, latent_structure="shared_private", shared_latent=4,
        )
        model = MAVAE.from_config(cfg, spec)
        batch = GroupedBatch(
            obs=(jnp.ones((2, 2, 6)), jnp.ones((2, 1, 4))),
            actions=(jnp.zeros((2, 2), jnp.int32), jnp.zeros((2, 1), jnp.int32)),
        )
        variables = model.init(jax.random.PRNGKey(0), batch, None, jax.random.PRNGKey(1))
        wm = WorldModel(model, variables)
        plan = (jnp.zeros((3, 2, 2), jnp.int32), jnp.zeros((3, 2, 1), jnp.int32))
        states, rewards = wm.rollout(batch, plan)
        assert states.shape == (3, 2, 16) and np.isfinite(np.asarray(states)).all()
