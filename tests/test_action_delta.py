"""model.action_delta_head: the direct action->own-obs-delta pathway.

Round-5 motivation: the oracle-decomposition control arm proved the
learned model is the ENTIRE planning gap (true-dynamics CEM = the
scripted oracle, results/r5/oracle_decomposition.json), so sharpening the
model's action response is the round's return lever.  This head gives
the optimizer a one-hop route from an agent's action embedding to its
own observation slice.  Pins: zero-init makes 'on' bit-identical to
'off' at initialization (reference parity is never silently disturbed);
the pathway routes each group's action embedding to exactly its own
agents' obs columns; training with the lever runs end-to-end.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mfvae_tpu.config import ExperimentConfig, ModelConfig
from mfvae_tpu.models.mavae import MAVAE
from __graft_entry__ import _flagship


def tiny_mc(**kw):
    return ModelConfig(
        idx_features=8, obs_features=8, action_features=8,
        encoder_hidden=(16,), action_encoder_hidden=(8,),
        decoder_hidden=(32,), compute_dtype="float32",
        residual_state=True, state_skip=True, decoder_layernorm=True,
        fused_decoders=False, **kw,
    )


class TestActionDeltaHead:
    def test_zero_init_is_identity(self):
        spec, _, inputs = _flagship(batch_size=4, tiny=True)
        m_off = MAVAE.from_config(tiny_mc(), spec)
        m_on = MAVAE.from_config(tiny_mc(action_delta_head=True), spec)
        p_off = m_off.init(
            jax.random.PRNGKey(0), inputs, None, jax.random.PRNGKey(1)
        )
        p_on = m_on.init(
            jax.random.PRNGKey(0), inputs, None, jax.random.PRNGKey(1)
        )
        o_off = m_off.apply(p_off, inputs, None, jax.random.PRNGKey(2))
        o_on = m_on.apply(p_on, inputs, None, jax.random.PRNGKey(2))
        np.testing.assert_array_equal(np.asarray(o_off[0]), np.asarray(o_on[0]))
        np.testing.assert_array_equal(np.asarray(o_off[1]), np.asarray(o_on[1]))

    def test_pathway_targets_own_group_columns(self):
        """Bumping ONLY group 0's delta-head kernel must change only the
        adversary block of the flat state (agent-order layout: group-0
        agents first on simple_tag), and leave rewards untouched."""
        spec, _, inputs = _flagship(batch_size=4, tiny=True)
        model = MAVAE.from_config(tiny_mc(action_delta_head=True), spec)
        params = model.init(
            jax.random.PRNGKey(0), inputs, None, jax.random.PRNGKey(1)
        )
        base_s, base_r, *_ = model.apply(
            params, inputs, None, jax.random.PRNGKey(2)
        )
        p2 = jax.tree.map(lambda x: x, params)
        k = p2["params"]["action_delta_head_0"]["kernel"]
        p2["params"]["action_delta_head_0"]["kernel"] = jnp.ones_like(k)
        s2, r2, *_ = model.apply(p2, inputs, None, jax.random.PRNGKey(2))
        n_adv_cols = 30 * spec.obs_dims[0]  # flagship: 30 adversaries first
        adv_changed = not np.allclose(
            np.asarray(s2[:, :n_adv_cols]), np.asarray(base_s[:, :n_adv_cols])
        )
        good_unchanged = np.array_equal(
            np.asarray(s2[:, n_adv_cols:]), np.asarray(base_s[:, n_adv_cols:])
        )
        assert adv_changed and good_unchanged
        np.testing.assert_array_equal(np.asarray(r2), np.asarray(base_r))

    def test_training_runs_with_lever(self, tmp_path):
        from mfvae_tpu.training.experiment import Experiment

        cfg = ExperimentConfig()
        cfg.env.num_good_agents = 1
        cfg.env.num_adversaries = 2
        cfg.env.num_obs = 1
        cfg.env.max_steps = 16
        cfg.model.idx_features = 8
        cfg.model.obs_features = 8
        cfg.model.action_features = 8
        cfg.model.encoder_hidden = (16,)
        cfg.model.action_encoder_hidden = (8,)
        cfg.model.decoder_hidden = (32,)
        cfg.model.compute_dtype = "float32"
        cfg.model.residual_state = True
        cfg.model.state_skip = True
        cfg.model.decoder_layernorm = True
        cfg.model.fused_decoders = False
        cfg.model.action_delta_head = True
        cfg.loss.s_weight = 300.0
        cfg.buffer.max_size = 64
        cfg.buffer.min_size = 16
        cfg.buffer.batch_size = 8
        cfg.train.epoch_num = 2
        cfg.train.sample_num = 16
        cfg.train.train_num = 3
        cfg.train.test_num = 2
        cfg.train.batch_size = 8
        cfg.train.unroll_steps = 4
        cfg.train.log_dir = str(tmp_path / "results")
        cfg.train.checkpoint_dir = ""
        result = Experiment(cfg).setup().run()
        assert np.isfinite(result["loss_train"])
