"""Config-driven behavior learning (mfvae_tpu/behavior.py).

End-to-end on a tiny simple_tag experiment: train a 2-epoch world model,
then run each imagination algorithm for a few updates through the config
surface, save/load the policy, and serve it.  The quality claims live in
the TPU studies (scripts/{imagination_policy,actor_critic,distill}_study
.py); these tests pin the plumbing.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfvae_tpu.behavior import (
    collect_start_states,
    load_policy,
    make_behavior_scores,
    resolve_plan_agents,
    save_policy,
    train_behavior,
)
from mfvae_tpu.config import ExperimentConfig
from mfvae_tpu.imagination import make_policy_actor
from mfvae_tpu.training.experiment import Experiment


@pytest.fixture(scope="module")
def tiny_exp(tmp_path_factory):
    cfg = ExperimentConfig()
    cfg.env.num_good_agents = 1
    cfg.env.num_adversaries = 2
    cfg.env.num_obs = 1
    cfg.env.max_steps = 16
    cfg.model.idx_features = 8
    cfg.model.obs_features = 8
    cfg.model.action_features = 8
    cfg.model.encoder_hidden = (16,)
    cfg.model.decoder_hidden = (32,)
    cfg.model.compute_dtype = "float32"
    cfg.buffer.max_size = 256
    cfg.buffer.min_size = 16
    cfg.buffer.batch_size = 16
    cfg.train.epoch_num = 2
    cfg.train.sample_num = 16
    cfg.train.train_num = 1
    cfg.train.test_num = 1
    cfg.train.test_sample_num = 8
    cfg.train.log_dir = str(tmp_path_factory.mktemp("behavior_logs"))
    cfg.train.run_name = "tiny_behavior"
    # behavior defaults scaled down for CPU
    cfg.behavior.updates = 3
    cfg.behavior.start_pool = 8
    cfg.behavior.start_burn_in = 2
    cfg.behavior.n_starts = 4
    cfg.behavior.n_rollouts = 2
    cfg.behavior.m_rollouts = 2
    cfg.behavior.horizon = 2
    cfg.behavior.visit_steps = 1
    cfg.behavior.hidden = (8,)
    cfg.validate()
    exp = Experiment(cfg).setup()
    exp.run()
    return exp


class TestConfig:
    def test_validate_rejects_bad_choices(self):
        for field, bad in (("algo", "ppo"), ("plan_agents", "prey"),
                           ("score", "novelty"), ("continuation", "cem")):
            cfg = ExperimentConfig()
            setattr(cfg.behavior, field, bad)
            with pytest.raises(ValueError):
                cfg.validate()

    def test_plan_agents_resolution(self, tiny_exp):
        assert resolve_plan_agents(tiny_exp, tiny_exp.cfg.behavior) == (0, 1)
        tiny_exp.cfg.behavior.plan_agents = "all"
        assert resolve_plan_agents(tiny_exp, tiny_exp.cfg.behavior) == (0, 1, 2)
        tiny_exp.cfg.behavior.plan_agents = "adversaries"


class TestScores:
    def test_prey_distance_matches_hand_slice(self, tiny_exp):
        bcfg = tiny_exp.cfg.behavior
        terminal, step = make_behavior_scores(tiny_exp, bcfg, (0, 1))
        # fabricate a states tensor with known adversary obs rows
        total = sum(
            tiny_exp.spec.obs_dims[i] for i in range(tiny_exp.spec.n_agents)
        )
        rng = np.random.default_rng(0)
        states = jnp.asarray(rng.normal(size=(3, 5, total)).astype(np.float32))
        rewards = jnp.zeros((3, 5, 3))
        out = np.asarray(terminal(states, rewards))
        assert out.shape == (5, 2)
        s = np.asarray(step(states, rewards))
        assert s.shape == (3, 5, 2)
        np.testing.assert_allclose(out, s.sum(0), rtol=1e-5)
        # hand-compute adversary 0's first-step min prey distance
        od = tiny_exp.spec.obs_dims[0]
        off = 4 + 2 * 1 + 2 * 1  # vel+pos, 1 obstacle, 1 other adversary
        rel = np.asarray(states)[0, :, :od][:, off : off + 2]
        d = np.sqrt((rel ** 2).sum(-1) + 1e-12)
        np.testing.assert_allclose(-s[0, :, 0], d, rtol=1e-4)

    def test_reward_score_uses_reward_columns(self, tiny_exp):
        bcfg = tiny_exp.cfg.behavior
        bcfg.score = "reward"
        terminal, step = make_behavior_scores(tiny_exp, bcfg, (0, 1))
        bcfg.score = "prey_distance"
        rewards = jnp.arange(2 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 3)
        states = jnp.zeros((2, 4, 10))
        np.testing.assert_allclose(
            np.asarray(terminal(states, rewards)),
            np.asarray(rewards[..., :2].sum(0)),
        )


class TestStartStates:
    def test_pool_shapes_for_each_collect_policy(self, tiny_exp):
        for cp in ("random", "pursuit", "sticky"):
            old = tiny_exp.cfg.train.collect_policy
            tiny_exp.cfg.train.collect_policy = cp
            pool = collect_start_states(tiny_exp, tiny_exp.cfg.behavior)
            tiny_exp.cfg.train.collect_policy = old
            assert pool[0].shape[0] == tiny_exp.cfg.behavior.start_pool
            assert np.isfinite(np.asarray(pool[0])).all()


class TestTrainAndServe:
    @pytest.mark.parametrize("algo", ["reinforce", "actor_critic", "distill"])
    def test_each_algo_trains_and_serves(self, tiny_exp, algo, tmp_path):
        tiny_exp.cfg.behavior.algo = algo
        result = train_behavior(tiny_exp, key=jax.random.PRNGKey(0))
        assert len(result.curve) >= 1
        last = {k: v for k, v in result.curve[-1].items() if k != "update"}
        assert np.isfinite(list(last.values())).all(), last
        if algo == "actor_critic":
            assert result.aux_params is not None
        # save -> load -> serve round trip
        path = str(tmp_path / f"{algo}.msgpack")
        save_policy(path, result, tiny_exp.cfg.behavior,
                    obs_dim=int(tiny_exp.spec.obs_dims[0]),
                    act_dim=int(tiny_exp.spec.act_dims[0]))
        policy, params, meta = load_policy(path)
        assert meta["algo"] == algo
        chex_equal = jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b), result.params,
            params,
        )
        del chex_equal
        actor = make_policy_actor(policy, params, tiny_exp.env,
                                  tiny_exp.spec, result.plan_agents)
        obs, _ = tiny_exp.env.reset_stacked(jax.random.PRNGKey(3))
        acts = actor(obs, jax.random.PRNGKey(4))
        assert acts.shape == (tiny_exp.spec.n_agents,)
        assert bool(jnp.all(acts >= 0))


class TestCentralized:
    def test_centralized_trains_saves_and_serves(self, tiny_exp, tmp_path):
        """behavior.centralized=true end to end: the policy input width is
        own row + flattened joint obs, the sidecar meta records the flag,
        and the loaded policy serves through the joint stacked obs."""
        from mfvae_tpu.imagination import make_obs_builder

        bcfg = tiny_exp.cfg.behavior
        bcfg.algo = "distill"
        bcfg.centralized = True
        try:
            result = train_behavior(tiny_exp, key=jax.random.PRNGKey(0))
            _, obs_dim = make_obs_builder(
                tiny_exp.spec, result.plan_agents, centralized=True
            )
            assert obs_dim == int(tiny_exp.spec.obs_dims[0]) + sum(
                tiny_exp.spec.obs_dims
            )
            path = str(tmp_path / "central.msgpack")
            save_policy(path, result, bcfg, obs_dim=obs_dim,
                        act_dim=int(tiny_exp.spec.act_dims[0]))
            policy, params, meta = load_policy(path)
            assert meta["centralized"] is True
            assert meta["obs_dim"] == obs_dim
            actor = make_policy_actor(
                policy, params, tiny_exp.env, tiny_exp.spec,
                result.plan_agents, centralized=True,
            )
            obs, _ = tiny_exp.env.reset_stacked(jax.random.PRNGKey(3))
            acts = actor(obs, jax.random.PRNGKey(4))
            assert acts.shape == (tiny_exp.spec.n_agents,)
            assert bool(jnp.all(acts >= 0))
        finally:
            bcfg.centralized = False
            bcfg.algo = "distill"


class TestImaginationCollection:
    def test_collect_policy_closes_the_dreamer_loop(self, tiny_exp, tmp_path):
        """Save a behavior policy, then run a FRESH experiment collecting
        with collect_policy='imagination:<path>' — the Dreamer iteration's
        data-collection leg."""
        tiny_exp.cfg.behavior.algo = "reinforce"
        result = train_behavior(tiny_exp, key=jax.random.PRNGKey(5))
        path = str(tmp_path / "iter_pol.msgpack")
        save_policy(path, result, tiny_exp.cfg.behavior,
                    obs_dim=int(tiny_exp.spec.obs_dims[0]),
                    act_dim=int(tiny_exp.spec.act_dims[0]))

        import copy

        cfg = copy.deepcopy(tiny_exp.cfg)
        cfg.train.collect_policy = f"imagination:{path}"
        cfg.train.collect_epsilon = 0.1
        cfg.train.log_dir = str(tmp_path / "logs")
        cfg.train.run_name = "imag_collect"
        cfg.validate()
        exp2 = Experiment(cfg).setup()
        exp2.run()
        # losses finite and buffer actually filled under the policy
        assert exp2.carry is not None
        size = int(exp2.carry.buffer_state.size)
        assert size >= cfg.train.sample_num * cfg.train.epoch_num

    def test_validate_accepts_and_rejects(self):
        cfg = ExperimentConfig()
        cfg.train.collect_policy = "imagination:/tmp/x.msgpack"
        cfg.validate()
        cfg.train.collect_policy = "dreamer:/tmp/x"
        with pytest.raises(ValueError):
            cfg.validate()


class TestMeta:
    def test_meta_sidecar_contents(self, tiny_exp, tmp_path):
        tiny_exp.cfg.behavior.algo = "reinforce"
        result = train_behavior(tiny_exp, key=jax.random.PRNGKey(1))
        path = str(tmp_path / "pol.msgpack")
        save_policy(path, result, tiny_exp.cfg.behavior, obs_dim=4, act_dim=5)
        meta = json.loads((tmp_path / "pol.msgpack.json").read_text())
        assert meta["plan_agents"] == [0, 1]
        assert meta["hidden"] == [8]
