"""Self-play imagination (round 5 stretch): both teams trained as
imagination policies against each other inside the same world model.

Stub-level convergence tests mirror tests/test_imagination.py's pattern:
a frozen-state stub WM with action-dependent rewards lets each claim be
checked deterministically — team gradients are isolated (training one
team never changes the other's params or flows gradient through it), and
alternating best-response moves each team toward its own payoff,
including through an INTERACTIVE payoff (pursuit-evasion in miniature:
the adversary wants action agreement, the prey wants disagreement).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mfvae_tpu.imagination import (
    make_selfplay_rollout,
    make_selfplay_trainer,
)
from mfvae_tpu.models.mavae import (
    AgentSpec,
    agent_order_concat,
    state_to_grouped,
)


class StubEnv:
    discrete_actions = True


def two_team_spec():
    agents = ("adversary_0", "adversary_1", "adversary_2", "agent_0")
    return AgentSpec.from_dicts(
        agents,
        {a: 6 for a in agents[:3]} | {"agent_0": 4},
        {a: 5 for a in agents},
    )


class StubWM:
    """Frozen-state WM: adversaries are paid for action 3, the prey is
    paid for action 1 — independent payoffs, so each team's convergence
    is attributable to its own update."""

    def __init__(self, spec):
        self.spec = spec

        def _predict(batch):
            acts_a = batch.actions[0]  # [B, 3]
            acts_b = batch.actions[1]  # [B, 1]
            rew_a = jnp.where(acts_a == 3, 1.0, 0.0)
            rew_b = jnp.where(acts_b == 1, 1.0, 0.0)
            rew = jnp.concatenate([rew_a, rew_b], axis=1)
            return agent_order_concat(spec, batch.obs), rew

        self._predict = _predict
        self._state_to_grouped = lambda s: state_to_grouped(spec, s)


class InteractiveStubWM:
    """Pursuit-evasion in miniature: adversary i is paid when its action
    MATCHES the prey's; the prey is paid per adversary it MISmatches,
    plus a small intrinsic preference for action 1 (weaker than the
    mismatch payoff) so the game has a predictable best-response cycle:
    vs a uniform adversary the prey settles on 1, the adversary then
    learns to match 1, and the retrained prey must abandon 1 to escape."""

    def __init__(self, spec):
        self.spec = spec

        def _predict(batch):
            acts_a = batch.actions[0]  # [B, 3]
            acts_b = batch.actions[1]  # [B, 1]
            match = (acts_a == acts_b).astype(jnp.float32)  # [B, 3]
            rew_b = jnp.sum(1.0 - match, axis=1, keepdims=True) + 0.5 * (
                acts_b == 1
            ).astype(jnp.float32)
            rew = jnp.concatenate([match, rew_b], axis=1)
            return agent_order_concat(spec, batch.obs), rew

        self._predict = _predict
        self._state_to_grouped = lambda s: state_to_grouped(spec, s)


def starts(S, key):
    ks = jax.random.split(key, 2)
    return (
        jax.random.normal(ks[0], (S, 3, 6)),
        jax.random.normal(ks[1], (S, 1, 4)),
    )


def score_a(states, rewards):
    return jnp.sum(rewards[..., :3], axis=0)  # [B, 3]


def score_b(states, rewards):
    return jnp.sum(rewards[..., 3:], axis=0)  # [B, 1]


class TestSelfplayRollout:
    def test_shapes_and_gradient_isolation(self):
        spec = two_team_spec()
        wm = StubWM(spec)
        rollout = make_selfplay_rollout(wm, StubEnv(), spec, horizon=4)
        pa, pb, init_fn, _, _ = make_selfplay_trainer(
            wm, StubEnv(), spec, score_a, score_b, horizon=4, n_rollouts=2
        )
        obs_g = starts(6, jax.random.PRNGKey(0))
        (params_a, _), (params_b, _) = init_fn(
            jax.random.PRNGKey(1), obs_g[0][0, 0], obs_g[1][0, 0]
        )
        states, rewards, (lp_a, en_a), (lp_b, en_b) = rollout(
            params_a, pa.apply, params_b, pb.apply, obs_g,
            jax.random.PRNGKey(2),
        )
        assert states.shape == (4, 6, 3 * 6 + 4)
        assert rewards.shape == (4, 6, 4)
        assert lp_a.shape == (4, 6, 3) and lp_b.shape == (4, 6, 1)

        # gradient isolation: team B's logp carries no gradient wrt A
        def b_loss(p_a):
            _, _, _, (lp_b2, _) = rollout(
                p_a, pa.apply, params_b, pb.apply, obs_g,
                jax.random.PRNGKey(2),
            )
            return jnp.sum(lp_b2)

        g = jax.grad(b_loss)(params_a)
        assert all(
            float(jnp.abs(x).max()) == 0.0 for x in jax.tree.leaves(g)
        )


class TestSelfplayTrainer:
    def _train(self, wm_cls, updates_each=60, rounds=2):
        spec = two_team_spec()
        wm = wm_cls(spec)
        pa, pb, init_fn, upd_a, upd_b = make_selfplay_trainer(
            wm, StubEnv(), spec, score_a, score_b,
            horizon=4, n_rollouts=8, learning_rate=3e-3, hidden=(32,),
        )
        obs_g = starts(16, jax.random.PRNGKey(0))
        (params_a, opt_a), (params_b, opt_b) = init_fn(
            jax.random.PRNGKey(1), obs_g[0][0, 0], obs_g[1][0, 0]
        )
        key = jax.random.PRNGKey(3)
        hist = {"a": [], "b": []}
        for r in range(rounds):
            for u in range(updates_each):
                key, k = jax.random.split(key)
                params_a, opt_a, m = upd_a(params_a, opt_a, params_b,
                                           obs_g, k)
            hist["a"].append(float(m["score_mean"]))
            for u in range(updates_each):
                key, k = jax.random.split(key)
                params_b, opt_b, m = upd_b(params_b, opt_b, params_a,
                                           obs_g, k)
            hist["b"].append(float(m["score_mean"]))
        return params_a, params_b, hist, (pa, pb, obs_g)

    def test_independent_payoffs_both_converge(self):
        params_a, params_b, hist, (pa, pb, obs_g) = self._train(StubWM)
        # adversaries learn action 3: score -> ~4 (H=4 steps x reward 1)
        assert hist["a"][-1] > 3.0, hist
        # prey learns action 1
        assert hist["b"][-1] > 3.0, hist
        logits_a = pa.apply(params_a, obs_g[0])
        assert int(np.bincount(
            np.asarray(jnp.argmax(logits_a, -1)).ravel(), minlength=5
        ).argmax()) == 3
        logits_b = pb.apply(params_b, obs_g[1])
        assert int(np.bincount(
            np.asarray(jnp.argmax(logits_b, -1)).ravel(), minlength=5
        ).argmax()) == 1

    def test_interactive_payoff_best_response(self):
        """Best-response cycle through the interactive payoff: the prey
        settles on its preferred action, the adversaries learn to MATCH
        it (score far above the chance 0.8/agent), and the retrained prey
        then escapes — the frozen adversaries' match score collapses."""
        spec = two_team_spec()
        wm = InteractiveStubWM(spec)
        pa, pb, init_fn, upd_a, upd_b = make_selfplay_trainer(
            wm, StubEnv(), spec, score_a, score_b,
            horizon=4, n_rollouts=8, learning_rate=3e-3, hidden=(32,),
        )
        obs_g = starts(16, jax.random.PRNGKey(0))
        (params_a, opt_a), (params_b, opt_b) = init_fn(
            jax.random.PRNGKey(1), obs_g[0][0, 0], obs_g[1][0, 0]
        )
        key = jax.random.PRNGKey(3)

        def train(side, n):
            nonlocal params_a, opt_a, params_b, opt_b, key
            for u in range(n):
                key, k = jax.random.split(key)
                if side == "a":
                    params_a, opt_a, m = upd_a(
                        params_a, opt_a, params_b, obs_g, k)
                else:
                    params_b, opt_b, m = upd_b(
                        params_b, opt_b, params_a, obs_g, k)
            return m

        def a_match_score():
            rollout = make_selfplay_rollout(wm, StubEnv(), spec, horizon=4)
            _, rewards, _, _ = rollout(
                params_a, pa.apply, params_b, pb.apply,
                tuple(jnp.repeat(o, 8, axis=0) for o in obs_g),
                jax.random.PRNGKey(9),
            )
            return float(jnp.mean(score_a(None, rewards)))

        train("b", 60)  # prey settles on its preferred action 1
        train("a", 80)  # adversaries learn to match it
        a1 = a_match_score()
        assert a1 > 2.0, a1  # per-agent over H=4: chance 0.8, max 4
        train("b", 80)  # prey must abandon 1 to escape
        a2 = a_match_score()
        assert a2 < 0.6 * a1, (a1, a2)
