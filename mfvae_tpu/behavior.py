"""Config-driven behavior learning: the Dreamer loop as one command.

Every imagination capability measured in round 4 (PARITY.md) — REINFORCE,
TD(λ) actor-critic, enumerated+CRN planner distillation — reachable from
the same config tree as world-model training:

    python -m mfvae_tpu.behavior examples/behavior_policy.yaml \
        behavior.updates=500 behavior.save_path=/tmp/policy.msgpack

runs (or resumes, via train.checkpoint_dir + train.resume) the world-model
experiment, trains the configured policy entirely inside the model's
imagination, saves servable policy params, and optionally scores real-env
return against the uniform-random anchor.  The reference's closest
artifact is a pickle that nothing ever loads (jax_ver/main.py:239-240).

Serving: ``load_policy(path)`` -> (policy, params) rebuilds the network
from the sidecar meta; ``imagination.make_policy_actor`` turns it into a
joint-action actor for eval_joint_policy / collection.
"""

from __future__ import annotations

import json
import sys
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from mfvae_tpu.config import BehaviorConfig, load_config
from mfvae_tpu.imagination import (
    PolicyMLP,
    make_actor_critic_trainer,
    make_distillation_trainer,
    make_imagination_trainer,
    make_obs_builder,
    make_policy_actor,
)
from mfvae_tpu.inference import WorldModel


@dataclass
class BehaviorResult:
    policy: PolicyMLP
    params: Any  # policy params (the 'pi' tree for actor_critic)
    aux_params: Any  # critic params for actor_critic, else None
    plan_agents: Tuple[int, ...]
    curve: list


def resolve_plan_agents(exp, bcfg: BehaviorConfig) -> Tuple[int, ...]:
    """'adversaries' -> the env's adversary-team prefix (agents 0..n_adv-1
    in every scenario family here); 'all' -> every agent.  Counted from
    the env's OWN agent names, not cfg.env.num_adversaries — scenarios
    like simple_adversary fix their adversary count and ignore the config
    knob (envs/mpe.py make() drops non-field kwargs)."""
    if bcfg.plan_agents == "all":
        return tuple(range(exp.spec.n_agents))
    n_adv = sum(1 for a in exp.env.agents if a.startswith("adversary"))
    if n_adv <= 0:
        raise ValueError(
            "behavior.plan_agents='adversaries' but env "
            f"{exp.cfg.env.name!r} has no adversary_* agents; use "
            "plan_agents='all'"
        )
    assert all(
        exp.env.agents[i].startswith("adversary") for i in range(n_adv)
    ), "adversaries must be the leading agent prefix"
    return tuple(range(n_adv))


def make_behavior_scores(exp, bcfg: BehaviorConfig, plan_idx):
    """(terminal_score_fn, step_score_fn) over imagined (states, rewards).

    'reward': the model's predicted-reward columns (env-agnostic).
    'prey_distance': the measured simple_tag planning signal — negative
    min distance to any prey, read from each adversary's own predicted
    observation rows (PARITY.md: the reward head is near-chance on sparse
    contacts; the distance potential is where the planning gains live)."""
    idx = jnp.asarray(plan_idx)
    if bcfg.score == "reward":
        def terminal(states, rewards):
            return jnp.sum(rewards[..., idx], axis=0)

        def step(states, rewards):
            return rewards[..., idx]

        return terminal, step

    if "tag" not in exp.cfg.env.name:
        raise ValueError(
            "behavior.score='prey_distance' is a simple_tag objective; "
            f"got env {exp.cfg.env.name!r} — use score='reward'"
        )
    n_adv = int(exp.cfg.env.num_adversaries)
    n_good = int(exp.cfg.env.num_good_agents)
    od_adv = exp.spec.obs_dims[0]
    prey_off = 4 + 2 * int(exp.cfg.env.num_obs) + 2 * (n_adv - 1)
    if not all(int(i) < n_adv for i in plan_idx):
        raise ValueError(
            "prey_distance scores adversaries only; plan_agents includes "
            "non-adversary indices — use score='reward' or "
            "plan_agents='adversaries'"
        )

    def _min_prey_dist(states):
        h, n = states.shape[:2]
        adv_obs = states[:, :, : n_adv * od_adv].reshape(h, n, n_adv, od_adv)
        rel = adv_obs[..., prey_off : prey_off + 2 * n_good].reshape(
            h, n, n_adv, n_good, 2
        )
        d = jnp.min(jnp.sqrt(jnp.sum(rel * rel, axis=-1) + 1e-12), axis=-1)
        return d[..., idx]  # [H, B, P]

    def terminal(states, rewards):
        return -jnp.sum(_min_prey_dist(states), axis=0)

    def step(states, rewards):
        return -_min_prey_dist(states)

    return terminal, step


def collect_start_states(exp, bcfg: BehaviorConfig, key=None):
    """Real start observations from the experiment's OWN collection
    process (train.collect_policy) after burn-in — imagination trains on
    the state distribution the world model was trained on, no new data
    regime."""
    from mfvae_tpu.envs.policies import make_collect_policy
    from mfvae_tpu.training.trainer import make_action_sampler

    env, spec, cfg = exp.env, exp.spec, exp.cfg
    key = jax.random.PRNGKey(4242) if key is None else key
    sample_actions, _ = make_action_sampler(env, spec)
    cp = cfg.train.collect_policy
    pol = None
    if cp != "random" and not cp.startswith("vdn:"):
        pol = make_collect_policy(
            env, spec, cp, cfg.train.collect_epsilon, sample_actions,
            mix_frac=cfg.train.collect_mix_frac,
        )

    def one(k):
        k_reset, k_run = jax.random.split(k)
        obs, state = env.reset_stacked(k_reset)
        if pol is None:
            def step(c, kt):
                obs_c, state_c = c
                k_act, k_step = jax.random.split(kt)
                acts = sample_actions(k_act)
                nobs, nstate, *_ = env.step_stacked(k_step, state_c, acts)
                return (nobs, nstate), None

            (obs, state), _ = jax.lax.scan(
                step, (obs, state), jax.random.split(k_run, bcfg.start_burn_in)
            )
            return obs
        if callable(pol) and not hasattr(pol, "init_carry"):
            # stateless scripted policy: (env_state, key) -> actions
            def step(c, kt):
                obs_c, state_c = c
                k_act, k_step = jax.random.split(kt)
                acts = pol(state_c, k_act)
                nobs, nstate, *_ = env.step_stacked(k_step, state_c, acts)
                return (nobs, nstate), None

            (obs, state), _ = jax.lax.scan(
                step, (obs, state), jax.random.split(k_run, bcfg.start_burn_in)
            )
            return obs
        pc = pol.init_carry()

        def step(c, kt):
            obs_c, state_c, pc_c = c
            k_act, k_step = jax.random.split(kt)
            pc_c, acts = pol.step(pc_c, obs_c, state_c, k_act)
            nobs, nstate, *_ = env.step_stacked(k_step, state_c, acts)
            return (nobs, nstate, pc_c), None

        (obs, state, _), _ = jax.lax.scan(
            step, (obs, state, pc), jax.random.split(k_run, bcfg.start_burn_in)
        )
        return obs

    return jax.jit(jax.vmap(one))(jax.random.split(key, bcfg.start_pool))


def train_behavior(
    exp,
    key=None,
    progress: Optional[Callable[[int, dict], None]] = None,
) -> BehaviorResult:
    """Train exp.cfg.behavior's policy inside exp's trained world model.

    ``exp`` is a set-up (and trained or checkpoint-resumed) Experiment;
    the world model is exp.carry.train_state.params.  Returns servable
    policy params + the metric curve."""
    bcfg: BehaviorConfig = exp.cfg.behavior
    if bcfg.algo == "distill" and not exp.cfg.env.discrete_actions:
        raise ValueError(
            "behavior.algo='distill' needs discrete actions (the "
            "enumerated teacher enumerates a finite action set); use "
            "'reinforce' or 'actor_critic' for continuous envs"
        )
    key = jax.random.PRNGKey(7) if key is None else key
    wm = WorldModel(exp.model, exp.carry.train_state.params)
    plan_idx = resolve_plan_agents(exp, bcfg)
    terminal, step_score = make_behavior_scores(exp, bcfg, plan_idx)
    hidden = tuple(int(h) for h in bcfg.hidden)

    if bcfg.algo == "reinforce":
        policy, init_fn, update_fn = make_imagination_trainer(
            wm, exp.env, exp.spec, plan_idx, score_fn=terminal,
            horizon=bcfg.horizon, n_rollouts=bcfg.n_rollouts,
            learning_rate=bcfg.learning_rate,
            entropy_coef=bcfg.entropy_coef, hidden=hidden,
            centralized=bcfg.centralized,
        )
    elif bcfg.algo == "actor_critic":
        policy, _value, init_fn, update_fn = make_actor_critic_trainer(
            wm, exp.env, exp.spec, plan_idx, step_score_fn=step_score,
            horizon=bcfg.horizon, n_rollouts=bcfg.n_rollouts,
            learning_rate=bcfg.learning_rate,
            entropy_coef=bcfg.entropy_coef, value_coef=bcfg.value_coef,
            gamma=bcfg.gamma, lam=bcfg.lam, hidden=hidden,
            target_ema=bcfg.target_ema, critic_symlog=bcfg.critic_symlog,
            bootstrap_tail=bcfg.bootstrap_tail,
            critic_time_feature=bcfg.critic_time_feature,
            centralized=bcfg.centralized,
        )
    else:  # distill
        policy, init_fn, update_fn = make_distillation_trainer(
            wm, exp.env, exp.spec, plan_idx, score_fn=terminal,
            horizon=bcfg.horizon, visit_steps=bcfg.visit_steps,
            learning_rate=bcfg.learning_rate, hidden=hidden,
            teacher_mode="enumerated", m_rollouts=bcfg.m_rollouts,
            continuation=bcfg.continuation, temperature=bcfg.temperature,
            centralized=bcfg.centralized,
        )

    pool = collect_start_states(exp, bcfg, jax.random.fold_in(key, 0))
    params, opt = init_fn(jax.random.fold_in(key, 1), pool[0][0, 0])
    curve = []
    for i in range(bcfg.updates):
        k_i = jax.random.fold_in(key, 100 + i)
        rows = jax.random.choice(
            jax.random.fold_in(k_i, 1), pool[0].shape[0],
            (min(bcfg.n_starts, bcfg.start_pool),), replace=False,
        )
        obs_starts = tuple(o[rows] for o in pool)
        params, opt, m = update_fn(params, opt, obs_starts, k_i)
        if i % 100 == 0 or i == bcfg.updates - 1:
            m = {k: float(v) for k, v in jax.device_get(m).items()}
            curve.append({"update": i, **m})
            if progress is not None:
                progress(i, m)

    if bcfg.algo == "actor_critic":
        return BehaviorResult(policy, params["pi"], params["v"],
                              plan_idx, curve)
    return BehaviorResult(policy, params, None, plan_idx, curve)


# --------------------------------------------------------------- save/load
def save_policy(path: str, result: BehaviorResult, bcfg: BehaviorConfig,
                obs_dim: int, act_dim: int) -> None:
    """Policy params as flax msgpack + a .json sidecar with the network
    shape, so load_policy can rebuild without the training config."""
    import flax.serialization

    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_bytes(flax.serialization.to_bytes(result.params))
    from mfvae_tpu.imagination import GaussianPolicyMLP

    meta = {
        "hidden": [int(h) for h in bcfg.hidden],
        "act_dim": int(act_dim),
        "obs_dim": int(obs_dim),
        "algo": bcfg.algo,
        "continuous": isinstance(result.policy, GaussianPolicyMLP),
        "plan_agents": [int(i) for i in result.plan_agents],
        # centralized policies need the joint obs built at serving time
        # (make_policy_actor centralized=True); obs_dim above is already
        # the centralized input width when set
        "centralized": bool(bcfg.centralized),
    }
    p.with_suffix(p.suffix + ".json").write_text(json.dumps(meta))


def load_policy(path: str) -> Tuple[Any, Any, dict]:
    """Rebuild (policy, params, meta) from save_policy's artifacts."""
    import flax.serialization

    from mfvae_tpu.imagination import GaussianPolicyMLP

    p = Path(path)
    meta = json.loads(p.with_suffix(p.suffix + ".json").read_text())
    cls = GaussianPolicyMLP if meta.get("continuous") else PolicyMLP
    policy = cls(hidden=tuple(meta["hidden"]), act_dim=meta["act_dim"])
    template = policy.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, meta["obs_dim"]))
    )
    params = flax.serialization.from_bytes(template, p.read_bytes())
    return policy, params, meta


# --------------------------------------------------------------------- cli
def run(cfg_path: Optional[str], overrides) -> dict:
    from mfvae_tpu.config import ExperimentConfig, apply_overrides
    from mfvae_tpu.training.experiment import Experiment

    if cfg_path is None:
        cfg = ExperimentConfig()
        apply_overrides(cfg, list(overrides))
    else:
        cfg = load_config(cfg_path, list(overrides))
    cfg.validate()
    exp = Experiment(cfg).setup()
    exp.run()
    bcfg = cfg.behavior

    def progress(i, m):
        print(f"behavior update {i}: " +
              " ".join(f"{k}={v:.4f}" for k, v in m.items()), flush=True)

    result = train_behavior(exp, progress=progress)
    out = {
        "algo": bcfg.algo,
        "updates": bcfg.updates,
        "plan_agents": len(result.plan_agents),
        "final": result.curve[-1] if result.curve else {},
    }
    if bcfg.save_path:
        _, policy_obs_dim = make_obs_builder(
            exp.spec, result.plan_agents, bcfg.centralized
        )
        save_policy(
            bcfg.save_path, result, bcfg,
            obs_dim=int(policy_obs_dim),
            act_dim=int(exp.spec.act_dims[0]),
        )
        out["save_path"] = bcfg.save_path
    if bcfg.eval_episodes > 0:
        from mfvae_tpu.planning import eval_joint_policy
        from mfvae_tpu.training.trainer import make_action_sampler
        import numpy as np

        sample_actions, _ = make_action_sampler(exp.env, exp.spec)
        actor = make_policy_actor(
            result.policy, result.params, exp.env, exp.spec,
            result.plan_agents, greedy=False,
            centralized=bcfg.centralized,
        )
        idx = jnp.asarray(result.plan_agents)
        is_plan = jnp.zeros((exp.spec.n_agents,), bool).at[idx].set(True)

        def arm_pol(obs, state, k):
            k1, k2 = jax.random.split(k)
            return jnp.where(is_plan, actor(obs, k1), sample_actions(k2))

        def arm_rand(obs, state, k):
            return sample_actions(k)

        for name, arm in (("policy", arm_pol), ("random", arm_rand)):
            rew = eval_joint_policy(
                exp.env, exp.spec, arm, n_episodes=bcfg.eval_episodes,
                ep_len=bcfg.eval_ep_len, key=jax.random.PRNGKey(1234),
            )
            ret = np.asarray(jnp.sum(rew[..., idx], axis=(1, 2)))
            out[f"eval_{name}_return_mean"] = float(ret.mean())
            out[f"eval_{name}_return_sem"] = float(
                ret.std(ddof=1) / max(np.sqrt(len(ret)), 1)
            )
    print(json.dumps(out))
    return out


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    cfg_path = None
    overrides = []
    for a in argv:
        if "=" in a and not a.endswith((".yaml", ".yml")):
            overrides.append(a)
        elif cfg_path is None:
            cfg_path = a
        else:
            raise SystemExit(f"unexpected argument {a!r}")
    run(cfg_path, overrides)


if __name__ == "__main__":
    main()
