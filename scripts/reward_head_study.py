#!/usr/bin/env python
"""The reward head as a PLANNING signal: scalar huber vs two-hot categorical.

The action-blindness chapter fixed state dynamics (PARITY.md round 4), but
reward-scored MPC stayed null even through the action-conditioned models —
the tag reward is +10-per-collision sparse (envs/mpe.py:50) and a scalar
huber head regresses it toward the near-zero conditional mean.  This study
isolates the reward head as the variable:

  1. train the action-conditioned recipe (sticky(0.9) + unroll W=8+clip10)
     twice — reward_head_mode='linear' (the reference structure) vs
     'twohot' (categorical over symlog bins, losses.twohot_bins);
  2. score one-step reward EVENT DETECTION on held-out trajectories
     (pursuit = contact-rich, sticky = the training process): ROC AUC of
     the predicted reward ranking true contact steps, plus the
     event-conditional mean prediction (does the head ever say "10"?);
  3. rerun reward-scored factorized MPC through both heads, same protocol
     and anchors as scripts/mpc_sticky_study.py, plus a distance-scored arm
     through the twohot model (does the new head cost state accuracy?).

Run on the TPU env: python scripts/reward_head_study.py [n_episodes]
[ep_len] [chunks] [epochs]
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from mfvae_tpu.inference import WorldModel  # noqa: E402
from mfvae_tpu.models.mavae import GroupedBatch  # noqa: E402
from mfvae_tpu.planning import eval_joint_policy, make_mpc_actor  # noqa: E402
from mfvae_tpu.rollout_eval import rollout_accuracy  # noqa: E402
from mfvae_tpu.training.trainer import make_action_sampler  # noqa: E402
from mfvae_tpu.envs.policies import make_collect_policy  # noqa: E402

from sticky_study import train_sticky  # noqa: E402

HORIZON = 8
N_CANDIDATES = 256
HOLD = 0.9


def one_step_reward_eval(exp, wm, policy: str, n_starts=256, T=64, key=None):
    """Collect [T, B] held-out transitions under ``policy`` and score the
    model's ONE-STEP reward prediction on the true (obs, action) pairs:
    ROC AUC of predicted-reward ranking of true contact events (adversary
    rows, true reward > 0), event/non-event conditional means, and huber."""
    env, spec = exp.env, exp.spec
    n_adv = exp.cfg.env.num_adversaries
    key = jax.random.PRNGKey(77) if key is None else key
    sample_actions, group_actions = make_action_sampler(env, spec)
    pol = (
        None
        if policy == "random"
        else make_collect_policy(
            env, spec, policy, 0.1, sample_actions, mix_frac=HOLD
        )
    )
    stateful = hasattr(pol, "init_carry")

    def one_traj(k):
        k_reset, k_run = jax.random.split(k)
        obs, state = env.reset_stacked(k_reset)
        pc = pol.init_carry() if stateful else ()

        def step(c, kt):
            obs_c, state_c, pc_c = c
            k_act, k_step = jax.random.split(kt)
            if pol is None:
                actions = sample_actions(k_act)
            elif stateful:
                pc_c, actions = pol.step(pc_c, obs_c, state_c, k_act)
            else:
                actions = pol(state_c, k_act)
            nobs, nstate, rewards, done, _ = env.step_stacked(
                k_step, state_c, actions
            )
            return (nobs, nstate, pc_c), (obs_c, actions, rewards)

        _, (obs_seq, act_seq, rew_seq) = jax.lax.scan(
            step, (obs, state, pc), jax.random.split(k_run, T)
        )
        return obs_seq, act_seq, rew_seq

    @jax.jit
    def collect_and_predict(k):
        obs_seq, act_seq, rew_seq = jax.vmap(one_traj)(
            jax.random.split(k, n_starts)
        )  # obs_seq: per-group [B, T, A_g, od]; act [B, T, A]; rew [B, T, A]
        obs_flat = tuple(o.reshape((-1,) + o.shape[2:]) for o in obs_seq)
        acts_flat = act_seq.reshape((-1,) + act_seq.shape[2:])
        _, pred_r = wm._predict(
            GroupedBatch(obs=obs_flat, actions=group_actions(acts_flat))
        )
        return pred_r, rew_seq.reshape((-1,) + rew_seq.shape[2:])

    pred_r, true_r = jax.device_get(collect_and_predict(key))
    # adversary rows only: the sparse +10-per-contact signal
    pred = np.asarray(pred_r[:, :n_adv]).ravel()
    true = np.asarray(true_r[:, :n_adv]).ravel()
    event = true > 0.5
    n_ev = int(event.sum())
    if n_ev == 0 or n_ev == len(event):
        auc = float("nan")
    else:
        order = np.argsort(pred, kind="mergesort")
        ranks = np.empty(len(pred))
        ranks[order] = np.arange(1, len(pred) + 1)
        auc = float(
            (ranks[event].sum() - n_ev * (n_ev + 1) / 2)
            / (n_ev * (len(event) - n_ev))
        )
    abs_err = np.abs(pred - true)
    quad = np.minimum(abs_err, 1.0)
    return {
        "n_rows": int(len(event)),
        "event_rate": float(event.mean()),
        "auc": auc,
        "pred_mean_on_event": float(pred[event].mean()) if n_ev else float("nan"),
        "pred_mean_off_event": float(pred[~event].mean()),
        "true_mean_on_event": float(true[event].mean()) if n_ev else float("nan"),
        "reward_huber": float(np.mean(0.5 * quad * quad + (abs_err - quad))),
    }


def main(n_episodes: int = 32, ep_len: int = 128, chunks: int = 4,
         epochs: int = 256):
    t0 = time.time()
    results = {"arms": {}, "detection": {}, "rollout": {}}

    # (head_mode, head_input) arms; checkpoint tags make re-runs resume
    ARMS = {
        "linear": ("linear", "latent", "_sticky90_w8_clip10"),
        "twohot": ("twohot", "latent", "_sticky90_w8_clip10_twohot"),
        "linear+predstate": (
            "linear", "pred_state", "_sticky90_w8_clip10_predstate"
        ),
        "twohot+predstate": (
            "twohot", "pred_state", "_sticky90_w8_clip10_twohot_predstate"
        ),
    }
    wms = {}
    for head, (mode, rinput, tag) in ARMS.items():
        exp = train_sticky(
            8, epochs, hold=HOLD, grad_clip=10.0, tag=tag, reward_head=mode,
            reward_input=rinput,
        )
        wm = WorldModel(exp.model, exp.carry.train_state.params)
        wms[head] = (exp, wm)
        print(f"[{time.time()-t0:.0f}s] trained {head}", flush=True)
        for pol in ("pursuit", "sticky"):
            det = one_step_reward_eval(exp, wm, pol)
            results["detection"][f"{head}|{pol}"] = det
            print(f"[{time.time()-t0:.0f}s] {head}|{pol}: {json.dumps(det)}",
                  flush=True)
        # standard open-loop accuracy (state cost of the new head, if any)
        for pol in ("random", "pursuit"):
            acc = rollout_accuracy(
                wm, exp.env, exp.spec, jax.random.PRNGKey(123),
                horizons=(1, 5, 25), n_starts=256, burn_in=32, policy=pol,
            )
            results["rollout"][f"{head}|{pol}"] = acc
            print(f"[{time.time()-t0:.0f}s] rollout {head}|{pol}: "
                  f"{json.dumps(acc)}", flush=True)

    # ---- MPC arms: reward-scored through both heads + dist through twohot
    exp, _ = wms["linear"]
    env, spec = exp.env, exp.spec
    n_adv = exp.cfg.env.num_adversaries
    n_good = exp.cfg.env.num_good_agents
    adv_idx = tuple(range(n_adv))
    is_adv = jnp.arange(spec.n_agents) < n_adv
    od_adv = spec.obs_dims[0]
    prey_off = 4 + 2 * exp.cfg.env.num_obs + 2 * (n_adv - 1)
    sample_actions, _ = make_action_sampler(env, spec)

    def _min_prey_dist(states):
        h, n = states.shape[:2]
        adv_obs = states[:, :, : n_adv * od_adv].reshape(h, n, n_adv, od_adv)
        rel = adv_obs[..., prey_off : prey_off + 2 * n_good].reshape(
            h, n, n_adv, n_good, 2
        )
        return jnp.min(jnp.sqrt(jnp.sum(rel * rel, axis=-1) + 1e-12), axis=-1)

    def dist_fact(states, rewards):
        return -jnp.sum(_min_prey_dist(states), axis=0)

    def arm_random(obs, state, key):
        return sample_actions(key)

    arms = {"random": arm_random}
    for name, (head, score, cmode) in {
        "mpc:rew_linear_rep": ("linear", None, "repeat"),
        "mpc:rew_twohot_rep": ("twohot", None, "repeat"),
        "mpc:rew_twohot_rand": ("twohot", None, "random"),
        "mpc:dist_twohot_rand": ("twohot", dist_fact, "random"),
        "mpc:rew_linps_rand": ("linear+predstate", None, "random"),
        "mpc:rew_2hps_rand": ("twohot+predstate", None, "random"),
        "mpc:dist_2hps_rand": ("twohot+predstate", dist_fact, "random"),
    }.items():
        actor = make_mpc_actor(
            wms[head][1], env, spec, horizon=HORIZON,
            n_candidates=N_CANDIDATES, plan_agents=adv_idx, score_fn=score,
            factorized=True, candidate_mode=cmode,
        )

        def arm_mpc(obs, state, key, actor=actor):
            k1, k2 = jax.random.split(key)
            return jnp.where(is_adv, actor(obs, k1), sample_actions(k2))

        arms[name] = arm_mpc

    for name, pol in arms.items():
        rets = []
        for c in range(chunks):
            rewards = eval_joint_policy(
                env, spec, pol, n_episodes=n_episodes, ep_len=ep_len,
                key=jax.random.PRNGKey(1234 + c),
            )
            rets.append(np.asarray(jnp.sum(rewards[:, :, :n_adv], axis=(1, 2))))
        adv_ret = np.concatenate(rets)
        results["arms"][name] = {
            "adv_return_mean": float(adv_ret.mean()),
            "adv_return_sem": float(adv_ret.std(ddof=1) / np.sqrt(len(adv_ret))),
            "n_episodes": int(len(adv_ret)),
        }
        print(f"[{time.time()-t0:.0f}s] {name}: "
              f"{json.dumps(results['arms'][name])}", flush=True)

    results.update({
        "study": "reward head as a planning signal (linear vs twohot)",
        "horizon": HORIZON, "n_candidates": N_CANDIDATES, "ep_len": ep_len,
        "hold": HOLD, "epochs": epochs,
    })
    out = Path(__file__).resolve().parents[1] / "results/r4/reward_head.json"
    out.write_text(json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:5]])
