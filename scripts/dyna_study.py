#!/usr/bin/env python
"""Dyna sample-efficiency study (VERDICT r3 item 2b): does imagination help?

Model-free VDN vs Dyna-VDN (baselines/dyna.py: the flagship det128 world
model imagines H-step TD windows from the agent's real replay states under
its CURRENT policy) at an IDENTICAL real-env-step budget — same num_envs,
num_steps, num_updates, same seeds (paired).  The greedy-eval return curve
(test_return, measured every test_interval updates on held-out episodes) is
the sample-efficiency story: a Dyna arm above the baseline at update U got
more return out of the same U x num_envs x num_steps real transitions.

The world model is pre-trained separately (det128, mixture collection
pursuit@eps — the distribution closest to what an eps-greedy learner visits)
and FROZEN during Q-learning; its own collection budget is reported in the
output for honest accounting.

Reference anchor: the reference holds a world model (jax_ver/model.py:100-199)
and a Q-learner (jax_ver/baselines/QLearning/vdn.py) that never touch; this
is the framework's second end-to-end consumer of the model (the first is
learned-policy collection, scripts/policy_collection_study.py).

Run on the TPU env: python scripts/dyna_study.py [n_seeds] [wm_epochs]
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import numpy as np  # noqa: E402

from mfvae_tpu.baselines.dyna import make_dyna_train  # noqa: E402
from mfvae_tpu.baselines.vdn import VdnConfig, make_train  # noqa: E402
from mfvae_tpu.config import ExperimentConfig  # noqa: E402
from mfvae_tpu.inference import WorldModel  # noqa: E402
from mfvae_tpu.training.experiment import Experiment  # noqa: E402

TUNED = Path(__file__).resolve().parents[1] / "mfvae_tpu/baselines/config/vdn_tuned.yaml"

# (arm tag, imagine_weight, horizon); weight 0 = model-free baseline
ARMS = (("baseline", 0.0, 0), ("dyna_w0.3_h8", 0.3, 8), ("dyna_w1.0_h8", 1.0, 8))


def train_world_model(epochs: int, recipe: bool = False) -> Experiment:
    """det128 under mixture collection (pursuit@0.5) — shares the mixture
    study's checkpoint dir so the artifact is reused across studies.

    ``recipe=True`` swaps in the dynamics recipe (PARITY round 4:
    residual+skip+layernorm+unfused+s_weight — one-step state error 2.9x
    below persistence vs the absolute decoder's 60x above) with the SAME
    collection, isolating the world model's accuracy as the variable."""
    cfg = ExperimentConfig()
    cfg.model.det_features = 128
    if recipe:
        cfg.model.residual_state = True
        cfg.model.state_skip = True
        cfg.model.decoder_layernorm = True
        cfg.model.fused_decoders = False
        cfg.loss.s_weight = 300.0
    cfg.train.epoch_num = epochs
    cfg.train.collect_policy = "pursuit"
    cfg.train.collect_epsilon = 0.5
    cfg.train.epochs_per_dispatch = 32
    tag = "recipe_mix_eps0.5" if recipe else "mixture_mix_eps0.5"
    cfg.train.run_name = tag
    cfg.train.log_dir = "/tmp/mixture_results"
    cfg.train.checkpoint_dir = f"/tmp/ck_{tag}"
    cfg.train.resume = True
    exp = Experiment(cfg).setup()
    exp.run()
    return exp


def main(n_seeds: int = 8, wm_epochs: int = 256, recipe: int = 0):
    """recipe: 0 = absolute det128 (mixture collection), 1 = dynamics
    recipe (same collection), 2 = the ACTION-CONDITIONED model (sticky
    collection + unroll W=8+clip10, PARITY round 4 action-blindness
    chapter) — reuses the sticky_study checkpoint."""
    t0 = time.time()
    if recipe == 2:
        from sticky_study import train_sticky

        exp = train_world_model_sticky = train_sticky(
            8, wm_epochs, grad_clip=10.0, tag="_sticky_w8_clip10"
        )
    else:
        exp = train_world_model(wm_epochs, recipe=bool(recipe))
    wm = WorldModel(exp.model, exp.carry.train_state.params)
    print(f"[{time.time()-t0:.0f}s] world model ready", flush=True)

    cfg = VdnConfig.from_yaml(str(TUNED))
    cfg.test_interval = 50
    cfg.log_during_training = False
    rngs = jax.random.split(jax.random.PRNGKey(cfg.seed), n_seeds)  # paired

    # each vmapped seed carries a full [buffer_size_time, num_envs] replay in
    # HBM, so run seeds in chunks of 4 (8-at-once OOMs a v5e-1 alongside the
    # world model) — chunking keeps the seed pairing across arms exact
    chunk = 4
    per_update_env_steps = cfg.num_envs * cfg.num_steps
    curves = {}
    for tag, w, h in ARMS:
        if w == 0.0:
            train = make_train(cfg)
        else:
            train = make_dyna_train(cfg, wm, horizon=h, imagine_weight=w)
        train_v = jax.jit(jax.vmap(train))
        rows = []
        for c0 in range(0, n_seeds, chunk):
            out = train_v(rngs[c0 : c0 + chunk])
            rows.append(np.asarray(out["metrics"]["test_return"]))
            del out  # drop the final runners (buffers) before the next chunk
        tr = np.concatenate(rows, axis=0)  # [seeds, updates]
        curves[tag] = tr
        print(
            f"[{time.time()-t0:.0f}s] {tag}: final test_return "
            f"{tr[:, -1].mean():.2f} +/- {tr[:, -1].std(ddof=1):.2f}",
            flush=True,
        )

    # greedy-eval return at equal real-env budgets (paired seeds)
    checkpoints = [200, 500, 1000, cfg.num_updates - 1]
    table = {}
    for tag, tr in curves.items():
        row = {}
        for u in checkpoints:
            vals = tr[:, u]
            row[f"return@{(u + 1) * per_update_env_steps}steps"] = {
                "mean": round(float(vals.mean()), 3),
                "sem": round(float(vals.std(ddof=1) / np.sqrt(len(vals))), 3),
            }
        row["auc_mean"] = round(float(tr.mean()), 3)
        table[tag] = row

    # archive the raw curves so later analyses don't need a rerun
    np.savez(
        {0: "/tmp/dyna_curves.npz", 1: "/tmp/dyna_curves_recipe.npz",
         2: "/tmp/dyna_curves_sticky.npz"}[recipe],
        **{tag: tr for tag, tr in curves.items()},
    )

    # paired per-seed deltas vs baseline at every budget checkpoint plus
    # final and AUC (pairing uses the shared seeds, the highest-powered
    # test; sample efficiency is an EARLY-budget claim, so the early
    # checkpoints are the ones that matter)
    def paired(d):
        return {
            "mean": round(float(d.mean()), 3),
            "sem": round(float(d.std(ddof=1) / np.sqrt(len(d))), 3),
            "seeds_improved": int((d > 0).sum()),
        }

    deltas = {}
    for tag, tr in curves.items():
        if tag == "baseline":
            continue
        row = {
            f"delta@{(u + 1) * per_update_env_steps}steps": paired(
                tr[:, u] - curves["baseline"][:, u]
            )
            for u in checkpoints
        }
        row["auc_delta"] = paired(tr.mean(axis=1) - curves["baseline"].mean(axis=1))
        row["n_seeds"] = int(tr.shape[0])
        deltas[tag] = row

    print(json.dumps({
        "study": "Dyna-VDN vs model-free VDN, equal real-env budget",
        "n_seeds": n_seeds,
        "env_steps_per_update": per_update_env_steps,
        "num_updates": cfg.num_updates,
        "wm": {
            "recipe": int(recipe),
            "det_features": 128,
            "collection": "sticky@0.75" if recipe == 2 else "pursuit@eps0.5",
            "epochs": wm_epochs,
            "collect_env_steps_per_epoch": exp.cfg.train.sample_num,
        },
        "arms": table,
        "paired_final_deltas_vs_baseline": deltas,
    }))


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:]]
    main(*(a or [8]))
