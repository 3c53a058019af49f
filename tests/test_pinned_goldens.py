"""Pinned-number regression for the parity training path.

Round-3's canonical-parity check (`r3_canonical_head`, Loss/Test 2.120 at
the 40-agent scale) was a manually-run artifact; a refactor could silently
move the parity path between benched runs.  This promotes it into the
suite: two small fixed-seed end-to-end runs (the reference-semantics
parity config and the det-features quality config) are pinned against
stored goldens.

The suite runs on CPU (tests/conftest.py forces the platform), where the
runs are deterministic; the tolerance absorbs only compiler-revision
drift, not semantic change — any edit to the loss family, RNG plumbing,
collection scan, PopArt, or optimizer wiring moves these numbers far
beyond it.

Regenerate after an INTENTIONAL semantic change with
``python scripts/regen_goldens.py`` (runs the same builders) and commit
the JSON alongside the change that moved it.
"""

import json
import os

import pytest

from mfvae_tpu.config import ExperimentConfig
from mfvae_tpu.training.experiment import Experiment

GOLDENS_PATH = os.path.join(os.path.dirname(__file__), "goldens", "pinned_runs.json")


def golden_configs(tmp_root="/tmp/pinned_goldens"):
    """name -> ExperimentConfig for every pinned run.  Small population,
    short horizon, but the REAL epoch program end-to-end (collect ->
    train -> test-collect -> eval) on the default parity semantics."""

    def base(name):
        cfg = ExperimentConfig()
        cfg.env.num_good_agents = 2
        cfg.env.num_adversaries = 3
        cfg.env.num_obs = 2
        cfg.env.max_steps = 64
        cfg.model.compute_dtype = "float32"
        cfg.buffer.max_size = 512
        cfg.buffer.min_size = 32
        cfg.buffer.batch_size = 32
        cfg.train.batch_size = 32
        cfg.train.epoch_num = 8
        cfg.train.sample_num = 32
        cfg.train.train_num = 5
        cfg.train.test_num = 8
        cfg.train.seed = 0
        cfg.train.log_dir = f"{tmp_root}/{name}/results"
        cfg.train.checkpoint_dir = f"{tmp_root}/{name}/ckpt"
        return cfg

    parity = base("parity_small")  # default = reference jax-family semantics

    det = base("det_small")  # the quality path (RSSM det/stoch split)
    det.model.det_features = 16

    popart = base("popart_small")  # torch-family + PopArt head path
    popart.loss.family = "torch"
    popart.train.mode = "POPART"
    popart.model.reward_head_init = "popart"

    return {"parity_small": parity, "det_small": det, "popart_small": popart}


def run_one(cfg: ExperimentConfig) -> dict:
    exp = Experiment(cfg).setup()
    result = exp.run()
    return {
        "loss_train": float(result["loss_train"]),
        "loss_test": float(result["loss_test"]),
    }


@pytest.fixture(scope="module")
def goldens():
    assert os.path.exists(GOLDENS_PATH), (
        f"{GOLDENS_PATH} missing — run scripts/regen_goldens.py"
    )
    with open(GOLDENS_PATH) as f:
        return json.load(f)


@pytest.mark.parametrize("name", ["parity_small", "det_small", "popart_small"])
def test_pinned_run(name, goldens, tmp_path):
    assert name in goldens["runs"], f"no golden for {name}; regenerate"
    cfg = golden_configs(str(tmp_path))[name]
    got = run_one(cfg)
    want = goldens["runs"][name]
    for key in ("loss_train", "loss_test"):
        assert got[key] == pytest.approx(want[key], rel=5e-3), (
            f"{name}.{key}: got {got[key]:.6f}, golden {want[key]:.6f} — "
            "the parity path moved; if intentional, rerun "
            "scripts/regen_goldens.py and commit the new goldens"
        )
