#!/usr/bin/env python
"""Entry point — the reference's `python main.py` surface
(jax_ver/main.py, launched by run.sh) with a real config system instead of
hardcoded constants.

    python main.py                      # reference-default hyperparameters
    python main.py cfg.yaml             # load a YAML config
    python main.py train.lr=3e-4 ...    # dotted-path overrides
"""

import sys

from mfvae_tpu.config import ExperimentConfig, apply_overrides, load_config


def parse_args(argv):
    cfg_path = None
    overrides = []
    for a in argv:
        if "=" in a:
            overrides.append(a)
        elif a.endswith((".yaml", ".yml")):
            cfg_path = a
        else:
            raise SystemExit(f"unrecognized argument {a!r}")
    cfg = load_config(cfg_path) if cfg_path else ExperimentConfig()
    if overrides:
        apply_overrides(cfg, overrides)
    return cfg


def main():
    cfg = parse_args(sys.argv[1:])
    from mfvae_tpu.training.experiment import run_experiment

    result = run_experiment(cfg)
    print(result)


if __name__ == "__main__":
    main()
