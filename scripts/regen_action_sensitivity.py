#!/usr/bin/env python
"""Regenerate results/r4/action_sensitivity.json: the three-arm probe.

The PARITY action-blindness chapter cites the action_effect_ratio of the
recipe (one-step), unroll-W8, and pursuit-trained models in one artifact;
action_sensitivity_probe.py measures one arm per invocation, so this
wrapper runs all three and merges (same arms, same probe, same keys).

Run on the TPU env: python scripts/regen_action_sensitivity.py [epochs]
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from mfvae_tpu.inference import WorldModel  # noqa: E402

from action_sensitivity_probe import build_arm, measure_action_sensitivity  # noqa: E402

ARMS = ("w1", "w8_clip10", "pursuitWM")


def main(epochs: int = 256):
    t0 = time.time()
    out = {"study": "action sensitivity (H=8 const plans)", "arms": {}}
    for arm in ARMS:
        exp = build_arm(arm, epochs)
        wm = WorldModel(exp.model, exp.carry.train_state.params)
        out["arms"][arm] = measure_action_sensitivity(exp, wm)
        print(f"[{time.time()-t0:.0f}s] {arm}: action_effect_ratio="
              f"{out['arms'][arm]['action_effect_ratio']}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
