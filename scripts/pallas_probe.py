#!/usr/bin/env python
"""Targeted Pallas experiment (VERDICT r2 item 8): measure the fused
reparam+KL+huber kernel path vs XLA fusion at a size where fusion should
pay most — det_features=128 (the shipped quality config: the latent tail
mu/logvar/det tensors are largest) at b256 and b4096.

Outcome recorded in PARITY.md: if XLA still wins at every shipped size,
the Pallas chapter closes as "measured, not needed at any shipped size".

Run on the TPU env: python scripts/pallas_probe.py
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from perf_matrix import measure  # noqa: E402

from mfvae_tpu.config import ModelConfig  # noqa: E402


def main():
    rows = []
    for b in (256, 4096):
        for pallas in (False, True):
            rows.append(
                measure(
                    ModelConfig(det_features=128, use_pallas=pallas),
                    b,
                    n_scan=200,
                    label=f"det128_b{b}_{'pallas' if pallas else 'xla'}",
                )
            )
    print(json.dumps({"pallas_probe": rows}))


if __name__ == "__main__":
    main()
