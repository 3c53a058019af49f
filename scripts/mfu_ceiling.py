#!/usr/bin/env python
"""Framework MFU ceiling — what utilization the stack reaches once the
model is NOT the reference architecture.

The parity model's 64-wide decoder bottleneck caps MXU utilization
(PARITY.md); these rows measure the same train step on progressively
less-bottlenecked (non-parity) shapes at b4096 to show the ceiling is the
reference's architecture, not the framework.  Scan-of-steps discipline,
real syncs (see bench.py header).

Run on the TPU env: python scripts/mfu_ceiling.py
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
    B = 4096
    rows.append(measure(ModelConfig(), B, n_scan=100, label="reference_arch"))
    rows.append(
        measure(
            ModelConfig(decoder_hidden=(1024, 512, 512, 512, 1024)),
            B, n_scan=100, label="no_bottleneck_512",
        )
    )
    rows.append(
        measure(
            ModelConfig(decoder_hidden=(2048, 1024, 1024, 1024, 2048)),
            B, n_scan=100, label="wide_2048",
        )
    )
    rows.append(
        measure(
            ModelConfig(
                idx_features=128, obs_features=128, action_features=128,
                encoder_hidden=(256, 256, 512),
                decoder_hidden=(4096, 2048, 2048, 2048, 4096),
            ),
            B, n_scan=50, label="big_4096",
        )
    )
    print(json.dumps({"mfu_ceiling": rows}))


if __name__ == "__main__":
    main()
