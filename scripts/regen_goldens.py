"""Regenerate the pinned-run goldens for tests/test_pinned_goldens.py.

Runs the exact builders the regression test uses (small-population,
fixed-seed end-to-end runs on the CPU platform) and stores their final
train/test losses.  Run this ONLY after an intentional semantic change to
the parity path, and commit the refreshed JSON alongside that change.

Usage: python scripts/regen_goldens.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# Mirror tests/conftest.py EXACTLY — goldens must be produced under the
# same platform config the suite runs with (device count and matmul
# precision both move the numbers).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from tests.test_pinned_goldens import GOLDENS_PATH, golden_configs, run_one


def main():
    runs = {}
    for name, cfg in golden_configs("/tmp/regen_goldens").items():
        print(f"running {name} ...", flush=True)
        runs[name] = run_one(cfg)
        print(f"  {runs[name]}", flush=True)
    os.makedirs(os.path.dirname(GOLDENS_PATH), exist_ok=True)
    with open(GOLDENS_PATH, "w") as f:
        json.dump({"note": "regenerate with scripts/regen_goldens.py", "runs": runs}, f, indent=2)
        f.write("\n")
    print(f"wrote {GOLDENS_PATH}")


if __name__ == "__main__":
    main()
