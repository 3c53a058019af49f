#!/usr/bin/env bash
# Launch surface parity with the reference's run.sh (XLA mem fraction + main):
# reference jax_ver/run.sh:1-2.
export XLA_PYTHON_CLIENT_MEM_FRACTION=${XLA_PYTHON_CLIENT_MEM_FRACTION:-.5}
exec python main.py "$@"
