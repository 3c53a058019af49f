"""Multi-host (DCN) smoke test: 2 jax.distributed CPU processes.

SURVEY §2.3 names multi-host as the TPU-native build target; this exercises
the init_distributed path (parallel/mesh.py) end-to-end by spawning two real
OS processes that form a 4-device global mesh (2 local devices each) and
psum one data-parallel MAVAE train step across the process boundary.
Runs in subprocesses so the in-process 8-device conftest backend is not
disturbed.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
WORKER = Path(__file__).resolve().parent / "dcn_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_dp_step():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}{os.pathsep}" + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=str(REPO),
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} rc={p.returncode}\n{out}"
        assert f"proc {pid}: OK" in out, out
        assert "mesh {'data': 4, 'model': 1}" in out, out
