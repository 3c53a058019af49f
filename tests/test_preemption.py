"""Preemption handling: SIGTERM mid-training checkpoints and exits cleanly;
a restarted process resumes from the saved epoch (SURVEY §5.3 — TPU pods
are preemptible; the reference has no recovery path of any kind)."""

import os
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
WORKER = Path(__file__).resolve().parent / "preempt_worker.py"


def _spawn(workdir):
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}{os.pathsep}" + env.get("PYTHONPATH", "")
    return subprocess.Popen(
        [sys.executable, str(WORKER), str(workdir)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=str(REPO),
    )


def test_sigterm_checkpoints_and_resumes(tmp_path):
    p = _spawn(tmp_path)
    # give it time to compile and enter the epoch loop, then preempt
    deadline = time.time() + 240
    while time.time() < deadline and p.poll() is None:
        time.sleep(5)
        if time.time() - deadline > -210:  # after ~30s, send the signal
            break
    assert p.poll() is None, p.communicate()[0]
    p.send_signal(signal.SIGTERM)
    out, _ = p.communicate(timeout=240)
    assert p.returncode == 0, out
    assert "preempted" in out, out
    assert "start_epoch=0" in out, out
    assert (tmp_path / "ckpt").exists()

    # restart: must resume from a positive epoch and keep going cleanly
    p2 = _spawn(tmp_path)
    time.sleep(20)
    p2.send_signal(signal.SIGTERM)
    out2, _ = p2.communicate(timeout=240)
    assert p2.returncode == 0, out2
    resumed = [l for l in out2.splitlines() if l.startswith("start_epoch=")]
    assert resumed and int(resumed[0].split("=")[1]) > 0, out2
