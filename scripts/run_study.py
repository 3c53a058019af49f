#!/usr/bin/env python
"""Persist a study's final JSON line as a committed results artifact.

Round-4 postmortem (VERDICT r4): ~21 study artifacts were lost to a
machine restart because study scripts print their JSON to stdout and the
redirected files were never committed.  This runner makes persistence part
of running a study: it streams the study's combined output, captures the
LAST stdout line that parses as a JSON object, and writes it — plus a
regeneration stamp recording the exact command and wall time — to the
results path PARITY.md cites.  Rule adopted in round 5: a study's JSON
lands in the same commit as its PARITY section.

Usage:
    python scripts/run_study.py results/r4/foo.json -- python scripts/foo_study.py [args...]
"""

import json
import subprocess
import sys
import threading
import time
from pathlib import Path


def main() -> int:
    try:
        sep = sys.argv.index("--")
    except ValueError:
        print(__doc__, file=sys.stderr)
        return 2
    artifact = Path(sys.argv[1])
    cmd = sys.argv[sep + 1 :]
    t0 = time.time()
    # stderr gets its OWN pipe: merging it into stdout (STDOUT) would let
    # unbuffered runtime warnings tear the study's final JSON line, which
    # is exactly the artifact-loss failure this wrapper exists to prevent
    proc = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True
    )
    assert proc.stderr is not None

    def _drain():
        for line in proc.stderr:
            sys.stderr.write(line)
            sys.stderr.flush()

    drain = threading.Thread(target=_drain, daemon=True)
    drain.start()
    last_json = None
    assert proc.stdout is not None
    for line in proc.stdout:
        sys.stdout.write(line)
        sys.stdout.flush()
        s = line.strip()
        if s.startswith("{") and s.endswith("}"):
            try:
                obj = json.loads(s)
            except json.JSONDecodeError:
                continue
            if isinstance(obj, dict):
                last_json = obj
    rc = proc.wait()
    drain.join(timeout=10)
    if rc != 0:
        print(f"[run_study] {cmd} exited {rc}; artifact NOT written",
              file=sys.stderr)
        return rc
    if last_json is None:
        print(f"[run_study] no JSON object line in output of {cmd}",
              file=sys.stderr)
        return 3
    last_json["_regen"] = {
        "cmd": " ".join(cmd),
        "wall_s": round(time.time() - t0, 1),
        "round": 5,
    }
    artifact.parent.mkdir(parents=True, exist_ok=True)
    artifact.write_text(json.dumps(last_json, indent=2) + "\n")
    print(f"[run_study] wrote {artifact} ({time.time() - t0:.0f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
