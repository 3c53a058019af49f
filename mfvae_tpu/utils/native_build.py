"""Build-and-load helper for first-party native (C++) components.

The framework's native runtime pieces (host ring buffer, host MPE physics
engine) are single-file C++ cores compiled on first use with g++ and loaded
through ctypes — the reference's native layer is third-party (cpprb's
Cython/C++ ring, torch's CUDA kernels); ours is first-party and
dependency-free.

Artifacts are keyed on a content hash of the source so a fresh clone (or a
checkout with equal mtimes) never loads a stale or foreign-arch binary;
``native/build/`` is gitignored and rebuilt on demand.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_BUILD_LOCK = threading.Lock()
_LOAD_CACHE: dict = {}


def load_cached(source_name: str) -> Optional[ctypes.CDLL]:
    """Once-per-process build_and_load, cached by source name (None results
    cached too, so a missing toolchain is probed once)."""
    if source_name not in _LOAD_CACHE:
        _LOAD_CACHE[source_name] = build_and_load(source_name)
    return _LOAD_CACHE[source_name]


def build_and_load(source_name: str) -> Optional[ctypes.CDLL]:
    """Compile ``native/<source_name>`` to a shared object (content-hash
    cached under ``native/build/``) and load it.  Returns None when the
    source is missing, the toolchain is unavailable, or the build fails —
    callers fall back to their pure-numpy paths."""
    src = NATIVE_DIR / source_name
    if not src.exists():
        return None
    digest = hashlib.sha256(src.read_bytes()).hexdigest()[:12]
    stem = src.stem
    so_path = NATIVE_DIR / "build" / f"lib{stem}-{digest}.so"
    with _BUILD_LOCK:
        if not so_path.exists():
            so_path.parent.mkdir(parents=True, exist_ok=True)
            # per-process tmp name: two PROCESSES (the lock is per-process)
            # racing on one tmp path could install a truncated .so under the
            # digest name forever
            tmp = so_path.with_suffix(f".so.tmp.{os.getpid()}")
            cmd = [
                "g++", "-O3", "-march=native", "-std=c++17", "-shared",
                "-fPIC", "-pthread", str(src), "-o", str(tmp),
            ]
            try:
                subprocess.run(cmd, check=True, capture_output=True)
                tmp.replace(so_path)
            except (subprocess.CalledProcessError, FileNotFoundError):
                return None
    try:
        return ctypes.CDLL(str(so_path))
    except OSError:
        return None
