"""Metrics sink: TensorBoard writer with the reference's exact tag names.

Tags match jax_ver/main.py:191-194 (Loss/Train, Loss/State_Train,
Loss/Reward_Train, Loss/KL_Train) and :232-235 (the *_Test variants) so
existing TensorBoard dashboards keep working.  Falls back to a JSONL writer
when tensorboardX is unavailable.
"""

from __future__ import annotations

import json
import time
from datetime import datetime
from pathlib import Path
from typing import Optional

from mfvae_tpu.models.losses import LossOutputs

try:
    from tensorboardX import SummaryWriter

    _HAVE_TBX = True
except ImportError:  # pragma: no cover
    _HAVE_TBX = False


class MetricsLogger:
    def __init__(self, log_dir: str, run_name: str = ""):
        if not run_name:
            run_name = f"run_{datetime.now().strftime('%Y-%m-%d-%H:%M:%S')}"
        self.run_dir = Path(log_dir) / run_name
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self._tb = SummaryWriter(str(self.run_dir)) if _HAVE_TBX else None
        self._jsonl = open(self.run_dir / "metrics.jsonl", "a")

    def scalar(self, tag: str, value: float, step: int):
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        self._jsonl.write(
            json.dumps({"tag": tag, "value": float(value), "step": int(step), "ts": time.time()})
            + "\n"
        )

    def losses(self, outs: LossOutputs, step: int, suffix: str = "Train"):
        """Write the reference's four per-phase tags."""
        self.scalar(f"Loss/{suffix}", float(outs.loss), step)
        self.scalar(f"Loss/State_{suffix}", float(outs.s_loss), step)
        self.scalar(f"Loss/Reward_{suffix}", float(outs.r_loss), step)
        self.scalar(f"Loss/KL_{suffix}", float(outs.kl_loss), step)

    def flush(self):
        if self._tb is not None:
            self._tb.flush()
        self._jsonl.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()
        self._jsonl.close()


class WandbLogger:
    """Optional wandb sink (the reference's VDN logs through wandb via
    jax.debug.callback, vdn.py:420-436,555-568).  Degrades to a no-op with
    one warning when wandb isn't installed, so configs carrying wandb
    settings still run (mode='disabled' parity with the reference YAML)."""

    def __init__(self, project: str = "mfvae_tpu", mode: str = "disabled", **init_kwargs):
        self._run = None
        if mode == "disabled":
            return
        try:
            import wandb

            self._run = wandb.init(project=project, mode=mode, **init_kwargs)
        except ImportError:
            print("wandb not installed; WandbLogger is a no-op")

    def log(self, metrics: dict, step: Optional[int] = None):
        if self._run is not None:
            self._run.log(metrics, step=step)

    def finish(self):
        if self._run is not None:
            self._run.finish()
