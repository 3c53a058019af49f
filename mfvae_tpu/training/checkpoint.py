"""Checkpoint/resume — the reference's biggest aux-subsystem gap.

The reference only ever *saves* (three formats, no load path anywhere:
torch state_dict at torch_ver/main.py:111-112, pickled params at
jax_ver/main.py:239-240, safetensors in vdn.py:576-587) and loses optimizer
state, step counters, RNG, and buffer contents (SURVEY §5.4).  Here a
checkpoint is the FULL training pytree — params, opt state, step, PopArt
stats, replay buffer state (optional), epoch index — written with orbax
(async-capable, the idiomatic preemption-survival path on TPU pods) and
restorable into an exact resume.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


class NullCheckpointManager:
    """Checkpointing disabled (train.checkpoint_dir='').  Same surface as
    CheckpointManager; save/wait/close are no-ops, restore finds nothing.
    Without this, an empty directory resolved to the CWD and step dirs
    like ./1 appeared wherever the process ran."""

    directory = None

    def save(self, step, payload) -> None:
        pass

    def restore(self, step=None, like=None):
        return None

    def latest_step(self):
        return None

    def wait(self):
        pass

    def close(self):
        pass


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3, async_save: bool = True):
        assert directory, (
            "CheckpointManager needs a directory; use NullCheckpointManager "
            "(train.checkpoint_dir='') to disable checkpointing"
        )
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        opts = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            enable_async_checkpointing=async_save,
        )
        self._mgr = ocp.CheckpointManager(str(self.directory), options=opts)

    def save(self, step: int, payload: Dict[str, Any]) -> None:
        """payload: arbitrary pytree dict, e.g.
        {'train_state': ..., 'buffer_state': ..., 'epoch': ...}."""
        self._mgr.save(step, args=ocp.args.StandardSave(payload))

    def restore(self, step: Optional[int] = None, like: Optional[Dict[str, Any]] = None):
        """Restore `step` (default: latest).  `like` provides the pytree
        structure/shape/dtype template for exact-typed restoration."""
        if step is None:
            step = self.latest_step()
        if step is None:
            return None
        if like is not None:
            template = jax.tree.map(ocp.utils.to_shape_dtype_struct, like)
            return self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()
