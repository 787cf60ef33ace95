"""Orbax checkpoint save/restore with auto-resume.

Replaces the reference's HF-Trainer + ZeRO-3 checkpointing
(safe_save_model_for_hf_trainer, train_mt.py:223-266; auto-resume glob at
train_mt.py:1177-1180).  Sharded params save/restore natively via orbax.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import orbax.checkpoint as ocp


class CheckpointManager:
    """step-numbered checkpoints: <dir>/checkpoint-<step>/{params,opt_state}."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, step_prefix="checkpoint"
            ),
        )

    def save(self, step: int, params, opt_state) -> None:
        self._mgr.save(
            step,
            args=ocp.args.Composite(
                params=ocp.args.StandardSave(params),
                opt_state=ocp.args.StandardSave(opt_state),
            ),
        )
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore_latest(self, params_like, opt_state_like) -> Optional[Tuple]:
        """Restore the newest checkpoint with the given pytrees as shape/
        sharding templates. Returns (params, opt_state, step) or None."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                params=ocp.args.StandardRestore(params_like),
                opt_state=ocp.args.StandardRestore(opt_state_like),
            ),
        )
        return restored["params"], restored["opt_state"], int(step)
