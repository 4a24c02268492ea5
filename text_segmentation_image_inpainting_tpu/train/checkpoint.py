"""Orbax checkpointing — the reference's crash-recovery story, upgraded.

Reference: ``torch.save`` every k steps, manual resume (SURVEY.md
section 5 "Failure detection"). Here: async Orbax checkpoints of the
full TrainState every N steps with retention, and restore-latest on
start — same capability (resume from last snapshot) with less loss and
no training stall during the save. Single-file model snapshots for
serving/export use ``models.base.save_model`` instead.
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper: save(step, state), restore_latest(template)."""

    def __init__(self, directory: str, *, max_to_keep: int = 3, save_interval_steps: int = 1):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                enable_async_checkpointing=True,
            ),
        )

    def save(self, step: int, state: Any) -> bool:
        return self._mgr.save(step, args=ocp.args.StandardSave(state))

    def restore_latest(self, template: Any) -> tuple[Any, int | None]:
        """Returns (state, step) — (template, None) if no checkpoint yet."""
        step = self._mgr.latest_step()
        if step is None:
            return template, None
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return restored, step

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
