"""Orbax-backed training checkpoints: async, sharded, crash-resumable.

The safetensors checkpoints in trainer.py are the MLX-interoperable surface;
this module is the production path for (multi-chip) training: the FULL train
state (params, optimizer moments, step, optional EMA) written asynchronously
with retention management, restorable with the original shardings.

SURVEY.md §5 notes the reference has no failure recovery at all and its resume
loses optimizer/schedule state; `latest_step` + `restore` here give exact
crash resume.
"""

from __future__ import annotations

from pathlib import Path

import jax
import orbax.checkpoint as ocp


class TrainCheckpointManager:
    """Thin wrapper over orbax.CheckpointManager for the trainer's state dict."""

    def __init__(self, directory: str | Path, max_to_keep: int = 3, async_save: bool = True):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            enable_async_checkpointing=async_save,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: dict) -> None:
        """Async save; returns immediately (pending writes finish in the
        background; call wait() or close() to block)."""
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def restore(self, step: int, abstract_state: dict) -> dict:
        """Restore into the structure/shardings of `abstract_state` (a state
        pytree, e.g. freshly initialized — its shardings are reused)."""
        target = jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract_state)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(target))

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def all_steps(self) -> list[int]:
        return list(self._mgr.all_steps())

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
