"""Checkpointing.

The reference persists weights via Keras TF-Checkpoints and the architecture
separately via ``save_config`` JSON (reference README.md:179-195,
nif/model.py:466-480). Here: orbax ``PyTreeCheckpointer`` with async save,
keyed by step, plus the same config JSON — so checkpoint + config.json fully
reconstructs a model. Resumable: ``latest_step``/``restore`` support
continuing an interrupted run.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp

__all__ = ["Checkpointer", "FINAL_MARKER_OFFSET"]

#: Step offset used for the params-only "final" checkpoint a completed CLI
#: run saves after training (+L-BFGS). Keeps the final weights distinct from
#: the periodic full-state checkpoints in the same directory; `eval` reads
#: the latest step (the marker), while resume prefers the latest REAL step
#: below this offset (Trainer.init_or_restore).
FINAL_MARKER_OFFSET = 1_000_000


class Checkpointer:
    def __init__(self, directory: str, keep: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep, enable_async_checkpointing=True
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, params: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(params))

    def restore(self, step: Optional[int] = None, template: Any = None) -> Any:
        if step is None:
            step = self.latest_step()
            if step is None:
                raise FileNotFoundError(f"no checkpoints in {self.directory}")
        if template is not None:
            return self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return self._mgr.all_steps()

    def wait(self) -> None:
        """Block until async saves land on disk."""
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
