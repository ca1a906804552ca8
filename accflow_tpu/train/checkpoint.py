"""Checkpoint/resume built on orbax (reference: torch.save of model +
{iter, scheduler, optimizer} state, train_acc.py:96-110,174-191).

Layout under <ckpt_dir>/: orbax step directories; "latest" is the highest
step. Retention mirrors the reference's best-k policy: the engine saves a
`latest` checkpoint every validation and a numbered checkpoint on new best
EPE, pruning to `keep` numbered saves (train_acc.py:291-301).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 4):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True, enable_async_checkpointing=False
            ),
        )

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def close(self) -> None:
        self._mgr.close()
