"""Checkpoint/resume built on orbax (reference: torch.save of model +
{iter, scheduler, optimizer} state, train_acc.py:96-110,174-191).

Retention reproduces the reference policy exactly
(train_acc.py:268,279-301,311):
- every validation overwrites a single `latest` checkpoint;
- a NUMBERED checkpoint is saved only on a new best validation EPE, and
  the numbered set is pruned oldest-first so that numbered + latest
  never exceeds `keep` (default 4 -> latest + the 3 most recent
  record-breaking checkpoints; four non-improving validations can never
  evict the best model);
- a `final` checkpoint is written when training completes.

Layout under <ckpt_dir>/: orbax step dirs `latest/<step>` (max_to_keep=1),
`best/<step>` (manually pruned), `final/<step>`.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 4):
        self.directory = os.path.abspath(directory)
        self.keep = keep
        os.makedirs(self.directory, exist_ok=True)
        opts = dict(create=True, enable_async_checkpointing=False)
        self._latest = ocp.CheckpointManager(
            os.path.join(self.directory, "latest"),
            options=ocp.CheckpointManagerOptions(max_to_keep=1, **opts),
        )
        self._best = ocp.CheckpointManager(
            os.path.join(self.directory, "best"),
            options=ocp.CheckpointManagerOptions(max_to_keep=None, **opts),
        )
        self._final = ocp.CheckpointManager(
            os.path.join(self.directory, "final"),
            options=ocp.CheckpointManagerOptions(max_to_keep=keep, **opts),
        )

    # -- saves ------------------------------------------------------------
    def save(self, step: int, state: Any) -> None:
        """The every-validation `latest` save (train_acc.py:268)."""
        self._latest.save(step, args=ocp.args.StandardSave(state))
        self._latest.wait_until_finished()

    def save_best(self, step: int, state: Any) -> None:
        """Numbered save on a new best EPE; prunes the OLDEST numbered
        checkpoints so numbered + latest <= keep (train_acc.py:291-301)."""
        self._best.save(step, args=ocp.args.StandardSave(state))
        self._best.wait_until_finished()
        steps = sorted(self._best.all_steps())
        while len(steps) + 1 > self.keep:
            self._best.delete(steps.pop(0))

    def save_final(self, step: int, state: Any) -> None:
        """End-of-training save (train_acc.py:311 `final.pth`)."""
        self._final.save(step, args=ocp.args.StandardSave(state))
        self._final.wait_until_finished()

    # -- queries / restore --------------------------------------------------
    def latest_step(self) -> Optional[int]:
        """Highest step across `latest` and `final` (a completed run's
        final save is newer than its last validation's latest save)."""
        steps = [
            s for s in (self._latest.latest_step(), self._final.latest_step())
            if s is not None
        ]
        return max(steps) if steps else None

    def best_steps(self) -> list:
        return sorted(self._best.all_steps())

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        """step=None -> the `latest` checkpoint (resume="auto"); an int ->
        that numbered step, looked up in best/ then latest/ then final/
        (reference resume loads `%06d.pth` by number, train_acc.py:27-32)."""
        if step is None:
            step = self.latest_step()
            if step is None:
                raise FileNotFoundError(f"no checkpoint in {self.directory}")
        for mgr in (self._best, self._latest, self._final):
            if step in mgr.all_steps():
                break
        else:
            raise FileNotFoundError(
                f"step {step} not found in {self.directory}"
            )
        return mgr.restore(step, args=ocp.args.StandardRestore(state_template))

    def close(self) -> None:
        self._latest.close()
        self._best.close()
        self._final.close()
