"""TensorBoard logging (the reference ships a tbLogger wrapper,
utils/util.py:156-172, but leaves it commented out at its call sites; this
one works and the engines accept it optionally)."""

from __future__ import annotations

from typing import Dict, Optional


class TBLogger:
    def __init__(self, log_dir: str):
        try:
            from torch.utils.tensorboard import SummaryWriter  # type: ignore

            self._writer = SummaryWriter(log_dir)
        except Exception:
            try:
                from tensorboardX import SummaryWriter  # type: ignore

                self._writer = SummaryWriter(log_dir)
            except Exception:
                self._writer = None
        self._step = 0

    def set_step(self, step: int) -> None:
        self._step = step

    def step(self) -> None:
        self._step += 1

    def write_dict(self, scalars: Dict[str, float], step: Optional[int] = None) -> None:
        if self._writer is None:
            return
        s = self._step if step is None else step
        for k, v in scalars.items():
            self._writer.add_scalar(k, float(v), s)

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
