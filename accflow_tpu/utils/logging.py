"""Logger + step timing (reference utils/util.py:68-153)."""

from __future__ import annotations

import logging
import os
import os.path as osp
import time
from datetime import datetime


def get_timestamp() -> str:
    return datetime.now().strftime("%y%m%d-%H%M%S")


def setup_logger(
    logger_name: str,
    root: str,
    phase: str,
    level=logging.INFO,
    screen: bool = True,
    tofile: bool = False,
) -> logging.Logger:
    lg = logging.getLogger(logger_name)
    formatter = logging.Formatter(
        "%(asctime)s.%(msecs)03d - %(levelname)s: %(message)s",
        datefmt="%y-%m-%d %H:%M:%S",
    )
    lg.setLevel(level)
    lg.propagate = False
    if tofile:
        os.makedirs(root, exist_ok=True)
        log_file = osp.join(root, phase + "_{}.log".format(get_timestamp()))
        fh = logging.FileHandler(log_file, mode="w")
        fh.setFormatter(formatter)
        lg.addHandler(fh)
    if screen:
        sh = logging.StreamHandler()
        sh.setFormatter(formatter)
        lg.addHandler(sh)
    return lg


def count_parameters(params) -> int:
    """Total parameter count of a param pytree (reference
    count_parameters, utils/util.py:89-92 — trainability is a property of
    the optimizer partition here, not the tree)."""
    import jax
    import numpy as np

    return int(sum(np.prod(x.shape) for x in jax.tree.leaves(params)))


class Timer:
    """Average step timer with reset (reference Timer, util.py:109-126)."""

    def __init__(self):
        self._last = None
        self._total = 0.0
        self._count = 0

    def tick(self) -> None:
        now = time.time()
        if self._last is not None:
            self._total += now - self._last
            self._count += 1
        self._last = now

    def get_average_and_reset(self) -> float:
        avg = self._total / max(self._count, 1)
        self._total = 0.0
        self._count = 0
        return avg


class ScopeTimer:
    def __init__(self, msg: str = "", logger=None):
        self.msg = msg
        self.logger = logger

    def __enter__(self):
        self.start = time.time()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.time() - self.start
        text = f"{self.msg}: {self.elapsed:.3f}s"
        if self.logger is not None:
            self.logger.info(text)
        else:
            print(text)
