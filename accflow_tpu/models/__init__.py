"""Model factory mirroring networks/__init__.py:4-23: substring dispatch on
the experiment/model name — "raft" -> RAFT, "gma" -> GMA (content-only
attention, 1 head, mixed precision), case-insensitive. Experiment names
like "Acc+RAFT-cvo" select the estimator the same way the reference's
configs do (train_acc.py:158)."""

from __future__ import annotations

import functools
from typing import Optional

import jax

from accflow_tpu.models.raft import RAFTConfig, init_raft, raft_forward  # noqa: F401
from accflow_tpu.models.gma import GMAConfig, init_gma, gma_forward  # noqa: F401
from accflow_tpu.models.accflow import (  # noqa: F401
    AccFlowConfig,
    accflow_forward,
    init_accflow,
)


class FlowEstimator:
    """A (config, init, forward) bundle for RAFT or GMA."""

    def __init__(self, name: str, cfg, init_fn, forward_fn):
        self.name = name
        self.cfg = cfg
        self._init = init_fn
        self._forward = forward_fn

    def init(self, key: jax.Array):
        return self._init(key, self.cfg)

    def forward(self, params, image1, image2, iters: Optional[int] = None,
                flow_init=None):
        return self._forward(params, image1, image2, self.cfg, iters, flow_init)

    def flow_fn(self, params):
        """Closure (i1, i2) -> final full-res flow, for AccFlow's frozen OFE."""
        def fn(image1, image2):
            return self._forward(params, image1, image2, self.cfg)["flow_up"]
        return fn


def build_flow_estimator(name: str, compute_dtype: str = "bfloat16") -> FlowEstimator:
    lname = name.lower()
    if "raft" in lname:
        cfg = RAFTConfig(compute_dtype=compute_dtype)
        return FlowEstimator(name, cfg, init_raft, raft_forward)
    if "gma" in lname:
        cfg = GMAConfig(compute_dtype=compute_dtype)
        return FlowEstimator(name, cfg, init_gma, gma_forward)
    raise NotImplementedError(f"unknown flow estimator: {name}")
