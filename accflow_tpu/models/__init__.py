"""Model factory mirroring networks/__init__.py:4-23: substring dispatch on
the experiment/model name — "raft" -> RAFT, "gma" -> GMA (content-only
attention, 1 head, mixed precision), case-insensitive. Experiment names
like "Acc+RAFT-cvo" select the estimator the same way the reference's
configs do (train_acc.py:158)."""

from __future__ import annotations

from typing import Optional

import jax

from accflow_tpu.models.raft import (  # noqa: F401
    RAFTConfig,
    init_raft,
    raft_encode_frame,
    raft_flow_pairs_from_features,
    raft_forward,
    raft_pairs_forward,
)
from accflow_tpu.models.gma import (  # noqa: F401
    GMAConfig,
    gma_encode_frame,
    gma_flow_pairs_from_features,
    gma_forward,
    gma_pairs_forward,
    init_gma,
)
from accflow_tpu.models.accflow import (  # noqa: F401
    AccFlowConfig,
    accflow_forward,
    init_accflow,
)


class FlowEstimator:
    """A (config, init, forward) bundle for RAFT or GMA."""

    def __init__(self, name: str, cfg, init_fn, forward_fn,
                 pairs_forward_fn=None, encode_frame_fn=None,
                 pairs_from_features_fn=None):
        self.name = name
        self.cfg = cfg
        self._init = init_fn
        self._forward = forward_fn
        self._pairs_forward = pairs_forward_fn
        self._encode_frame = encode_frame_fn
        self._pairs_from_features = pairs_from_features_fn

    def init(self, key: jax.Array):
        return self._init(key, self.cfg)

    def forward(self, params, image1, image2, iters: Optional[int] = None,
                flow_init=None, final_only: bool = False, train: bool = False):
        """train=True = torch model.train() semantics: the context
        encoder's BatchNorm normalizes with batch statistics and stashes
        running-stat updates (harvest with nn.layers.collect_bn_updates
        inside the same trace)."""
        return self._forward(
            params, image1, image2, self.cfg, iters, flow_init, final_only,
            train,
        )

    def pairs_fn(self, params, iters=None, final_only: bool = True):
        """Closure (frames, src_idx, dst_idx) -> (P*N, H, W, 2) flows with
        deduplicated frame encoding, for AccFlow's fused-OFE path."""
        if self._pairs_forward is None:
            return None

        def fn(frames, src_idx, dst_idx):
            return self._pairs_forward(
                params, frames, src_idx, dst_idx, self.cfg,
                iters=iters, final_only=final_only,
            )

        return fn

    def encode_frame_fn(self, params):
        """Closure (image_batch) -> cacheable per-frame features
        ({fmap, net, inp}) for the streaming carry (streaming.py)."""
        def fn(image, train: bool = False):
            return self._encode_frame(params, image, self.cfg, train)
        return fn

    def pairs_from_features_fn(self, params, iters=None,
                               final_only: bool = True):
        """Closure (src_feats, dst_fmaps, flow_init=None) -> (P*N, H, W, 2)
        flows from precomputed features — the streaming step's OFE call
        (1 fnet + 1 cnet per NEW frame; cached maps for the rest)."""
        def fn(src, dst_fmaps, flow_init=None):
            return self._pairs_from_features(
                params, src, dst_fmaps, self.cfg, iters=iters,
                flow_init=flow_init, final_only=final_only,
            )
        return fn

    def flow_fn(self, params):
        """Closure (i1, i2, flow_init=None) -> final full-res flow, for
        AccFlow's frozen OFE (final_only: skips the 11 unused
        per-iteration upsamples). flow_init: optional (N, H/8, W/8, 2)
        warm start (AccFlowConfig.warm_start)."""
        def fn(image1, image2, flow_init=None):
            return self._forward(
                params, image1, image2, self.cfg, None, flow_init, True
            )["flow_up"]
        return fn


def _cfg_for(cls, other_cls, compute_dtype, overrides):
    """Build `cls` from overrides, DROPPING keys that are valid fields of
    the other estimator's config only (cross-model knobs like attn_chunk
    pass through call sites untouched) and rejecting keys neither config
    knows (typos still fail loudly)."""
    import dataclasses

    mine = {f.name for f in dataclasses.fields(cls)}
    theirs = {f.name for f in dataclasses.fields(other_cls)}
    unknown = set(overrides) - mine - theirs
    if unknown:
        raise TypeError(
            f"unknown {cls.__name__} override(s): {sorted(unknown)}"
        )
    kept = {k: v for k, v in overrides.items() if k in mine}
    return cls(compute_dtype=compute_dtype, **kept)


def build_flow_estimator(
    name: str, compute_dtype: str = "bfloat16", **cfg_overrides
) -> FlowEstimator:
    """Substring dispatch mirroring networks/__init__.py:4-23. Extra kwargs
    override RAFTConfig/GMAConfig fields (e.g. corr_volume_dtype, iters);
    fields specific to the *other* estimator (e.g. attn_chunk on a RAFT
    build) are ignored so callers can thread one knob set through."""
    lname = name.lower()
    if "raft" in lname:
        cfg = _cfg_for(RAFTConfig, GMAConfig, compute_dtype, cfg_overrides)
        return FlowEstimator(name, cfg, init_raft, raft_forward,
                             raft_pairs_forward, raft_encode_frame,
                             raft_flow_pairs_from_features)
    if "gma" in lname:
        cfg = _cfg_for(GMAConfig, RAFTConfig, compute_dtype, cfg_overrides)
        return FlowEstimator(name, cfg, init_gma, gma_forward,
                             gma_pairs_forward, gma_encode_frame,
                             gma_flow_pairs_from_features)
    raise NotImplementedError(f"unknown flow estimator: {name}")
