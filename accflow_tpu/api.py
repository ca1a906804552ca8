"""High-level inference API: optical flow on raw frames in three calls.

The reference repo has no Python inference surface — its models are only
reachable through the benchmark scripts (test_cvo.py:132-166), so a user
estimating flow on their own frames must hand-assemble normalization,
/8 padding, the estimator call, and unpadding. `FlowPipeline` packages
that protocol (the exact preprocess of test_cvo.py:32-50 and the
InputPadder of networks/raft/utils/utils.py:7-28) behind one object:

    from accflow_tpu import FlowPipeline

    pipe = FlowPipeline.from_checkpoint(
        "acc+raft", acc_ckpt="checkpoints/acc+raft-things.pth")
    flow  = pipe.pair_flow(img1, img2)      # (H, W, 2) float32
    flows = pipe.pairs(frames)              # (T-1, H, W, 2) f_{i->i+1}
    longf = pipe.long_range(frames)         # (T-2, H, W, 2) F_{i->0}

    pipe = FlowPipeline.from_artifact("acc_raft_512.sflow")  # StableHLO
    longf = pipe.long_range(frames)         # no model code/ckpt needed

    stream = pipe2.stream()                 # stateful per-frame serving
    for frame in video:                     # (accflow_tpu/streaming.py)
        flow = stream.send(frame)           # F_{i,0}, warm-started

Frames are HWC uint8/float RGB in [0, 255] (a leading batch or time axis
is accepted); pass `normalized=True` if they are already scaled to the
protocol's [-1, 1]. Any size works — inputs are replicate-padded to
/8-divisible dims and outputs unpadded, and the default
`corr_lookup="auto"` / `attn_chunk=-1` switch to the volume-free memory
modes past the HBM budget, so resolution is unbounded.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _as_frames(images, normalized: bool, expect: str) -> tuple[np.ndarray, bool]:
    """Coerce user images to (T_or_N, ..., H, W, 3) float32 in [-1, 1].

    `expect` is "one" (a single image; returns (1, H, W, 3)) or "many"
    (a sequence: list of HWC images, a (T, H, W, 3) stack, or a
    (T, N, H, W, 3) batched stack). Returns (array, had_batch_axis).
    """
    if isinstance(images, (list, tuple)):
        arrs = [np.asarray(a) for a in images]
        shapes = {a.shape for a in arrs}
        if len(shapes) != 1:
            raise ValueError(f"frames disagree in shape: {sorted(shapes)}")
        images = np.stack(arrs, axis=0)
    a = np.asarray(images)
    if a.ndim == 2:  # single grayscale
        a = a[..., None]
    if a.shape[-1] == 1:  # grayscale -> RGB, like cli/demo.py
        a = np.concatenate([a] * 3, axis=-1)
    if a.shape[-1] == 4:  # drop alpha
        a = a[..., :3]
    if a.shape[-1] != 3:
        raise ValueError(f"expected channels-last RGB images, got shape {a.shape}")

    if expect == "one":
        if a.ndim == 3:
            a, batched = a[None], False
        elif a.ndim == 4:
            batched = True
        else:
            raise ValueError(f"expected one (N)HWC image, got shape {a.shape}")
    else:
        if a.ndim == 3:
            raise ValueError(
                f"expected a SEQUENCE of frames, got one HWC image {a.shape}; "
                "pass a list or a (T, H, W, 3) stack"
            )
        if a.ndim == 4:
            a, batched = a[:, None], False
        elif a.ndim == 5:
            batched = True
        else:
            raise ValueError(f"expected (T[, N], H, W, 3) frames, got {a.shape}")

    a = a.astype(np.float32)
    if not normalized and a.size:
        # Guard the classic footguns: float frames in [0, 1]
        # (matplotlib/skimage convention) or already in [-1, 1] would be
        # silently crushed to ~-1 by the [0, 255] preprocess.
        amin, amax = float(a.min()), float(a.max())
        if amin < 0.0:
            raise ValueError(
                f"float frames span [{amin:.3g}, {amax:.3g}] — they look "
                "already normalized; pass normalized=True"
            )
        if amax <= 1.0 and np.issubdtype(np.asarray(images).dtype, np.floating):
            raise ValueError(
                f"float frames span [{amin:.3g}, {amax:.3g}] — they look "
                "[0, 1]-scaled; scale to [0, 255] or pass normalized=True "
                "for [-1, 1] input"
            )
        a = 2.0 * (a / 255.0) - 1.0  # test_cvo.py:32-50 preprocess
    elif not normalized:
        a = 2.0 * (a / 255.0) - 1.0
    return a, batched


class FlowPipeline:
    """Ready-to-call optical-flow inference over a flow estimator (RAFT or
    GMA) and, when accumulator weights are present, the AccFlow long-range
    accumulation. Build with `from_checkpoint` / `from_artifact` (or pass
    params you already hold to the constructor)."""

    def __init__(self, est, params, acc_params=None, acfg=None,
                 iters: int = 12):
        self.est = est
        self.params = params
        self.acc_params = acc_params
        self.acfg = acfg
        self.iters = iters

    def _est_with_iters(self, iters: Optional[int]):
        """A FlowEstimator clone whose cfg.iters is `iters` (flow_fn and
        pairs_fn read the config default)."""
        import copy
        import dataclasses

        if iters is None or iters == self.est.cfg.iters:
            return self.est
        est = copy.copy(self.est)
        est.cfg = dataclasses.replace(self.est.cfg, iters=iters)
        return est

    # -- construction -----------------------------------------------------

    @classmethod
    def from_checkpoint(
        cls,
        model_name: str = "raft",
        ofe_ckpt: Optional[str] = None,
        acc_ckpt: Optional[str] = None,
        compute_dtype: str = "bfloat16",
        iters: int = 12,
        corr_lookup: str = "auto",
        attn_chunk: int = -1,
        **cfg_overrides,
    ) -> "FlowPipeline":
        """Build from released .pth checkpoints (converted on the fly) or
        pre-converted .npz trees — exactly what the CLIs accept.

        model_name uses the reference's substring dispatch
        (networks/__init__.py:4-23): "raft"/"gma" picks the estimator;
        an "acc" prefix (e.g. "acc+raft") or an `acc_ckpt` enables
        long_range(). With no checkpoint the weights are random-init
        (useful for smoke tests only)."""
        import jax

        from accflow_tpu.models import build_flow_estimator
        from accflow_tpu.models.accflow import AccFlowConfig, init_accflow

        cfg_overrides.setdefault("iters", iters)  # one knob for both the
        # explicit calls below and anything staged off est.cfg (e.g. a
        # serving export of this pipeline's estimator)
        est = build_flow_estimator(
            model_name, compute_dtype=compute_dtype,
            corr_lookup=corr_lookup, attn_chunk=attn_chunk, **cfg_overrides,
        )
        template = est.init(jax.random.PRNGKey(0))
        want_acc = acc_ckpt is not None or "acc" in model_name.lower()

        acfg = acc_params = None
        if want_acc:
            if acc_ckpt and ofe_ckpt:
                raise ValueError(
                    "pass acc_ckpt OR ofe_ckpt, not both — the acc+* "
                    "checkpoints already contain the OFE weights"
                )
            acfg = AccFlowConfig(compute_dtype=compute_dtype, ofe_iters=iters)
            acc_template = init_accflow(jax.random.PRNGKey(1), acfg)
            if acc_ckpt:
                from accflow_tpu.convert.torch_weights import load_accflow_checkpoint

                acc_params, params = load_accflow_checkpoint(
                    acc_ckpt, acc_template, template
                )
            elif ofe_ckpt:
                # real OFE under a random-init accumulator (pair_flow/pairs
                # work; long_range is smoke-quality until trained)
                from accflow_tpu.convert.torch_weights import (
                    load_flow_estimator_checkpoint,
                )

                acc_params = acc_template
                params = load_flow_estimator_checkpoint(ofe_ckpt, template)
            else:
                acc_params, params = acc_template, template
        elif ofe_ckpt:
            from accflow_tpu.convert.torch_weights import load_flow_estimator_checkpoint

            params = load_flow_estimator_checkpoint(ofe_ckpt, template)
        else:
            params = template
        return cls(est, params, acc_params, acfg, iters=iters)

    @classmethod
    def from_artifact(cls, path: str) -> "ArtifactPipeline":
        """Load an exported StableHLO serving artifact
        (cli.export_serving / serving.export_serving): long_range()
        inference with the weights baked in — no model code or checkpoint
        at inference time. The clip shape (T, N, H, W) is fixed at export."""
        return ArtifactPipeline(path)

    # -- inference --------------------------------------------------------

    def pair_flow(self, image1, image2, normalized: bool = False):
        """Flow image1 -> image2 for one pair.

        Accepts HWC (returns (H, W, 2)) or NHWC (returns (N, H, W, 2))
        uint8/float RGB in [0, 255] (`normalized=True` for [-1, 1] input).
        """
        from accflow_tpu.ops.padding import InputPadder

        i1, batched = _as_frames(image1, normalized, "one")
        i2, batched2 = _as_frames(image2, normalized, "one")
        if i1.shape != i2.shape or batched != batched2:
            raise ValueError(f"pair shapes disagree: {i1.shape} vs {i2.shape}")
        padder = InputPadder(i1.shape)
        p1, p2 = padder.pad_np(i1), padder.pad_np(i2)
        out = self.est.forward(
            self.params, p1, p2, iters=self.iters, final_only=True
        )
        flow = np.asarray(padder.unpad(out["flow_up"]), dtype=np.float32)
        return flow if batched else flow[0]

    def occlusion(self, image1, image2, normalized: bool = False):
        """Occlusion masks for the pair via the eval protocol's
        bidirectional consistency check (test_cvo.py:53-78 semantics,
        ops/occlusion.py::calc_occ_mask): estimates forward AND backward
        flow, then thresholds |f + b∘f| against 0.01·(|f|+|b|) + 0.5.

        Returns (flow_fw, occ_fw): the image1→image2 flow and a float
        {0,1} mask of pixels occluded in image2 (1 = occluded), each
        (H, W, ·) for HWC inputs or (N, H, W, ·) for NHWC.
        """
        from accflow_tpu.ops.occlusion import calc_occ_mask
        from accflow_tpu.ops.padding import InputPadder

        i1, batched = _as_frames(image1, normalized, "one")
        i2, batched2 = _as_frames(image2, normalized, "one")
        if i1.shape != i2.shape or batched != batched2:
            raise ValueError(f"pair shapes disagree: {i1.shape} vs {i2.shape}")
        padder = InputPadder(i1.shape)
        p1, p2 = padder.pad_np(i1), padder.pad_np(i2)
        # One batched solve for both directions: rows [0, N) are
        # image1->image2, rows [N, 2N) the reverse. Same compiled shape
        # would otherwise run twice; this halves dispatches.
        n = p1.shape[0]
        src = np.concatenate([p1, p2], axis=0)
        dst = np.concatenate([p2, p1], axis=0)
        both = self.est.forward(self.params, src, dst, iters=self.iters,
                                final_only=True)["flow_up"]
        fwd, bwd = both[:n], both[n:]
        _, occ_fw = calc_occ_mask(bwd, fwd)
        flow = np.asarray(padder.unpad(fwd), dtype=np.float32)
        occ = np.asarray(padder.unpad(occ_fw), dtype=np.float32)
        return (flow, occ) if batched else (flow[0], occ[0])

    def pairs(self, frames, warm_start: bool = True, normalized: bool = False):
        """Consecutive-pair flows [f_{0->1}, ..., f_{T-2 -> T-1}] over a
        frame sequence, warm-starting each solve from the previous flow
        advected along itself (upstream RAFT's Sintel recipe,
        networks/raft/utils/utils.py:31-63).

        frames: list of HWC images, a (T, H, W, 3) stack (returns
        (T-1, H, W, 2)), or (T, N, H, W, 3) (returns (T-1, N, H, W, 2)).
        """
        from accflow_tpu.ops.padding import InputPadder
        from accflow_tpu.train.evaluate import evaluate_sequence

        clip, batched = _as_frames(frames, normalized, "many")
        if clip.shape[0] < 2:
            raise ValueError(f"pairs() needs >= 2 frames, got {clip.shape[0]}")
        padder = InputPadder(clip.shape)
        padded = padder.pad_np(clip)  # one host-side np.pad, no device round trips
        flows = evaluate_sequence(
            self.est, self.params, padded, iters=self.iters,
            warm_start=warm_start,
        )
        flows = np.asarray(padder.unpad(flows), dtype=np.float32)
        return flows if batched else flows[:, 0]

    def long_range(self, frames, normalized: bool = False):
        """Long-range flows [F_{2->0}, ..., F_{T-1 -> 0}] by AccFlow
        backward accumulation over the clip (networks/AccFlow_.py:157-175
        semantics). Needs accumulator weights (`acc_ckpt` / an "acc"
        model_name at construction) and >= 3 frames.

        frames as in pairs(); returns (T-2, [N,] H, W, 2) float32.
        """
        if self.acc_params is None:
            raise ValueError(
                "long_range() needs accumulator weights — build the "
                "pipeline with from_checkpoint('acc+raft', acc_ckpt=...)"
            )
        from accflow_tpu.models.accflow import accflow_forward
        from accflow_tpu.ops.padding import InputPadder

        clip, batched = _as_frames(frames, normalized, "many")
        if clip.shape[0] < 3:
            raise ValueError(
                f"long_range() needs >= 3 frames (got {clip.shape[0]}; "
                "accumulation starts at F_{2->0})"
            )
        padder = InputPadder(clip.shape)
        padded = padder.pad_np(clip)  # one host-side np.pad, no device round trips
        outs = accflow_forward(
            self.acc_params,
            lambda a, b, flow_init=None: self.est.forward(
                self.params, a, b, iters=self.iters, flow_init=flow_init,
                final_only=True,
            )["flow_up"],
            padded,
            self.acfg,
            ofe_pairs=self.est.pairs_fn(self.params, iters=self.iters),
        )
        outs = np.asarray(padder.unpad(outs), dtype=np.float32)
        return outs if batched else outs[:, 0]

    def stream(self, iters: Optional[int] = 6, normalized: bool = False,
               ini_init: str = "ini"):
        """Open a stateful streaming session: long-range flows F_{i,0}
        over an unbounded frame stream, one frame at a time, with
        warm-started OFE queries (the shipped serving configuration
        measured FASTER than the clip path at BETTER CVO-protocol EPE —
        see README "Streaming serving").

        iters: OFE iterations per step (default 6 — the measured
        quality/throughput sweet spot; pass 12 for the full cold-start
        count, or None for this pipeline's `iters`). Needs accumulator
        weights, like long_range(). ini_init: warm-start seed of the
        long-range query, "ini" or "carry" (see
        streaming.make_streaming_fns — "carry" re-anchors very long
        streams on the accumulated flow).

            stream = pipe.stream()
            for frame in video:
                flow = stream.send(frame)   # None for the first 2 frames
        """
        if self.acc_params is None:
            raise ValueError(
                "stream() needs accumulator weights — build the pipeline "
                "with from_checkpoint('acc+raft', acc_ckpt=...)"
            )
        from accflow_tpu.streaming import FlowStream, StreamAccumulator

        acc = StreamAccumulator(
            self._est_with_iters(iters), self.acfg, self.params,
            self.acc_params, ini_init=ini_init,
        )
        return FlowStream(acc, normalized=normalized)

    @classmethod
    def from_streaming_artifact(cls, path: str, normalized: bool = False):
        """Open a streaming session from an exported streaming artifact
        (cli.export_serving --streaming / streaming.export_streaming):
        same send() surface as stream(), no model code or checkpoints."""
        from accflow_tpu.streaming import FlowStream, load_streaming_artifact

        return FlowStream(load_streaming_artifact(path), normalized=normalized)


class ArtifactPipeline:
    """long_range() inference through a serialized StableHLO artifact
    (see serving.py). The artifact's (T, N, H, W, 3) input spec is fixed:
    exactly T frames are consumed and the padded frame size must match.
    A fixed batch N is filled by replication for smaller inputs; a
    batch-polymorphic artifact (exported with N=None / --batch 0) takes
    any batch as-is."""

    def __init__(self, path: str):
        from accflow_tpu.serving import load_exported

        self.path = path
        self.exported = load_exported(path)
        (spec,) = self.exported.in_avals
        self.clip_shape = tuple(spec.shape)  # (T, N, H, W, 3); N may be symbolic

    def long_range(self, frames, normalized: bool = False):
        """frames: list / (T, H, W, 3) / (T, N, H, W, 3) as in
        FlowPipeline.pairs(); returns (T-2, [N,] H, W, 2) float32."""
        from accflow_tpu.ops.padding import InputPadder

        t, n, h, w, _ = self.clip_shape
        poly_batch = not isinstance(n, int)  # symbolic dim: any batch works
        clip, batched = _as_frames(frames, normalized, "many")
        if clip.shape[0] != t:
            raise ValueError(
                f"artifact expects a {t}-frame clip, got {clip.shape[0]}"
            )
        if not poly_batch and clip.shape[1] > n:
            raise ValueError(
                f"artifact batch is {n}, got {clip.shape[1]} — re-export "
                "with a larger batch (or --batch 0 for polymorphic)"
            )
        padder = InputPadder(clip.shape)
        padded = padder.pad_np(clip)  # one host-side np.pad, no device round trips
        if padded.shape[2:4] != (h, w):
            raise ValueError(
                f"artifact was exported for {h}x{w} frames; these are "
                f"{padded.shape[2]}x{padded.shape[3]} after /8 padding — "
                "re-export with --size to match"
            )
        nb = clip.shape[1]
        if not poly_batch and nb < n:
            # fill the fixed batch by replicating the last sample
            padded = np.concatenate(
                [padded, np.repeat(padded[:, -1:], n - nb, axis=1)], axis=1
            )
        outs = np.asarray(self.exported.call(padded.astype(np.float32)))
        outs = padder.unpad(outs)[:, :nb].astype(np.float32)
        return outs if batched else outs[:, 0]


__all__ = ["FlowPipeline", "ArtifactPipeline"]
