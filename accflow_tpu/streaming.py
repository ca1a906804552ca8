"""Stateful streaming serving: long-range flow over an unbounded video
stream, one frame at a time, with warm-started OFE queries.

The reference can only process fixed 7-frame clips in one shot
(networks/AccFlow_.py:157-175) and lists flow warm-starting as an open
TODO (/root/reference/README.md:11, upstream helper at
networks/raft/utils/utils.py:31-63). This module promotes the measured
warm-start path (AccFlowConfig.warm_start, r2/r3: 69-77 f/s at warm 6/4
iters with CVO-protocol EPE *better* than cold-start 12 iters — see
README "Performance") to a first-class serving surface:

    acc = StreamAccumulator(est, acfg, ofe_params, acc_params)
    out0 = acc.reset(frames3)          # cold start on [I0, I1, I2] -> F_{2,0}
    out  = acc.push(frame)             # each new frame I_i -> F_{i,0}

Every `push` is ONE compiled XLA program that encodes ONLY the new
frame: 1 OFE fnet + 1 cnet + 1 context encode, then a warm-started
2-pair GRU solve (I_i->I_{i-1} and I_i->I_0, from cached feature maps
carried in the state) and one accumulation cell. A plain 2-pair forward
would cost 4 fnet + 2 cnet + 3 context encodes per step — the carry
removes all redundant work, before the reduced iteration count.

The explicit carry makes the surface deployable: `export_streaming`
serializes (init, step) as StableHLO with the weights baked in, and the
loader threads the opaque state tuple between calls with no model code
(see save_streaming_artifact / StreamingArtifact).

Numerics: `push` reproduces the in-clip warm-start recurrence
(models/accflow.py::_accflow_forward_warmstart) exactly up to conv
batch-splitting (the context/flow encoders are per-sample convs;
tested). With enough OFE iterations outputs match the cold-start clip
path; at reduced iterations it trades protocol-exactness for speed —
the measured EPE trade is in the streaming bench
(scripts/bench_stream.py, QUALITY=1).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from accflow_tpu.models.accflow import (
    AccFlowConfig,
    _cell_from_ctx,
)
from accflow_tpu.models.encoders import basic_encoder
from accflow_tpu.ops.grids import downflow8
from accflow_tpu.ops.warmstart import forward_splat_flow

# Streaming state, threaded through step calls as a PLAIN TUPLE so an
# exported artifact can carry it without any pytree registry:
#   (fmap_n, fmap_prev, cn, c_prev, carry, dflow, flow_ini)
#   fmap_n   (N, H/8, W/8, C)  OFE fnet features of frame 0 (the anchor)
#   fmap_prev(N, H/8, W/8, C)  OFE fnet features of frame i-1
#   cn       (N, H/8, W/8, C)  accumulator context features of frame 0
#   c_prev   (N, H/8, W/8, C)  accumulator context features of frame i-1
#   carry    (N, H/8, W/8, 2)  accumulated 1/8-res flow F_{i-1,0}
#   dflow    (N, H/8, W/8, 2)  previous local pair flow f_{i-1,i-2}
#   flow_ini (N, H/8, W/8, 2)  previous direct flow F_{i-1,0} (OFE's)
#
# Caching the fnet maps (instead of raw frames) means a step encodes
# ONLY the new frame: 1 fnet + 1 cnet + 1 context encode, where a plain
# 2-pair forward would cost 4 fnet + 2 cnet + 3 context. Per-sample
# norms (instance / frozen-BN / none) make the split exact.


def make_streaming_fns(
    est, acfg: AccFlowConfig, ofe_params, acc_params, ini_init: str = "ini"
):
    """Build (init_fn, step_fn) for streaming backward accumulation.

    init_fn(frames3: (3, N, H, W, 3)) -> (out: (N, H, W, 2), state)
        Cold start on the first three frames (the OFE also seeds
        F_{1,0}), emitting F_{2,0}.
    step_fn(state, frame: (N, H, W, 3)) -> (out, state)
        One warm-started accumulation step, emitting F_{i,0}.

    Both are pure jittable functions closing over the weights; est must
    be flow_init-capable (RAFT and GMA both are). The OFE iteration
    count is est.cfg.iters — build the estimator with the reduced count
    you want per step (6 by default in the serving surfaces below).

    ini_init picks the warm start of the LONG-RANGE query (I_i -> I_0):
      "ini"    advect the previous step's direct flow_ini (default; the
               in-clip warm-start recurrence, exactness-tested).
      "carry"  advect the previous ACCUMULATED output flow. ADJUDICATED
               LOSER, kept as the documented negative result: the r5
               64-frame drift study (scripts/bench_drift.py, PARITY.md
               "Long-stream drift study") measured it diverging
               catastrophically (EPE 30.7 at i=8 -> 1591 at i=32) —
               the accumulated flow's magnitude grows with horizon, and
               a beyond-search-range query seed puts the correlation
               lookup outside its 81-tap window with no path back. The
               default "ini" needs no re-anchoring: it tracks the cold
               recurrence at every horizon measured (to i=63).
    """
    if ini_init not in ("ini", "carry"):
        raise ValueError(f"ini_init must be 'ini' or 'carry', got {ini_init!r}")
    cd = jnp.dtype(acfg.compute_dtype)
    encode = est.encode_frame_fn(ofe_params)
    pairs_ff = est.pairs_from_features_fn(ofe_params)

    def encode_ctx(frames):
        return basic_encoder(
            acc_params["context"], frames.astype(cd), "none",
            stem_s2d=acfg.stem_s2d,
        )

    def init_fn(frames3):
        In, I2, I1 = frames3[0], frames3[1], frames3[2]
        n = I1.shape[0]
        feats1, feats2, featsn = encode(I1), encode(I2), encode(In)
        # Queries (I1->I2, I1->In) and the seed (I2->In), from features.
        flows_a = pairs_ff(feats1, [feats2["fmap"], featsn["fmap"]])
        seed = pairs_ff(feats2, [featsn["fmap"]])
        flows = lax.stop_gradient(
            downflow8(jnp.concatenate([flows_a, seed], axis=0))
        )
        dflow, flow_ini, seed = jnp.split(flows, 3, axis=0)
        ctx = encode_ctx(jnp.concatenate([I1, I2, In], axis=0))
        c1, cn = ctx[:n], ctx[2 * n :]
        carry, out = _cell_from_ctx(
            acc_params, dflow, flow_ini, seed, c1, ctx[n : 2 * n], cn, acfg
        )
        state = (featsn["fmap"], feats1["fmap"], cn, c1, carry, dflow, flow_ini)
        return out, state

    def step_fn(state, frame):
        fmap_n, fmap_prev, cn, c_prev, carry, dflow, flow_ini = state
        src = encode(frame)
        # Advect the previous step's flows into the new frame's grid
        # (constant velocity along the negated backward pair flow) and
        # warm-start both OFE queries from them.
        advect = -dflow
        ini_seed = flow_ini if ini_init == "ini" else carry
        init = jnp.concatenate(
            [
                forward_splat_flow(dflow, advect),
                forward_splat_flow(ini_seed, advect),
            ],
            axis=0,
        )
        flows = pairs_ff(src, [fmap_prev, fmap_n], flow_init=init)
        flows = lax.stop_gradient(downflow8(flows))
        dflow, flow_ini = jnp.split(flows, 2, axis=0)
        c1 = encode_ctx(frame)
        carry, out = _cell_from_ctx(
            acc_params, dflow, flow_ini, lax.stop_gradient(carry),
            c1, c_prev, cn, acfg,
        )
        state = (fmap_n, src["fmap"], cn, c1, carry, dflow, flow_ini)
        return out, state

    return init_fn, step_fn


def make_pair_streaming_fns(est, params):
    """Consecutive-pair streaming: (init_fn, step_fn) where
    init_fn(f0, f1) -> (flow_{0->1}, state) and step_fn(state, frame) ->
    (flow_{i-1->i}, state). Each step warm-starts from the previous flow
    advected along itself (upstream RAFT's Sintel recipe,
    networks/raft/utils/utils.py:31-63); state = (prev_frame, flow_low)."""

    def init_fn(frame0, frame1):
        out = est.forward(params, frame0, frame1, final_only=True)
        return out["flow_up"], (frame1, out["flow_low"])

    def step_fn(state, frame):
        prev, flow_low = state
        out = est.forward(
            params, prev, frame,
            flow_init=forward_splat_flow(flow_low), final_only=True,
        )
        return out["flow_up"], (frame, out["flow_low"])

    return init_fn, step_fn


class StreamAccumulator:
    """Jit-compiled stateful wrapper around make_streaming_fns.

    Device arrays in, device arrays out; state stays resident on device
    between calls (no host round-trips beyond the frame upload). For the
    numpy/padding convenience layer use FlowPipeline.stream()."""

    def __init__(self, est, acfg: AccFlowConfig, ofe_params, acc_params,
                 ini_init: str = "ini"):
        init_fn, step_fn = make_streaming_fns(
            est, acfg, ofe_params, acc_params, ini_init=ini_init)
        self._init = jax.jit(init_fn)
        self._step = jax.jit(step_fn)
        self._state = None

    @property
    def state(self):
        return self._state

    def reset(self, frames3) -> jnp.ndarray:
        """Cold start on (3, N, H, W, 3) normalized frames -> F_{2,0}."""
        out, self._state = self._init(jnp.asarray(frames3))
        return out

    def push(self, frame) -> jnp.ndarray:
        """Advance one frame: (N, H, W, 3) -> F_{i,0} (N, H, W, 2)."""
        if self._state is None:
            raise RuntimeError("push() before reset() — seed with 3 frames first")
        out, self._state = self._step(self._state, jnp.asarray(frame))
        return out


# ---------------------------------------------------------------------------
# Export: (init, step) as StableHLO with the weights baked in
# ---------------------------------------------------------------------------

_MAGIC = b"SFLOWSTRM1\n"


def export_streaming(
    est, acfg: AccFlowConfig, ofe_params, acc_params, frame_shape,
    platforms=None, weights_dtype=None, ini_init: str = "ini",
):
    """Export the streaming pipeline for frame_shape = (N, H, W).

    Returns (init_exported, step_exported): jax.export.Exported for
    init(frames3: (3, N, H, W, 3)) and step(state, frame). The step's
    state signature is the concrete tuple produced by init, so a loader
    can thread it blindly. weights_dtype="bfloat16" halves the baked-in
    weights (see serving.cast_weights)."""
    from accflow_tpu.serving import cast_weights

    if weights_dtype is not None:
        ofe_params = cast_weights(ofe_params, weights_dtype)
        acc_params = cast_weights(acc_params, weights_dtype)
    init_fn, step_fn = make_streaming_fns(
        est, acfg, ofe_params, acc_params, ini_init=ini_init)
    n, h, w = frame_shape
    kwargs = {"platforms": tuple(platforms)} if platforms else {}

    frames3_spec = jax.ShapeDtypeStruct((3, n, h, w, 3), jnp.float32)
    init_exp = jax.export.export(jax.jit(init_fn), **kwargs)(frames3_spec)

    # The step's state spec is whatever init produces (shapes/dtypes).
    _, state_aval = jax.eval_shape(init_fn, frames3_spec)
    state_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), state_aval
    )
    frame_spec = jax.ShapeDtypeStruct((n, h, w, 3), jnp.float32)
    step_exp = jax.export.export(jax.jit(step_fn), **kwargs)(
        state_spec, frame_spec
    )
    return init_exp, step_exp


def save_streaming_artifact(path: str, init_exp, step_exp) -> None:
    """One-file container: magic + two length-prefixed serialized exports."""
    import struct

    blobs = [bytes(init_exp.serialize()), bytes(step_exp.serialize())]
    with open(path, "wb") as f:
        f.write(_MAGIC)
        for b in blobs:
            f.write(struct.pack("<Q", len(b)))
            f.write(b)


def load_streaming_artifact(path: str) -> "StreamingArtifact":
    import struct

    with open(path, "rb") as f:
        data = f.read()
    if not data.startswith(_MAGIC):
        raise ValueError(f"{path}: not a streaming artifact (bad magic)")
    off = len(_MAGIC)
    blobs = []
    for _ in range(2):
        (ln,) = struct.unpack_from("<Q", data, off)
        off += 8
        blobs.append(bytearray(data[off : off + ln]))
        off += ln
    init_exp = jax.export.deserialize(blobs[0])
    step_exp = jax.export.deserialize(blobs[1])
    return StreamingArtifact(init_exp, step_exp)


class StreamingArtifact:
    """Loaded streaming artifact: reset/push like StreamAccumulator, with
    no model code or checkpoints — only jax. The state is an opaque tuple
    threaded between the exported calls."""

    def __init__(self, init_exp, step_exp):
        self._init_exp = init_exp
        self._step_exp = step_exp
        self._state = None
        # (3, N, H, W, 3) of the init export
        (spec,) = init_exp.in_avals
        self.frame_shape = tuple(spec.shape[1:])  # (N, H, W, 3)

    def reset(self, frames3):
        out, self._state = self._init_exp.call(
            jnp.asarray(frames3, jnp.float32)
        )
        return out

    def push(self, frame):
        if self._state is None:
            raise RuntimeError("push() before reset() — seed with 3 frames first")
        out, self._state = self._step_exp.call(
            self._state, jnp.asarray(frame, jnp.float32)
        )
        return out


class FlowStream:
    """User-facing streaming session (from FlowPipeline.stream() or a
    loaded artifact): feed raw frames one at a time, get long-range flows
    F_{i,0} back as numpy. Handles [0,255]->[-1,1] normalization, /8
    padding and output unpadding; buffers the first three frames (the
    cold start), so the first two send() calls return None.

        stream = pipe.stream()
        for frame in video:
            flow = stream.send(frame)   # (H, W, 2) or None while seeding
    """

    def __init__(self, backend, normalized: bool = False):
        # backend: StreamAccumulator or StreamingArtifact (reset/push).
        self._backend = backend
        self._normalized = normalized
        self._buffer: list = []
        self._padder = None
        self._batched: Optional[bool] = None
        self.index = 0  # frames consumed

    def _prep(self, frame):
        from accflow_tpu.api import _as_frames
        from accflow_tpu.ops.padding import InputPadder

        a, batched = _as_frames(frame, self._normalized, "one")
        if self._batched is None:
            self._batched = batched
        elif batched != self._batched:
            raise ValueError("all frames must agree in batchedness")
        if self._padder is None:
            self._padder = InputPadder(a.shape)
        return self._padder.pad_np(a)

    def send(self, frame) -> Optional[np.ndarray]:
        """Feed one HWC (or NHWC) frame; returns F_{i,0} unpadded float32
        numpy once i >= 2, else None (seeding)."""
        a = self._prep(frame)
        self.index += 1
        if self.index < 3:
            self._buffer.append(a)
            return None
        if self.index == 3:
            self._buffer.append(a)
            out = self._backend.reset(np.stack(self._buffer, axis=0))
            self._buffer = []
        else:
            out = self._backend.push(a)
        out = np.asarray(self._padder.unpad(out), dtype=np.float32)
        return out if self._batched else out[0]


__all__ = [
    "StreamAccumulator",
    "StreamingArtifact",
    "FlowStream",
    "make_streaming_fns",
    "make_pair_streaming_fns",
    "export_streaming",
    "save_streaming_artifact",
    "load_streaming_artifact",
]
