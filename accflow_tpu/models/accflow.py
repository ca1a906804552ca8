"""AccFlow: occlusion-aware backward accumulation for long-range flow.

Rebuilt from networks/AccFlow_.py (the paper's core module):

- FlowEncoder (:48-65): 2->128 conv stack for 1/8-res flows (batched over a
  list like RAFT's encoders).
- FlowDecoder (:13-45): 128 -> (flow_small, flow) with a 2-conv flow head,
  a 64*9 mask head and RAFT's convex 8x upsampling.
- context (:152): BasicEncoder(3, 128, norm="none") reused per frame.
- AccPlus (:68-109): occlusion-aware accumulation cell — conv stacks + a
  modulated 3x3 deformable conv whose 18 offsets + 9 sigmoid masks come
  from a ZeroConv2d-terminated branch (split [18, 9] at :102).
- Blending (:112-124): learned sigmoid mask from an error map fusing the
  direct-flow feature with the accumulated feature.
- Recurrence (:157-201): for i in 2..N-1 the cell consumes the detached
  accumulated flow F_{i-1,0}; the frozen OFE is queried in ONE batched call
  per step (3 image pairs on the first step, 2 afterwards).

TPU mapping: the temporal recurrence is an unrolled first step plus a
`lax.scan` over the remaining steps (their traced shapes are identical), so
an N-frame clip runs as one XLA program with no host round-trips.
`stop_gradient` replaces `.detach()`/`torch.no_grad` — the OFE is a frozen
feature oracle, exactly as in the reference. Mixed precision mirrors
autocast: cell modules run in compute dtype; OFE outputs, occlusion maps
and decoder outputs are float32.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

from accflow_tpu.models.encoders import basic_encoder, init_basic_encoder
from accflow_tpu.nn.layers import (
    conv2d,
    init_conv,
    init_zero_conv,
    relu,
    zero_conv2d,
)
from accflow_tpu.ops.deform import deform_conv3x3
from accflow_tpu.ops.grids import downflow8
from accflow_tpu.ops.occlusion import photometric_occ
from accflow_tpu.ops.upsample import convex_upsample

Params = dict


@dataclasses.dataclass(frozen=True)
class AccFlowConfig:
    hidden: int = 128
    ofe_iters: int = 12
    compute_dtype: str = "bfloat16"
    # Rematerialize each accumulation cell in the backward pass (trade
    # FLOPs for HBM) — lets the training batch scale past what storing all
    # five cells' activations allows. True/"full" recomputes the whole
    # cell from the carry; "dots" (jax.checkpoint_policies.checkpoint_dots)
    # keeps matmul/conv outputs and recomputes only the elementwise glue.
    remat: "bool | str" = False
    # Fuse every OFE query of the clip into ONE batched estimator call.
    # The 2(T-2)+1 pair flows are independent of the recurrence
    # (AccFlow_.py:182-190 queries them stepwise under no_grad), so
    # batching them is mathematically identical while removing 4 of 5
    # serial estimator passes and deduplicating fnet/context encodes
    # (~22 -> 7 frame passes for T=7). Costs peak HBM: all pair
    # correlation volumes coexist (~89 MB x 11 x batch at 512^2) — use
    # fused_ofe=False for very large eval batches.
    fused_ofe: bool = True
    # Warm-start each step's OFE queries from the previous step's advected
    # flows (the reference README's TODO; see _accflow_forward_warmstart).
    # Requires a flow_init-capable ofe (FlowEstimator.flow_fn) and forces
    # the stepwise path (the queries become sequentially dependent).
    warm_start: bool = False
    # Space-to-depth stem for the context encoder (see RAFTConfig.stem_s2d).
    stem_s2d: bool = False
    # Accumulation direction: "backward" (the paper's FN0 model — flow
    # frame i -> frame 0) or "forward" (the F0N ablation — flow frame 0 ->
    # frame i; see _accflow_forward_f0n). The reference ships the forward
    # direction only as broken legacy code (networks/AccPlus_forward.py).
    direction: str = "backward"
    # Unroll factor for the fused path's accumulation-cell lax.scan (5
    # steps for T=7). The training trace attributes ~26 ms/step to this
    # scan's boundary dynamic-update-slice/copy ops.
    acc_unroll: int = 1


# ---------------------------------------------------------------------------
# Sub-modules
# ---------------------------------------------------------------------------

def init_flow_encoder(key: jax.Array, c: int = 128) -> Params:
    ks = jax.random.split(key, 3)
    return {
        "conv1": init_conv(ks[0], 2, c, 7),
        "conv2": init_conv(ks[1], c, c * 2, 3),
        "conv3": init_conv(ks[2], c * 2, c, 1),
    }


def flow_encoder(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    x = relu(conv2d(p["conv1"], x))
    x = relu(conv2d(p["conv2"], x))
    return conv2d(p["conv3"], x, padding=0)


def init_flow_decoder(key: jax.Array, c: int = 128) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "flow": {
            "0": init_conv(ks[0], c, c * 2, 3),
            "2": init_conv(ks[1], c * 2, 2, 3),
        },
        "mask": {
            "0": init_conv(ks[2], c, c * 2, 3),
            "2": init_conv(ks[3], c * 2, 64 * 9, 1),
        },
    }


def flow_decoder(p: Params, x: jnp.ndarray):
    flow_small = conv2d(p["flow"]["2"], relu(conv2d(p["flow"]["0"], x)))
    mask = conv2d(p["mask"]["2"], relu(conv2d(p["mask"]["0"], x)), padding=0)
    flow = convex_upsample(flow_small.astype(jnp.float32), mask)
    return flow_small, flow


def init_accplus(key: jax.Array, c: int = 128) -> Params:
    ks = jax.random.split(key, 10)
    return {
        "conv1": {
            "0": init_conv(ks[0], c * 2 + 1, c * 2, 3),
            "2": init_conv(ks[1], c * 2, c, 3),
        },
        "conv2": {
            "0": init_conv(ks[2], c * 2, c * 2, 3),
            "2": init_conv(ks[3], c * 2, c, 3),
            "4": init_zero_conv(ks[4], c, 27),
        },
        "dconv": init_conv(ks[5], c, c, 3),
        "conv3": {
            "0": init_conv(ks[6], c * 2 + 1, c * 2, 3),
            "2": init_conv(ks[7], c * 2, c, 3),
        },
        "conv4": {
            "0": init_conv(ks[8], c * 4, c * 2, 3),
            "2": init_conv(ks[9], c * 2, c, 3),
            "4": init_conv(jax.random.fold_in(key, 99), c, c, 1),
        },
    }


def accplus(p: Params, df, f, o, c):
    """Accumulation cell (AccFlow_.py:97-109).

    df: encoded local flow; f: encoded accumulated flow F_{i-1,0};
    o: binary occlusion map (1 channel); c: context features of frame i.
    """
    x = jnp.concatenate([df, f, o.astype(df.dtype)], axis=-1)
    x = conv2d(p["conv1"]["2"], relu(conv2d(p["conv1"]["0"], x)))
    x = jnp.concatenate([x, c], axis=-1)
    x = relu(conv2d(p["conv2"]["2"], relu(conv2d(p["conv2"]["0"], x))))
    x = zero_conv2d(p["conv2"]["4"], x)
    off, m = x[..., :18], x[..., 18:]
    m = jax.nn.sigmoid(m)
    f_ = deform_conv3x3(
        f, off.astype(jnp.float32), m.astype(jnp.float32),
        p["dconv"]["w"], p["dconv"]["b"],
    )
    x = jnp.concatenate([f_, df, o.astype(df.dtype)], axis=-1)
    x = conv2d(p["conv3"]["2"], relu(conv2d(p["conv3"]["0"], x)))
    x = jnp.concatenate([x, c, f_, df], axis=-1)
    x = relu(conv2d(p["conv4"]["2"], relu(conv2d(p["conv4"]["0"], x))))
    return conv2d(p["conv4"]["4"], x, padding=0)


def init_blending(key: jax.Array, c: int = 128) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "mask": {
            "0": init_conv(k1, c, c * 2, 1),
            "2": init_conv(k2, c * 2, 1, 3),
        }
    }


def blending(p: Params, f1, f2, emap):
    m = jax.nn.sigmoid(
        conv2d(p["mask"]["2"], relu(conv2d(p["mask"]["0"], emap, padding=0)))
    )
    return f1 * m + (1.0 - m) * f2


# ---------------------------------------------------------------------------
# AccFlow
# ---------------------------------------------------------------------------

def init_accflow(key: jax.Array, cfg: AccFlowConfig = AccFlowConfig()) -> Params:
    """Params for the accumulation modules only; the OFE params live in a
    sibling subtree (see accflow_forward's `ofe_params`) mirroring the
    reference's AccFlow(ofe) composition."""
    ks = jax.random.split(key, 5)
    c = cfg.hidden
    return {
        "flow_encoder": init_flow_encoder(ks[0], c),
        "flow_decoder": init_flow_decoder(ks[1], c),
        "context": init_basic_encoder(ks[2], 3, output_dim=c, norm_fn="none"),
        "accplus": init_accplus(ks[3], c),
        "blending": init_blending(ks[4], c),
    }


OfeFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]
# OfeFn(image1_batch, image2_batch) -> full-res flow batch (float32), i.e. a
# closed-over frozen flow estimator (RAFT or GMA forward returning flow_up).


def _remat_wrap(fn, remat, **ckpt_kwargs):
    """Apply AccFlowConfig.remat to a cell/body function: False = off,
    True/"full" = save-nothing jax.checkpoint, "dots" = keep matmul/conv
    outputs (checkpoint_dots policy), recompute elementwise glue."""
    if not remat:
        return fn
    if remat is True or remat == "full":
        return jax.checkpoint(fn, **ckpt_kwargs)
    if remat == "dots":
        return jax.checkpoint(
            fn, policy=jax.checkpoint_policies.checkpoint_dots, **ckpt_kwargs
        )
    raise ValueError(f"remat must be bool|'full'|'dots', got {remat!r}")


def _cell_from_ctx(
    params: Params,
    dflow: jnp.ndarray,
    flow_ini: jnp.ndarray,
    F2n: jnp.ndarray,
    c1: jnp.ndarray,
    c2: jnp.ndarray,
    cn: jnp.ndarray,
    cfg: AccFlowConfig,
):
    """Cell modules on precomputed 1/8-res OFE flows AND precomputed
    context features (c1/c2/cn = context of frames i, i-1, n in compute
    dtype). The context encoder is norm="none" per-sample convs, so
    splitting its batch is exact — streaming (streaming.py) caches c2/cn
    across steps and encodes only the new frame."""
    cd = jnp.dtype(cfg.compute_dtype)
    n = dflow.shape[0]
    f_enc = flow_encoder(
        params["flow_encoder"],
        jnp.concatenate([flow_ini, dflow, F2n], axis=0).astype(cd),
    )
    f_ini, df, f = f_enc[:n], f_enc[n : 2 * n], f_enc[2 * n :]

    o = photometric_occ(dflow, c1.astype(jnp.float32), c2.astype(jnp.float32))
    o = lax.stop_gradient(o)
    f_acc = accplus(params["accplus"], df, f, o.astype(cd), c1)

    emap = photometric_occ(
        flow_ini, c1.astype(jnp.float32), cn.astype(jnp.float32), binary=False
    )
    emap = lax.stop_gradient(emap)
    f_fuse = blending(params["blending"], f_ini, f_acc, emap.astype(cd))

    out_small, out = flow_decoder(params["flow_decoder"], f_fuse)
    return out_small.astype(jnp.float32), out.astype(jnp.float32)


def _cell_modules(
    params: Params,
    dflow: jnp.ndarray,
    flow_ini: jnp.ndarray,
    F2n: jnp.ndarray,
    I1: jnp.ndarray,
    I2: jnp.ndarray,
    In: jnp.ndarray,
    cfg: AccFlowConfig,
):
    """The trainable cell modules applied to precomputed 1/8-res OFE flows
    (everything in AccFlow_.py:177-201 after the no_grad OFE queries)."""
    cd = jnp.dtype(cfg.compute_dtype)
    n = I1.shape[0]
    ctx = basic_encoder(
        params["context"],
        jnp.concatenate([I1, I2, In], axis=0).astype(cd),
        "none", stem_s2d=cfg.stem_s2d,
    )
    c1, c2, cn = ctx[:n], ctx[n : 2 * n], ctx[2 * n :]
    return _cell_from_ctx(params, dflow, flow_ini, F2n, c1, c2, cn, cfg)


def _accflow_cell(
    params: Params,
    ofe: OfeFn,
    I1: jnp.ndarray,
    I2: jnp.ndarray,
    In: jnp.ndarray,
    F2n: Optional[jnp.ndarray],
    cfg: AccFlowConfig,
):
    """One accumulation step (AccFlow_.py:177-201). F2n is the 1/8-res
    accumulated flow I2 -> In, or None on the first step (it is then
    estimated directly by the OFE alongside the other pairs)."""
    if F2n is None:
        flows = ofe(
            jnp.concatenate([I1, I1, I2], axis=0),
            jnp.concatenate([I2, In, In], axis=0),
        )
        flows = downflow8(flows)
        dflow, flow_ini, F2n = jnp.split(flows, 3, axis=0)
    else:
        flows = ofe(
            jnp.concatenate([I1, I1], axis=0),
            jnp.concatenate([I2, In], axis=0),
        )
        flows = downflow8(flows)
        dflow, flow_ini = jnp.split(flows, 2, axis=0)
    dflow = lax.stop_gradient(dflow)
    flow_ini = lax.stop_gradient(flow_ini)
    return _cell_modules(params, dflow, flow_ini, F2n, I1, I2, In, cfg)


def _accflow_forward_warmstart(
    params: Params,
    ofe: OfeFn,
    images: jnp.ndarray,
    cfg: AccFlowConfig,
) -> jnp.ndarray:
    """Stepwise accumulation with occlusion-aware WARM-STARTED OFE queries
    — the reference README's own TODO (/root/reference/README.md:11),
    built on upstream RAFT's forward-interpolate warm start
    (networks/raft/utils/utils.py:31-63, here ops/warmstart.py on-device).

    Between steps the query grid advances one frame (I1: frame i -> i+1),
    so the previous step's 1/8-res flows are advected INTO the new frame's
    grid by the negated backward pair flow (-dflow: constant-velocity
    motion i -> i+1) and passed to the estimator as flow_init:

        dflow_init    <- splat(dflow_prev,    -dflow_prev)
        flow_ini_init <- splat(flow_ini_prev, -dflow_prev)

    `ofe` must accept flow_init (FlowEstimator.flow_fn does). This changes
    only the estimator's ITERATION START, not the protocol — with enough
    iterations outputs match the cold-start path; with few iterations it
    trades exactness for speed on video streams.
    """
    from accflow_tpu.ops.warmstart import forward_splat_flow

    t = images.shape[0]
    In = images[0]

    # First step (i=2): cold start, OFE also estimates the seed F_{1,0}.
    I1, I2 = images[2], images[1]
    flows = ofe(
        jnp.concatenate([I1, I1, I2], axis=0),
        jnp.concatenate([I2, In, In], axis=0),
    )
    flows = lax.stop_gradient(downflow8(flows))
    dflow, flow_ini, seed = jnp.split(flows, 3, axis=0)
    carry, out0 = _cell_modules(params, dflow, flow_ini, seed, I1, I2, In, cfg)
    outs = [out0]

    for i in range(3, t):
        I1, I2 = images[i], images[i - 1]
        advect = -dflow
        init = jnp.concatenate(
            [
                forward_splat_flow(dflow, advect),
                forward_splat_flow(flow_ini, advect),
            ],
            axis=0,
        )
        flows = ofe(
            jnp.concatenate([I1, I1], axis=0),
            jnp.concatenate([I2, In], axis=0),
            flow_init=init,
        )
        flows = lax.stop_gradient(downflow8(flows))
        dflow, flow_ini = jnp.split(flows, 2, axis=0)
        carry, out = _cell_modules(
            params, dflow, flow_ini, lax.stop_gradient(carry), I1, I2, In, cfg
        )
        outs.append(out)
    return jnp.stack(outs, axis=0)


def _accflow_forward_f0n(
    params: Params,
    ofe: OfeFn,
    images: jnp.ndarray,
    cfg: AccFlowConfig,
) -> jnp.ndarray:
    """Forward accumulation (F0N): [F_{0,2}, ..., F_{0,T-1}].

    The reference ships this direction only as dead legacy code
    (networks/AccPlus_forward.py:109-143 — broken upstream: it imports the
    missing networks/raft/softsplat module and calls `ofe(...,
    return_emap=True)`, a signature today's estimators lack; its
    separately-trained weights were never released). This TPU-native
    counterpart reuses the ACTIVE AccFlow cell with source/target roles
    swapped instead of resurrecting that architecture:

      forward composition  F_{0,i}(x) = F_{0,i-1}(x)
                                        + f_{i-1,i}(x + F_{0,i-1}(x))

    samples the LOCAL flow at positions displaced by the carry, so here the
    deformable conv warps the encoded local flow f_{i-1,i} with offsets
    conditioned on the encoded carry F_{0,i-1} — the mirror image of the
    backward cell, which warps the carry by the local flow. Slot mapping
    into _cell_modules: dflow<-carry (occlusion of the carry between c_0
    and c_{i-1}), F2n<-local (the deform-warped operand), flow_ini<-direct
    OFE flow 0->i (the blending alternative), I1<-frame 0 (the output
    grid), I2<-frame i-1, In<-frame i.

    For T=3 this is EXACTLY backward accumulation on the reversed clip
    (same cell call; tested); for T>3 it yields all [F_{0,i}] in one pass,
    which the reversed-clip trick cannot. Like upstream's ablation it
    needs its own training run — backward-trained weights are
    shape-compatible but role-swapped.
    """
    t = images.shape[0]
    I0 = images[0]

    # First step (i=2): OFE also seeds the carry F_{0,1}.
    flows = ofe(
        jnp.concatenate([I0, I0, images[1]], axis=0),
        jnp.concatenate([images[1], images[2], images[2]], axis=0),
    )
    flows = lax.stop_gradient(downflow8(flows))
    seed, direct, local = jnp.split(flows, 3, axis=0)
    carry, out0 = _cell_modules(
        params, seed, direct, local, I0, images[1], images[2], cfg
    )

    if t == 3:
        return out0[None]

    cell_fn = _remat_wrap(_cell_modules, cfg.remat, static_argnums=(7,))

    def step(carry, frames):
        I2, In = frames  # frames i-1, i
        carry = lax.stop_gradient(carry)
        flows = ofe(
            jnp.concatenate([I0, I2], axis=0),
            jnp.concatenate([In, In], axis=0),
        )
        flows = lax.stop_gradient(downflow8(flows))
        direct, local = jnp.split(flows, 2, axis=0)
        carry, out = cell_fn(params, carry, direct, local, I0, I2, In, cfg)
        return carry, out

    xs = (images[2:-1], images[3:])
    _, outs = lax.scan(step, carry, xs)
    return jnp.concatenate([out0[None], outs], axis=0)


def _accflow_forward_f0n_fused(
    params: Params,
    ofe: OfeFn,
    images: jnp.ndarray,
    cfg: AccFlowConfig,
    ofe_pairs=None,
) -> jnp.ndarray:
    """Fused-OFE forward accumulation (see _accflow_forward_f0n for the
    direction's semantics and slot mapping into the cell modules).

    Mirror of _accflow_forward_fused: every OFE query (direct F_{0,i},
    local f_{i-1,i}, seed F_{0,1}), the per-frame context features, the
    error maps of the direct flows, and the flow encodings of all
    precomputed flows are hoisted out of the recurrence — the scan runs
    only the carry-dependent modules (encode carry, its occlusion map,
    AccPlus, blending, decoder). The occlusion map stays IN the scan here
    (unlike backward, where it belongs to the precomputed local flow):
    forward accumulation occludes the carry F_{0,i-1} between frames 0
    and i-1. Numerically equivalent to the stepwise F0N path (tested)."""
    t, n, h, w, _ = images.shape
    cd = jnp.dtype(cfg.compute_dtype)
    s = t - 2  # number of accumulation steps / outputs
    h8, w8 = h // 8, w // 8

    # --- One batched OFE call: [direct_2..direct_{T-1} | local_2.. | seed]
    src_idx = (0,) * s + tuple(range(1, t - 1)) + (0,)
    dst_idx = tuple(range(2, t)) + tuple(range(2, t)) + (1,)
    if ofe_pairs is not None:
        full_flows = ofe_pairs(images, src_idx, dst_idx)
    else:
        srcs = jnp.concatenate([images[i] for i in src_idx], axis=0)
        dsts = jnp.concatenate([images[i] for i in dst_idx], axis=0)
        full_flows = ofe(srcs, dsts)
    flows = lax.stop_gradient(downflow8(full_flows))
    directs = flows[: s * n].reshape(s, n, h8, w8, 2)
    locals_ = flows[s * n : 2 * s * n].reshape(s, n, h8, w8, 2)
    seed = flows[2 * s * n :]  # (N, h8, w8, 2) = F_{0,1}

    # --- Per-frame context features, one batched encode ---
    ctx = basic_encoder(
        params["context"], images.reshape(t * n, h, w, 3).astype(cd), "none",
        stem_s2d=cfg.stem_s2d,
    ).reshape(t, n, h8, w8, -1)
    ctx32 = ctx.astype(jnp.float32)
    c0 = ctx[0]  # frame-0 context: the output grid of every step
    c0_32 = ctx32[0]

    # --- Error maps of the direct flows (detached, carry-independent) ---
    emap = photometric_occ(
        directs.reshape(s * n, h8, w8, 2),
        jnp.broadcast_to(c0_32[None], (s, n, h8, w8, ctx.shape[-1])).reshape(
            s * n, h8, w8, -1
        ),
        ctx32[2:].reshape(s * n, h8, w8, -1),
        binary=False,
    )
    emap = lax.stop_gradient(emap).reshape(s, n, h8, w8, -1)

    # --- Encode the precomputed flows once ---
    enc = flow_encoder(
        params["flow_encoder"],
        jnp.concatenate(
            [directs.reshape(s * n, h8, w8, 2),
             locals_.reshape(s * n, h8, w8, 2)],
            axis=0,
        ).astype(cd),
    )
    f_dirs = enc[: s * n].reshape(s, n, h8, w8, -1)
    f_locs = enc[s * n :].reshape(s, n, h8, w8, -1)

    # --- Sequential cells (slots: dflow<-carry, flow_ini<-direct,
    # F2n<-local; see _accflow_forward_f0n) ---
    def cell(flow_carry, xs):
        f_dir, f_loc, emap_i, c_prev32 = xs
        flow_carry = lax.stop_gradient(flow_carry)
        f = flow_encoder(params["flow_encoder"], flow_carry.astype(cd))
        o = photometric_occ(flow_carry, c0_32, c_prev32)
        o = lax.stop_gradient(o)
        f_acc = accplus(params["accplus"], f, f_loc, o.astype(cd), c0)
        f_fuse = blending(params["blending"], f_dir, f_acc, emap_i.astype(cd))
        out_small, out = flow_decoder(params["flow_decoder"], f_fuse)
        return out_small.astype(jnp.float32), out.astype(jnp.float32)

    cell = _remat_wrap(cell, cfg.remat)

    _, outs = lax.scan(
        cell, seed, (f_dirs, f_locs, emap, ctx32[1:-1]),
        unroll=min(cfg.acc_unroll, s),
    )
    return outs


def _accflow_forward_fused(
    params: Params,
    ofe: OfeFn,
    images: jnp.ndarray,
    cfg: AccFlowConfig,
    ofe_pairs=None,
) -> jnp.ndarray:
    """Fused-OFE accumulation (see AccFlowConfig.fused_ofe).

    Precomputes everything that does not depend on the recurrence —
    all pair flows (one OFE call), per-frame context features, occlusion
    maps, and the flow encodings of the precomputed flows — then scans
    only the sequential cell modules (encode carry, AccPlus, blending,
    decoder). Numerically equivalent to the stepwise path.
    """
    t, n, h, w, _ = images.shape
    cd = jnp.dtype(cfg.compute_dtype)
    s = t - 2  # number of accumulation steps / outputs

    # --- One batched OFE call for every pair flow of the clip ---
    # order: [dflow_2..dflow_{T-1} | ini_2..ini_{T-1} | seed]
    src_idx = tuple(range(2, t)) + tuple(range(2, t)) + (1,)
    dst_idx = tuple(range(1, t - 1)) + (0,) * s + (0,)
    if ofe_pairs is not None:
        # Deduplicated-encode path: each unique frame is encoded once
        # inside the estimator (raft_pairs_forward / gma_pairs_forward).
        full_flows = ofe_pairs(images, src_idx, dst_idx)
    else:
        srcs = jnp.concatenate([images[i] for i in src_idx], axis=0)
        dsts = jnp.concatenate([images[i] for i in dst_idx], axis=0)
        full_flows = ofe(srcs, dsts)
    flows = lax.stop_gradient(downflow8(full_flows))
    dflows = flows[: s * n].reshape(s, n, h // 8, w // 8, 2)
    inis = flows[s * n : 2 * s * n].reshape(s, n, h // 8, w // 8, 2)
    seed = flows[2 * s * n :]  # (N, h8, w8, 2) = F_{1,0}

    # --- Per-frame context features, one batched encode ---
    ctx = basic_encoder(
        params["context"], images.reshape(t * n, h, w, 3).astype(cd), "none",
        stem_s2d=cfg.stem_s2d,
    ).reshape(t, n, h // 8, w // 8, -1)
    ctx32 = ctx.astype(jnp.float32)

    # --- Occlusion / error maps (detached in the reference) ---
    h8, w8 = h // 8, w // 8
    o = photometric_occ(
        dflows.reshape(s * n, h8, w8, 2),
        ctx32[2:].reshape(s * n, h8, w8, -1),
        ctx32[1:-1].reshape(s * n, h8, w8, -1),
    )
    o = lax.stop_gradient(o).reshape(s, n, h8, w8, 1)
    emap = photometric_occ(
        inis.reshape(s * n, h8, w8, 2),
        ctx32[2:].reshape(s * n, h8, w8, -1),
        jnp.broadcast_to(ctx32[0][None], (s, n, h8, w8, ctx.shape[-1])).reshape(
            s * n, h8, w8, -1
        ),
        binary=False,
    )
    emap = lax.stop_gradient(emap).reshape(s, n, h8, w8, -1)

    # --- Encode the precomputed flows once ---
    enc = flow_encoder(
        params["flow_encoder"],
        jnp.concatenate(
            [inis.reshape(s * n, h8, w8, 2), dflows.reshape(s * n, h8, w8, 2)],
            axis=0,
        ).astype(cd),
    )
    f_inis = enc[: s * n].reshape(s, n, h8, w8, -1)
    dfs = enc[s * n :].reshape(s, n, h8, w8, -1)

    # --- Sequential cells ---
    def cell(flow_carry, xs):
        f_ini, df, o_i, emap_i, c_i = xs
        flow_carry = lax.stop_gradient(flow_carry)
        f = flow_encoder(params["flow_encoder"], flow_carry.astype(cd))
        f_acc = accplus(params["accplus"], df, f, o_i.astype(cd), c_i)
        f_fuse = blending(params["blending"], f_ini, f_acc, emap_i.astype(cd))
        out_small, out = flow_decoder(params["flow_decoder"], f_fuse)
        return out_small.astype(jnp.float32), out.astype(jnp.float32)

    cell = _remat_wrap(cell, cfg.remat)

    _, outs = lax.scan(
        cell, seed, (f_inis, dfs, o, emap, ctx[2:]),
        unroll=min(cfg.acc_unroll, s),
    )
    return outs


def accflow_forward(
    params: Params,
    ofe: OfeFn,
    images: jnp.ndarray,
    cfg: AccFlowConfig = AccFlowConfig(),
    ofe_pairs=None,
):
    """Accumulate long-range flow over a clip.

    images: (T, N, H, W, 3) normalized frames [I0 ... I_{T-1}], T >= 3.
    ofe_pairs: optional pair-batched estimator closure
    (frames, src_idx, dst_idx) -> (P*N, H, W, 2) flows with deduplicated
    frame encoding (FlowEstimator.pairs_fn); used by the fused path.
    Returns (T-2, N, H, W, 2) float32: [F_{2,0}, ..., F_{T-1,0}] at full
    resolution (AccFlow_.py:157-175 collects the same list); with
    cfg.direction="forward", [F_{0,2}, ..., F_{0,T-1}] instead (the F0N
    ablation — see _accflow_forward_f0n).
    """
    t = images.shape[0]
    if t < 3:
        raise ValueError("AccFlow needs at least 3 frames")

    if cfg.direction == "forward":
        if cfg.warm_start:
            raise ValueError("warm_start is a backward-direction feature")
        if cfg.fused_ofe:
            return _accflow_forward_f0n_fused(params, ofe, images, cfg, ofe_pairs)
        return _accflow_forward_f0n(params, ofe, images, cfg)
    if cfg.direction != "backward":
        raise ValueError(f"unknown accumulation direction: {cfg.direction!r}")

    if cfg.warm_start:
        return _accflow_forward_warmstart(params, ofe, images, cfg)
    if cfg.fused_ofe:
        return _accflow_forward_fused(params, ofe, images, cfg, ofe_pairs)

    In = images[0]
    cell = _remat_wrap(_accflow_cell, cfg.remat, static_argnums=(1, 6))

    # First step (i=2): OFE also estimates the seed flow F_{1,0}.
    flow, out0 = cell(params, ofe, images[2], images[1], In, None, cfg)

    if t == 3:
        return out0[None]

    def step(flow, frames):
        I1, I2 = frames
        flow = lax.stop_gradient(flow)
        flow, out = cell(params, ofe, I1, I2, In, flow, cfg)
        return flow, out

    xs = (images[3:], images[2:-1])
    _, outs = lax.scan(step, flow, xs)
    return jnp.concatenate([out0[None], outs], axis=0)
