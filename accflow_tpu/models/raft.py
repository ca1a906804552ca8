"""RAFT optical-flow estimator, TPU-native.

Rebuilt from the behavior of networks/raft/raft.py and networks/raft/update.py:
- fnet: BasicEncoder(256, instance norm) over both frames (batched);
  features cast to float32 for the correlation volume (raft.py:107-112).
- cnet: BasicEncoder(256, batch norm) -> tanh(net) | relu(inp) (raft.py:115-119).
- Iterative updates: corr lookup -> BasicMotionEncoder -> SepConvGRU ->
  FlowHead (+ 0.25-scaled upsample-mask head), coords detached each step
  (raft.py:127-144). Here the fixed-iteration loop is a `lax.scan` with
  `stop_gradient` standing in for .detach(), so the whole forward jits to a
  single XLA program.

Mixed precision mirrors the reference's autocast boundaries: encoders and
the update block run in `compute_dtype` (bfloat16 on TPU), the correlation
volume, coordinate state, and upsampling run float32.

The committed reference forward returns only the final flow (raft.py:146) and
silently ignores `test_mode`; upstream RAFT returned the 12-prediction list
in training and (flow_low, flow_up) in test mode. We return everything and
let callers pick (SURVEY.md §3.4 documents the divergence).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from accflow_tpu.models.encoders import (
    basic_encoder,
    init_basic_encoder,
    init_small_encoder,
    small_encoder,
)
from accflow_tpu.nn.layers import conv2d, init_conv, relu
from accflow_tpu.ops.corr import (
    build_corr_operands,
    is_ondemand,
    ondemand_chunk,
    prepare_ondemand_chunks,
    normalize_corr_lookup,
    resolve_auto_lookup,
    lookup,
    lookup_corr_split,
    lookup_corr_split_packed,
    lookup_corr_split_v2,
)
from accflow_tpu.ops.grids import coords_grid, upflow8
from accflow_tpu.ops.upsample import convex_upsample

Params = dict


@dataclasses.dataclass(frozen=True)
class RAFTConfig:
    small: bool = False
    corr_levels: int = 4
    corr_radius: int = 4
    iters: int = 12
    compute_dtype: str = "bfloat16"
    # Corr volume storage dtype: float32 (reference-exact) or bfloat16
    # (halves volume HBM footprint + lookup traffic; values are quantized
    # to bf16, which the bf16 update block does anyway after lookup).
    corr_volume_dtype: str = "float32"
    # Corr lookup implementation (all numerically equivalent; measured
    # trade-offs in PARITY.md): "fused" (default — per-level windows
    # einsummed into convc1), "mm", "rows", "patch", "gather", "packed",
    # "packed2", "fusedv", "fused_vy[_cat]", "fused_cat", "fused_bd[2]",
    # "fused_mix:<l0,l1,l2,l3>", "pallas" (per-query kernel),
    # "pallas_fused" (all-levels kernel; inference-only, guarded),
    # "ondemand[:chunk]" (volume-free streaming recompute — the hi-res
    # memory mode, see ops/corr.py::OnDemandCorr), or "auto" (fused while
    # the stored volume fits AUTO_VOLUME_BYTES, ondemand beyond).
    corr_lookup: str = "fused"
    # Unroll factor for the GRU-iteration lax.scan. The serving trace
    # attributes ~7 ms/step to while-loop boundary slice/copy ops; unrolling
    # trades compile time for their removal + cross-iteration fusion.
    scan_unroll: int = 1
    # Rematerialization policy for the GRU scan body under grad (the
    # fine-tune path — the only place the backward runs through this
    # scan). "none" lets XLA stack every per-iteration intermediate for
    # the backward (the r4 fine-tune trace attributes ~39 ms/step, 25%,
    # to that raft.py:638 dus/copy traffic); "dots" saves only matmul/conv
    # outputs (jax.checkpoint_policies.checkpoint_dots) and recomputes the
    # elementwise glue; "full" saves nothing but the carry. No effect on
    # inference (checkpoint is an identity without differentiation).
    scan_remat: str = "none"
    # Space-to-depth stem: run the 7x7/2 stem as an exact 4x4/1 conv on
    # 2x2-folded input (12 channels instead of 3 on the MXU contraction).
    stem_s2d: bool = False

    @property
    def corr_precision(self) -> str:
        """MXU precision for corr construction/lookup: exact f32 emulation
        when the model computes in float32 (parity paths); single-pass when
        the features are bfloat16-valued anyway (same products, ~6x faster)."""
        return "highest" if jnp.dtype(self.compute_dtype) == jnp.float32 else "default"

    @property
    def hidden_dim(self) -> int:
        return 96 if self.small else 128

    @property
    def context_dim(self) -> int:
        return 64 if self.small else 128

    @property
    def radius(self) -> int:
        return 3 if self.small else self.corr_radius

    @property
    def corr_planes(self) -> int:
        return self.corr_levels * (2 * self.radius + 1) ** 2


# ---------------------------------------------------------------------------
# Update-block submodules (networks/raft/update.py)
# ---------------------------------------------------------------------------

def init_flow_head(key: jax.Array, input_dim: int = 128, hidden_dim: int = 256) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "conv1": init_conv(k1, input_dim, hidden_dim, 3),
        "conv2": init_conv(k2, hidden_dim, 2, 3),
    }


def flow_head(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return conv2d(p["conv2"], relu(conv2d(p["conv1"], x)))


def init_sep_conv_gru(key: jax.Array, hidden_dim: int, input_dim: int) -> Params:
    ks = jax.random.split(key, 6)
    cat = hidden_dim + input_dim
    return {
        "convz1": init_conv(ks[0], cat, hidden_dim, (1, 5)),
        "convr1": init_conv(ks[1], cat, hidden_dim, (1, 5)),
        "convq1": init_conv(ks[2], cat, hidden_dim, (1, 5)),
        "convz2": init_conv(ks[3], cat, hidden_dim, (5, 1)),
        "convr2": init_conv(ks[4], cat, hidden_dim, (5, 1)),
        "convq2": init_conv(ks[5], cat, hidden_dim, (5, 1)),
    }


def sep_conv_gru(p: Params, h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Separable (1x5 then 5x1) ConvGRU (update.py:33-60)."""
    for axis in ("1", "2"):
        hx = jnp.concatenate([h, x], axis=-1)
        z = jax.nn.sigmoid(conv2d(p[f"convz{axis}"], hx))
        r = jax.nn.sigmoid(conv2d(p[f"convr{axis}"], hx))
        q = jnp.tanh(conv2d(p[f"convq{axis}"], jnp.concatenate([r * h, x], axis=-1)))
        h = (1.0 - z) * h + z * q
    return h


def make_fused_sep_gru(p: Params, inp: jnp.ndarray, hidden_dim: int):
    """Build a fast SepConvGRU step specialized to a fixed `inp` prefix.

    The GRU input inside the RAFT/GMA refinement loop is
    ``x = cat(inp, varying)`` where `inp` (the context features) never
    changes across iterations (raft.py:119 computes it once). Convolution
    is linear in its input channels, so each gate conv over
    ``hx = cat(h, inp, varying)`` splits into three channel-slices whose
    contributions add:

      conv(hx) = conv_h(h) + conv_inp(inp) + conv_var(varying) + bias

    `conv_inp(inp) + bias` is hoisted out of the scan (computed once here),
    and the remaining per-iteration convs are fused across gates into two
    larger MXU-friendly matmuls (z|r|q over `varying`, z|r over `h`; q's
    h-term uses r*h so it stays separate). Numerically identical to
    `sep_conv_gru(p, h, cat([inp, varying]))` up to float summation order.

    Returns step(h, varying) -> h.
    """
    hd = hidden_dim
    idim = inp.shape[-1]
    pre = {}
    for ax in ("1", "2"):
        gates = [p[f"convz{ax}"], p[f"convr{ax}"], p[f"convq{ax}"]]
        w_inp = jnp.concatenate([g["w"][:, :, hd : hd + idim, :] for g in gates], axis=-1)
        bias = jnp.concatenate([g["b"] for g in gates])
        pre[ax] = {
            "a_inp": conv2d({"w": w_inp, "b": bias}, inp),
            "w_var": jnp.concatenate([g["w"][:, :, hd + idim :, :] for g in gates], axis=-1),
            "w_h_zr": jnp.concatenate([g["w"][:, :, :hd, :] for g in gates[:2]], axis=-1),
            "w_h_q": gates[2]["w"][:, :, :hd, :],
        }

    def step(h: jnp.ndarray, varying: jnp.ndarray) -> jnp.ndarray:
        for ax in ("1", "2"):
            q = pre[ax]
            s = conv2d({"w": q["w_var"]}, varying) + q["a_inp"].astype(varying.dtype)
            hzr = conv2d({"w": q["w_h_zr"]}, h)
            z = jax.nn.sigmoid(hzr[..., :hd] + s[..., :hd])
            r = jax.nn.sigmoid(hzr[..., hd:] + s[..., hd : 2 * hd])
            qg = jnp.tanh(conv2d({"w": q["w_h_q"]}, r * h) + s[..., 2 * hd :])
            h = (1.0 - z) * h + z * qg
        return h

    return step


def init_conv_gru(key: jax.Array, hidden_dim: int, input_dim: int) -> Params:
    ks = jax.random.split(key, 3)
    cat = hidden_dim + input_dim
    return {
        "convz": init_conv(ks[0], cat, hidden_dim, 3),
        "convr": init_conv(ks[1], cat, hidden_dim, 3),
        "convq": init_conv(ks[2], cat, hidden_dim, 3),
    }


def conv_gru(p: Params, h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    hx = jnp.concatenate([h, x], axis=-1)
    z = jax.nn.sigmoid(conv2d(p["convz"], hx))
    r = jax.nn.sigmoid(conv2d(p["convr"], hx))
    q = jnp.tanh(conv2d(p["convq"], jnp.concatenate([r * h, x], axis=-1)))
    return (1.0 - z) * h + z * q


def init_basic_motion_encoder(key: jax.Array, corr_planes: int) -> Params:
    ks = jax.random.split(key, 5)
    return {
        "convc1": init_conv(ks[0], corr_planes, 256, 1),
        "convc2": init_conv(ks[1], 256, 192, 3),
        "convf1": init_conv(ks[2], 2, 128, 7),
        "convf2": init_conv(ks[3], 128, 64, 3),
        "conv": init_conv(ks[4], 64 + 192, 128 - 2, 3),
    }


def basic_motion_encoder_split(
    p: Params, flow: jnp.ndarray, corr_levels: list
) -> jnp.ndarray:
    """basic_motion_encoder with convc1 fused over unflattened per-level
    windows (see ops/corr.py::lookup_corr_split). convc1 is 1x1, so
    convc1(cat(levels)) == sum_l einsum(level_l, W_l) with W reshaped
    (num_levels, 9, 9, 256) — level-major, x-offset-major, matching the
    reference's corr channel layout."""
    num = corr_levels[0].shape[-1]
    nlev = sum(1 if part.ndim == 5 else part.shape[3] for part in corr_levels)
    wc = p["convc1"]["w"].reshape(nlev, num, num, -1)
    cd = corr_levels[0].dtype
    prec = "highest" if cd == jnp.float32 else "default"
    cor = p["convc1"]["b"].astype(cd)
    li = 0
    for part in corr_levels:
        if part.ndim == 5:  # (N, H, W, 9, 9) single level
            cor = cor + jnp.einsum(
                "nhwab,abo->nhwo", part, wc[li].astype(cd),
                precision=prec, preferred_element_type=cd,
            )
            li += 1
        else:  # (N, H, W, L, 9, 9) packed levels
            ln = part.shape[3]
            cor = cor + jnp.einsum(
                "nhwlab,labo->nhwo", part, wc[li : li + ln].astype(cd),
                precision=prec, preferred_element_type=cd,
            )
            li += ln
    cor = relu(cor)
    cor = relu(conv2d(p["convc2"], cor))
    flo = relu(conv2d(p["convf1"], flow))
    flo = relu(conv2d(p["convf2"], flo))
    out = relu(conv2d(p["conv"], jnp.concatenate([cor, flo], axis=-1)))
    return jnp.concatenate([out, flow], axis=-1)


def basic_motion_encoder_stacked(
    p: Params, flow: jnp.ndarray, corr_levels: list
) -> jnp.ndarray:
    """basic_motion_encoder_split with convc1 as ONE dense
    (Q, L*81) x (L*81, 256) GEMM over the stacked level windows.

    The per-level "nhwab,abo->nhwo" einsums traced at 6.2 TF/s (r2): their
    K=81 contraction pads to 128 lanes and each level pays its own
    dispatch. Stacking the four (N, H, W, 9, 9) windows into (N, H, W,
    324) makes convc1 a single well-shaped GEMM. The stack order (level,
    a, b) is exactly the reference's corr channel layout, so the weight
    reshape is free."""
    num = corr_levels[0].shape[-1]
    cat = jnp.stack(corr_levels, axis=3)  # (N, H, W, L, 9, 9)
    n, h, w, nlev = cat.shape[:4]
    x = cat.reshape(n, h, w, nlev * num * num)
    cd = x.dtype
    prec = "highest" if cd == jnp.float32 else "default"
    wc = p["convc1"]["w"].reshape(nlev * num * num, -1).astype(cd)
    cor = jnp.einsum(
        "nhwk,ko->nhwo", x, wc, precision=prec, preferred_element_type=cd
    ) + p["convc1"]["b"].astype(cd)
    cor = relu(cor)
    cor = relu(conv2d(p["convc2"], cor))
    flo = relu(conv2d(p["convf1"], flow))
    flo = relu(conv2d(p["convf2"], flo))
    out = relu(conv2d(p["conv"], jnp.concatenate([cor, flo], axis=-1)))
    return jnp.concatenate([out, flow], axis=-1)


def basic_motion_encoder(p: Params, flow: jnp.ndarray, corr: jnp.ndarray) -> jnp.ndarray:
    cor = relu(conv2d(p["convc1"], corr, padding=0))
    cor = relu(conv2d(p["convc2"], cor))
    flo = relu(conv2d(p["convf1"], flow))
    flo = relu(conv2d(p["convf2"], flo))
    out = relu(conv2d(p["conv"], jnp.concatenate([cor, flo], axis=-1)))
    return jnp.concatenate([out, flow], axis=-1)


def init_small_motion_encoder(key: jax.Array, corr_planes: int) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "convc1": init_conv(ks[0], corr_planes, 96, 1),
        "convf1": init_conv(ks[1], 2, 64, 7),
        "convf2": init_conv(ks[2], 64, 32, 3),
        "conv": init_conv(ks[3], 128, 80, 3),
    }


def small_motion_encoder(p: Params, flow: jnp.ndarray, corr: jnp.ndarray) -> jnp.ndarray:
    cor = relu(conv2d(p["convc1"], corr, padding=0))
    flo = relu(conv2d(p["convf1"], flow))
    flo = relu(conv2d(p["convf2"], flo))
    out = relu(conv2d(p["conv"], jnp.concatenate([cor, flo], axis=-1)))
    return jnp.concatenate([out, flow], axis=-1)


def init_basic_update_block(key: jax.Array, cfg: RAFTConfig, hidden_dim: int = 128) -> Params:
    ks = jax.random.split(key, 5)
    return {
        "encoder": init_basic_motion_encoder(ks[0], cfg.corr_planes),
        "gru": init_sep_conv_gru(ks[1], hidden_dim, 128 + hidden_dim),
        "flow_head": init_flow_head(ks[2], hidden_dim, 256),
        "mask": {
            "0": init_conv(ks[3], 128, 256, 3),
            "2": init_conv(ks[4], 256, 64 * 9, 1),
        },
    }


def mask_head_s_major(p: Params) -> Params:
    """Permute the mask head's final conv output channels into the
    (sub-pixel, tap) layout that convex_upsample(s_major=True) consumes
    without the whole-mask swapaxes relayout. A 576-wide weight gather —
    call ONCE outside the GRU scan (XLA's loop-invariant hoisting across
    scan bodies is not guaranteed) and pass the result to upsample_mask.
    Parameters stay in the canonical checkpoint layout."""
    from accflow_tpu.ops.upsample import mask_s_major_perm

    w2 = p["mask"]["2"]
    perm = jnp.asarray(mask_s_major_perm(w2["b"].shape[0]))
    return {"w": jnp.take(w2["w"], perm, axis=-1), "b": jnp.take(w2["b"], perm)}


def upsample_mask(p: Params, net, s_major: bool = False, w2: Optional[Params] = None) -> jnp.ndarray:
    """0.25-scaled convex-upsampling mask head (update.py:122-125,135).

    s_major=True permutes the final conv's channels via mask_head_s_major;
    pass a precomputed `w2` when calling inside a scan body."""
    if w2 is None:
        w2 = mask_head_s_major(p) if s_major else p["mask"]["2"]
    return 0.25 * conv2d(w2, relu(conv2d(p["mask"]["0"], net)), padding=0)


def basic_update_block(p: Params, net, inp, corr, flow, with_mask: bool = True):
    motion = basic_motion_encoder(p["encoder"], flow, corr)
    gru_in = jnp.concatenate([inp, motion], axis=-1)
    net = sep_conv_gru(p["gru"], net, gru_in)
    delta = flow_head(p["flow_head"], net)
    mask = upsample_mask(p, net) if with_mask else None
    return net, mask, delta


def init_small_update_block(key: jax.Array, cfg: RAFTConfig, hidden_dim: int = 96) -> Params:
    ks = jax.random.split(key, 3)
    return {
        "encoder": init_small_motion_encoder(ks[0], cfg.corr_planes),
        "gru": init_conv_gru(ks[1], hidden_dim, 82 + 64),
        "flow_head": init_flow_head(ks[2], hidden_dim, 128),
    }


def small_update_block(p: Params, net, inp, corr, flow, with_mask: bool = True):
    del with_mask  # the small model has no learned upsampling mask
    motion = small_motion_encoder(p["encoder"], flow, corr)
    gru_in = jnp.concatenate([inp, motion], axis=-1)
    net = conv_gru(p["gru"], net, gru_in)
    delta = flow_head(p["flow_head"], net)
    return net, None, delta


# ---------------------------------------------------------------------------
# RAFT
# ---------------------------------------------------------------------------

def init_raft(key: jax.Array, cfg: RAFTConfig = RAFTConfig()) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    hdim, cdim = cfg.hidden_dim, cfg.context_dim
    if cfg.small:
        return {
            "fnet": init_small_encoder(k1, output_dim=128, norm_fn="instance"),
            "cnet": init_small_encoder(k2, output_dim=hdim + cdim, norm_fn="none"),
            "update_block": init_small_update_block(k3, cfg, hdim),
        }
    return {
        "fnet": init_basic_encoder(k1, 3, output_dim=256, norm_fn="instance"),
        "cnet": init_basic_encoder(k2, 3, output_dim=hdim + cdim, norm_fn="batch"),
        "update_block": init_basic_update_block(k3, cfg, hdim),
    }


def raft_fnet(params: Params, images: jnp.ndarray, cfg: RAFTConfig) -> jnp.ndarray:
    """Feature encoder over a batch of frames (any batching — instance
    norm is per-sample, so results are independent of how frames are
    grouped)."""
    cd = jnp.dtype(cfg.compute_dtype)
    enc = small_encoder if cfg.small else basic_encoder
    return enc(params["fnet"], images.astype(cd), "instance",
               stem_s2d=cfg.stem_s2d)


def raft_cnet(params: Params, image1: jnp.ndarray, cfg: RAFTConfig, train: bool = False):
    """Context encoder -> (net, inp) initial state. train=True uses
    batch-stat BatchNorm and stashes running-stat updates (the reference
    fine-tunes with model.train(): fine_tune.py:163)."""
    cd = jnp.dtype(cfg.compute_dtype)
    if cfg.small:
        cnet_out = small_encoder(params["cnet"], image1.astype(cd), "none", train,
                                 stem_s2d=cfg.stem_s2d)
    else:
        cnet_out = basic_encoder(params["cnet"], image1.astype(cd), "batch", train,
                                 stem_s2d=cfg.stem_s2d)
    hdim = cfg.hidden_dim
    net = jnp.tanh(cnet_out[..., :hdim])
    inp = jax.nn.relu(cnet_out[..., hdim:])
    return net, inp


def raft_features(params: Params, image1, image2, cfg: RAFTConfig, train: bool = False):
    """Encoders + correlation pyramid + initial state (everything outside
    the iteration loop). `train` affects the cnet's BatchNorm only (the
    fnet's instance norm is mode-independent)."""
    n = image1.shape[0]
    fmaps = raft_fnet(params, jnp.concatenate([image1, image2], axis=0), cfg)
    fmap1, fmap2 = fmaps[:n], fmaps[n:]
    pyramid = build_corr_operands(
        fmap1.astype(jnp.float32), fmap2.astype(jnp.float32), cfg.corr_levels,
        cfg.corr_lookup,
        precision=cfg.corr_precision, dtype=jnp.dtype(cfg.corr_volume_dtype),
    )
    net, inp = raft_cnet(params, image1, cfg, train)
    return pyramid, net, inp


def raft_forward(
    params: Params,
    image1: jnp.ndarray,
    image2: jnp.ndarray,
    cfg: RAFTConfig = RAFTConfig(),
    iters: Optional[int] = None,
    flow_init: Optional[jnp.ndarray] = None,
    final_only: bool = False,
    train: bool = False,
):
    """Estimate flow image1 -> image2.

    images: (N, H, W, 3) normalized to [-1, 1] (the engines apply
    2*(x/255)-1, mirroring test_cvo.py:41 / train_acc.py:62).
    flow_init: optional (N, H/8, W/8, 2) warm start (raft.py:123-124).
    final_only: skip the per-iteration convex upsampling and upsample only
    the last flow (the reference upsamples every iteration and discards
    11 of 12 at eval — raft.py:139-144,146); exact same final flow, no
    `predictions` in the result. Use for eval / frozen-OFE calls.

    Returns dict:
      flow_up     — final full-res flow (N, H, W, 2) float32
      predictions — (iters, N, H, W, 2) per-iteration flows (unless
                    final_only)
      flow_low    — final 1/8-res flow (N, H/8, W/8, 2)
    """
    iters = cfg.iters if iters is None else iters
    n, h, w = image1.shape[0], image1.shape[1], image1.shape[2]
    cfg = dataclasses.replace(cfg, corr_lookup=resolve_auto_lookup(
        normalize_corr_lookup(cfg.corr_lookup), n, h // 8, w // 8,
        num_levels=cfg.corr_levels,
        dtype=jnp.dtype(cfg.corr_volume_dtype)))
    pyramid, net, inp = raft_features(params, image1, image2, cfg, train)
    return raft_iterate(
        params, pyramid, net, inp, cfg, iters=iters, flow_init=flow_init,
        final_only=final_only,
    )


def apply_scan_remat(step, scan_remat: str):
    """Wrap a lax.scan body in jax.checkpoint per the scan_remat knob.

    Under grad, lax.scan stacks every intermediate the backward needs via
    per-iteration dynamic-update-slices (the r4 fine-tune trace puts that
    boundary traffic at ~25% of the step). "dots" keeps matmul/conv
    outputs and recomputes elementwise glue; "full" recomputes the whole
    body from the carry. prevent_cse=False is safe (and free) inside scan.
    """
    if scan_remat == "none":
        return step
    if scan_remat == "full":
        return jax.checkpoint(step, prevent_cse=False)
    if scan_remat == "dots":
        return jax.checkpoint(
            step, prevent_cse=False,
            policy=jax.checkpoint_policies.checkpoint_dots,
        )
    raise ValueError(
        f"scan_remat must be none|dots|full, got {scan_remat!r}"
    )


def raft_iterate(
    params: Params,
    pyramid,
    net: jnp.ndarray,
    inp: jnp.ndarray,
    cfg: RAFTConfig,
    iters: int,
    flow_init: Optional[jnp.ndarray] = None,
    final_only: bool = False,
):
    """The scanned GRU refinement loop, shared by raft_forward and the
    pair-batched path (raft_pairs_forward)."""
    cd = jnp.dtype(cfg.compute_dtype)
    n, h8, w8 = net.shape[0], net.shape[1], net.shape[2]

    coords0 = coords_grid(n, h8, w8)
    coords1 = coords0
    if flow_init is not None:
        coords1 = coords1 + flow_init.astype(jnp.float32)

    ub = params["update_block"]
    gru_step = (
        None if cfg.small else make_fused_sep_gru(ub["gru"], inp, cfg.hidden_dim)
    )
    # s-major mask head, permuted once outside the scan (see mask_head_s_major).
    w2s = None if cfg.small else mask_head_s_major(ub)

    pf_ops = pf_plan = None
    lookup_impl = cfg.corr_lookup
    if is_ondemand(lookup_impl):
        # Chunk-major f1 layout hoisted out of the scan (loop-invariant).
        pyramid = prepare_ondemand_chunks(pyramid, ondemand_chunk(lookup_impl))
    if lookup_impl == "pallas_fused" and not cfg.small:
        # Fused Pallas lookup (ops/corr_pallas.py): repack the pyramid into
        # the kernel's streaming layouts ONCE, outside the scan (manual
        # hoist — XLA's loop-invariant motion across scan bodies is not
        # guaranteed). No autodiff rule: inference / frozen-OFE use only.
        from accflow_tpu.ops.corr_pallas import (
            fused_lookup_supported,
            lookup_corr_fused,
            prepare_fused_lookup_operands,
        )

        if jax.default_backend() == "tpu" and not fused_lookup_supported(
            pyramid, cfg.radius
        ):
            lookup_impl = "fused"  # tiny levels: Mosaic shape-cast limits
        else:
            pf_ops, pf_plan = prepare_fused_lookup_operands(
                pyramid, cfg.radius, stream_dtype=cd
            )

    def step(carry, _):
        net, coords1 = carry
        coords1 = lax.stop_gradient(coords1)
        flow = coords1 - coords0
        if cfg.small:
            # The small path has no split-window consumer: any fused-family
            # or kernel impl maps to the equivalent flat mm lookup.
            impl = (
                cfg.corr_lookup
                if cfg.corr_lookup in ("mm", "rows", "patch", "gather", "pallas")
                or is_ondemand(cfg.corr_lookup)
                else "mm"
            )
            corr = lookup(
                pyramid, coords1, cfg.radius,
                impl=impl, precision=cfg.corr_precision,
            )
            net, mask, delta = small_update_block(
                ub, net, inp, corr.astype(cd), flow.astype(cd),
                with_mask=not final_only,
            )
        else:
            if lookup_impl == "pallas_fused":
                corr = lookup_corr_fused(
                    pf_ops, pf_plan, coords1, cfg.radius, stream_dtype=cd
                )
                motion = basic_motion_encoder(
                    ub["encoder"], flow.astype(cd), corr.astype(cd)
                )
            elif lookup_impl.startswith("fused_mix:") or lookup_impl in (
                "fused", "fusedv", "packed", "packed2", "fused_vy", "fused_cat",
                "fused_vy_cat", "fused_bd", "fused_bd2",
            ):
                if lookup_impl.startswith("fused_mix:"):
                    # Per-level impl mix, e.g. "fused_mix:mm,vpu_y,vpu_y,mm"
                    corr_l = lookup_corr_split_v2(
                        pyramid, coords1, cfg.radius,
                        precision=cfg.corr_precision,
                        level_impl=tuple(lookup_impl.split(":", 1)[1].split(",")),
                    )
                elif lookup_impl in ("packed", "packed2"):
                    corr_l = lookup_corr_split_packed(
                        pyramid, coords1, cfg.radius,
                        precision=cfg.corr_precision,
                        start=1 if lookup_impl == "packed" else 2,
                    )
                elif lookup_impl in ("fused_bd", "fused_bd2"):
                    # Block-diagonal Pallas MXU y-contraction for the big
                    # levels (ops/corr_pallas.py::y_contract_bd).
                    nbd = 2 if lookup_impl == "fused_bd2" else 1
                    corr_l = lookup_corr_split_v2(
                        pyramid, coords1, cfg.radius,
                        precision=cfg.corr_precision,
                        level_impl=("bd",) * nbd + ("mm",) * (4 - nbd),
                    )
                elif lookup_impl in ("fused_vy", "fused_vy_cat"):
                    # VPU y-contraction: streams the volume without the
                    # batched-tiny-matmul dispatch stalls (see ops/corr.py).
                    corr_l = lookup_corr_split_v2(
                        pyramid, coords1, cfg.radius,
                        precision=cfg.corr_precision,
                        level_impl=("vpu_y",) * 4,
                    )
                else:
                    corr_l = lookup_corr_split(
                        pyramid, coords1, cfg.radius,
                        precision=cfg.corr_precision,
                        x_contraction="vpu" if lookup_impl == "fusedv" else "mxu",
                    )
                if lookup_impl in ("fused_cat", "fused_vy_cat"):
                    motion = basic_motion_encoder_stacked(
                        ub["encoder"], flow.astype(cd),
                        [c.astype(cd) for c in corr_l],
                    )
                else:
                    motion = basic_motion_encoder_split(
                        ub["encoder"], flow.astype(cd),
                        [c.astype(cd) for c in corr_l],
                    )
            else:
                corr = lookup(
                    pyramid, coords1, cfg.radius,
                    impl=lookup_impl, precision=cfg.corr_precision,
                )
                motion = basic_motion_encoder(
                    ub["encoder"], flow.astype(cd), corr.astype(cd)
                )
            net = gru_step(net, motion)
            delta = flow_head(ub["flow_head"], net)
            mask = upsample_mask(ub, net, w2=w2s) if not final_only else None
        coords1 = coords1 + delta.astype(jnp.float32)
        if final_only:
            return (net, coords1), None
        if mask is None:
            flow_up = upflow8(coords1 - coords0)
        else:
            flow_up = convex_upsample(coords1 - coords0, mask, s_major=True)
        return (net, coords1), flow_up

    (net, coords1), flows_up = lax.scan(
        apply_scan_remat(step, cfg.scan_remat), (net, coords1), None,
        length=iters, unroll=min(cfg.scan_unroll, iters),
    )

    if final_only:
        if cfg.small:
            flow_up = upflow8(coords1 - coords0)
        else:
            mask = upsample_mask(params["update_block"], net, w2=w2s)
            flow_up = convex_upsample(coords1 - coords0, mask, s_major=True)
        return {"flow_up": flow_up, "flow_low": coords1 - coords0}

    return {
        "flow_up": flows_up[-1],
        "predictions": flows_up,
        "flow_low": coords1 - coords0,
    }


def raft_encode_frame(params: Params, image: jnp.ndarray, cfg: RAFTConfig,
                      train: bool = False) -> dict:
    """Cacheable per-frame features for streaming serving
    (accflow_tpu/streaming.py): the fnet feature map plus the cnet
    (net, inp) initial state. fnet's instance norm and the frozen-BN
    cnet are per-sample, so encoding frames separately is exact vs the
    batched encodes of raft_forward/raft_pairs_forward."""
    fmap = raft_fnet(params, image, cfg)
    net, inp = raft_cnet(params, image, cfg, train)
    return {"fmap": fmap, "net": net, "inp": inp}


def raft_flow_pairs_from_features(
    params: Params,
    src: dict,
    dst_fmaps,
    cfg: RAFTConfig,
    iters: Optional[int] = None,
    flow_init: Optional[jnp.ndarray] = None,
    final_only: bool = True,
):
    """Pair flows src -> each dst with PRECOMPUTED features.

    src: raft_encode_frame of the query frame; dst_fmaps: list of P
    cached fnet maps. The streaming accumulator caches the anchor
    frame's and the previous frame's features in its carry, so each
    step encodes only the new frame (1 fnet + 1 cnet instead of the
    4 fnet + 2 cnet a plain 2-pair forward costs). Returns flow_up
    (P*N, H, W, 2), P-major; flow_init likewise (P*N, H/8, W/8, 2)."""
    iters = cfg.iters if iters is None else iters
    fmap1, net, inp = src["fmap"], src["net"], src["inp"]
    p = len(dst_fmaps)
    n, h8, w8 = fmap1.shape[0], fmap1.shape[1], fmap1.shape[2]
    cfg = dataclasses.replace(cfg, corr_lookup=resolve_auto_lookup(
        normalize_corr_lookup(cfg.corr_lookup), p * n, h8, w8,
        num_levels=cfg.corr_levels,
        dtype=jnp.dtype(cfg.corr_volume_dtype)))
    f1 = jnp.concatenate([fmap1] * p, axis=0).astype(jnp.float32)
    f2 = jnp.concatenate(list(dst_fmaps), axis=0).astype(jnp.float32)
    pyramid = build_corr_operands(
        f1, f2, cfg.corr_levels, cfg.corr_lookup,
        precision=cfg.corr_precision, dtype=jnp.dtype(cfg.corr_volume_dtype),
    )
    net = jnp.concatenate([net] * p, axis=0)
    inp = jnp.concatenate([inp] * p, axis=0)
    out = raft_iterate(params, pyramid, net, inp, cfg, iters=iters,
                       flow_init=flow_init, final_only=final_only)
    return out["flow_up"]


def raft_pairs_forward(
    params: Params,
    frames: jnp.ndarray,
    src_idx,
    dst_idx,
    cfg: RAFTConfig = RAFTConfig(),
    iters: Optional[int] = None,
    final_only: bool = True,
):
    """Flow for many (src, dst) frame pairs with deduplicated encoding.

    frames: (K, N, H, W, 3); src_idx/dst_idx: equal-length tuples of frame
    indices. Each unique frame is fnet-encoded once and each unique src
    frame cnet-encoded once; per-pair feature maps are then gathered —
    numerically identical to independent pair forwards (instance norm is
    per-sample, batch norm is frozen), but e.g. AccFlow's 11 clip queries
    cost 7 fnet + 6 cnet encodes instead of 22 + 11.

    Returns flow_up of shape (P*N, H, W, 2), pairs stacked P-major (the
    same layout as concatenating the per-pair batches).
    """
    iters = cfg.iters if iters is None else iters
    src_idx = tuple(int(i) for i in src_idx)
    dst_idx = tuple(int(i) for i in dst_idx)
    k, n, h, w, _ = frames.shape
    p = len(src_idx)
    cfg = dataclasses.replace(cfg, corr_lookup=resolve_auto_lookup(
        normalize_corr_lookup(cfg.corr_lookup), p * n, h // 8, w // 8,
        num_levels=cfg.corr_levels,
        dtype=jnp.dtype(cfg.corr_volume_dtype)))

    used = sorted(set(src_idx) | set(dst_idx))
    pos = {f: i for i, f in enumerate(used)}
    fmaps = raft_fnet(
        params, frames[jnp.asarray(used)].reshape(len(used) * n, h, w, 3), cfg
    ).reshape(len(used), n, h // 8, w // 8, -1)

    fmap1 = fmaps[jnp.asarray([pos[i] for i in src_idx])].reshape(p * n, h // 8, w // 8, -1)
    fmap2 = fmaps[jnp.asarray([pos[i] for i in dst_idx])].reshape(p * n, h // 8, w // 8, -1)
    pyramid = build_corr_operands(
        fmap1.astype(jnp.float32), fmap2.astype(jnp.float32), cfg.corr_levels,
        cfg.corr_lookup,
        precision=cfg.corr_precision, dtype=jnp.dtype(cfg.corr_volume_dtype),
    )

    src_used = sorted(set(src_idx))
    spos = {f: i for i, f in enumerate(src_used)}
    net_u, inp_u = raft_cnet(
        params, frames[jnp.asarray(src_used)].reshape(len(src_used) * n, h, w, 3), cfg
    )
    net_u = net_u.reshape(len(src_used), n, h // 8, w // 8, -1)
    inp_u = inp_u.reshape(len(src_used), n, h // 8, w // 8, -1)
    sel = jnp.asarray([spos[i] for i in src_idx])
    net = net_u[sel].reshape(p * n, h // 8, w // 8, -1)
    inp = inp_u[sel].reshape(p * n, h // 8, w // 8, -1)

    out = raft_iterate(params, pyramid, net, inp, cfg, iters=iters, final_only=final_only)
    return out["flow_up"]
