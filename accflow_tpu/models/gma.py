"""GMA (Global Motion Aggregation) flow estimator, TPU-native.

Rebuilt from networks/gma/gma.py, networks/gma/modules.py and
networks/gma/update.py. GMA is RAFT's skeleton plus a single-head
content-only attention over the context features:

- Attention (modules.py:34-76): q, k from one bias-free 1x1 conv on `inp`,
  q scaled by dim_head^-0.5, sim = q·k over the flattened H*W axis,
  softmax -> (B, heads, HW, HW). Computed ONCE per pair (gma.py:96) and
  reused every iteration. The factory's flags (networks/__init__.py:14-19)
  select the content-only branch; RelPosEmb exists upstream but is unused
  (we support content-only, matching released checkpoints).
- Aggregate (modules.py:79-115): v = bias-free 1x1 conv on the motion
  features, out = attn @ v, residual with learned scalar gamma (init 0).
- GMAUpdateBlock (update.py:112-139): GRU input = [inp, motion,
  motion_global] (128*3 channels).

TPU notes: at 1/8 resolution of 512^2 the attention is a (4096, 4096)
matmul + softmax — MXU-friendly. The softmax runs in float32; the stored
attention matrix is kept in compute dtype for the per-iteration
aggregation matmul.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from accflow_tpu.models.encoders import basic_encoder, init_basic_encoder
from accflow_tpu.models.raft import (
    RAFTConfig,
    apply_scan_remat,
    basic_motion_encoder,
    basic_motion_encoder_split,
    basic_motion_encoder_stacked,
    flow_head,
    init_basic_motion_encoder,
    init_flow_head,
    init_sep_conv_gru,
    make_fused_sep_gru,
    mask_head_s_major,
    sep_conv_gru,
    upsample_mask,
)
from accflow_tpu.nn.layers import conv2d, init_conv, relu
import accflow_tpu.ops.corr as _corr
from accflow_tpu.ops.corr import (
    _divisor_chunk,
    build_corr_operands,
    is_ondemand,
    ondemand_chunk,
    prepare_ondemand_chunks,
    normalize_corr_lookup,
    resolve_auto_lookup,
    stored_volume_bytes,
    lookup,
    lookup_corr_split,
    lookup_corr_split_packed,
    lookup_corr_split_v2,
)
from accflow_tpu.ops.grids import coords_grid
from accflow_tpu.ops.upsample import convex_upsample

Params = dict


@dataclasses.dataclass(frozen=True)
class GMAConfig:
    num_heads: int = 1
    corr_levels: int = 4
    corr_radius: int = 4
    iters: int = 12
    compute_dtype: str = "bfloat16"
    hidden_dim: int = 128
    context_dim: int = 128
    dim_head: int = 128
    # Attention similarity branches (networks/gma/modules.py:62-71). The
    # released checkpoints use content-only (both False — the factory's
    # defaults, networks/__init__.py:14-19); the positional branches are
    # provided for full upstream API coverage.
    position_only: bool = False
    position_and_content: bool = False
    max_pos_size: int = 160
    # Corr volume storage dtype: float32 (reference-exact) or bfloat16
    # (halves volume HBM footprint + lookup traffic; values are quantized
    # to bf16, which the bf16 update block does anyway after lookup).
    corr_volume_dtype: str = "float32"
    # Corr lookup implementation (see ops/corr.py and models/raft.py's
    # RAFTConfig for the full list; measured trade-offs in PARITY.md).
    corr_lookup: str = "fused"
    # GRU-iteration lax.scan unroll factor (see RAFTConfig.scan_unroll).
    scan_unroll: int = 1
    # Remat policy for the GRU scan body under grad (none|dots|full — see
    # RAFTConfig.scan_remat).
    scan_remat: str = "none"
    # Chunked on-demand attention: 0 stores the full (HW, HW) softmaxed
    # attention matrix once per pair (the reference's layout, gma.py:96);
    # >0 keeps only q/k and recomputes softmax(q_c k^T) v per query chunk
    # at every aggregate call. O(chunk*HW) memory instead of O((HW)^2) —
    # at 1024^2 inputs the stored matrix alone is 1 GB bf16 plus a 4 GB
    # f32 softmax temporary; chunking is what makes GMA fit at all.
    # Exact (content-only branch; same f32 softmax, same matmul dtypes).
    # -1 = auto: dense while the f32 similarity fits AUTO_VOLUME_BYTES,
    # chunks of 1024 beyond (resolved per input shape, like corr "auto").
    attn_chunk: int = 0
    # Space-to-depth stem (see RAFTConfig.stem_s2d).
    stem_s2d: bool = False

    @property
    def corr_precision(self) -> str:
        return "highest" if jnp.dtype(self.compute_dtype) == jnp.float32 else "default"

    @property
    def corr_planes(self) -> int:
        return self.corr_levels * (2 * self.corr_radius + 1) ** 2


# ---------------------------------------------------------------------------
# Attention / Aggregate
# ---------------------------------------------------------------------------

def init_attention(key: jax.Array, cfg: GMAConfig) -> Params:
    inner = cfg.num_heads * cfg.dim_head
    k1, k2, k3 = jax.random.split(key, 3)
    n = 2 * cfg.max_pos_size - 1
    return {
        "to_qk": init_conv(k1, cfg.context_dim, inner * 2, 1, bias=False),
        # RelPosEmb (modules.py:6-18): two nn.Embedding tables, N(0,1) init.
        # Always present (the upstream module creates it unconditionally,
        # so every released checkpoint carries the tables).
        "pos_emb": {
            "rel_height": {"emb": jax.random.normal(k2, (n, cfg.dim_head))},
            "rel_width": {"emb": jax.random.normal(k3, (n, cfg.dim_head))},
        },
    }


def rel_pos_score(p: Params, q: jnp.ndarray, cfg: GMAConfig) -> jnp.ndarray:
    """Decomposed relative-position similarity (modules.py:20-31).

    q: (N, H, W, heads, dh) scaled queries ->
    (N, heads, x, y, u, v) with score[x,y,u,v] =
    q[x,y]·rel_height[x-u+...] + q[x,y]·rel_width[y-v+...] — the height
    term is independent of (y, v) and the width term of (x, u), matching
    the reference's broadcast einsums.
    """
    n, h, w, heads, dh = q.shape
    m = cfg.max_pos_size
    rel = lambda size: (
        jnp.arange(size)[None, :] - jnp.arange(size)[:, None] + m - 1
    )
    hemb = p["rel_height"]["emb"][rel(h)]  # (x, u, dh)
    wemb = p["rel_width"]["emb"][rel(w)]  # (y, v, dh)
    hs = jnp.einsum("nxyhd,xud->nhxyu", q, hemb, precision="highest")
    ws = jnp.einsum("nxyhd,yvd->nhxyv", q, wemb, precision="highest")
    return hs[..., :, None] + ws[..., None, :]


class AttnOperands(NamedTuple):
    """q/k operands for chunked on-demand attention (attn_chunk > 0).

    q is pre-scaled by dim_head^-0.5; both are kept float32 flattened
    (N, HW, heads, dh) — the per-chunk similarity matmul uses the same
    precision rule as the dense path, so results match it exactly."""

    q: jnp.ndarray
    k: jnp.ndarray


class AttnChunks(NamedTuple):
    """AttnOperands with q pre-split chunk-major: (nch, N, chunk, heads,
    dh). Prepared ONCE outside the GRU scan (prepare_attn_chunks) so the
    loop-invariant reshape/transpose is not re-emitted per iteration
    (XLA's loop-invariant motion across scan bodies is not guaranteed)."""

    qs: jnp.ndarray
    k: jnp.ndarray


def resolve_auto_attn_chunk(attn_chunk: int, batch: int, heads: int,
                            h8: int, w8: int, reserved_bytes: int = 0,
                            compute_dtype="bfloat16",
                            positional: bool = False) -> int:
    """Resolve attn_chunk=-1 (auto): dense attention while the attention
    storage fits the stored-volume budget, 1024-query chunks beyond it.
    Non-negative values pass through unchanged.

    Dense cost = the f32 similarity temporary plus the compute-dtype
    softmaxed matrix that coexists with it (6 B/element at bf16 compute,
    8 at f32). `reserved_bytes` is HBM already committed by a co-resident
    stored structure (the corr volume when GMA's corr_lookup resolves to
    a stored impl) — both consumers share ONE budget, so attention yields
    first (the corr lookup is the hotter path). AUTO_VOLUME_BYTES is read
    through the module so tests can monkeypatch it.

    `positional`: the position-only/position+content branches have no
    chunked form (attention() rejects attn_chunk>0 there), so auto stays
    dense regardless of size — those configs trade the ValueError mid-
    forward for the dense memory cost, matching small-input behavior."""
    if attn_chunk >= 0:
        return attn_chunk
    if positional:
        return 0
    if not isinstance(batch, int):  # symbolic dim (shape-polymorphic export)
        raise ValueError(
            "attn_chunk=-1 (auto) needs a concrete batch to size the "
            f"attention matrix, got symbolic {batch!r} — pick an explicit "
            "value (0 dense / >0 chunked) for shape-polymorphic exports"
        )
    hw = h8 * w8
    elem = 4 + jnp.dtype(compute_dtype).itemsize
    attn_bytes = batch * heads * hw * hw * elem
    return 0 if attn_bytes + reserved_bytes <= _corr.AUTO_VOLUME_BYTES else 1024


def prepare_attn_chunks(attn: AttnOperands, chunk: int) -> AttnChunks:
    n, hw, heads, dh = attn.q.shape
    chunk = _divisor_chunk(hw, chunk)
    nch = hw // chunk
    qs = attn.q.reshape(n, nch, chunk, heads, dh).transpose(1, 0, 2, 3, 4)
    return AttnChunks(qs, attn.k)


def attention(
    p: Params, fmap: jnp.ndarray, cfg: GMAConfig, out_dtype=None
) -> jnp.ndarray:
    """Attention map (N, H, W, C) -> (N, heads, HW, HW).

    Branches per modules.py:62-71: position-only, position+content, or
    content-only (the default used by all released checkpoints).

    The content similarity is computed DIRECTLY in the flattened
    (N, heads, HW, HW) form — flattening q/k first instead of reshaping
    the 6D (N, heads, x, y, u, v) result avoids a whole-matrix relayout
    (3.6 ms on the CVO-6 serving shape: (22, 1, 4096, 4096) is 1.5 GB).
    out_dtype (e.g. the compute dtype) fuses the storage cast into the
    softmax instead of a separate 4.9 ms copy; the softmax itself always
    reduces in float32.
    """
    n, h, w, _ = fmap.shape
    heads, dh = cfg.num_heads, cfg.dim_head
    qk = conv2d(p["to_qk"], fmap, padding=0)
    q, k = jnp.split(qk, 2, axis=-1)
    # torch channel layout (h d) -> heads-major split.
    # bf16-valued q/k lose nothing to a single-pass matmul; true-f32
    # parity paths keep exact emulation (see RAFTConfig.corr_precision).
    prec = "highest" if qk.dtype == jnp.float32 else "default"
    if cfg.attn_chunk > 0:
        if cfg.position_only or cfg.position_and_content:
            raise ValueError(
                "attn_chunk (on-demand attention) supports the content-only "
                "branch — the one every released checkpoint uses"
            )
        qf = q.reshape(n, h * w, heads, dh).astype(jnp.float32) * (dh**-0.5)
        kf = k.reshape(n, h * w, heads, dh).astype(jnp.float32)
        return AttnOperands(qf, kf)
    if cfg.position_only or cfg.position_and_content:
        qp = q.reshape(n, h, w, heads, dh).astype(jnp.float32) * (dh**-0.5)
        sim = rel_pos_score(p["pos_emb"], qp, cfg)
        if cfg.position_and_content:
            kp = k.reshape(n, h, w, heads, dh).astype(jnp.float32)
            sim = sim + jnp.einsum("nxyhd,nuvhd->nhxyuv", qp, kp, precision=prec)
        sim = sim.reshape(n, heads, h * w, h * w)
    else:
        qf = q.reshape(n, h * w, heads, dh).astype(jnp.float32) * (dh**-0.5)
        kf = k.reshape(n, h * w, heads, dh).astype(jnp.float32)
        sim = jnp.einsum("nqhd,nkhd->nhqk", qf, kf, precision=prec)
    out = jax.nn.softmax(sim, axis=-1)
    return out if out_dtype is None else out.astype(out_dtype)


def init_aggregate(key: jax.Array, cfg: GMAConfig, dim: int = 128) -> Params:
    inner = cfg.num_heads * cfg.dim_head
    p: Params = {
        "to_v": init_conv(key, dim, inner, 1, bias=False),
        "gamma": jnp.zeros((1,), jnp.float32),
    }
    if dim != inner:
        p["project"] = init_conv(jax.random.fold_in(key, 1), inner, dim, 1, bias=False)
    return p


def _aggregate_chunked(attn, v: jnp.ndarray, chunk: int) -> jnp.ndarray:
    """softmax(q_c k^T) v streamed over query chunks under lax.map, the
    chunk body rematerialized — peak live memory O(chunk * HW) instead of
    the full (HW, HW) matrix. Row softmaxes see the complete key axis, so
    this equals the dense path exactly (no online-softmax approximation
    needed). chunk rounds down to a divisor of HW.

    attn: AttnChunks (chunk-major q, prepared outside the scan) or raw
    AttnOperands (prepared here — fine outside loops)."""
    n, hw, heads, dh = v.shape
    if isinstance(attn, AttnOperands):
        attn = prepare_attn_chunks(attn, chunk)
    qs, k = attn.qs, attn.k
    nch = qs.shape[0]
    prec = "highest" if v.dtype == jnp.float32 else "default"

    def one_chunk(qc: jnp.ndarray) -> jnp.ndarray:
        sim = jnp.einsum("nqhd,nkhd->nhqk", qc, k, precision=prec)
        a = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        return jnp.einsum("nhqk,nkhd->nqhd", a, v)

    if nch == 1:
        return one_chunk(qs[0])
    out = jax.lax.map(jax.checkpoint(one_chunk), qs)
    return out.transpose(1, 0, 2, 3, 4).reshape(n, hw, heads, dh)


def aggregate(p: Params, attn, fmap: jnp.ndarray, cfg: GMAConfig) -> jnp.ndarray:
    """Apply the (fixed) attention to per-iteration motion features.

    attn: dense (N, heads, HW, HW) matrix, or AttnOperands when
    cfg.attn_chunk > 0 (recompute-per-chunk; see GMAConfig.attn_chunk)."""
    n, h, w, c = fmap.shape
    heads, dh = cfg.num_heads, cfg.dim_head
    v = conv2d(p["to_v"], fmap, padding=0)
    v = v.reshape(n, h * w, heads, dh)
    if isinstance(attn, (AttnOperands, AttnChunks)):
        out = _aggregate_chunked(attn, v, cfg.attn_chunk)
    else:
        out = jnp.einsum("nhqk,nkhd->nqhd", attn.astype(v.dtype), v)
    out = out.reshape(n, h, w, heads * dh)
    if "project" in p:
        out = conv2d(p["project"], out, padding=0)
    return fmap + p["gamma"].astype(fmap.dtype) * out


# ---------------------------------------------------------------------------
# GMA update block
# ---------------------------------------------------------------------------

def init_gma_update_block(key: jax.Array, cfg: GMAConfig) -> Params:
    ks = jax.random.split(key, 6)
    hdim = cfg.hidden_dim
    return {
        "encoder": init_basic_motion_encoder(ks[0], cfg.corr_planes),
        "gru": init_sep_conv_gru(ks[1], hdim, 128 + hdim + hdim),
        "flow_head": init_flow_head(ks[2], hdim, 256),
        "mask": {
            "0": init_conv(ks[3], 128, 256, 3),
            "2": init_conv(ks[4], 256, 64 * 9, 1),
        },
        "aggregator": init_aggregate(ks[5], cfg, dim=128),
    }


def gma_update_block(p: Params, net, inp, corr, flow, attn, cfg: GMAConfig,
                     with_mask: bool = True):
    motion = basic_motion_encoder(p["encoder"], flow, corr)
    motion_global = aggregate(p["aggregator"], attn, motion, cfg)
    gru_in = jnp.concatenate([inp, motion, motion_global], axis=-1)
    net = sep_conv_gru(p["gru"], net, gru_in)
    delta = flow_head(p["flow_head"], net)
    mask = upsample_mask(p, net) if with_mask else None
    return net, mask, delta


# ---------------------------------------------------------------------------
# RAFT-GMA
# ---------------------------------------------------------------------------

def init_gma(key: jax.Array, cfg: GMAConfig = GMAConfig()) -> Params:
    ks = jax.random.split(key, 4)
    hdim, cdim = cfg.hidden_dim, cfg.context_dim
    return {
        "fnet": init_basic_encoder(ks[0], 3, output_dim=256, norm_fn="instance"),
        "cnet": init_basic_encoder(ks[1], 3, output_dim=hdim + cdim, norm_fn="batch"),
        "update_block": init_gma_update_block(ks[2], cfg),
        "att": init_attention(ks[3], cfg),
    }


def gma_forward(
    params: Params,
    image1: jnp.ndarray,
    image2: jnp.ndarray,
    cfg: GMAConfig = GMAConfig(),
    iters: Optional[int] = None,
    flow_init: Optional[jnp.ndarray] = None,
    final_only: bool = False,
    train: bool = False,
):
    """Same contract as raft_forward (see models/raft.py)."""
    iters = cfg.iters if iters is None else iters
    cd = jnp.dtype(cfg.compute_dtype)
    n = image1.shape[0]
    h8, w8 = image1.shape[1] // 8, image1.shape[2] // 8
    vdt = jnp.dtype(cfg.corr_volume_dtype)
    corr_lookup = resolve_auto_lookup(
        normalize_corr_lookup(cfg.corr_lookup), n, h8, w8,
        num_levels=cfg.corr_levels, dtype=vdt)
    cfg = dataclasses.replace(
        cfg,
        corr_lookup=corr_lookup,
        attn_chunk=resolve_auto_attn_chunk(
            cfg.attn_chunk, n, cfg.num_heads, h8, w8,
            reserved_bytes=0 if is_ondemand(corr_lookup) else
            stored_volume_bytes(n, h8, w8, cfg.corr_levels, vdt),
            compute_dtype=cfg.compute_dtype,
            positional=cfg.position_only or cfg.position_and_content),
    )

    imgs = jnp.concatenate([image1, image2], axis=0).astype(cd)
    fmaps = basic_encoder(params["fnet"], imgs, "instance",
                          stem_s2d=cfg.stem_s2d)
    fmap1, fmap2 = fmaps[:n], fmaps[n:]
    pyramid = build_corr_operands(
        fmap1.astype(jnp.float32), fmap2.astype(jnp.float32), cfg.corr_levels,
        cfg.corr_lookup,
        precision=cfg.corr_precision, dtype=jnp.dtype(cfg.corr_volume_dtype),
    )

    net, inp = gma_cnet(params, image1, cfg, train)
    attn = attention(params["att"], inp, cfg, out_dtype=cd)
    return gma_iterate(
        params, pyramid, net, inp, attn, cfg, iters=iters,
        flow_init=flow_init, final_only=final_only,
    )


def gma_encode_frame(params: Params, image: jnp.ndarray, cfg: GMAConfig,
                     train: bool = False) -> dict:
    """Cacheable per-frame features for streaming serving (see
    models/raft.py::raft_encode_frame — same exactness argument)."""
    cd = jnp.dtype(cfg.compute_dtype)
    fmap = basic_encoder(params["fnet"], image.astype(cd), "instance",
                         stem_s2d=cfg.stem_s2d)
    net, inp = gma_cnet(params, image, cfg, train)
    return {"fmap": fmap, "net": net, "inp": inp}


def gma_flow_pairs_from_features(
    params: Params,
    src: dict,
    dst_fmaps,
    cfg: GMAConfig,
    iters: Optional[int] = None,
    flow_init: Optional[jnp.ndarray] = None,
    final_only: bool = True,
):
    """Pair flows src -> each dst with precomputed features (see
    models/raft.py::raft_flow_pairs_from_features). The attention matrix
    depends only on the src frame's context, so it is built once on the
    tiled inp exactly as gma_forward would on the stacked batch."""
    iters = cfg.iters if iters is None else iters
    cd = jnp.dtype(cfg.compute_dtype)
    fmap1 = src["fmap"]
    p = len(dst_fmaps)
    n, h8, w8 = fmap1.shape[0], fmap1.shape[1], fmap1.shape[2]
    vdt = jnp.dtype(cfg.corr_volume_dtype)
    corr_lookup = resolve_auto_lookup(
        normalize_corr_lookup(cfg.corr_lookup), p * n, h8, w8,
        num_levels=cfg.corr_levels, dtype=vdt)
    cfg = dataclasses.replace(
        cfg,
        corr_lookup=corr_lookup,
        attn_chunk=resolve_auto_attn_chunk(
            cfg.attn_chunk, p * n, cfg.num_heads, h8, w8,
            reserved_bytes=0 if is_ondemand(corr_lookup) else
            stored_volume_bytes(p * n, h8, w8, cfg.corr_levels, vdt),
            compute_dtype=cfg.compute_dtype,
            positional=cfg.position_only or cfg.position_and_content),
    )
    f1 = jnp.concatenate([fmap1] * p, axis=0).astype(jnp.float32)
    f2 = jnp.concatenate(list(dst_fmaps), axis=0).astype(jnp.float32)
    pyramid = build_corr_operands(
        f1, f2, cfg.corr_levels, cfg.corr_lookup,
        precision=cfg.corr_precision, dtype=vdt,
    )
    net = jnp.concatenate([src["net"]] * p, axis=0)
    inp = jnp.concatenate([src["inp"]] * p, axis=0)
    attn = attention(params["att"], inp, cfg, out_dtype=cd)
    out = gma_iterate(params, pyramid, net, inp, attn, cfg, iters=iters,
                      flow_init=flow_init, final_only=final_only)
    return out["flow_up"]


def gma_cnet(params: Params, image1: jnp.ndarray, cfg: GMAConfig, train: bool = False):
    cd = jnp.dtype(cfg.compute_dtype)
    cnet_out = basic_encoder(params["cnet"], image1.astype(cd), "batch", train,
                             stem_s2d=cfg.stem_s2d)
    hdim = cfg.hidden_dim
    net = jnp.tanh(cnet_out[..., :hdim])
    inp = jax.nn.relu(cnet_out[..., hdim:])
    return net, inp


def gma_iterate(
    params: Params,
    pyramid,
    net: jnp.ndarray,
    inp: jnp.ndarray,
    attn: jnp.ndarray,
    cfg: GMAConfig,
    iters: int,
    flow_init: Optional[jnp.ndarray] = None,
    final_only: bool = False,
):
    cd = jnp.dtype(cfg.compute_dtype)
    n, h8, w8 = net.shape[0], net.shape[1], net.shape[2]

    coords0 = coords_grid(n, h8, w8)
    coords1 = coords0
    if flow_init is not None:
        coords1 = coords1 + flow_init.astype(jnp.float32)

    ub = params["update_block"]
    gru_step = make_fused_sep_gru(ub["gru"], inp, cfg.hidden_dim)
    # s-major mask head, permuted once outside the scan (see mask_head_s_major).
    w2s = mask_head_s_major(ub)

    if isinstance(attn, AttnOperands):
        # Chunk-major q layout hoisted out of the scan (loop-invariant).
        attn = prepare_attn_chunks(attn, cfg.attn_chunk)
    if is_ondemand(cfg.corr_lookup):
        pyramid = prepare_ondemand_chunks(
            pyramid, ondemand_chunk(cfg.corr_lookup)
        )

    pf_ops = pf_plan = None
    lookup_impl = cfg.corr_lookup
    if lookup_impl == "pallas_fused":
        # Fused Pallas lookup — pyramid repacked once outside the scan
        # (see models/raft.py::raft_iterate for the rationale).
        from accflow_tpu.ops.corr_pallas import (
            fused_lookup_supported,
            lookup_corr_fused,
            prepare_fused_lookup_operands,
        )

        if jax.default_backend() == "tpu" and not fused_lookup_supported(
            pyramid, cfg.corr_radius
        ):
            lookup_impl = "fused"  # tiny levels: Mosaic shape-cast limits
        else:
            pf_ops, pf_plan = prepare_fused_lookup_operands(
                pyramid, cfg.corr_radius, stream_dtype=cd
            )

    def step(carry, _):
        net, coords1 = carry
        coords1 = lax.stop_gradient(coords1)
        flow = coords1 - coords0
        if lookup_impl == "pallas_fused":
            corr = lookup_corr_fused(
                pf_ops, pf_plan, coords1, cfg.corr_radius, stream_dtype=cd
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
                    pyramid, coords1, cfg.corr_radius,
                    precision=cfg.corr_precision,
                    level_impl=tuple(lookup_impl.split(":", 1)[1].split(",")),
                )
            elif lookup_impl in ("packed", "packed2"):
                corr_l = lookup_corr_split_packed(
                    pyramid, coords1, cfg.corr_radius,
                    precision=cfg.corr_precision,
                    start=1 if lookup_impl == "packed" else 2,
                )
            elif lookup_impl in ("fused_bd", "fused_bd2"):
                # Block-diagonal Pallas MXU y-contraction for the big
                # levels (ops/corr_pallas.py::y_contract_bd).
                nbd = 2 if lookup_impl == "fused_bd2" else 1
                corr_l = lookup_corr_split_v2(
                    pyramid, coords1, cfg.corr_radius,
                    precision=cfg.corr_precision,
                    level_impl=("bd",) * nbd + ("mm",) * (4 - nbd),
                )
            elif lookup_impl in ("fused_vy", "fused_vy_cat"):
                corr_l = lookup_corr_split_v2(
                    pyramid, coords1, cfg.corr_radius,
                    precision=cfg.corr_precision, level_impl=("vpu_y",) * 4,
                )
            else:
                corr_l = lookup_corr_split(
                    pyramid, coords1, cfg.corr_radius,
                    precision=cfg.corr_precision,
                    x_contraction="vpu" if lookup_impl == "fusedv" else "mxu",
                )
            enc = (
                basic_motion_encoder_stacked
                if lookup_impl in ("fused_cat", "fused_vy_cat")
                else basic_motion_encoder_split
            )
            motion = enc(
                ub["encoder"], flow.astype(cd), [c.astype(cd) for c in corr_l]
            )
        else:
            corr = lookup(
                pyramid, coords1, cfg.corr_radius,
                impl=lookup_impl, precision=cfg.corr_precision,
            )
            motion = basic_motion_encoder(
                ub["encoder"], flow.astype(cd), corr.astype(cd)
            )
        motion_global = aggregate(ub["aggregator"], attn, motion, cfg)
        net = gru_step(net, jnp.concatenate([motion, motion_global], axis=-1))
        delta = flow_head(ub["flow_head"], net)
        mask = upsample_mask(ub, net, w2=w2s) if not final_only else None
        coords1 = coords1 + delta.astype(jnp.float32)
        if final_only:
            return (net, coords1), None
        flow_up = convex_upsample(coords1 - coords0, mask, s_major=True)
        return (net, coords1), flow_up

    (net, coords1), flows_up = lax.scan(
        apply_scan_remat(step, cfg.scan_remat), (net, coords1), None,
        length=iters, unroll=min(cfg.scan_unroll, iters),
    )

    if final_only:
        mask = upsample_mask(params["update_block"], net, w2=w2s)
        flow_up = convex_upsample(coords1 - coords0, mask, s_major=True)
        return {"flow_up": flow_up, "flow_low": coords1 - coords0}

    return {
        "flow_up": flows_up[-1],
        "predictions": flows_up,
        "flow_low": coords1 - coords0,
    }


def gma_pairs_forward(
    params: Params,
    frames: jnp.ndarray,
    src_idx,
    dst_idx,
    cfg: GMAConfig = GMAConfig(),
    iters: Optional[int] = None,
    final_only: bool = True,
):
    """Pair-batched GMA with deduplicated encodes (see raft_pairs_forward).

    Each unique frame is fnet-encoded once; each unique src frame gets one
    cnet encode + one attention map. Returns (P*N, H, W, 2) flows."""
    cd = jnp.dtype(cfg.compute_dtype)
    iters = cfg.iters if iters is None else iters
    src_idx = tuple(int(i) for i in src_idx)
    dst_idx = tuple(int(i) for i in dst_idx)
    k, n, h, w, _ = frames.shape
    p = len(src_idx)
    h8, w8 = h // 8, w // 8
    vdt = jnp.dtype(cfg.corr_volume_dtype)
    corr_lookup = resolve_auto_lookup(
        normalize_corr_lookup(cfg.corr_lookup), p * n, h8, w8,
        num_levels=cfg.corr_levels, dtype=vdt)
    cfg = dataclasses.replace(
        cfg,
        corr_lookup=corr_lookup,
        attn_chunk=resolve_auto_attn_chunk(
            cfg.attn_chunk, p * n, cfg.num_heads, h8, w8,
            reserved_bytes=0 if is_ondemand(corr_lookup) else
            stored_volume_bytes(p * n, h8, w8, cfg.corr_levels, vdt),
            compute_dtype=cfg.compute_dtype,
            positional=cfg.position_only or cfg.position_and_content),
    )

    used = sorted(set(src_idx) | set(dst_idx))
    pos = {f: i for i, f in enumerate(used)}
    fmaps = basic_encoder(
        params["fnet"],
        frames[jnp.asarray(used)].reshape(len(used) * n, h, w, 3).astype(cd),
        "instance", stem_s2d=cfg.stem_s2d,
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
    net_u, inp_u = gma_cnet(
        params, frames[jnp.asarray(src_used)].reshape(len(src_used) * n, h, w, 3), cfg
    )
    attn_u = attention(params["att"], inp_u, cfg, out_dtype=cd)
    hw8 = (h // 8) * (w // 8)
    net_u = net_u.reshape(len(src_used), n, h // 8, w // 8, -1)
    inp_u = inp_u.reshape(len(src_used), n, h // 8, w // 8, -1)
    sel = jnp.asarray([spos[i] for i in src_idx])
    net = net_u[sel].reshape(p * n, h // 8, w // 8, -1)
    inp = inp_u[sel].reshape(p * n, h // 8, w // 8, -1)
    if isinstance(attn_u, AttnOperands):
        gather_qk = lambda x: x.reshape(
            (len(src_used), n) + x.shape[1:]
        )[sel].reshape((p * n,) + x.shape[1:])
        attn = AttnOperands(gather_qk(attn_u.q), gather_qk(attn_u.k))
    else:
        attn_u = attn_u.reshape(len(src_used), n, cfg.num_heads, hw8, hw8)
        attn = attn_u[sel].reshape(p * n, cfg.num_heads, hw8, hw8)

    out = gma_iterate(params, pyramid, net, inp, attn, cfg, iters=iters, final_only=final_only)
    return out["flow_up"]
