"""Pallas TPU kernel: fused correlation-pyramid window lookup.

Replaces the XLA mm lookup (ops/corr.py::lookup_corr) on the RAFT/GMA hot
path. For every query pixel q the kernel computes the (2r+1)^2 bilinear
window of q's OWN (hl, wl) correlation map around coords/2^level
(networks/raft/corr.py:24-45 semantics: align_corners grid, zeros padding,
x-major window flatten).

Why a kernel (measured on-chip, see PARITY.md perf notes): the XLA lookup
runs one fused op per level whose effective bandwidth collapses on the
small pyramid levels (level0 292 GB/s, level3 38 GB/s of 819 peak — the
90k-element batch of (9,hl)x(hl,wl) matmuls pays per-element dispatch),
and its (90112,9,9)->(B,64,64,81) output reshape is a 0.5 ms relayout per
level per iteration. Here:

- levels stream as FLAT (Q, hl*wl) rows — minor dim a multiple of 128 for
  levels 0-2, so bfloat16 streaming is unpadded (the (...,64,64) 4D layout
  pads 64 lanes to 128 and erases bf16's bandwidth win);
- tent weights are built in-registers from broadcasted iotas;
- both separable contractions run in VMEM on the tile;
- the output is written directly as (Q, 81) rows in the update block's
  consumption dtype/layout (a free bitcast to (B, H, W, 81)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from accflow_tpu.ops.corr import CorrPyramid


def y_contract_bd(
    corr3: jnp.ndarray,
    wy: jnp.ndarray,
    tq: int = 128,
    g: int = 8,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Block-diagonal MXU y-contraction: tmp[q,b,x] = sum_y wy[q,b,y] *
    corr3[q,y,x], with G queries packed into one (G*9, G*hl) x (G*hl, wl)
    dot so the MXU sees real tile sizes.

    Why: XLA lowers the batched (9,hl)x(hl,wl) tent dots as VPU loop
    fusions whose ~9.4 flop/byte intensity pins them to the VPU roofline
    knee (traced r2: 182 GB/s / 2.0 TF/s — 22% of both peaks). The MXU
    has ~25x the flops; wasting (G-1)/G of them on the off-diagonal zeros
    still wins because the stream becomes the only cost. The block
    diagonal is built by G static sub-tile writes into a zeroed VMEM
    scratch (zeroed ONCE per program — only diagonal blocks are ever
    overwritten), the kind of static addressing Mosaic lowers cleanly
    (scripts/probe_pallas_bd.py).

    corr3: (Q, hl, wl); wy: (Q, num, hl), both any float dtype (bf16
    recommended: the dot is single-pass anyway); returns (Q, num, wl) f32.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    q, hl, wl = corr3.shape
    num = wy.shape[1]
    while q % tq:
        tq //= 2
    g = min(g, tq)

    def kernel(wy_ref, corr_ref, out_ref, lhs_ref):
        lhs_ref[...] = jnp.zeros_like(lhs_ref)
        for g0 in range(tq // g):
            for i in range(g):
                lhs_ref[i * num : (i + 1) * num, i * hl : (i + 1) * hl] = (
                    wy_ref[g0 * g + i]
                )
            rhs = corr_ref[g0 * g : (g0 + 1) * g].reshape(g * hl, wl)
            out = jnp.dot(lhs_ref[...], rhs, preferred_element_type=jnp.float32)
            out_ref[g0 * g : (g0 + 1) * g] = out.reshape(g, num, wl)

    return pl.pallas_call(
        kernel,
        grid=(q // tq,),
        in_specs=[
            pl.BlockSpec((tq, num, hl), lambda i: (i, 0, 0)),
            pl.BlockSpec((tq, hl, wl), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((tq, num, wl), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((q, num, wl), jnp.float32),
        scratch_shapes=[pltpu.VMEM((g * num, g * hl), corr3.dtype)],
        interpret=interpret,
    )(wy, corr3)


def _level_kernel(
    coords_ref, corr_ref, out_ref, *, radius: int, hl: int, wl: int
):
    num = 2 * radius + 1
    tq = corr_ref.shape[0]

    def body(qi, _):
        # Scalar tap centers for query qi (SMEM reads).
        cx = coords_ref[qi, 0]
        cy = coords_ref[qi, 1]
        # Tent weights (integer iotas only; Mosaic forbids float iota and
        # captured constants). delta[k] = k - radius rides the sublanes.
        ks = jax.lax.broadcasted_iota(jnp.int32, (num, max(hl, wl)), 0).astype(
            jnp.float32
        ) - float(radius)
        ys = jax.lax.broadcasted_iota(jnp.int32, (num, hl), 1).astype(jnp.float32)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(ys - (cy + ks[:, :hl])))  # (9, hl)
        xs = jax.lax.broadcasted_iota(jnp.int32, (num, wl), 1).astype(jnp.float32)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(xs - (cx + ks[:, :wl])))  # (9, wl)

        corr_q = corr_ref[qi].astype(jnp.float32)  # (hl, wl)
        # tmp[b, x] = sum_y wy[b, y] corr[y, x]
        tmp = jnp.dot(wy, corr_q, preferred_element_type=jnp.float32)
        # out[a, b] = sum_x wx[a, x] tmp[b, x]
        out = jax.lax.dot_general(
            wx, tmp, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        # (9, 9) -> 81 lanes via static row stores (Mosaic rejects the
        # tiny sublane->lane reshape; 9 lane-slice stores lower cleanly).
        for a in range(num):
            out_ref[qi, a * num : (a + 1) * num] = out[a].astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, tq, body, 0)


def _lookup_level(
    level_flat: jnp.ndarray,
    coords_scaled: jnp.ndarray,
    radius: int,
    hl: int,
    wl: int,
    tq: int,
    out_dtype,
    interpret: bool,
) -> jnp.ndarray:
    """level3d: (Q, hl, wl); coords_scaled: (Q, 2) -> (Q, (2r+1)^2)."""
    q = level_flat.shape[0]
    num = 2 * radius + 1
    assert q % tq == 0, (q, tq)
    kernel = functools.partial(_level_kernel, radius=radius, hl=hl, wl=wl)
    return pl.pallas_call(
        kernel,
        grid=(q // tq,),
        in_specs=[
            pl.BlockSpec((tq, 2), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tq, hl, wl), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tq, num * num), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((q, num * num), out_dtype),
        interpret=interpret,
    )(coords_scaled, level_flat)


def lookup_corr_pallas(
    pyramid: CorrPyramid,
    coords: jnp.ndarray,
    radius: int = 4,
    tq: int = 256,
    stream_dtype=jnp.bfloat16,
    out_dtype=jnp.float32,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused Pallas lookup; matches lookup_corr/lookup_corr_gather up to the
    streaming dtype (bfloat16 by default — the bf16 update block quantizes
    the result anyway; pass stream_dtype=None to stream the storage dtype).

    coords: (B, H, W, 2) float32 -> (B, H, W, num_levels*(2r+1)^2) in
    out_dtype, reference channel layout (level-major; within a level the
    outer window index carries x).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, _ = coords.shape
    num = 2 * radius + 1
    q = b * h * w
    tq = min(tq, q)
    while q % tq:
        tq //= 2
    cf = coords.reshape(q, 2).astype(jnp.float32)

    outs = []
    for i, level in enumerate(pyramid.levels):
        hl, wl = level.shape[-2:]
        lvl = level.reshape(q, hl, wl)
        if stream_dtype is not None:
            lvl = lvl.astype(stream_dtype)  # hoisted out of scans by XLA
        out = _lookup_level(
            lvl, cf / (2.0**i), radius, hl, wl, tq, out_dtype, interpret
        )
        # out[q, a*num+b] with a = x offset, b = y offset (reference layout).
        outs.append(out.reshape(b, h, w, num * num))
    return jnp.concatenate(outs, axis=-1)
