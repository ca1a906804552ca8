"""Pallas TPU kernels for the correlation-pyramid window lookup.

For every query pixel q the lookup computes the (2r+1)^2 bilinear window
of q's OWN (hl, wl) correlation map around coords/2^level
(networks/raft/corr.py:24-45 semantics: align_corners grid, zeros
padding, x-major window flatten).

Contents, in order of construction (full measured journey in PARITY.md
"Round-3 fused Pallas lookup kernel"):

- y_contract_bd / lookup_corr_pallas: the r2 experiments — a standalone
  block-diagonal y-contraction (loses end-to-end: it materializes the
  weights and the intermediate in HBM) and a per-query kernel (10.6 f/s:
  per-query fori_loop dots serialize). Kept as exactness-tested
  baselines for the dispatch table in ops/corr.py::lookup.
- lookup_corr_fused (+ prepare_fused_lookup_operands,
  fused_lookup_supported): the r3 fused ALL-LEVELS kernel —
  corr_lookup="pallas_fused". One pallas_call per iteration computes all
  four levels' windows and writes the concatenated (Q, L*81)
  motion-encoder input. It reaches ~parity with the XLA fused lookup
  (~10 vs ~9.4 ms/iteration on the CVO-6 serving shape) against a
  measured 2.25 ms passthrough floor; the remaining gap is tent-weight
  VPU work whose vectorization is blocked by Mosaic's shape-cast rule
  (CLAUDE.md). Guarded, non-default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from accflow_tpu.ops.corr import CorrPyramid


# ---------------------------------------------------------------------------
# Fused all-levels lookup kernel (the serving fast path).
#
# One pallas_call computes the COMPLETE 4-level (2r+1)^2 window lookup for a
# tile of queries and writes the concatenated (Q, L*81) motion-encoder input
# directly (reference channel layout: level-major, x-offset-major —
# networks/raft/corr.py:24-45). Design notes (probed in
# scripts/probe_pallas_fused.py before integration):
#
# - Tent weights are built in-registers from integer iotas and SMEM coords;
#   nothing but the correlation volume is streamed from HBM. (The r2
#   `y_contract_bd` experiment materialized weights and the y-contracted
#   intermediate in HBM, which cost more traffic than it saved — traced.)
# - y contraction: block-diagonal MXU dots — G queries packed into one
#   (G*9, G*K) x (G*K, N) dot via static diagonal-block writes into a
#   zeroed f32 VMEM scratch (zeroed once per tile; only diagonal slots are
#   ever overwritten). Sub-tile bf16 scratch writes mis-lower for narrow
#   blocks (probed), hence f32 scratch + cast at dot time.
# - "packed" levels stream the volume as a layout-FREE bitcast
#   (Q, hl*wl/128, 128) of the flat rows — minor dim 128, so bf16
#   streaming is unpadded (the (Q, hl, wl) form pads wl<128 lanes to 128:
#   2x traffic at level 0, 4x at level 1). Each 128-lane row packs
#   E = 128//wl consecutive-y segments; the y contraction becomes E
#   partial block-diagonal dots (weights for y = E*r + e) merged by a
#   lane-group select. Small levels ("3d") keep the padded (Q, hl, wl)
#   stream where the E-dot MXU waste would dominate their tiny footprint.
# - x contraction: one lane-contraction dot per group
#   (wxall (G*9, N) x t (G*9, N)^T) whose diagonal (9, 9) blocks are the
#   per-query windows; blocks land in a (tq, 9, 9) scratch and the output
#   is written as 9 VECTORIZED (tq, 9)-lane stores per level — the r1
#   kernel's per-query stores are what serialized it (10.6 f/s).
#
# Differentiation: pallas_call has no autodiff rule, so this path is for
# inference / frozen-OFE use (evaluate, accumulator training's frozen
# estimator, serving). Trainable paths keep the XLA lookups.
# ---------------------------------------------------------------------------

def _plan_level(hl: int, wl: int, impl: str, g: int):
    if impl == "auto":
        impl = "packed" if hl * wl >= 1024 else "3d"
    if impl == "packed" and (hl * wl) % 128 != 0:
        impl = "3d"
    if g == 0:
        # K = g*hl ("3d") or g*hl*wl/128 ("packed") lands at 512/256/128 —
        # real MXU contraction depths; capped at 16 so the vectorized
        # (g, 9, g*K) weight builds stay within register budget (g=32/64
        # variants crashed Mosaic and grow the m2 garbage quadratically).
        g = min(16, max(1, 512 // hl))
    return impl, g


def make_fused_lookup_kernel(shapes, radius, impls, gs, tq, dtype):
    """shapes: ((hl, wl), ...) per level; impls/gs: per-level plan.

    FULLY VECTORIZED inner structure (v2): the v1 kernel did ~3 serialized
    per-QUERY ops per level (SMEM coord reads + diagonal weight-block
    stores + m2 diagonal-slice extraction); at ~10 cycles each that was
    ~8.5 us/tile of scalar-bound time PER LEVEL — level 3 (23 MB of data)
    cost as much as level 0 (738 MB) (micro_pf.py). v2 eliminates every
    per-query op:
    - coords arrive as a VMEM block; per group they are (g, 1, 1) vectors;
    - the block-diagonal y-tent LHS is built as ONE 3D iota expression
      (g, 9, g*K) with an i==i' block mask, reshaped (g*9, g*K) — a free
      sublane merge — so there is no weight scratch and no scatter;
    - m2's diagonal (9, 9) blocks are extracted by mask-multiply plus one
      fixed (g*9, 9) summation dot (SUM9[(j,b),b'] = [b == b']), yielding
      (g*9(i,a), 9(b)) whose (g, 9, 9) reshape is stored with ONE store
      per group.
    """
    num = 2 * radius + 1

    def level_common(coords_ref, corr_ref, s_ref, *, hl, wl, g, scale,
                     packed):
        """One level's windows -> s_ref (9(a), tq, 9(b)) f32."""
        e_cnt = (128 // wl) if packed else 1
        width = 128 if packed else wl  # rhs lane count
        k = (hl * wl) // width  # rhs sublane rows per query
        f32 = jnp.float32

        # wx rows are a-MAJOR (a*g + i): the m2 chain then emits
        # (a, i)-ordered rows whose (num, g, num) reshape stores
        # contiguously into the (num, tq, num) scratch, and the final
        # per-a output stores read contiguous sublane blocks — no strided
        # VMEM access anywhere.
        xs3 = (
            jax.lax.broadcasted_iota(jnp.int32, (num, g, width), 2) % wl
            if packed
            else jax.lax.broadcasted_iota(jnp.int32, (num, g, width), 2)
        ).astype(f32)
        ax3 = jax.lax.broadcasted_iota(jnp.int32, (num, g, width), 0).astype(
            f32
        ) - float(radius)
        # y-tent geometry on (g, 9, g*k): lane -> (i' = c // k, r = c % k).
        iy_blk = jax.lax.broadcasted_iota(jnp.int32, (g, num, g * k), 0)
        ic_blk = jax.lax.broadcasted_iota(jnp.int32, (g, num, g * k), 2) // k
        blkmask = (iy_blk == ic_blk).astype(f32)
        rr3 = (
            jax.lax.broadcasted_iota(jnp.int32, (g, num, g * k), 2) % k
        ).astype(f32)
        by3 = jax.lax.broadcasted_iota(jnp.int32, (g, num, g * k), 1).astype(
            f32
        ) - float(radius)
        # m2 diagonal extraction operands, shared per tile. m2 rows are
        # (a, i) (a-major), columns (j, b): the diagonal mask matches
        # row%g (query i) against column//num (query j).
        i_row = jax.lax.broadcasted_iota(jnp.int32, (g * num, g * num), 0) % g
        i_col = jax.lax.broadcasted_iota(jnp.int32, (g * num, g * num), 1) // num
        diagmask = (i_row == i_col).astype(dtype)
        b_col = jax.lax.broadcasted_iota(jnp.int32, (g * num, num), 0) % num
        b_out = jax.lax.broadcasted_iota(jnp.int32, (g * num, num), 1)
        sum9 = (b_col == b_out).astype(dtype)

        for g0 in range(tq // g):
            rhs = corr_ref[g0 * g : (g0 + 1) * g].reshape(g * k, width)
            cxy = coords_ref[g0 * g : (g0 + 1) * g]  # (g, 2) VMEM
            cx3 = (cxy[:, 0:1] * scale).reshape(1, g, 1)
            cy3 = (cxy[:, 1:2] * scale).reshape(g, 1, 1)
            ts = []
            for e in range(e_cnt):
                ys3 = rr3 * float(e_cnt) + float(e)
                wy = (
                    jnp.maximum(0.0, 1.0 - jnp.abs(ys3 - (cy3 + by3)))
                    * blkmask
                ).astype(dtype)
                ts.append(
                    jnp.dot(
                        wy.reshape(g * num, g * k), rhs,
                        preferred_element_type=jnp.float32,
                    )
                )
            t = ts[0]
            if e_cnt > 1:
                laneg = (
                    jax.lax.broadcasted_iota(jnp.int32, (g * num, width), 1)
                    // wl
                )
                for e in range(1, e_cnt):
                    t = jnp.where(laneg == e, ts[e], t)

            wx = jnp.maximum(0.0, 1.0 - jnp.abs(xs3 - (cx3 + ax3))).astype(
                dtype
            ).reshape(num * g, width)
            m2 = jax.lax.dot_general(
                wx, t.astype(dtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (9*g (a, i), g*9 (j, b))
            out3 = jnp.dot(
                (m2.astype(dtype) * diagmask), sum9,
                preferred_element_type=jnp.float32,
            )  # (9*g (a, i), 9 (b))
            s_ref[:, g0 * g : (g0 + 1) * g, :] = out3.reshape(num, g, num)

    def kernel(coords_ref, *refs):
        corr_refs = refs[: len(shapes)]
        out_ref = refs[len(shapes)]
        scratch = refs[len(shapes) + 1 :]
        for li, (hl, wl) in enumerate(shapes):
            s_ref = scratch[li]
            level_common(
                coords_ref, corr_refs[li], s_ref,
                hl=hl, wl=wl, g=gs[li], scale=1.0 / (2.0**li),
                packed=impls[li] == "packed",
            )
            base = li * num * num
            for a in range(num):
                out_ref[:, base + a * num : base + (a + 1) * num] = s_ref[a]

    return kernel


def fused_lookup_supported(
    pyramid: CorrPyramid,
    radius: int = 4,
    level_impl=("packed", "packed", "3d", "3d"),
    level_g=(0, 0, 0, 0),
) -> bool:
    """Whether the fused kernel's shapes compile on real TPU Mosaic.

    Empirical Mosaic rule (probed): a sublane-merge shape cast
    (a, b, c) -> (a*b, c) lowers only when b % 8 == 0 or c % 128 == 0.
    The kernel's merges therefore need g % 8 == 0, (g*k) % 128 == 0 and,
    for the "3d" path (lane width wl < 128), hl % 8 == 0. Tiny eval
    shapes (e.g. 64x64 inputs -> 8x8 base level) violate these; callers
    fall back to the XLA lookup there. Interpret mode (CPU) has no such
    constraints.
    """
    for li, level in enumerate(pyramid.levels):
        hl, wl = level.shape[-2:]
        impl, g = _plan_level(hl, wl, level_impl[li], level_g[li])
        width = 128 if impl == "packed" else wl
        k = (hl * wl) // width
        if g % 8 != 0 or (g * k) % 128 != 0:
            return False
        if impl == "3d" and hl % 8 != 0:
            return False
    return True


def prepare_fused_lookup_operands(
    pyramid: CorrPyramid,
    radius: int = 4,
    stream_dtype=jnp.bfloat16,
    level_impl=("packed", "packed", "3d", "3d"),
    level_g=(0, 0, 0, 0),
):
    """One-time (per forward, OUTSIDE the GRU scan) repack of the pyramid
    into the kernel's streaming layouts. Returns (operands, plan) for
    lookup_corr_fused. Hoist this manually — XLA's loop-invariant motion
    across `lax.scan` bodies is not guaranteed."""
    ops = []
    plan = []
    for li, level in enumerate(pyramid.levels):
        hl, wl = level.shape[-2:]
        q = level.size // (hl * wl)
        impl, g = _plan_level(hl, wl, level_impl[li], level_g[li])
        if impl == "packed":
            r = (hl * wl) // 128
            arr = level.reshape(q, r, 128).astype(stream_dtype)
        else:
            arr = level.reshape(q, hl, wl).astype(stream_dtype)
        ops.append(arr)
        plan.append((impl, g, hl, wl))
    return tuple(ops), tuple(plan)


def lookup_corr_fused(
    operands,
    plan,
    coords: jnp.ndarray,
    radius: int = 4,
    tq: int = 128,
    stream_dtype=jnp.bfloat16,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused all-levels lookup: (B, H, W, 2) coords -> (B, H, W, L*81) f32
    in the reference channel layout. `operands`/`plan` come from
    prepare_fused_lookup_operands."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, _ = coords.shape
    q = b * h * w
    num = 2 * radius + 1
    tq = min(tq, q)
    while q % tq:
        tq //= 2
    shapes = tuple((hl, wl) for (_, _, hl, wl) in plan)
    impls = tuple(p[0] for p in plan)
    gs = []
    for p in plan:
        g = min(p[1], tq)
        while tq % g:
            g //= 2
        gs.append(g)
    gs = tuple(gs)
    nlev = len(shapes)

    in_specs = [pl.BlockSpec((tq, 2), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    scratch = []
    for impl, g, (hl, wl) in zip(impls, gs, shapes):
        if impl == "packed":
            r = (hl * wl) // 128
            in_specs.append(
                pl.BlockSpec((tq, r, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
            )
        else:
            in_specs.append(
                pl.BlockSpec((tq, hl, wl), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
            )
        scratch.append(pltpu.VMEM((num, tq, num), jnp.float32))

    kernel = make_fused_lookup_kernel(shapes, radius, impls, gs, tq, stream_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(q // tq,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tq, nlev * num * num), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((q, nlev * num * num), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(coords.reshape(q, 2).astype(jnp.float32), *operands)
    return out.reshape(b, h, w, nlev * num * num)


def lookup_corr_fused_from_pyramid(
    pyramid: CorrPyramid,
    coords: jnp.ndarray,
    radius: int = 4,
    tq: int = 128,
    stream_dtype=jnp.bfloat16,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Convenience wrapper (tests / one-shot use): prepare + lookup. Real
    consumers should call prepare_fused_lookup_operands once outside the
    iteration loop."""
    operands, plan = prepare_fused_lookup_operands(
        pyramid, radius, stream_dtype=stream_dtype
    )
    return lookup_corr_fused(
        operands, plan, coords, radius, tq, stream_dtype, interpret
    )


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
