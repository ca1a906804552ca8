"""All-pairs 4D correlation volume: construction, pyramid, and lookup.

Reproduces `CorrBlock` (networks/raft/corr.py:7-55):
- corr(q, k) = <f1(q), f2(k)> / sqrt(dim), built as one batched matmul.
- 4-level pyramid by 2x average pooling of the (H2, W2) key plane.
- Lookup: for each query pixel, a (2r+1)^2 window sampled bilinearly around
  coords/2^level.

Window-offset quirk preserved for checkpoint parity: the reference builds
`delta = stack(meshgrid(dy, dx), -1)` and adds it to (x, y)-ordered
centroids (corr.py:32-38), so window entry (a, b) samples
(x + delta[a], y + delta[b]) — the *x* offset varies along the flattened
window's outer index. The flattened 81-channel order is a*9+b, levels are
concatenated level-major. Released checkpoints were trained against this
layout, so we reproduce it exactly.

TPU notes: the volume is built on the MXU in float32 (`precision highest`)
because sub-pixel flow precision depends on small correlation differences;
pooling is an exact reshape-mean; lookup is 4 flattened gathers per level
(see ops/sampling.py). A fused Pallas lookup kernel can replace the gather
path; this module is the XLA reference implementation.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from accflow_tpu.ops.sampling import bilinear_sample


class CorrPyramid(NamedTuple):
    """Per-level correlation maps, each (B*H1*W1, Hl, Wl).

    Stored flat over queries: every lookup consumes (Q, Hl, Wl) and a
    4D (B, H1*W1, Hl, Wl) layout forced a whole-volume relayout copy per
    GRU iteration inside the scan (traced at 13 ms/step on the CVO-6
    serving shape). Lookup functions reshape defensively, so 4D pyramids
    (e.g. hand-built in tests) still work."""

    levels: tuple[jnp.ndarray, ...]
    h1: int
    w1: int


def avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """Exact 2x2/stride-2 average pool over the trailing two spatial dims
    of (B, Q, H, W); odd remainder rows/cols are dropped (torch semantics)."""
    b, q, h, w = x.shape
    h2, w2 = h // 2, w // 2
    x = x[:, :, : h2 * 2, : w2 * 2]
    x = x.reshape(b, q, h2, 2, w2, 2)
    return x.mean(axis=(3, 5))


def avg_pool2_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 average pool over H, W of (B, H, W, C)."""
    b, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    x = x[:, : h2 * 2, : w2 * 2, :]
    x = x.reshape(b, h2, 2, w2, 2, c)
    return x.mean(axis=(2, 4))


def build_corr_pyramid(
    fmap1: jnp.ndarray,
    fmap2: jnp.ndarray,
    num_levels: int = 4,
    precision: str = "highest",
    dtype=jnp.float32,
) -> CorrPyramid:
    """fmap1, fmap2: (B, H, W, C) -> pyramid of (B, H*W, Hl, Wl) float32.

    precision: MXU precision for the all-pairs matmul. Use "highest" for
    float32-valued features (parity/golden paths). When the encoders run in
    bfloat16 the feature values are already bf16-exact, so a single-pass
    "default" matmul (f32 accumulation) produces the same products at ~6x
    the throughput of the 6-pass f32 emulation.
    """
    b, h, w, c = fmap1.shape
    f1 = fmap1.reshape(b, h * w, c).astype(jnp.float32)

    # Pooling the correlation volume == correlating against pooled key
    # features (the dot product is linear in f2, and both divide by the
    # window size), so each level is built DIRECTLY from 2x-pooled fmap2.
    # This replaces the reference's avg-pool over the (B, Q, Hl, Wl) volume
    # (networks/raft/corr.py:19-22) — a multi-GB relayout pass on TPU —
    # with pooling of the tiny (B, Hl, Wl, C) feature map. Exact up to f32
    # summation order.
    inv_sqrt_c = 1.0 / jnp.sqrt(jnp.float32(c))
    levels = []
    f2l = fmap2.astype(jnp.float32)
    for _ in range(num_levels):
        _, hl, wl, _ = f2l.shape
        corr = jnp.einsum(
            "bqc,bkc->bqk", f1, f2l.reshape(b, hl * wl, c), precision=precision
        )
        corr = corr * inv_sqrt_c
        levels.append(corr.reshape(b * h * w, hl, wl).astype(dtype))
        f2l = avg_pool2_nhwc(f2l)
    return CorrPyramid(levels=tuple(levels), h1=h, w1=w)


def is_ondemand(lookup_impl: str) -> bool:
    """True for the volume-free impl spelling 'ondemand[:chunk]'."""
    return lookup_impl.split(":", 1)[0] == "ondemand"


# The supported corr_lookup API (see README): everything else in the
# dispatch is a recorded experiment from the adjudication matrix
# (PARITY.md "Performance exploration matrix") — measured losers kept
# in-tree as evidence, reachable only behind an explicit prefix.
LIVE_LOOKUPS = ("fused", "mm", "auto", "pallas_fused")


def normalize_corr_lookup(lookup_impl: str) -> str:
    """API fence for the lookup-variant surface: live spellings
    (fused | mm | ondemand[:chunk] | auto | pallas_fused) pass through;
    adjudicated experimental variants need an 'experimental:' prefix
    (e.g. 'experimental:packed2', 'experimental:fused_mix:mm,vpu_y,...')
    so nobody ships a measured-loser path by accident."""
    if lookup_impl.startswith("experimental:"):
        return lookup_impl.split(":", 1)[1]
    if lookup_impl in LIVE_LOOKUPS or is_ondemand(lookup_impl):
        return lookup_impl
    raise ValueError(
        f"corr_lookup={lookup_impl!r} is an adjudicated experimental "
        "variant (PARITY.md 'Performance exploration matrix'), not a "
        f"supported impl — spell it 'experimental:{lookup_impl}' to opt "
        "in. Supported: fused | mm | ondemand[:chunk] | auto | pallas_fused"
    )


# Stored-volume budget for corr_lookup="auto": above this many bytes of
# correlation volume (all levels, whole batch, as laid out in HBM) the
# volume-free ondemand mode is selected. 4 GB leaves room on a 16 GB
# chip for the model, its activations, and XLA temporaries at serving
# batch sizes.
AUTO_VOLUME_BYTES = 4 << 30


def stored_volume_bytes(batch: int, h8: int, w8: int, num_levels: int = 4,
                        dtype=jnp.float32) -> int:
    """HBM footprint of the stored corr pyramid. Each level is a
    (B*H8*W8, hl, wl) array and XLA pads the minor dim to 128 lanes and
    the second-minor to the dtype's sublane multiple (8 f32 / 16 bf16),
    so levels narrower than 128 cost up to ~2.8x their logical size —
    the padded-volume OOM is exactly what the auto mode must predict."""
    itemsize = jnp.dtype(dtype).itemsize
    sublane = 32 // itemsize
    padded_k = 0
    hl, wl = h8, w8
    for _ in range(num_levels):
        padded_k += (-(-hl // sublane) * sublane) * (-(-wl // 128) * 128)
        hl, wl = max(hl // 2, 1), max(wl // 2, 1)
    return batch * h8 * w8 * padded_k * itemsize


def resolve_auto_lookup(lookup_impl: str, batch: int, h8: int, w8: int,
                        default: str = "fused", num_levels: int = 4,
                        dtype=jnp.float32) -> str:
    """Resolve corr_lookup='auto' from the 1/8-res feature shape: the
    fused stored-volume path while the padded volume (stored_volume_bytes)
    fits AUTO_VOLUME_BYTES, 'ondemand' beyond it. Non-auto impls pass
    through unchanged."""
    if lookup_impl != "auto":
        return lookup_impl
    if not isinstance(batch, int):  # symbolic dim (shape-polymorphic export)
        raise ValueError(
            "corr_lookup='auto' needs a concrete batch to size the stored "
            f"volume, got symbolic {batch!r} — pick an explicit impl "
            "('fused', 'ondemand', ...) for shape-polymorphic exports"
        )
    vol_bytes = stored_volume_bytes(batch, h8, w8, num_levels, dtype)
    return default if vol_bytes <= AUTO_VOLUME_BYTES else "ondemand"


def ondemand_chunk(lookup_impl: str, default: int = 0) -> int:
    """Parse the ':chunk' suffix of an ondemand impl string.

    Returns 0 (the AUTO sentinel) for a bare 'ondemand': the chunk is
    then sized per shape at lookup time (_auto_chunk) — one chunk
    whenever the recomputed rows fit the memory budget, since the
    lax.map chunk loop costs real throughput (measured r5 at 512^2 b2:
    chunk 1024 = 40.7 f/s vs single-chunk 53.9 f/s, a 32% win purely
    from removing the loop)."""
    if ":" not in lookup_impl:
        return default
    suffix = lookup_impl.split(":", 1)[1]
    try:
        chunk = int(suffix)
    except ValueError:
        raise ValueError(
            f"bad ondemand chunk suffix {suffix!r} in corr_lookup="
            f"{lookup_impl!r}; expected 'ondemand' or 'ondemand:<int>'"
        ) from None
    if chunk <= 0:
        # _divisor_chunk would silently clamp to 1 = per-query lax.map
        # serialization (~10x slower, CLAUDE.md) — fail loudly instead.
        raise ValueError(
            f"ondemand chunk must be positive, got {chunk} in corr_lookup="
            f"{lookup_impl!r}"
        )
    return chunk


def _divisor_chunk(total: int, chunk: int) -> int:
    """Largest divisor of `total` that is <= the requested chunk."""
    chunk = max(1, min(int(chunk), total))
    while total % chunk:
        chunk -= 1
    return chunk


# Live-rows budget for the AUTO ondemand chunk (bytes of recomputed
# correlation rows per chunk, f32, across the batch). 4 GB reproduces
# the chunk the fixed default already ran at the 2048^2 fused shape
# (11 pairs x 1024 queries x 87k keys ~ 2.9 GB, measured r4) while
# removing the chunk loop entirely up to ~1024^2 serving shapes.
OD_AUTO_BYTES = int(os.environ.get("ACCFLOW_OD_CHUNK_BYTES", 4 << 30))

# On-demand recompute einsum form: "bqyx" emits correlation rows directly
# in the (hl, wl)-separated layout the tent contractions consume; "bqk"
# is the flat form. Default "auto" picks per shape from the r5 on-chip
# A/B (BENCH_MATRIX): bqyx wins when the chunk's live rows are small
# (512^2 single-chunk, 178 MB: 57.3 vs 53.9 f/s — it skips the
# per-iteration relayout of the flat output), bqk wins once they are
# large (1024^2 single-chunk, 1.4 GB: 6.15 vs 5.95 f/s); 1536^2/2048^2
# measured a wash. The crossover is gated on _OD_BQYX_BYTES of live
# f32 rows per chunk.
_OD_EINSUM = os.environ.get("ACCFLOW_OD_EINSUM", "auto")
_OD_BQYX_BYTES = int(os.environ.get("ACCFLOW_OD_BQYX_BYTES", 512 << 20))


def _auto_chunk(b: int, q: int, key_elems: int) -> int:
    """Largest divisor-of-q chunk whose recomputed rows
    (b * chunk * key_elems f32) fit OD_AUTO_BYTES; at least 256 queries
    so tiny budgets never degenerate toward per-query serialization."""
    fit = OD_AUTO_BYTES // max(4 * b * key_elems, 1)
    return _divisor_chunk(q, max(int(fit), 256))


def build_corr_operands(
    fmap1: jnp.ndarray,
    fmap2: jnp.ndarray,
    num_levels: int,
    lookup_impl: str,
    precision: str = "highest",
    dtype=jnp.float32,
):
    """Build whatever the chosen lookup impl consumes: on-demand feature
    operands for impl 'ondemand[:chunk]', a materialized volume pyramid
    for everything else. Shared by the RAFT/GMA feature stages. `dtype`
    (corr_volume_dtype) applies to both: the on-demand path quantizes
    its recomputed rows to it so the numerics match a stored volume of
    the same dtype."""
    if is_ondemand(lookup_impl):
        ondemand_chunk(lookup_impl)  # validate the suffix at build time
        return build_corr_on_demand(fmap1, fmap2, num_levels, dtype=dtype)
    return build_corr_pyramid(
        fmap1, fmap2, num_levels, precision=precision, dtype=dtype
    )


def build_corr_single_scale(
    fmap1: jnp.ndarray, fmap2: jnp.ndarray
) -> CorrPyramid:
    """Single-level correlation (reference CorrBlockSingleScale,
    networks/gma/corr.py:61-99 — an unused ablation variant, kept for API
    completeness). Same layout as the pyramid with one level."""
    return build_corr_pyramid(fmap1, fmap2, num_levels=1)


class OnDemandCorr(NamedTuple):
    """Correlation operands that store FEATURES, not the volume.

    The reference carries an `alternate_corr` flag for a memory-efficient
    CUDA lookup (networks/raft/raft.py:45-46 — dead upstream: the kernel
    was never shipped with AccFlow). This is the TPU-native equivalent:
    keep f1 plus the 2x-pooled f2 feature pyramid (O(HW·C) memory) and
    recompute each query's correlation rows on the MXU at every lookup,
    streamed over query chunks so the O((HW)^2) volume never materializes.
    Exactly equal to building the volume f32 and running lookup_corr
    (same einsum contractions in the same order).

    f1: (B, H1*W1, C) float32 query features (UNscaled; 1/sqrt(C) is
        applied after the chunk matmul, matching build_corr_pyramid).
    f2_levels: per level, (B, Hl*Wl, C) float32 pooled key features.
    shapes: per level (Hl, Wl).
    vol_dtype: dtype string the recomputed rows are quantized to before
        the tent contractions — matches a stored volume of that dtype
        (corr_volume_dtype semantics)."""

    f1: jnp.ndarray
    f2_levels: tuple[jnp.ndarray, ...]
    shapes: tuple[tuple[int, int], ...]
    h1: int
    w1: int
    vol_dtype: str = "float32"


def build_corr_on_demand(
    fmap1: jnp.ndarray, fmap2: jnp.ndarray, num_levels: int = 4,
    dtype=jnp.float32,
) -> OnDemandCorr:
    """fmap1, fmap2: (B, H, W, C) -> on-demand operands (see OnDemandCorr).

    Cost: num_levels avg-pools of the small f2 map — no all-pairs matmul
    happens here; it moves into lookup_corr_on_demand."""
    b, h, w, c = fmap1.shape
    f1 = fmap1.reshape(b, h * w, c).astype(jnp.float32)
    levels, shapes = [], []
    f2l = fmap2.astype(jnp.float32)
    for _ in range(num_levels):
        _, hl, wl, _ = f2l.shape
        levels.append(f2l.reshape(b, hl * wl, c))
        shapes.append((hl, wl))
        f2l = avg_pool2_nhwc(f2l)
    return OnDemandCorr(
        f1, tuple(levels), tuple(shapes), h, w, jnp.dtype(dtype).name
    )


class OnDemandChunks(NamedTuple):
    """OnDemandCorr with f1 pre-split chunk-major: (nch, B, chunk, C).
    Prepared ONCE outside an iteration loop (prepare_ondemand_chunks) so
    the loop-invariant reshape/transpose is not re-emitted per scan step
    (XLA's loop-invariant motion across scan bodies is not guaranteed)."""

    f1s: jnp.ndarray
    f2_levels: tuple[jnp.ndarray, ...]
    shapes: tuple[tuple[int, int], ...]
    h1: int
    w1: int
    vol_dtype: str
    chunk: int


def prepare_ondemand_chunks(od: OnDemandCorr, chunk: int) -> OnDemandChunks:
    b, q, c = od.f1.shape
    if chunk == 0:  # AUTO (see ondemand_chunk)
        chunk = _auto_chunk(b, q, sum(hl * wl for hl, wl in od.shapes))
    chunk = _divisor_chunk(q, chunk)
    f1s = od.f1.reshape(b, q // chunk, chunk, c).transpose(1, 0, 2, 3)
    return OnDemandChunks(
        f1s, od.f2_levels, od.shapes, od.h1, od.w1, od.vol_dtype, chunk
    )


def lookup_corr_on_demand(
    od,
    coords: jnp.ndarray,
    radius: int = 4,
    chunk: int = 0,
    precision: str = "highest",
) -> jnp.ndarray:
    """Streaming corr lookup: recompute + tent-contract per query chunk.

    For each chunk of queries the full (Qc, Hl, Wl) correlation rows are
    rebuilt with one MXU matmul and immediately consumed by the separable
    tent contractions of lookup_corr; peak live memory is one chunk's rows
    (chunk * sum(Hl*Wl) floats) instead of the whole volume. Chunks run
    sequentially under lax.map; the chunk body is rematerialized
    (jax.checkpoint) so the backward pass also never stores the volume —
    usable as a memory-bounded TRAINING path, not just inference.

    chunk: requested queries per chunk; rounded down to the largest
    divisor of H*W so every chunk has one static shape. 0 = AUTO: the
    largest chunk whose live rows fit OD_AUTO_BYTES — one chunk (no
    lax.map at all) whenever memory allows, since the chunk loop itself
    costs ~32% throughput at 512^2 (r5 sweep, BENCH_MATRIX).
    Numerically identical to lookup_corr on a
    build_corr_pyramid(precision=precision, dtype=vol_dtype) volume.

    od: OnDemandCorr, or OnDemandChunks when the caller looks up inside
    an iteration loop (the chunk-major f1 layout is then prepared once,
    outside the loop, and the `chunk` argument is ignored)."""
    b, h, w, _ = coords.shape
    num = 2 * radius + 1
    qtot = h * w
    prepared = isinstance(od, OnDemandChunks)
    if prepared:
        chunk = od.chunk
        c = od.f1s.shape[-1]
    else:
        if chunk == 0:  # AUTO (see ondemand_chunk)
            chunk = _auto_chunk(
                b, qtot, sum(hl * wl for hl, wl in od.shapes)
            )
        chunk = _divisor_chunk(qtot, chunk)
        c = od.f1.shape[-1]
    nch = qtot // chunk
    inv_sqrt_c = 1.0 / jnp.sqrt(jnp.float32(c))
    delta = jnp.linspace(-radius, radius, num, dtype=jnp.float32)

    vol = jnp.dtype(od.vol_dtype)
    key_elems = sum(hl * wl for hl, wl in od.shapes)
    use_bqyx = _OD_EINSUM == "bqyx" or (
        _OD_EINSUM == "auto" and 4 * b * chunk * key_elems <= _OD_BQYX_BYTES
    )

    def one_chunk(f1c: jnp.ndarray, cc: jnp.ndarray) -> jnp.ndarray:
        # f1c: (B, Qc, C) queries; cc: (B, Qc, 2) their lookup centers.
        # The dtype chain (f32 scale -> vol_dtype rows -> vol_dtype tent
        # weights -> f32-accumulated einsums) mirrors build_corr_pyramid
        # + lookup_corr exactly, so any vol_dtype matches a stored volume.
        qc = b * chunk
        cf = cc.reshape(qc, 2)
        outs = []
        for i, (f2l, (hl, wl)) in enumerate(zip(od.f2_levels, od.shapes)):
            if use_bqyx:
                # Emit the rows directly in (b, q, hl, wl): the f2 view
                # (b,hl,wl,c) is free (minor dim unchanged) and the MXU
                # writes straight into the lane-padded row layout the
                # tent contractions consume — the r5 trace pinned a
                # 92 ms/step relayout reshape on the flat (b,q,k) form
                # (the stored path pays that relayout ONCE at build
                # time; on-demand was paying it every iteration).
                # Explicit batch dim: -1 cannot be inferred when the
                # coarsest pyramid level is degenerate (hl or wl == 0 at
                # tiny frame sizes — the einsum then just yields empty
                # rows, like the flat form always did).
                corr = jnp.einsum(
                    "bqc,byxc->bqyx", f1c,
                    f2l.reshape(f2l.shape[0], hl, wl, f2l.shape[-1]),
                    precision=precision,
                ) * inv_sqrt_c
            else:  # "bqk" — the flat form (large chunks / A/B probes)
                corr = jnp.einsum(
                    "bqc,bkc->bqk", f1c, f2l, precision=precision
                ) * inv_sqrt_c
            corr = corr.reshape(qc, hl, wl).astype(vol)
            cx = cf[:, 0:1] / (2.0**i) + delta[None]
            cy = cf[:, 1:2] / (2.0**i) + delta[None]
            wx = _window_weights(cx, wl).astype(vol)  # (Qc, 9, wl)
            wy = _window_weights(cy, hl).astype(vol)  # (Qc, 9, hl)
            tmp = jnp.einsum("qby,qyx->qbx", wy, corr, precision=precision,
                             preferred_element_type=jnp.float32)
            out = jnp.einsum("qax,qbx->qab", wx, tmp.astype(vol),
                             precision=precision,
                             preferred_element_type=jnp.float32)
            outs.append(out.reshape(b, chunk, num * num))
        return jnp.concatenate(outs, axis=-1)  # (B, Qc, levels*num^2)

    cf32 = coords.reshape(b, nch, chunk, 2).astype(jnp.float32)
    if nch == 1:
        f1c = od.f1s[0] if prepared else od.f1
        out = one_chunk(f1c, cf32[:, 0])[None]
    else:
        f1s = (
            od.f1s if prepared
            else od.f1.reshape(b, nch, chunk, c).transpose(1, 0, 2, 3)
        )
        out = jax.lax.map(
            lambda args: jax.checkpoint(one_chunk)(*args),
            (f1s, cf32.transpose(1, 0, 2, 3)),
        )  # (nch, B, Qc, levels*num^2)
    return out.transpose(1, 0, 2, 3).reshape(b, h, w, -1)


def lookup_corr_gather(
    pyramid: CorrPyramid, coords: jnp.ndarray, radius: int = 4
) -> jnp.ndarray:
    """Gather-based reference lookup (see lookup_corr for the fast path).

    Samples (2r+1)^2 windows at every level around `coords` (B, H, W, 2).
    Returns (B, H, W, num_levels*(2r+1)^2) float32 with the reference's
    channel layout (level-major; within a level the outer window index
    carries the x offset — see module docstring).
    """
    b, h, w, _ = coords.shape
    num = 2 * radius + 1
    delta = jnp.linspace(-radius, radius, num, dtype=jnp.float32)
    # Window entry (a, b): (x + delta[a], y + delta[b]); flattened a*num+b.
    dx = jnp.repeat(delta, num)  # outer index a
    dy = jnp.tile(delta, num)  # inner index b
    offsets = jnp.stack([dx, dy], axis=-1)  # (num*num, 2)

    q = b * h * w
    coords_flat = coords.reshape(q, 1, 2).astype(jnp.float32)

    outs = []
    for i, level in enumerate(pyramid.levels):
        hl, wl = level.shape[-2:]
        pts = coords_flat / (2.0**i) + offsets[None]  # (Q, 81, 2)
        img = level.reshape(q, hl, wl, 1)
        sampled = bilinear_sample(img, pts)  # (Q, 81, 1)
        outs.append(sampled.reshape(b, h, w, num * num))
    return jnp.concatenate(outs, axis=-1)


def lookup_corr_split_packed(
    pyramid: CorrPyramid,
    coords: jnp.ndarray,
    radius: int = 4,
    precision: str = "highest",
    start: int = 1,
) -> list:
    """lookup_corr_split with levels start..L-1 PACKED into one volume.

    On TPU the small pyramid levels' lookups are overhead-bound, not
    data-bound (the batched (9, hl) x (hl, wl) matmuls pay per-batch-element
    dispatch: measured 1.8/1.3/0.9 ms for levels 1-3 vs 2.6 ms for the 21x
    larger level 0). Packing them — y-concatenated, x zero-padded to
    level 1's width — turns three batched matmuls into one with 3x the M
    rows. Numerically exact: the per-level tent weights are masked to
    their own y-range, and taps landing in x padding multiply zeros,
    which is precisely the zeros-padding sampling semantics.

    Returns [per-level (B,H,W,9,9) for levels < start,
    packed (B,H,W,L-start,9,9)]. start=2 packs only the TINY levels —
    the (Q,16,16)/(Q,8,8) tent einsums trigger a pathological XLA
    "convolution" lowering at ~31 GB/s (traced r3) that a single taller
    packed einsum avoids, while the well-lowered big levels keep mm.
    """
    b, h, w, _ = coords.shape
    num = 2 * radius + 1
    delta = jnp.linspace(-radius, radius, num, dtype=jnp.float32)
    q = b * h * w
    cf = coords.reshape(q, 2).astype(jnp.float32)

    outs_big = lookup_corr_split(
        CorrPyramid(
            levels=pyramid.levels[:start], h1=pyramid.h1, w1=pyramid.w1
        ),
        coords, radius, precision,
    )

    small = pyramid.levels[start:]
    nl = len(small)
    wp = small[0].shape[-1]  # pack width = first packed level's wl
    offs = []
    rows = []
    off = 0
    for lvl in small:
        hl, wl = lvl.shape[-2:]
        offs.append(off)
        rows.append(
            jnp.pad(lvl.reshape(q, hl, wl), ((0, 0), (0, 0), (0, wp - wl)))
        )
        off += hl
    packed = jnp.concatenate(rows, axis=1)  # (Q, sum_hl, wp)
    ycat = off

    # Masked per-level tent weights over the concatenated y axis.
    ys = jnp.arange(ycat, dtype=jnp.float32)
    wys = []
    wxs = []
    for li, lvl in enumerate(small):
        hl, wl = lvl.shape[-2:]
        scale = 2.0 ** (li + start)
        cy = cf[:, 1:2] / scale + delta[None] + float(offs[li])  # (Q, 9)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(ys[None, None, :] - cy[..., None]))
        mask = (ys >= offs[li]) & (ys < offs[li] + hl)
        wys.append(wy * mask[None, None, :])
        cx = cf[:, 0:1] / scale + delta[None]
        wxs.append(_window_weights(cx, wp))
    wy_p = jnp.stack(wys, axis=1).astype(packed.dtype)  # (Q, L-1, 9, ycat)
    wx_p = jnp.stack(wxs, axis=1).astype(packed.dtype)  # (Q, L-1, 9, wp)

    tmp = jnp.einsum(
        "qlby,qyx->qlbx", wy_p, packed, precision=precision,
        preferred_element_type=jnp.float32,
    )
    out = jnp.einsum(
        "qlax,qlbx->qlab", wx_p, tmp.astype(packed.dtype), precision=precision,
        preferred_element_type=jnp.float32,
    )
    return outs_big + [out.reshape(b, h, w, nl, num, num)]


def lookup_corr_split(
    pyramid: CorrPyramid,
    coords: jnp.ndarray,
    radius: int = 4,
    precision: str = "highest",
    x_contraction: str = "mxu",
) -> list:
    """mm lookup WITHOUT the output flatten/concat: returns one
    (B, H, W, num, num) tensor per level, window indexed [a (x offset),
    b (y offset)]. Consumers that immediately contract the window channels
    (the motion encoder's 1x1 conv) can einsum these directly against
    reshaped weights, skipping the (Q,9,9)->(B,H,W,81) relayout and the
    level concat the flattened form forces (each ~0.5 ms per iteration on
    a v5e at the CVO-6 serving shape)."""
    b, h, w, _ = coords.shape
    num = 2 * radius + 1
    delta = jnp.linspace(-radius, radius, num, dtype=jnp.float32)
    q = b * h * w
    cf = coords.reshape(q, 2).astype(jnp.float32)

    outs = []
    for i, level in enumerate(pyramid.levels):
        hl, wl = level.shape[-2:]
        cx = cf[:, 0:1] / (2.0**i) + delta[None]
        cy = cf[:, 1:2] / (2.0**i) + delta[None]
        wx = _window_weights(cx, wl).astype(level.dtype)
        wy = _window_weights(cy, hl).astype(level.dtype)
        corr = level.reshape(q, hl, wl)
        tmp = jnp.einsum("qby,qyx->qbx", wy, corr, precision=precision,
                         preferred_element_type=jnp.float32)
        if x_contraction == "vpu":
            # The batched (9, wl) x (wl, 9) matmuls are MXU-dispatch-bound
            # (90k batch elements); as 9 static multiply + lane-reduce
            # passes the contraction runs entirely on the VPU.
            t = tmp.astype(jnp.float32)
            wxf = wx.astype(jnp.float32)
            out = jnp.stack(
                [(t * wxf[:, a : a + 1, :]).sum(axis=-1) for a in range(num)],
                axis=1,
            )
        else:
            out = jnp.einsum("qax,qbx->qab", wx, tmp.astype(level.dtype),
                             precision=precision,
                             preferred_element_type=jnp.float32)
        outs.append(out.reshape(b, h, w, num, num))
    return outs


def lookup(
    pyramid: CorrPyramid,
    coords: jnp.ndarray,
    radius: int = 4,
    impl: str = "mm",
    precision: str = "highest",
) -> jnp.ndarray:
    """Dispatch over the lookup implementations (all numerically
    equivalent; they differ only in how the work maps onto the TPU).

    impl "ondemand" (or "ondemand:<chunk>") requires `pyramid` to be an
    OnDemandCorr from build_corr_on_demand; every other impl requires a
    materialized CorrPyramid."""
    if is_ondemand(impl):
        if not isinstance(pyramid, (OnDemandCorr, OnDemandChunks)):
            raise TypeError(
                "impl='ondemand' needs build_corr_on_demand operands, got "
                f"{type(pyramid).__name__}"
            )
        return lookup_corr_on_demand(
            pyramid, coords, radius, ondemand_chunk(impl), precision
        )
    if isinstance(pyramid, (OnDemandCorr, OnDemandChunks)):
        raise TypeError(
            f"impl={impl!r} needs a materialized CorrPyramid; the model was "
            "built with on-demand correlation operands"
        )
    if impl == "mm":
        return lookup_corr(pyramid, coords, radius, precision)
    if impl == "pallas_fused":
        from accflow_tpu.ops.corr_pallas import (
            fused_lookup_supported,
            lookup_corr_fused_from_pyramid,
        )

        if jax.default_backend() == "tpu" and not fused_lookup_supported(
            pyramid, radius
        ):
            # Tiny pyramid levels violate Mosaic's shape-cast rule (see
            # fused_lookup_supported); fall back like the model paths do
            # instead of failing deep inside the kernel.
            import warnings

            warnings.warn(
                "pallas_fused lookup unsupported for this pyramid shape on "
                "TPU; falling back to the XLA 'mm' lookup."
            )
            return lookup_corr(pyramid, coords, radius, precision)
        # precision=highest (f32 parity paths) -> stream f32; default ->
        # bf16 (what the serving path quantizes to anyway).
        stream = jnp.float32 if precision == "highest" else jnp.bfloat16
        return lookup_corr_fused_from_pyramid(
            pyramid, coords, radius, stream_dtype=stream
        )
    if impl == "pallas":
        from accflow_tpu.ops.corr_pallas import lookup_corr_pallas

        # precision=highest (f32 parity paths) -> stream the storage dtype
        # exactly; default -> bf16 streaming (what the MXU would do anyway).
        import jax.numpy as _jnp

        stream = None if precision == "highest" else _jnp.bfloat16
        return lookup_corr_pallas(pyramid, coords, radius, stream_dtype=stream)
    if impl == "rows":
        return lookup_corr_rows(pyramid, coords, radius, precision)
    if impl == "patch":
        return lookup_corr_patch(pyramid, coords, radius)
    if impl == "gather":
        return lookup_corr_gather(pyramid, coords, radius)
    raise ValueError(f"unknown corr lookup impl: {impl}")


def _window_weights(centers: jnp.ndarray, size: int) -> jnp.ndarray:
    """Separable bilinear weights: centers (Q, K) -> (Q, K, size) where
    weight[q, k, y] = max(0, 1 - |y - centers[q, k]|).

    This is exactly grid_sample's align_corners=True + zeros-padding
    behavior along one axis: for in-range centers the two neighboring
    integer positions get (1-frac, frac); out-of-range corners fall off
    the [0, size) support and contribute nothing."""
    ys = jnp.arange(size, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(ys[None, None, :] - centers[..., None]))


def lookup_corr_patch(
    pyramid: CorrPyramid, coords: jnp.ndarray, radius: int = 4
) -> jnp.ndarray:
    """Patch-based corr lookup.

    All (2r+1)^2 window taps share ONE fractional offset (the window
    deltas are integers), so the whole window is a bilinear blend of the
    four (2r+1)^2 integer sub-grids of a (2r+2)^2 patch around
    floor(coords/2^level). One flattened gather of (2r+2)^2 contiguous-ish
    values per query replaces 4x(2r+1)^2 scattered corner gathers, and the
    blend is 4 fused multiply-adds on the VPU. Zeros-padding semantics
    preserved by masking out-of-range patch entries.
    """
    b, h, w, _ = coords.shape
    num = 2 * radius + 1
    side = num + 1
    q = b * h * w
    cf = coords.reshape(q, 2).astype(jnp.float32)

    dy = jnp.arange(-radius, radius + 2, dtype=jnp.float32)  # side ints
    dx = jnp.arange(-radius, radius + 2, dtype=jnp.float32)

    outs = []
    for i, level in enumerate(pyramid.levels):
        hl, wl = level.shape[-2:]
        cx = cf[:, 0] / (2.0**i)
        cy = cf[:, 1] / (2.0**i)
        x0 = jnp.floor(cx)
        y0 = jnp.floor(cy)
        fx = (cx - x0)[:, None, None]
        fy = (cy - y0)[:, None, None]

        # Integer patch coords (Q, side, side): rows carry y, cols x.
        py = y0[:, None] + dy[None]  # (Q, side)
        px = x0[:, None] + dx[None]
        valid = (
            (py[:, :, None] >= 0)
            & (py[:, :, None] <= hl - 1)
            & (px[:, None, :] >= 0)
            & (px[:, None, :] <= wl - 1)
        )
        iy = jnp.clip(py, 0, hl - 1).astype(jnp.int32)
        ix = jnp.clip(px, 0, wl - 1).astype(jnp.int32)
        idx = (iy[:, :, None] * wl + ix[:, None, :]).reshape(q, side * side)

        flat = level.reshape(q, hl * wl)
        patch = jnp.take_along_axis(flat, idx, axis=1).reshape(q, side, side)
        patch = patch * valid.astype(patch.dtype)

        # out[q, a, b]: a = x offset, b = y offset (reference layout).
        p00 = patch[:, :num, :num]  # (y0+Δb, x0+Δa)
        p01 = patch[:, :num, 1:]
        p10 = patch[:, 1:, :num]
        p11 = patch[:, 1:, 1:]
        blend = (
            (1 - fy) * (1 - fx) * p00
            + (1 - fy) * fx * p01
            + fy * (1 - fx) * p10
            + fy * fx * p11
        )  # (Q, num(y=b), num(x=a))
        out = blend.transpose(0, 2, 1).reshape(b, h, w, num * num)
        outs.append(out)
    return jnp.concatenate(outs, axis=-1)


def _level_window_rows(
    corr3: jnp.ndarray,
    cf: jnp.ndarray,
    scale: float,
    radius: int,
    precision: str,
    x_mode: str = "mxu",
) -> jnp.ndarray:
    """One level's (2r+1)^2 window via a row gather: (Q, num(a), num(b)).

    All taps of a window share one fractional y offset, so the y tent
    contraction == gathering 2r+2 rows of each query's own (hl, wl) map and
    one 2-tap VPU lerp. The gather is a single `take_along_axis` along the
    row axis — the one-row-per-index form that lowers to a fast strided
    gather on TPU (same pattern as ops/sampling.py), NOT the
    multi-dim-slice `lax.gather` that relayouts (see CLAUDE.md perf notes).
    This reads ~(2r+2)/hl of the level per iteration instead of streaming
    the whole volume through the tent matmul (level 0: 10/64 of 1.5 GB at
    the AccFlow OFE shape).

    x_mode: "mxu" finishes with the (9, wl) x (wl, 9) tent einsum;
    "gather" gathers 2r+2 columns of the lerped rows and lerps again
    (no MXU dispatch at all).
    """
    q, hl, wl = corr3.shape
    num = 2 * radius + 1
    side = num + 1
    dy = jnp.arange(-radius, radius + 2, dtype=jnp.float32)

    cx = cf[:, 0] / scale
    cy = cf[:, 1] / scale
    y0 = jnp.floor(cy)
    fy = (cy - y0)[:, None, None]
    py = y0[:, None] + dy[None]  # (Q, side)
    yvalid = (py >= 0) & (py <= hl - 1)
    iy = jnp.clip(py, 0, hl - 1).astype(jnp.int32)
    rows = jnp.take_along_axis(corr3, iy[:, :, None], axis=1)  # (Q, side, wl)
    rows = rows * yvalid[:, :, None].astype(rows.dtype)
    rows = rows.astype(jnp.float32)
    tmp = (1.0 - fy) * rows[:, :num] + fy * rows[:, 1:]  # (Q, num(b), wl)

    if x_mode == "mxu":
        delta = jnp.linspace(-radius, radius, num, dtype=jnp.float32)
        wx = _window_weights(cx[:, None] + delta[None], wl)  # (Q, num(a), wl)
        return jnp.einsum(
            "qax,qbx->qab", wx.astype(corr3.dtype), tmp.astype(corr3.dtype),
            precision=precision, preferred_element_type=jnp.float32,
        )
    # gather finish: 2r+2 columns, shared fractional x.
    x0 = jnp.floor(cx)
    fx = (cx - x0)[:, None, None]
    px = x0[:, None] + dy[None]  # (Q, side)
    xvalid = (px >= 0) & (px <= wl - 1)
    ix = jnp.clip(px, 0, wl - 1).astype(jnp.int32)
    cols = jnp.take_along_axis(tmp, ix[:, None, :], axis=2)  # (Q, num(b), side)
    cols = cols * xvalid[:, None, :].astype(cols.dtype)
    out_ba = (1.0 - fx) * cols[:, :, :num] + fx * cols[:, :, 1:]  # (Q, b, a)
    return out_ba.transpose(0, 2, 1)


def _level_window_mm(
    corr3: jnp.ndarray,
    cf: jnp.ndarray,
    scale: float,
    radius: int,
    precision: str,
) -> jnp.ndarray:
    """One level's window via the two tent matmuls: (Q, num(a), num(b))."""
    q, hl, wl = corr3.shape
    num = 2 * radius + 1
    delta = jnp.linspace(-radius, radius, num, dtype=jnp.float32)
    cx = cf[:, 0:1] / scale + delta[None]
    cy = cf[:, 1:2] / scale + delta[None]
    wx = _window_weights(cx, wl).astype(corr3.dtype)
    wy = _window_weights(cy, hl).astype(corr3.dtype)
    tmp = jnp.einsum("qby,qyx->qbx", wy, corr3, precision=precision,
                     preferred_element_type=jnp.float32)
    return jnp.einsum("qax,qbx->qab", wx, tmp.astype(corr3.dtype),
                      precision=precision,
                      preferred_element_type=jnp.float32)


def _level_window_vpu_y(
    corr3: jnp.ndarray,
    cf: jnp.ndarray,
    scale: float,
    radius: int,
    precision: str,
) -> jnp.ndarray:
    """One level's window with the Y tent contraction on the VPU:
    tmp[q,b,x] = sum_y wy[q,b,y] corr[q,y,x] as a fused broadcast-multiply
    + SUBLANE-axis reduce (streams the volume once without the batched
    tiny-matmul MXU dispatch stalls that cap the mm form at ~180 GB/s —
    traced r2), then the small X tent contraction on the MXU."""
    q, hl, wl = corr3.shape
    num = 2 * radius + 1
    delta = jnp.linspace(-radius, radius, num, dtype=jnp.float32)
    cx = cf[:, 0:1] / scale + delta[None]
    cy = cf[:, 1:2] / scale + delta[None]
    wy = _window_weights(cy, hl).astype(corr3.dtype)  # (Q, 9, hl)
    # (Q, 9, hl, 1) * (Q, 1, hl, wl) -> reduce hl (second-minor axis):
    # XLA fuses this into one pass over the volume.
    tmp = jnp.sum(
        wy[:, :, :, None].astype(jnp.float32)
        * corr3[:, None, :, :].astype(jnp.float32),
        axis=2,
    )  # (Q, 9(b), wl) f32
    wx = _window_weights(cx, wl).astype(corr3.dtype)
    return jnp.einsum(
        "qax,qbx->qab", wx, tmp.astype(corr3.dtype),
        precision=precision, preferred_element_type=jnp.float32,
    )


def _level_window_bd(
    corr3: jnp.ndarray,
    cf: jnp.ndarray,
    scale: float,
    radius: int,
    precision: str,
) -> jnp.ndarray:
    """One level's window with the y tent contraction on the MXU via the
    block-diagonal Pallas kernel (ops/corr_pallas.py::y_contract_bd) and
    the small x tent contraction as the usual einsum. The volume is
    streamed bf16 on single-pass paths (the value set is bf16 anyway for
    bf16-encoded features; the cast is loop-invariant and hoisted out of
    the GRU scan by XLA)."""
    from accflow_tpu.ops.corr_pallas import y_contract_bd

    q, hl, wl = corr3.shape
    num = 2 * radius + 1
    delta = jnp.linspace(-radius, radius, num, dtype=jnp.float32)
    cx = cf[:, 0:1] / scale + delta[None]
    cy = cf[:, 1:2] / scale + delta[None]
    kd = jnp.float32 if precision == "highest" else jnp.bfloat16
    wy = _window_weights(cy, hl).astype(kd)
    tmp = y_contract_bd(corr3.astype(kd), wy)  # (Q, num, wl) f32
    wx = _window_weights(cx, wl).astype(corr3.dtype)
    return jnp.einsum(
        "qax,qbx->qab", wx, tmp.astype(corr3.dtype),
        precision=precision, preferred_element_type=jnp.float32,
    )


def lookup_corr_split_v2(
    pyramid: CorrPyramid,
    coords: jnp.ndarray,
    radius: int = 4,
    precision: str = "highest",
    level_impl: tuple = ("rows", "mm", "mm", "mm"),
) -> list:
    """Per-level-configurable split lookup (same consumer interface as
    lookup_corr_split): level_impl[i] in {"mm", "rows", "rows_gx",
    "vpu_y", "bd"} picks the window formulation for pyramid level i.
    Returns one (B, H, W, num, num) array per level, window indexed
    [a (x), b (y)]."""
    b, h, w, _ = coords.shape
    num = 2 * radius + 1
    q = b * h * w
    cf = coords.reshape(q, 2).astype(jnp.float32)
    outs = []
    for i, level in enumerate(pyramid.levels):
        hl, wl = level.shape[-2:]
        corr3 = level.reshape(q, hl, wl)
        impl = level_impl[i] if i < len(level_impl) else level_impl[-1]
        if impl == "mm":
            out = _level_window_mm(corr3, cf, 2.0**i, radius, precision)
        elif impl == "bd":
            out = _level_window_bd(corr3, cf, 2.0**i, radius, precision)
        elif impl == "vpu_y":
            out = _level_window_vpu_y(corr3, cf, 2.0**i, radius, precision)
        elif impl == "rows":
            out = _level_window_rows(corr3, cf, 2.0**i, radius, precision, "mxu")
        elif impl == "rows_gx":
            out = _level_window_rows(corr3, cf, 2.0**i, radius, precision, "gather")
        else:
            raise ValueError(f"unknown level impl: {impl}")
        outs.append(out.reshape(b, h, w, num, num))
    return outs


def lookup_corr_rows(
    pyramid: CorrPyramid,
    coords: jnp.ndarray,
    radius: int = 4,
    precision: str = "highest",
) -> jnp.ndarray:
    """Row-gather corr lookup.

    All taps of a window share one fractional y offset, so the y-axis
    contraction of the mm form reduces to gathering 2r+2 CONTIGUOUS rows of
    each query's (hl, wl) map (a fast strided gather — full cache lines,
    no per-element addressing) and one 2-tap VPU blend. Only the tiny
    x-axis tent contraction (9 x wl x 9 per query) stays on the MXU.
    Numerically identical to lookup_corr/lookup_corr_gather.
    """
    b, h, w, _ = coords.shape
    num = 2 * radius + 1
    side = num + 1
    q = b * h * w
    cf = coords.reshape(q, 2).astype(jnp.float32)
    delta = jnp.linspace(-radius, radius, num, dtype=jnp.float32)
    dy = jnp.arange(-radius, radius + 2, dtype=jnp.float32)

    outs = []
    for i, level in enumerate(pyramid.levels):
        hl, wl = level.shape[-2:]
        cx = cf[:, 0:1] / (2.0**i) + delta[None]  # (Q, 9) tap x-centers
        cy = cf[:, 1] / (2.0**i)
        y0 = jnp.floor(cy)
        fy = (cy - y0)[:, None, None]
        py = y0[:, None] + dy[None]  # (Q, side)
        yvalid = (py >= 0) & (py <= hl - 1)
        iy = jnp.clip(py, 0, hl - 1).astype(jnp.int32)
        rows = jax.vmap(lambda m, ii: jnp.take(m, ii, axis=0))(
            level.reshape(q, hl, wl), iy
        )  # (Q, side, wl)
        rows = rows * yvalid[:, :, None].astype(rows.dtype)
        tmp = (1.0 - fy) * rows[:, :num] + fy * rows[:, 1:]  # (Q, 9=b, wl)
        wx = _window_weights(cx, wl)  # (Q, 9=a, wl)
        out = jnp.einsum("qax,qbx->qab", wx, tmp, precision=precision)
        outs.append(out.reshape(b, h, w, num * num))
    return jnp.concatenate(outs, axis=-1)


def lookup_corr(
    pyramid: CorrPyramid,
    coords: jnp.ndarray,
    radius: int = 4,
    precision: str = "highest",
) -> jnp.ndarray:
    """Matmul-based corr lookup — the TPU-native fast path.

    Key observation: every query pixel samples a (2r+1)^2 bilinear window
    from ITS OWN (hl, wl) correlation map, and bilinear interpolation is
    separable, so the whole lookup is two small batched contractions on
    the MXU instead of scattered gathers:

        tmp[q, b, x] = sum_y  Wy[q, b, y] * corr[q, y, x]
        out[q, a, b] = sum_x  Wx[q, a, x] * tmp[q, b, x]

    with Wy/Wx the tent-function weights above. Numerically identical to
    lookup_corr_gather (same zeros-padding semantics); same channel
    layout: level-major, then a (x offset), then b (y offset).
    """
    b, h, w, _ = coords.shape
    num = 2 * radius + 1
    delta = jnp.linspace(-radius, radius, num, dtype=jnp.float32)

    q = b * h * w
    cf = coords.reshape(q, 2).astype(jnp.float32)

    outs = []
    for i, level in enumerate(pyramid.levels):
        hl, wl = level.shape[-2:]
        cx = cf[:, 0:1] / (2.0**i) + delta[None]  # (Q, 9) tap x-centers
        cy = cf[:, 1:2] / (2.0**i) + delta[None]  # (Q, 9) tap y-centers
        wx = _window_weights(cx, wl).astype(level.dtype)  # (Q, 9, wl)
        wy = _window_weights(cy, hl).astype(level.dtype)  # (Q, 9, hl)
        corr = level.reshape(q, hl, wl)
        tmp = jnp.einsum("qby,qyx->qbx", wy, corr, precision=precision,
                         preferred_element_type=jnp.float32)
        out = jnp.einsum("qax,qbx->qab", wx, tmp.astype(level.dtype),
                         precision=precision,
                         preferred_element_type=jnp.float32)
        outs.append(out.reshape(b, h, w, num * num))
    return jnp.concatenate(outs, axis=-1)
