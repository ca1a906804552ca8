"""Mosaic probe: fully-fused corr-lookup kernel building blocks.

Per CLAUDE.md workflow — probe pallas_call compatibility standalone before
a full-model experiment. The kernel under test computes ONE pyramid
level's complete (2r+1)^2 window lookup for a tile of queries:

- coords in SMEM, tent weights built in-registers from integer iotas;
- y contraction as a block-diagonal MXU dot (G queries per
  (G*9, G*hl) x (G*hl, wl) dot, diagonal blocks written into zeroed
  VMEM scratch — only diagonal slots are ever overwritten across groups);
- x contraction as one (G*9, wl) x (wl, G*9) lane-contraction dot whose
  diagonal (9, 9) blocks are the per-query answers;
- per-group diagonal extraction into a (tq, 9, 9) scratch, then the
  (tq, 81) output written as 9 VECTORIZED lane stores per tile (not per
  query — the per-query store pattern is what serialized the r1 kernel).

Input layout variants probed:
  A: corr as (Q, hl, wl) 3D blocks (known-good from probe_pallas_bd, but
     the HBM layout pads wl<128 lanes -> 2x stream traffic at level 0);
  B: corr as flat (Q, hl*wl) rows (unpadded stream) with the in-kernel
     per-group reshape (G, hl*wl) -> (G*hl, wl).

    python scripts/probe_pallas_fused.py          # correctness (both)
    TIME=1 python scripts/probe_pallas_fused.py   # + on-chip timing
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RADIUS = 4
NUM = 2 * RADIUS + 1  # 9


def _tent(centers, size):
    """centers (rows,) scalarish -> weights; built from integer iotas only."""
    ys = jax.lax.broadcasted_iota(jnp.int32, (NUM, size), 1).astype(jnp.float32)
    ks = jax.lax.broadcasted_iota(jnp.int32, (NUM, size), 0).astype(
        jnp.float32
    ) - float(RADIUS)
    return jnp.maximum(0.0, 1.0 - jnp.abs(ys - (centers + ks)))


def make_kernel(hl, wl, tq, g, flat, dtype):
    def kernel(coords_ref, corr_ref, out_ref, lhs_ref, s_ref):
        lhs_ref[...] = jnp.zeros_like(lhs_ref)
        for g0 in range(tq // g):
            # Block-diagonal y-tent LHS built from SMEM scalars.
            wx_rows = []
            for i in range(g):
                qi = g0 * g + i
                cx = coords_ref[qi, 0]
                cy = coords_ref[qi, 1]
                lhs_ref[i * NUM : (i + 1) * NUM, i * hl : (i + 1) * hl] = (
                    _tent(cy, hl).astype(lhs_ref.dtype)
                )
                wx_rows.append(_tent(cx, wl).astype(dtype))
            if flat:
                rhs = corr_ref[g0 * g : (g0 + 1) * g].reshape(g * hl, wl)
            else:
                rhs = corr_ref[g0 * g : (g0 + 1) * g].reshape(g * hl, wl)
            # y: (G*9, G*hl) x (G*hl, wl) -> t rows (i, b)
            t = jnp.dot(lhs_ref[...], rhs, preferred_element_type=jnp.float32)
            # x: contract lanes of wxall (G*9 (i,a), wl) with t (G*9 (i,b), wl)
            wxall = jnp.concatenate(wx_rows, axis=0)  # (G*9, wl)
            m2 = jax.lax.dot_general(
                wxall.astype(dtype), t.astype(dtype),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (G*9, G*9): [(i, a), (j, b)]
            # Diagonal (9, 9) blocks -> s_ref (tq, 9, 9).
            m3 = m2.reshape(g, NUM, g * NUM)
            for i in range(g):
                s_ref[g0 * g + i] = m3[i, :, i * NUM : (i + 1) * NUM]
        # Vectorized (tq, 9)-lane stores: 9 per tile, not per query.
        for a in range(NUM):
            out_ref[:, a * NUM : (a + 1) * NUM] = s_ref[:, a, :]

    return kernel


def make_kernel_packed(hl, wl, tq, g, dtype):
    """Variant C: corr streamed as (tq, R, 128) — a layout-FREE bitcast of
    the flat (Q, hl*wl) rows (minor split at the 128-lane boundary), so
    HBM traffic is unpadded. Each 128-lane row packs E = 128//wl
    consecutive-y segments; the y contraction becomes E block-diagonal
    partial dots (lhs weights for y = E*r + e) merged by a lane-group
    select, and the x weights are built on the packed (e, x) lane layout
    directly. All reshapes are sublane merges (the known-good Mosaic
    pattern); no lane-dim splits anywhere."""
    E = 128 // wl
    R = (hl * wl) // 128
    assert E * R == hl and E * wl == 128

    def kernel(coords_ref, corr_ref, out_ref, lhs_ref, s_ref):
        # Zero ONCE per tile: only diagonal blocks are ever overwritten.
        lhs_ref[...] = jnp.zeros_like(lhs_ref)
        lanes_x = (
            jax.lax.broadcasted_iota(jnp.int32, (NUM, 128), 1) % wl
        ).astype(jnp.float32)
        ks128 = jax.lax.broadcasted_iota(jnp.int32, (NUM, 128), 0).astype(
            jnp.float32
        ) - float(RADIUS)
        for g0 in range(tq // g):
            rhs = corr_ref[g0 * g : (g0 + 1) * g].reshape(g * R, 128)
            wx_rows = []
            for i in range(g):
                cx = coords_ref[g0 * g + i, 0]
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(lanes_x - (cx + ks128)))
                wx_rows.append(wx.astype(dtype))
            ts = []
            for e in range(E):
                ys = (
                    jax.lax.broadcasted_iota(jnp.int32, (NUM, R), 1) * E + e
                ).astype(jnp.float32)
                ksr = jax.lax.broadcasted_iota(jnp.int32, (NUM, R), 0).astype(
                    jnp.float32
                ) - float(RADIUS)
                for i in range(g):
                    cy = coords_ref[g0 * g + i, 1]
                    lhs_ref[i * NUM : (i + 1) * NUM, i * R : (i + 1) * R] = (
                        jnp.maximum(0.0, 1.0 - jnp.abs(ys - (cy + ksr)))
                    ).astype(lhs_ref.dtype)
                ts.append(
                    jnp.dot(
                        lhs_ref[...].astype(dtype), rhs,
                        preferred_element_type=jnp.float32,
                    )
                )
            t = ts[0]
            if E > 1:
                laneg = jax.lax.broadcasted_iota(
                    jnp.int32, (g * NUM, 128), 1
                ) // wl
                for e in range(1, E):
                    t = jnp.where(laneg == e, ts[e], t)
            wxall = jnp.concatenate(wx_rows, axis=0)  # (G*9, 128)
            m2 = jax.lax.dot_general(
                wxall, t.astype(dtype),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (G*9, G*9): [(i, a), (j, b)]
            m3 = m2.reshape(g, NUM, g * NUM)
            for i in range(g):
                s_ref[g0 * g + i] = m3[i, :, i * NUM : (i + 1) * NUM]
        for a in range(NUM):
            out_ref[:, a * NUM : (a + 1) * NUM] = s_ref[:, a, :]

    return kernel, R


def lookup_level_packed_call(corr_in, coords, hl, wl, tq=128, g=8, dtype=None):
    """corr_in: (Q, R, 128) bitcast view of flat rows, in stream dtype."""
    q = corr_in.shape[0]
    dtype = dtype or corr_in.dtype
    kernel, r = make_kernel_packed(hl, wl, tq, g, dtype)
    return pl.pallas_call(
        kernel,
        grid=(q // tq,),
        in_specs=[
            pl.BlockSpec((tq, 2), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tq, r, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tq, NUM * NUM), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((q, NUM * NUM), jnp.float32),
        scratch_shapes=[
            # f32 scratch regardless of stream dtype: sub-tile bf16 scratch
            # writes mis-lower for R < 32 (probed); cast at dot time instead.
            pltpu.VMEM((g * NUM, g * r), jnp.float32),
            pltpu.VMEM((tq, NUM, NUM), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(coords, corr_in)


def lookup_level_packed(corr, coords, tq=128, g=8, dtype=jnp.bfloat16):
    q, hl, wl = corr.shape
    r = (hl * wl) // 128
    corr_in = corr.reshape(q, r, 128).astype(dtype)
    return lookup_level_packed_call(corr_in, coords, hl, wl, tq, g, dtype)


def lookup_level_kernel_call(corr_in, coords, hl, wl, tq=128, g=8, dtype=None):
    """corr_in: (Q, hl*wl) flat or (Q, hl, wl) 3D, ALREADY in stream dtype."""
    q = corr_in.shape[0]
    flat = corr_in.ndim == 2
    dtype = dtype or corr_in.dtype
    if flat:
        spec = pl.BlockSpec((tq, hl * wl), lambda i: (i, 0), memory_space=pltpu.VMEM)
    else:
        spec = pl.BlockSpec((tq, hl, wl), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    kernel = make_kernel(hl, wl, tq, g, flat, dtype)
    return pl.pallas_call(
        kernel,
        grid=(q // tq,),
        in_specs=[
            pl.BlockSpec((tq, 2), lambda i: (i, 0), memory_space=pltpu.SMEM),
            spec,
        ],
        out_specs=pl.BlockSpec((tq, NUM * NUM), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((q, NUM * NUM), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((g * NUM, g * hl), dtype),
            pltpu.VMEM((tq, NUM, NUM), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(coords, corr_in)


def lookup_level_pallas(corr, coords, tq=128, g=8, flat=True, dtype=jnp.bfloat16):
    q, hl, wl = corr.shape
    corr_in = corr.reshape(q, hl * wl) if flat else corr
    return lookup_level_kernel_call(
        corr_in.astype(dtype), coords, hl, wl, tq, g, dtype
    )


def ref_lookup(corr, coords):
    """numpy separable-tent window (same math as ops/corr.py::lookup_corr)."""
    q, hl, wl = corr.shape
    delta = np.arange(-RADIUS, RADIUS + 1, dtype=np.float32)
    cx = coords[:, 0:1] + delta[None]
    cy = coords[:, 1:2] + delta[None]
    ys = np.arange(hl, dtype=np.float32)
    xs = np.arange(wl, dtype=np.float32)
    wy = np.maximum(0.0, 1.0 - np.abs(ys[None, None] - cy[..., None]))
    wx = np.maximum(0.0, 1.0 - np.abs(xs[None, None] - cx[..., None]))
    tmp = np.einsum("qby,qyx->qbx", wy, corr)
    return np.einsum("qax,qbx->qab", wx, tmp).reshape(q, NUM * NUM)


def check(hl, wl, g, variant, dtype=jnp.float32):
    q = 512
    rng = np.random.default_rng(0)
    corr = rng.standard_normal((q, hl, wl)).astype(np.float32)
    coords = (rng.uniform(-2, max(hl, wl) + 2, (q, 2))).astype(np.float32)
    fn = lookup_level_packed if variant == "packed" else (
        lambda c, cf, tq, g, dtype: lookup_level_pallas(
            c, cf, tq, g, False, dtype))
    try:
        out = np.asarray(
            fn(jnp.asarray(corr), jnp.asarray(coords), 128, g, dtype))
    except Exception as e:
        print(f"hl={hl} wl={wl} g={g} {variant}: FAIL {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
        return False
    ref = ref_lookup(corr, coords)
    scale = np.abs(ref).max() + 1e-6
    d = np.abs(out - ref).max() / scale
    # On-chip dots run at default precision (single-pass bf16) even for
    # f32 inputs, so tolerance is bf16-level for both dtypes.
    tol = 0.02
    print(f"hl={hl} wl={wl} g={g} {variant} {jnp.dtype(dtype).name}: "
          f"rel diff {d:.6f}", "ok" if d < tol else "MISMATCH", flush=True)
    return d < tol


def main():
    ok = True
    for hl, g in ((64, 8), (32, 16), (16, 32)):
        ok &= check(hl, hl, g, "packed")
        ok &= check(hl, hl, g, "packed", jnp.bfloat16)
    ok &= check(64, 64, 8, "3d")
    print("ALL OK" if ok else "FAILURES", flush=True)

    if not os.environ.get("TIME") or jax.default_backend() != "tpu":
        return
    from accflow_tpu.utils.profiling import device_step_time
    from accflow_tpu.ops.corr import CorrPyramid, lookup_corr_split

    # Serving shape: Q = 22 * 64 * 64 (CVO-6, b2), levels 64/32/16.
    q = 90112
    rng = np.random.default_rng(0)
    for hl, g in ((64, 8), (32, 16), (16, 32)):
        corr = jnp.asarray(rng.standard_normal((q, hl, hl)).astype(np.float32))
        coords = jnp.asarray(rng.uniform(0, hl, (q, 2)).astype(np.float32))
        r = (hl * hl) // 128
        packed_bf16 = corr.reshape(q, r, 128).astype(jnp.bfloat16)
        for tq, gg in ((128, g), (256, g), (256, 2 * g)):
            fn = functools.partial(
                lookup_level_packed_call, hl=hl, wl=hl, tq=tq, g=gg)
            try:
                ms = device_step_time(fn, (packed_bf16, coords), iters=30) * 1e3
                print(f"hl={hl} packed bf16 tq={tq} g={gg}: {ms:.3f} ms",
                      flush=True)
            except Exception as e:
                print(f"hl={hl} packed bf16 tq={tq} g={gg}: FAIL "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)
        if hl == 64:
            fn = functools.partial(
                lookup_level_kernel_call, hl=hl, wl=hl, tq=128, g=g)
            ms = device_step_time(
                fn, (corr.astype(jnp.bfloat16), coords), iters=30) * 1e3
            print(f"hl={hl} 3d bf16 tq=128 g={g}: {ms:.3f} ms", flush=True)

        def xla_mm(c, cf):
            pyr = CorrPyramid(levels=(c,), h1=1, w1=1)
            return lookup_corr_split(
                pyr, cf.reshape(1, 1, q, 2), RADIUS, precision="default"
            )[0]

        for name, c in (("f32", corr), ("bf16", corr.astype(jnp.bfloat16))):
            ms = device_step_time(xla_mm, (c, coords), iters=30) * 1e3
            print(f"hl={hl} XLA mm {name}: {ms:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
