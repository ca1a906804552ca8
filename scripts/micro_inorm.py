"""Micro-probe: instance_norm variants on the bf16 encoder hot shapes.

trace_stream.py attributes ~3.6 ms/step (13%) of the streaming step to
nn/layers.py:117-124 (instance_norm): the f32 materialization of the
bf16 activations (`xf = x.astype(f32)`) feeds three consumers (mean,
var, normalize), and XLA materializes the cast as a real f32 buffer
plus bf16<->f32 tile-relayout copies. Variants measured here:

  v0_current      two-pass f32 stats on a shared materialized f32 cast
  v1_fused_casts  per-consumer casts (dtype=f32 reductions + a single
                  elementwise convert-sub-mul-convert chain) — same
                  math, no shared f32 buffer for XLA to materialize
  v2_onepass      v1 but one-pass var (E[x^2] - E[x]^2)
  v3_bf16_affine  f32 stats, bf16 normalize arithmetic
                  (x - mean_bf16) * rsqrt_bf16 — cheapest, loosest

  v4_matmul_stats MXU-contraction stats: transpose to (n*c, hw), dot
                  with a ones vector, f32 accumulation — probes whether
                  reading x in the conv's spatial-minor layout avoids
                  the reduce's channel-minor relayout copies
  v5_matmul_stats_nt  v4 without the explicit transpose
  v6_concat_reduce    one fused reduce over concat([x, x^2], C axis)

Each variant is timed INSIDE a conv -> norm -> relu chain (the encoder
consumption pattern; a bare norm would let XLA fuse differently than in
the model). Honest chained timing via utils/profiling.device_step_time.

    python scripts/micro_inorm.py

Measured (r4, 1x v5e, ms/5-norm-chain, dominant 256^2x64 stage):
v0 4.14 / v1 4.70 / v2 3.60 / **v3 1.33 (shipped)** / v4 1.96 /
v5 2.25 / v6 3.23 — the MXU-contraction theory LOSES standalone (the
dot-with-ones still relayouts x to put hw on lanes, plus pays the bf16
x*x materialization), and the fused concat-reduce pays the concat copy.
96ch/128ch stages: all variants within noise of each other (<0.2 ms).
The avenue is closed at v3; the remaining ~1 ms/step of in-model copies
around the 64-ch stage's norms (trace_stream r4) is XLA's layout
oscillation between spatial-minor conv form and channel-minor reduce
form — every formulation probed either pays it or pays more elsewhere.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from accflow_tpu.utils.profiling import device_step_time

# (N, H, W, C) encoder stage shapes at the 512^2 serving protocol, b2,
# with the per-stage instance_norm counts of the RAFT BasicEncoder
# (stem 1 + 2 res blocks/stage x 2-3 norms; counts approximate weights).
SHAPES = [
    ((2, 256, 256, 64), 5),
    ((2, 128, 128, 96), 5),
    ((2, 64, 64, 128), 5),
]
EPS = 1e-5


def v0_current(x):
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=(1, 2), keepdims=True)
    var = xf.var(axis=(1, 2), keepdims=True)
    out = (xf - mean) * lax.rsqrt(var + EPS)
    return out.astype(x.dtype)


def v1_fused_casts(x):
    mean = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
    var = jnp.mean(
        jnp.square(x.astype(jnp.float32) - mean),
        axis=(1, 2), keepdims=True, dtype=jnp.float32,
    )
    out = (x.astype(jnp.float32) - mean) * lax.rsqrt(var + EPS)
    return out.astype(x.dtype)


def v2_onepass(x):
    mean = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
    meansq = jnp.mean(
        jnp.square(x.astype(jnp.float32)),
        axis=(1, 2), keepdims=True, dtype=jnp.float32,
    )
    var = jnp.maximum(meansq - jnp.square(mean), 0.0)
    out = (x.astype(jnp.float32) - mean) * lax.rsqrt(var + EPS)
    return out.astype(x.dtype)


def v3_bf16_affine(x):
    mean = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
    meansq = jnp.mean(
        jnp.square(x.astype(jnp.float32)),
        axis=(1, 2), keepdims=True, dtype=jnp.float32,
    )
    var = jnp.maximum(meansq - jnp.square(mean), 0.0)
    scale = lax.rsqrt(var + EPS)
    return (x - mean.astype(x.dtype)) * scale.astype(x.dtype)


def _normalize_from_sums(x, s, sq, count):
    n, _, _, c = x.shape
    mean = (s / count).reshape(n, 1, 1, c)
    meansq = (sq / count).reshape(n, 1, 1, c)
    var = jnp.maximum(meansq - jnp.square(mean), 0.0)
    scale = lax.rsqrt(var + EPS)
    return (x - mean.astype(x.dtype)) * scale.astype(x.dtype)


def v4_matmul_stats(x):
    # r4 follow-up: the shipped v3 still leaves ~1 ms/step of relayout
    # copies in the stream trace — the (H, W) reduce wants C in lanes
    # while the 64-ch convs keep a spatial-minor layout. Contract H*W on
    # the MXU instead (dot with a ones vector, f32 accumulation): the
    # contraction can read x in the conv layout, so no relayout.
    n, h, w, c = x.shape
    xq = x.reshape(n, h * w, c).transpose(0, 2, 1).reshape(n * c, h * w)
    ones = jnp.ones((h * w,), x.dtype)
    dim = (((1,), (0,)), ((), ()))
    s = lax.dot_general(xq, ones, dim, preferred_element_type=jnp.float32)
    sq = lax.dot_general(
        xq * xq, ones, dim, preferred_element_type=jnp.float32
    )
    return _normalize_from_sums(x, s, sq, h * w)


def v5_matmul_stats_nt(x):
    # v4 without the explicit transpose: contract dim 1 of (n, hw, c)
    # with the ones vector directly — output (n, c).
    n, h, w, c = x.shape
    xq = x.reshape(n, h * w, c)
    ones = jnp.ones((h * w,), x.dtype)
    dim = (((1,), (0,)), ((), ()))
    s = lax.dot_general(xq, ones, dim, preferred_element_type=jnp.float32)
    sq = lax.dot_general(
        xq * xq, ones, dim, preferred_element_type=jnp.float32
    )
    return _normalize_from_sums(x, s, sq, h * w)


def v6_concat_reduce(x):
    # One fused reduce over a stacked [x, x^2] tensor: halves the number
    # of reduction ops (one convert_reduce instead of two).
    n, h, w, c = x.shape
    both = jnp.concatenate([x, x * x], axis=-1)  # (n, h, w, 2c)
    sums = jnp.mean(both, axis=(1, 2), dtype=jnp.float32)  # (n, 2c)
    s, sq = sums[:, :c], sums[:, c:]
    return _normalize_from_sums(x, s * (h * w), sq * (h * w), h * w)


VARIANTS = [
    v0_current,
    v1_fused_casts,
    v2_onepass,
    v3_bf16_affine,
    v4_matmul_stats,
    v5_matmul_stats_nt,
    v6_concat_reduce,
]


def main():
    rng = np.random.default_rng(0)
    for (shape, reps) in SHAPES:
        n, h, w, c = shape
        x = jnp.asarray(rng.normal(1.5, 2.0, shape).astype(np.float32)).astype(
            jnp.bfloat16
        )
        wconv = jnp.asarray(
            rng.normal(0, 0.05, (3, 3, c, c)).astype(np.float32)
        ).astype(jnp.bfloat16)
        ref = None
        print(f"shape {shape} x{reps} norms (conv-norm-relu chain):")
        for fn in VARIANTS:
            def step(x, wconv, fn=fn):
                y = x
                for _ in range(reps):
                    y = lax.conv_general_dilated(
                        y, wconv, (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    )
                    y = jax.nn.relu(fn(y))
                return y

            t = device_step_time(step, (x, wconv), iters=16)
            # numeric drift vs v0 (bf16 rounding scale ~ 0.8% of unit std)
            out = jax.jit(lambda a, b, f=fn: step(a, b))(x, wconv)
            if ref is None:
                ref = np.asarray(out, dtype=np.float32)
                err = 0.0
            else:
                err = float(
                    np.max(np.abs(np.asarray(out, np.float32) - ref))
                )
            print(
                f"  {fn.__name__:15s} {t*1e3:7.3f} ms/chain   "
                f"max|delta vs v0| {err:.4f}"
            )


if __name__ == "__main__":
    main()
