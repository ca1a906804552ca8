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

Each variant is timed INSIDE a conv -> norm -> relu chain (the encoder
consumption pattern; a bare norm would let XLA fuse differently than in
the model). Honest chained timing via utils/profiling.device_step_time.

    python scripts/micro_inorm.py
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


VARIANTS = [v0_current, v1_fused_casts, v2_onepass, v3_bf16_affine]


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
