"""TPU micro-probe: is int8 worth a quantized serving mode on v5e?

v5e lists ~2x int8 peak over bf16 (394 vs 197 T). The serving step's
conv budget (~46 ms of 222 ms, PARITY.md r3 trace) is the only category
that could cash that in — the lookup complex is dispatch/VPU-bound and
gains nothing from narrower dtypes (measured, PARITY.md). Before
building any PTQ mode, measure whether XLA actually lowers int8
convs/dots at ~2x on OUR shapes:

  1. dense GEMM sanity (4096x512 @ 512x512): the best case;
  2. SepConvGRU 1x5 conv at serving shape (22, 64, 64, 384->128) — the
     bf16 version runs at 97% of bf16 peak, so a real int8 MXU path
     MUST beat it or int8 is dead on arrival;
  3. encoder stage-1 3x3 conv (22, 128, 128, 64->64) — the lane-bound
     case where bf16 already underutilizes (42-49 TF/s);
  4. motion-encoder 1x1 GEMM ((22*4096, 324) @ (324, 256)).

Prints one table: bf16 vs int8 ms + effective T(FL)OP/s. Run on the
real chip (refuses CPU):    python scripts/micro_int8.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from accflow_tpu.utils.profiling import device_step_time


def int_chain(out, args, s):
    """Data-dependency chain for integer inputs: add the checksum's low
    bit to every int operand (value-irrelevant, hoist-proof)."""
    bit = (s.astype(jnp.int32) % 2).astype(jnp.int8)

    def nudge(a):
        a = jnp.asarray(a)
        if a.dtype == jnp.int8:
            return a + bit
        if jnp.issubdtype(a.dtype, jnp.floating):
            return a + (s * 1e-30).astype(a.dtype)
        return a

    return jax.tree.map(nudge, args)


def conv_hwio(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32 if x.dtype == jnp.int8 else None,
    )


def bench(name, fn, args, flops, iters=None):
    t = device_step_time(jax.jit(fn), args, iters=iters or ITERS,
                         chain=int_chain)
    print(f"{name:34s} {t * 1e3:8.3f} ms  {flops / t / 1e12:7.2f} T/s")
    return t


ITERS = int(os.environ.get("INT8_ITERS", "30"))
SMALL = bool(os.environ.get("INT8_SMALL"))  # CPU smoke: shrink shapes


def main():
    backend = jax.default_backend()
    if backend not in ("tpu", "axon") and not os.environ.get("ALLOW_CPU"):
        raise SystemExit(f"refusing to probe on backend {backend!r}")
    rng = np.random.default_rng(0)
    B, R = (2, 16) if SMALL else (22, 128)

    def mk(shape, dtype):
        if dtype == jnp.int8:
            return jnp.asarray(
                rng.integers(-127, 127, shape, dtype=np.int8)
            )
        return jnp.asarray(rng.normal(size=shape).astype(np.float32)).astype(dtype)

    def gemm(a, b):
        return lax.dot(
            a, b,
            preferred_element_type=jnp.int32 if a.dtype == jnp.int8 else None,
        )

    cases = []

    # 1. dense GEMM sanity
    m, k, n = 4096, 512, 512
    flops = 2 * m * k * n
    cases.append(("gemm 4096x512x512", gemm, [((m, k), (k, n))], flops))

    # 2. GRU 1x5 conv (serving shape; input = cat(h, gru_in) = 128+256)
    x_shape, w_shape = (B, R // 2, R // 2, 384), (1, 5, 384, 128)
    flops = 2 * B * (R // 2) ** 2 * 5 * 384 * 128
    cases.append(("gru conv 1x5 384->128", conv_hwio,
                  [(x_shape, w_shape)], flops))

    # 3. encoder stage-1 3x3 conv at 1/2 res
    x_shape, w_shape = (B, R, R, 64), (3, 3, 64, 64)
    flops = 2 * B * R * R * 9 * 64 * 64
    cases.append(("enc conv 3x3 64->64 @128^2", conv_hwio,
                  [(x_shape, w_shape)], flops))

    # 4. motion-encoder 1x1 GEMM
    m, k, n = B * (R // 2) ** 2, 324, 256
    flops = 2 * m * k * n
    cases.append(("convc1 gemm (22*4096)x324x256", gemm,
                  [((m, k), (k, n))], flops))

    for name, fn, [shapes], flops in cases:
        for dtype in (jnp.bfloat16, jnp.int8):
            tag = jnp.dtype(dtype).name
            args = tuple(mk(s, dtype) for s in shapes)
            try:
                bench(f"{name} [{tag}]", fn, args, flops)
            except Exception as e:  # an unlowered int8 op is a result too
                print(f"{name} [{tag}]: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
