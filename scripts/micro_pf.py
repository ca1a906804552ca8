"""TPU micro: fused Pallas lookup kernel cost anatomy at the serving shape.

Times lookup_corr_fused per-level and all-levels at several tile sizes,
against the XLA mm lookup, with coords-only chaining (the volume stays a
loop-constant in HBM, exactly like production). B=22 pairs at 64x64 ->
Q=90112 (CVO-6 b2 serving); one call == one of 12 GRU iterations.

    python scripts/micro_pf.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from accflow_tpu.ops.corr import CorrPyramid, build_corr_pyramid, lookup_corr_split
from accflow_tpu.ops.corr_pallas import (
    lookup_corr_fused,
    prepare_fused_lookup_operands,
)
from accflow_tpu.ops.grids import coords_grid
from accflow_tpu.utils.profiling import device_step_time

B = int(sys.argv[1]) if len(sys.argv) > 1 else 22
H8 = int(sys.argv[2]) if len(sys.argv) > 2 else 64


def main():
    rng = np.random.default_rng(0)
    fmap = jnp.asarray(rng.standard_normal((B, H8, H8, 256)).astype(np.float32))
    fmap_bf = fmap.astype(jnp.bfloat16).astype(jnp.float32)
    coords = coords_grid(B, H8, H8) + jnp.asarray(
        rng.uniform(-10, 10, (B, H8, H8, 2)).astype(np.float32)
    )
    pyramid = build_corr_pyramid(fmap_bf, fmap_bf, 4, precision="default")

    def chain_coords_only(out, args, s):
        eps = (s * 1e-30).astype(args[0].dtype)
        return (args[0] + eps,) + tuple(args[1:])

    def bench(name, fn, args, iters=8):
        try:
            t = device_step_time(fn, args, iters=iters, chain=chain_coords_only)
            print(f"{name:46s} {t*1e3:9.3f} ms", flush=True)
        except Exception as e:
            print(f"{name:46s} FAIL {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    h1, w1 = pyramid.h1, pyramid.w1

    # Single-level kernels at tq=256.
    defaults = ("packed", "packed", "3d", "3d")
    for li in range(4):
        pyr1 = CorrPyramid(levels=(pyramid.levels[li],), h1=h1, w1=w1)
        ops1, plan1 = prepare_fused_lookup_operands(
            pyr1, 4, level_impl=(defaults[li],)
        )
        c_scaled = coords / (2.0**li)  # single-level plan sees scale 1.0
        bench(
            f"PF L{li} {plan1[0][0]} tq=256",
            lambda c, lv, pp=plan1: lookup_corr_fused((lv,), pp, c, 4, tq=256),
            (c_scaled, ops1[0]),
        )

    # All-levels kernel at several tile sizes.
    operands, plan = prepare_fused_lookup_operands(pyramid, 4)
    for tq in (128, 256, 512):
        bench(
            f"PF all tq={tq}",
            lambda c, *lv, tq=tq, pp=plan: lookup_corr_fused(
                tuple(lv), pp, c, 4, tq=tq
            ),
            (coords,) + tuple(operands),
        )

    # XLA mm baseline (f32 volume, the shipping default).
    bench(
        "XLA all-mm f32",
        lambda c, *lv: jnp.stack([
            x.sum() for x in lookup_corr_split(
                CorrPyramid(levels=lv, h1=h1, w1=w1), c, 4, precision="default"
            )
        ]),
        (coords,) + tuple(pyramid.levels),
    )


if __name__ == "__main__":
    main()
