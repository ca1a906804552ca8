"""TPU micro-benchmark round 2: per-level lookup variant race.

For each pyramid level, times the window extraction alone under each
formulation (mm tent-matmuls, rows take_along_axis gather + lerp with MXU
or gather x-finish). Shapes mirror the AccFlow fused-OFE hot path
(B=11 pairs at 64x64 -> Q=45056). One call == one of 12 iterations.

    python scripts/micro_lookup2.py [B] [H8]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from accflow_tpu.ops.corr import (
    CorrPyramid,
    build_corr_pyramid,
    lookup_corr_split,
    lookup_corr_split_v2,
)
from accflow_tpu.ops.grids import coords_grid
from accflow_tpu.utils.profiling import device_step_time

B = int(sys.argv[1]) if len(sys.argv) > 1 else 11
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
        # Nudge ONLY the coords arg: the default chain would nudge the
        # pyramid levels too, adding a full volume read+write per
        # iteration (737 MB at the L0 shape) that production never pays.
        eps = (s * 1e-30).astype(args[0].dtype)
        return (args[0] + eps,) + tuple(args[1:])

    def bench(name, fn, args, iters=8):
        t = device_step_time(fn, args, iters=iters, chain=chain_coords_only)
        print(f"{name:46s} {t*1e3:9.3f} ms", flush=True)
        return t

    # --- numerics first (skippable once verified: SKIP_CHECK=1) ---
    if os.environ.get("SKIP_CHECK"):
        ref = None
    else:
        ref = lookup_corr_split(pyramid, coords, 4, precision="highest")
    for impl in ("rows", "rows_gx") if ref is not None else ():
        got = lookup_corr_split_v2(
            pyramid, coords, 4, precision="highest", level_impl=(impl,) * 4
        )
        d = max(float(jnp.abs(a - b).max()) for a, b in zip(ref, got))
        print(f"max|{impl} - mm| = {d:.2e}", flush=True)
        assert d < 1e-3, (impl, d)

    # NOTE: the pyramid levels are passed as ARGS, not captured — captured
    # concrete arrays embed as HLO constants and blow the remote-compile
    # relay's request size limit (HTTP 413) at these shapes.

    # --- per-level race ---
    h1, w1 = pyramid.h1, pyramid.w1
    for li in range(4):
        c_scaled = coords / (2.0**li)  # single-level pyramid sees level 0
        for impl in ("mm", "vpu_y", "rows", "rows_gx"):
            bench(
                f"L{li} {impl}",
                lambda c, lv, im=impl: lookup_corr_split_v2(
                    CorrPyramid(levels=(lv,), h1=h1, w1=w1),
                    c, 4, precision="default", level_impl=(im,)
                )[0],
                (c_scaled, pyramid.levels[li]),
            )

    # --- full 4-level configs ---
    configs = {
        "all-mm (current default)": ("mm",) * 4,
        "all-vpu_y": ("vpu_y",) * 4,
        "vy,vy,mm,mm": ("vpu_y", "vpu_y", "mm", "mm"),
        "all-rows": ("rows",) * 4,
    }
    for name, li in configs.items():
        bench(
            f"full {name}",
            lambda c, *lv, im=li: jnp.stack([
                x.sum() for x in lookup_corr_split_v2(
                    CorrPyramid(levels=lv, h1=h1, w1=w1),
                    c, 4, precision="default", level_impl=im
                )
            ]),
            (coords,) + tuple(pyramid.levels),
        )


if __name__ == "__main__":
    main()
