"""Component-level timing of the RAFT/AccFlow pipeline on the TPU chip.

Uses the K-vs-2K chained-loop method (utils/profiling.py) so tunnel
dispatch/sync overheads cancel. Run alone (one process per chip).

    python scripts/profile_components.py [batch] [size]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

from accflow_tpu.models import build_flow_estimator
from accflow_tpu.models.raft import RAFTConfig, init_raft, raft_features
from accflow_tpu.ops.corr import build_corr_pyramid, lookup_corr, lookup_corr_gather, lookup_corr_patch
from accflow_tpu.ops.grids import coords_grid
from accflow_tpu.utils.profiling import device_step_time

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 2
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 512


def main():
    est = build_flow_estimator("raft", compute_dtype="bfloat16")
    cfg = est.cfg
    params = est.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.uniform(-1, 1, (BATCH, SIZE, SIZE, 3)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(-1, 1, (BATCH, SIZE, SIZE, 3)).astype(np.float32))
    h8 = SIZE // 8

    fmap = jnp.asarray(
        rng.standard_normal((BATCH, h8, h8, 256)).astype(np.float32)
    )
    coords = coords_grid(BATCH, h8, h8) + jnp.asarray(
        rng.uniform(-10, 10, (BATCH, h8, h8, 2)).astype(np.float32)
    )
    pyramid = build_corr_pyramid(fmap, fmap, 4)

    results = {}

    def bench(name, fn, args, iters=4):
        t = device_step_time(fn, args, iters=iters)
        results[name] = t
        print(f"{name:36s} {t*1e3:9.2f} ms")

    # Full RAFT forward (12 iters, eval path: final-only upsampling)
    bench(
        "raft_forward_12it(final_only)",
        lambda a, b: est.forward(params, a, b, final_only=True)["flow_up"],
        (i1, i2),
        iters=2,
    )

    # Encoders + corr build (everything outside the loop)
    bench(
        "raft_features(enc+corr_build)",
        lambda a, b: raft_features(params, a, b, cfg)[0].levels[0],
        (i1, i2),
        iters=2,
    )

    # Corr build alone (production precision)
    bench(
        "corr_build(default_prec)",
        lambda f: build_corr_pyramid(f, f, 4, precision="default").levels[0],
        (fmap,),
        iters=4,
    )

    # One lookup (one of 12 iterations), f32 vs bf16 volume
    bench(
        "lookup_mm_x1",
        lambda c: lookup_corr(pyramid, c, 4, precision="default"),
        (coords,),
        iters=4,
    )
    pyr_bf = build_corr_pyramid(fmap, fmap, 4, precision="default", dtype=jnp.bfloat16)
    bench(
        "lookup_mm_bf16vol_x1",
        lambda c: lookup_corr(pyr_bf, c, 4, precision="default"),
        (coords,),
        iters=4,
    )

    print()
    total = results["raft_forward_12it(final_only)"]
    feat = results["raft_features(enc+corr_build)"]
    lk = results["lookup_mm_x1"] * 12
    print(f"approx split of raft pair: features+build {feat*1e3:.1f} ms, "
          f"12 lookups {lk*1e3:.1f} ms, "
          f"update blocks+rest {max(total-feat-lk,0)*1e3:.1f} ms, total {total*1e3:.1f} ms")


if __name__ == "__main__":
    main()
