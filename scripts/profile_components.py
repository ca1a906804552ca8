"""Component-level timing of the RAFT/AccFlow pipeline on the TPU chip.

Uses the K-vs-2K chained-loop method (utils/profiling.py) so tunnel
dispatch/sync overheads cancel. Run alone (one process per chip).

    python scripts/profile_components.py [batch] [size]
"""

import sys
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

    # Full RAFT forward (12 iters)
    bench("raft_forward_12it", lambda a, b: est.forward(params, a, b)["flow_up"], (i1, i2), iters=2)

    # Encoders + corr build (everything outside the loop)
    bench(
        "raft_features(enc+corr_build)",
        lambda a, b: raft_features(params, a, b, cfg)[0].levels[0],
        (i1, i2),
        iters=2,
    )

    # Corr build alone
    bench("corr_build", lambda f: build_corr_pyramid(f, f, 4).levels[0], (fmap,), iters=4)

    # One lookup (mm) / (gather)
    bench("lookup_mm_x1", lambda c: lookup_corr(pyramid, c, 4), (coords,), iters=4)
    bench("lookup_gather_x1", lambda c: lookup_corr_gather(pyramid, c, 4), (coords,), iters=4)
    bench("lookup_patch_x1", lambda c: lookup_corr_patch(pyramid, c, 4), (coords,), iters=4)

    print()
    total = results["raft_forward_12it"]
    feat = results["raft_features(enc+corr_build)"]
    lk = results["lookup_mm_x1"] * 12
    print(f"approx split of raft pair: features+build {feat*1e3:.1f} ms, "
          f"12 lookups {lk*1e3:.1f} ms, "
          f"update blocks+rest {max(total-feat-lk,0)*1e3:.1f} ms, total {total*1e3:.1f} ms")


if __name__ == "__main__":
    main()
