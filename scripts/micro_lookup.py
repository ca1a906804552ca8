"""TPU micro-benchmark: corr lookup variants, corr-build precision, GRU step.

Shapes mirror the AccFlow serving hot path: one 512^2 clip => the fused OFE
runs batch 11 at 1/8 res (64x64), 4 pyramid levels, r=4, 12 iterations.

    python scripts/micro_lookup.py [B] [H8]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from accflow_tpu.ops.corr import (
    build_corr_pyramid,
    lookup_corr,
    lookup_corr_gather,
    lookup_corr_patch,
    lookup_corr_rows,
)
from accflow_tpu.ops.grids import coords_grid
from accflow_tpu.models.raft import (
    RAFTConfig,
    basic_motion_encoder,
    basic_update_block,
    flow_head,
    init_basic_update_block,
    make_fused_sep_gru,
)
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

    def bench(name, fn, args, iters=8):
        t = device_step_time(fn, args, iters=iters)
        print(f"{name:42s} {t*1e3:9.3f} ms", flush=True)
        return t

    # --- lookup variants (one call == one of 12 iterations) ---
    bench("lookup rows default", lambda c: lookup_corr_rows(pyramid, c, 4, precision="default"), (coords,))
    bench("lookup mm highest", lambda c: lookup_corr(pyramid, c, 4, precision="highest"), (coords,))
    bench("lookup mm default", lambda c: lookup_corr(pyramid, c, 4, precision="default"), (coords,))
    bench("lookup patch", lambda c: lookup_corr_patch(pyramid, c, 4), (coords,))

    # --- corr build precision ---
    bench("corr_build default", lambda f: build_corr_pyramid(f, f, 4, precision="default").levels[0], (fmap_bf,))
    bench("corr_build highest", lambda f: build_corr_pyramid(f, f, 4, precision="highest").levels[0], (fmap_bf,))

    # numerics drift of default vs highest (bf16-valued corr)
    hi = lookup_corr(pyramid, coords, 4, precision="highest")
    lo = lookup_corr_rows(pyramid, coords, 4, precision="default")
    d = jnp.abs(hi - lo)
    print(f"rows-default vs mm-highest: max {float(d.max()):.2e} mean {float(d.mean()):.2e} (corr scale {float(jnp.abs(hi).mean()):.3f})")

    # --- update block: reference layout vs fused/hoisted ---
    cfg = RAFTConfig(compute_dtype="bfloat16")
    ub = init_basic_update_block(jax.random.PRNGKey(0), cfg)
    cd = jnp.bfloat16
    net = jnp.asarray(rng.standard_normal((B, H8, H8, 128)).astype(np.float32)).astype(cd)
    inp = jnp.asarray(rng.standard_normal((B, H8, H8, 128)).astype(np.float32)).astype(cd)
    corr = jnp.asarray(rng.standard_normal((B, H8, H8, 324)).astype(np.float32)).astype(cd)
    flow = jnp.asarray(rng.standard_normal((B, H8, H8, 2)).astype(np.float32)).astype(cd)

    def ub_ref(net, inp, corr, flow):
        return basic_update_block(ub, net, inp, corr, flow, with_mask=False)[0]

    def ub_fused(net, inp, corr, flow):
        step = make_fused_sep_gru(ub["gru"], inp, 128)
        motion = basic_motion_encoder(ub["encoder"], flow, corr)
        net = step(net, motion)
        return flow_head(ub["flow_head"], net)

    bench("update_block reference", ub_ref, (net, inp, corr, flow))
    bench("update_block fused(hoisted inp)", ub_fused, (net, inp, corr, flow))


if __name__ == "__main__":
    main()
