"""Bisect the fused-lookup kernel's compute cost on-chip.

Runs the L0 (packed, 64x64) level kernel with pieces ablated to attribute
the gap between the full kernel (~4.5 ms) and the stream floor (~1.6 ms):

  full        — the production level_common math
  nobuild     — tent formulas replaced by the precomputed block mask
                (kills the per-group VPU weight-formula cost)
  noy         — y-stage: single dot (E=1, mathematically wrong) instead
                of E partial dots + select
  nox         — skip m2/sum9 x-stage; store a slice of t
  dotsonly    — nobuild + nox (dots with constant weights, no extraction)

    python scripts/probe_pf_bisect.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from accflow_tpu.utils.profiling import device_step_time

Q = 90112
HL = WL = 64
NUM = 9
G = 8
TQ = 128
R = (HL * WL) // 128  # 32
DT = jnp.bfloat16


def make_kernel(mode):
    e_cnt = 2 if mode != "noy" else 1
    width = 128

    def kernel(coords_ref, corr_ref, out_ref, s_ref):
        f32 = jnp.float32
        g, num, k = G, NUM, R
        xs3 = (
            jax.lax.broadcasted_iota(jnp.int32, (num, g, width), 2) % WL
        ).astype(f32)
        ax3 = jax.lax.broadcasted_iota(jnp.int32, (num, g, width), 0).astype(
            f32
        ) - 4.0
        iy_blk = jax.lax.broadcasted_iota(jnp.int32, (g, num, g * k), 0)
        ic_blk = jax.lax.broadcasted_iota(jnp.int32, (g, num, g * k), 2) // k
        blkmask = (iy_blk == ic_blk).astype(f32)
        rr3 = (
            jax.lax.broadcasted_iota(jnp.int32, (g, num, g * k), 2) % k
        ).astype(f32)
        by3 = jax.lax.broadcasted_iota(jnp.int32, (g, num, g * k), 1).astype(
            f32
        ) - 4.0
        i_row = jax.lax.broadcasted_iota(jnp.int32, (g * num, g * num), 0) % g
        i_col = jax.lax.broadcasted_iota(jnp.int32, (g * num, g * num), 1) // num
        diagmask = (i_row == i_col).astype(DT)
        b_col = jax.lax.broadcasted_iota(jnp.int32, (g * num, num), 0) % num
        b_out = jax.lax.broadcasted_iota(jnp.int32, (g * num, num), 1)
        sum9 = (b_col == b_out).astype(DT)
        blkmask_dt = blkmask.astype(DT).reshape(g * num, g * k)

        for g0 in range(TQ // g):
            rhs = corr_ref[g0 * g : (g0 + 1) * g].reshape(g * k, width)
            cxy = coords_ref[g0 * g : (g0 + 1) * g]
            cx3 = cxy[:, 0:1].reshape(1, g, 1)
            cy3 = cxy[:, 1:2].reshape(g, 1, 1)

            ts = []
            for e in range(e_cnt):
                if mode in ("nobuild", "dotsonly"):
                    wy = blkmask_dt
                else:
                    ys3 = rr3 * float(e_cnt) + float(e)
                    wy = (
                        jnp.maximum(0.0, 1.0 - jnp.abs(ys3 - (cy3 + by3)))
                        * blkmask
                    ).astype(DT).reshape(g * num, g * k)
                ts.append(
                    jnp.dot(wy, rhs, preferred_element_type=jnp.float32)
                )
            t = ts[0]
            if e_cnt > 1:
                laneg = (
                    jax.lax.broadcasted_iota(jnp.int32, (g * num, width), 1)
                    // WL
                )
                t = jnp.where(laneg == 1, ts[1], t)

            if mode in ("nox", "dotsonly"):
                s_ref[:, g0 * g : (g0 + 1) * g, :] = (
                    t[:, :num].reshape(num, g, num)
                )
                continue

            if mode == "nobuild":
                wx = blkmask_dt[:, :width] if g * k >= width else jnp.ones(
                    (g * num, width), DT
                )
            else:
                wx = jnp.maximum(
                    0.0, 1.0 - jnp.abs(xs3 - (cx3 + ax3))
                ).astype(DT).reshape(num * g, width)
            m2 = jax.lax.dot_general(
                wx, t.astype(DT), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out3 = jnp.dot(
                (m2.astype(DT) * diagmask), sum9,
                preferred_element_type=jnp.float32,
            )
            s_ref[:, g0 * g : (g0 + 1) * g, :] = out3.reshape(num, g, num)

        for a in range(NUM):
            out_ref[:, a * NUM : (a + 1) * NUM] = s_ref[a]

    return kernel


def main():
    rng = np.random.default_rng(0)
    corr = jnp.asarray(
        rng.standard_normal((Q, R, 128)).astype(np.float32)
    ).astype(DT)
    coords = jnp.asarray(rng.uniform(0, 64, (Q, 2)).astype(np.float32))

    def chain_coords_only(out, args, s):
        eps = (s * 1e-30).astype(args[0].dtype)
        return (args[0] + eps,) + tuple(args[1:])

    for mode in ("full", "nobuild", "noy", "nox", "dotsonly"):
        def run(c, lv, mode=mode):
            return pl.pallas_call(
                make_kernel(mode),
                grid=(Q // TQ,),
                in_specs=[
                    pl.BlockSpec((TQ, 2), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((TQ, R, 128), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((TQ, NUM * NUM), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((Q, NUM * NUM), jnp.float32),
                scratch_shapes=[pltpu.VMEM((NUM, TQ, NUM), jnp.float32)],
                interpret=jax.default_backend() != "tpu",
            )(c, lv)

        try:
            t = device_step_time(run, (coords, corr), iters=8,
                                 chain=chain_coords_only)
            print(f"{mode:10s}: {t*1e3:.3f} ms", flush=True)
        except Exception as e:
            print(f"{mode:10s}: FAIL {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
