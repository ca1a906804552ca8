"""Bounded probe: the VERDICT-r2 "b%8 sublane-merge loophole" attempt.

PARITY.md's cost bisect shows the fused-lookup kernel's tent-weight
builds are 75% of kernel time because they are evaluated g^2-redundantly
on the (g, num, g*k) block-diagonal grid (3.1 of 4.97 ms at L0). Mosaic's
shape-cast rule (sublane merge (a,b,c)->(a*b,c) lowers only when b%8==0
or c%128==0) blocked every compact-build assembly path probed in r2/r3.
This script measures the two remaining formulations that satisfy the
rule's own escape hatches, on the L0 (packed 64x64) level:

  full    — production math (baseline, ~4.97 ms)
  bdot    — NON-redundant tent build on (g, num, k) + a g-batched
            dot_general against the UNRESHAPED (g, k, width) corr block
            (no merge needed anywhere; the (g,num,width)->(g*num,width)
            result merge is legal because width%128==0). Risk: Mosaic
            unrolls the batch into 8 tiny serialized MXU dots.
  cbuild  — NON-redundant tent build on (num, g, k), lane-broadcast to
            (num, g, g, k) and merged to (num, g, g*k) (a lane-side
            merge, outside the probed sublane rule), then the production
            block-diag dots. Risk: the lane merge relayouts.

    python scripts/probe_pf_compact.py
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
E = 2  # lane-group count (width // WL)


def make_kernel(mode):
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
        i_row = jax.lax.broadcasted_iota(jnp.int32, (g * num, g * num), 0) % g
        # t rows are query-major (q*num+tap) for full/bdot, tap-major
        # (tap*g+q) for cbuild — the diag-extract masks follow suit.
        if mode == "cbuild":
            i_col = jax.lax.broadcasted_iota(jnp.int32, (g * num, g * num), 1) % g
            b_col = jax.lax.broadcasted_iota(jnp.int32, (g * num, num), 0) // g
        else:
            i_col = jax.lax.broadcasted_iota(jnp.int32, (g * num, g * num), 1) // num
            b_col = jax.lax.broadcasted_iota(jnp.int32, (g * num, num), 0) % num
        diagmask = (i_row == i_col).astype(DT)
        b_out = jax.lax.broadcasted_iota(jnp.int32, (g * num, num), 1)
        sum9 = (b_col == b_out).astype(DT)

        if mode == "full":
            iy_blk = jax.lax.broadcasted_iota(jnp.int32, (g, num, g * k), 0)
            ic_blk = jax.lax.broadcasted_iota(jnp.int32, (g, num, g * k), 2) // k
            blkmask = (iy_blk == ic_blk).astype(f32)
            rr3 = (
                jax.lax.broadcasted_iota(jnp.int32, (g, num, g * k), 2) % k
            ).astype(f32)
            by3 = jax.lax.broadcasted_iota(jnp.int32, (g, num, g * k), 1).astype(
                f32
            ) - 4.0
        elif mode == "bdot":
            # compact grids: (g, num, k) — query-major rows, no redundancy
            rr3 = jax.lax.broadcasted_iota(jnp.int32, (g, num, k), 2).astype(f32)
            by3 = jax.lax.broadcasted_iota(jnp.int32, (g, num, k), 1).astype(
                f32
            ) - 4.0
        else:  # cbuild: (num, g, k) build, lane-broadcast expansion
            iy_blk = jax.lax.broadcasted_iota(jnp.int32, (num, g, g * k), 1)
            ic_blk = jax.lax.broadcasted_iota(jnp.int32, (num, g, g * k), 2) // k
            blkmask = (iy_blk == ic_blk).astype(DT)
            rr3 = jax.lax.broadcasted_iota(jnp.int32, (num, g, k), 2).astype(f32)
            by3 = jax.lax.broadcasted_iota(jnp.int32, (num, g, k), 0).astype(
                f32
            ) - 4.0

        for g0 in range(TQ // g):
            rhs3 = corr_ref[g0 * g : (g0 + 1) * g]  # (g, k, width)
            rhs = rhs3.reshape(g * k, width)
            cxy = coords_ref[g0 * g : (g0 + 1) * g]
            cx3 = cxy[:, 0:1].reshape(1, g, 1)

            ts = []
            for e in range(E):
                if mode == "full":
                    cy3 = cxy[:, 1:2].reshape(g, 1, 1)
                    ys3 = rr3 * float(E) + float(e)
                    wy = (
                        jnp.maximum(0.0, 1.0 - jnp.abs(ys3 - (cy3 + by3)))
                        * blkmask
                    ).astype(DT).reshape(g * num, g * k)
                    ts.append(
                        jnp.dot(wy, rhs, preferred_element_type=jnp.float32)
                    )
                elif mode == "bdot":
                    cy3 = cxy[:, 1:2].reshape(g, 1, 1)
                    ys3 = rr3 * float(E) + float(e)
                    wc = jnp.maximum(
                        0.0, 1.0 - jnp.abs(ys3 - (cy3 + by3))
                    ).astype(DT)  # (g, num, k)
                    t3 = jax.lax.dot_general(
                        wc, rhs3,
                        (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    )  # (g, num, width)
                    ts.append(t3.reshape(g * num, width))
                else:  # cbuild
                    cy3 = cxy[:, 1:2].reshape(1, g, 1)
                    ys3 = rr3 * float(E) + float(e)
                    wc = jnp.maximum(
                        0.0, 1.0 - jnp.abs(ys3 - (cy3 + by3))
                    )  # (num, g, k) — non-redundant
                    wexp = jnp.broadcast_to(
                        wc[:, :, None, :], (num, g, g, k)
                    ).reshape(num, g, g * k)
                    wy = (wexp.astype(DT) * blkmask).reshape(num * g, g * k)
                    ts.append(
                        jnp.dot(wy, rhs, preferred_element_type=jnp.float32)
                    )
            t = ts[0]
            laneg = (
                jax.lax.broadcasted_iota(jnp.int32, (g * num, width), 1) // WL
            )
            t = jnp.where(laneg == 1, ts[1], t)

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

    outs = {}
    for mode in ("full", "bdot", "cbuild"):
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
            o = np.asarray(run(coords, corr))
            outs[mode] = o
            t = device_step_time(run, (coords, corr), iters=8,
                                 chain=chain_coords_only)
            ok = ""
            if "full" in outs and mode != "full":
                d = float(np.max(np.abs(outs[mode] - outs["full"])))
                rel = d / (float(np.max(np.abs(outs["full"]))) + 1e-9)
                ok = f"  maxdiff vs full {rel:.2e}"
            print(f"{mode:8s}: {t*1e3:.3f} ms{ok}", flush=True)
        except Exception as e:
            print(f"{mode:8s}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
