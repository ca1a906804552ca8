"""Measure the Pallas per-tile floor: DMA + grid/pipeline overhead only.

A passthrough kernel streams the same blocks as the fused lookup kernel
(packed L0 (Q,32,128) bf16 + L1 (Q,8,128) + 3d L2 (Q,16,16) + L3 (Q,8,8))
and writes one (tq, 324) f32 row per query from a trivial reduction. If
this floor is close to the fused kernel's measured time, the lookup kernel
is overhead-bound and no inner-loop optimization can save it.

    python scripts/probe_pallas_floor.py
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


def make(tq, nlev):
    def kernel(coords_ref, *refs):
        corr_refs = refs[:nlev]
        out_ref = refs[nlev]
        acc = coords_ref[:, 0:1] * 0.0  # (tq, 1)
        for r in corr_refs:
            s1 = jnp.sum(r[...].astype(jnp.float32), axis=2)  # (tq, rows)
            acc = acc + jnp.sum(s1, axis=1, keepdims=True)
        out_ref[...] = acc + jnp.zeros(out_ref.shape, jnp.float32)

    return kernel


def main():
    rng = np.random.default_rng(0)
    levels = [
        jnp.asarray(rng.standard_normal((Q, 32, 128)).astype(np.float32)).astype(jnp.bfloat16),
        jnp.asarray(rng.standard_normal((Q, 8, 128)).astype(np.float32)).astype(jnp.bfloat16),
        jnp.asarray(rng.standard_normal((Q, 16, 16)).astype(np.float32)).astype(jnp.bfloat16),
        jnp.asarray(rng.standard_normal((Q, 8, 8)).astype(np.float32)).astype(jnp.bfloat16),
    ]
    coords = jnp.asarray(rng.standard_normal((Q, 2)).astype(np.float32))

    def chain_coords_only(out, args, s):
        eps = (s * 1e-30).astype(args[0].dtype)
        return (args[0] + eps,) + tuple(args[1:])

    for nlev, tq in ((4, 128), (4, 256), (1, 128), (1, 256), (1, 512)):
        def run(c, *lv, tq=tq, nlev=nlev):
            in_specs = [
                pl.BlockSpec((tq, 2), lambda i: (i, 0), memory_space=pltpu.VMEM)
            ] + [
                pl.BlockSpec((tq,) + l.shape[1:], lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
                for l in lv
            ]
            return pl.pallas_call(
                make(tq, nlev),
                grid=(Q // tq,),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((tq, 324), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((Q, 324), jnp.float32),
                interpret=jax.default_backend() != "tpu",
            )(c, *lv)

        args = (coords,) + tuple(levels[:nlev])
        try:
            t = device_step_time(run, args, iters=8, chain=chain_coords_only)
            print(f"floor nlev={nlev} tq={tq}: {t*1e3:.3f} ms "
                  f"({t*1e6/(Q//tq):.2f} us/tile)", flush=True)
        except Exception as e:
            print(f"floor nlev={nlev} tq={tq}: FAIL {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
