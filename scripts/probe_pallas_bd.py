"""Mosaic probe: block-diagonal y-contraction kernel building blocks.

Per CLAUDE.md workflow — probe pallas_call compatibility with a tiny
standalone before investing in a full-model experiment. Checks, in one
kernel: zeroed VMEM scratch, static block writes of (9, hl) weight tiles
into a (G*9, G*hl) block-diagonal LHS, reshape of a (G, hl, wl) ref slice
to (G*hl, wl), one MXU dot per group, f32 accumulate store.

    python scripts/probe_pallas_bd.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TQ, G, HL, WL, NUM = 128, 8, 64, 64, 9


def kernel(wy_ref, corr_ref, out_ref, lhs_ref):
    lhs_ref[...] = jnp.zeros_like(lhs_ref)
    for g in range(TQ // G):
        for i in range(G):
            lhs_ref[i * NUM : (i + 1) * NUM, i * HL : (i + 1) * HL] = wy_ref[
                g * G + i
            ]
        rhs = corr_ref[g * G : (g + 1) * G].reshape(G * HL, WL)
        out = jnp.dot(
            lhs_ref[...], rhs, preferred_element_type=jnp.float32
        )  # (G*9, WL)
        out_ref[g * G : (g + 1) * G] = out.reshape(G, NUM, WL)


def main():
    q = 1024
    rng = np.random.default_rng(0)
    wy = jnp.asarray(rng.standard_normal((q, NUM, HL)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    corr = jnp.asarray(
        rng.standard_normal((q, HL, WL)).astype(np.float32)
    ).astype(jnp.bfloat16)

    fn = pl.pallas_call(
        kernel,
        grid=(q // TQ,),
        in_specs=[
            pl.BlockSpec((TQ, NUM, HL), lambda i: (i, 0, 0)),
            pl.BlockSpec((TQ, HL, WL), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((TQ, NUM, WL), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((q, NUM, WL), jnp.float32),
        scratch_shapes=[pltpu.VMEM((G * NUM, G * HL), jnp.bfloat16)],
        interpret=jax.default_backend() != "tpu",
    )
    out = np.asarray(fn(wy, corr))
    ref = np.einsum(
        "qby,qyx->qbx", np.asarray(wy, np.float32), np.asarray(corr, np.float32)
    )
    d = np.abs(out - ref).max()
    print("max diff:", d, "ok" if d < 1e-2 else "MISMATCH", flush=True)


if __name__ == "__main__":
    main()
