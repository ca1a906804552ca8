"""Kernel-only timing of the block-diagonal y-contraction vs XLA's mm.

    python scripts/micro_bd.py [Q]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from accflow_tpu.ops.corr_pallas import y_contract_bd
from accflow_tpu.utils.profiling import device_step_time

Q = int(sys.argv[1]) if len(sys.argv) > 1 else 90112
HL = WL = 64
NUM = 9


def main():
    rng = np.random.default_rng(0)
    corr = jnp.asarray(rng.standard_normal((Q, HL, WL)).astype(np.float32))
    corr_bf = corr.astype(jnp.bfloat16)
    cy = jnp.asarray(rng.uniform(0, HL, (Q, NUM)).astype(np.float32))

    def weights(cy):
        ys = jnp.arange(HL, dtype=jnp.float32)
        return jnp.maximum(0.0, 1.0 - jnp.abs(ys[None, None, :] - cy[..., None]))

    def chain(out, args, s):
        eps = (s * 1e-30).astype(args[0].dtype)
        return (args[0] + eps,) + tuple(args[1:])

    def bench(name, fn, args, iters=8):
        t = device_step_time(fn, args, iters=iters, chain=chain)
        gb = Q * HL * WL * (2 if "bf16" in name else 4) / 1e9
        print(f"{name:42s} {t*1e3:9.3f} ms  ({gb/t:5.0f} GB/s vol)", flush=True)
        return t

    # XLA mm reference (y-dot only)
    bench(
        "xla y-einsum f32vol",
        lambda c, v: jnp.einsum(
            "qby,qyx->qbx", weights(c).astype(v.dtype), v,
            precision="default", preferred_element_type=jnp.float32,
        ),
        (cy, corr),
    )
    bench(
        "xla y-einsum bf16vol",
        lambda c, v: jnp.einsum(
            "qby,qyx->qbx", weights(c).astype(v.dtype), v,
            precision="default", preferred_element_type=jnp.float32,
        ),
        (cy, corr_bf),
    )
    for tq, g in ((128, 8), (128, 16), (256, 8), (256, 16), (256, 32), (512, 16)):
        bench(
            f"bd bf16 tq={tq} g={g}",
            lambda c, v, tq=tq, g=g: y_contract_bd(
                v, weights(c).astype(v.dtype), tq=tq, g=g
            ),
            (cy, corr_bf),
        )


if __name__ == "__main__":
    main()
