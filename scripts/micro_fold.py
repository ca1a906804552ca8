"""Micro-probe: is a W-folded 128-channel stage-1 conv faster than the
64-channel original?

The serving trace pins ~11 ms/step on encoder stage-1 residual convs
((B,256,256,64) 3x3 64->64 at 42-49 TF/s — 64 channels use half of the
128 MXU/VPU lanes). Folding width pairs into channels gives an exact
(B,256,128,128) 3x3 128->128 reformulation with 2x the FLOPs but
full-lane operands. This measures both raw conv shapes (plus the fold
relayout) to decide whether the full encoder rewrite is worth it.

    python scripts/micro_fold.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from accflow_tpu.utils.profiling import device_step_time

B, H, W, C = 14, 256, 256, 64
DT = jnp.bfloat16
DIMNUMS = ("NHWC", "HWIO", "NHWC")


def conv(x, w):
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=DIMNUMS,
    )


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32)).astype(DT)
    xf = jnp.asarray(
        rng.standard_normal((B, H, W // 2, 2 * C)).astype(np.float32)
    ).astype(DT)
    w1 = jnp.asarray(rng.standard_normal((3, 3, C, C)).astype(np.float32)).astype(DT)
    w2 = jnp.asarray(
        rng.standard_normal((3, 3, 2 * C, 2 * C)).astype(np.float32)
    ).astype(DT)

    def chain(out, args, s):
        return (args[0] + (s * 1e-30).astype(args[0].dtype),) + tuple(args[1:])

    def orig(x, w):
        return conv(conv(x, w), w)  # two chained convs like a residual block

    def folded(xf, w):
        return conv(conv(xf, w), w)

    def fold_only(x, w):
        n, h, wd, c = x.shape
        f = x.reshape(n, h, wd // 2, 2, c).reshape(n, h, wd // 2, 2 * c)
        return f * w[0, 0, 0, 0]

    for name, fn, args in (
        ("orig 2x(3x3 64ch)", orig, (x, w1)),
        ("fold 2x(3x3 128ch)", folded, (xf, w2)),
        ("fold relayout only", fold_only, (x, w2)),
    ):
        t = device_step_time(
            lambda *a, fn=fn: jnp.sum(fn(*a).astype(jnp.float32)),
            args, iters=8, chain=chain,
        )
        print(f"{name:22s}: {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
