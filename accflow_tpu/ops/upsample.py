"""RAFT-style convex-combination 8x flow upsampling.

Reproduces `RAFT.upsample_flow` (networks/raft/raft.py:81-92) and the
identical `FlowDecoder.upsample_flow` (networks/AccFlow_.py:27-38):

    out[n, c, 8i+r, 8j+s] = sum_k softmax_k(mask)[n, k, r, s, i, j]
                            * 8 * flow_pad[n, c, i + ky(k) - 1, j + kx(k) - 1]

where k = ky*3 + kx enumerates the 3x3 neighborhood (zero padded) and the
mask channel layout is c = k*64 + r*8 + s (torch .view(N, 1, 9, 8, 8, H, W)).

TPU formulation: the 3x3 neighborhood is materialized as 9 shifted slices
(pure data movement, fused by XLA) and the convex combination is a single
einsum on the VPU/MXU — no unfold/gather needed.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax.nn


def neighborhood3x3(x: jnp.ndarray) -> jnp.ndarray:
    """Zero-padded 3x3 neighborhoods: (N, H, W, C) -> (N, H, W, 9, C).

    Tap order k = ky*3 + kx, matching torch.nn.functional.unfold([3,3], pad=1).
    """
    n, h, w, c = x.shape
    padded = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [
        padded[:, ky : ky + h, kx : kx + w, :]
        for ky in range(3)
        for kx in range(3)
    ]
    return jnp.stack(taps, axis=3)


def mask_s_major_perm(num: int = 576):
    """Channel permutation turning a (k, s)-major convex-upsample mask head
    into (s, k)-major: perm[c'] with c' = s*9 + k reads original channel
    k*64 + s. Applying this to the mask conv's OUTPUT channels (weights +
    bias, free at trace time) lets convex_upsample skip the whole-mask
    (..., 9, 64) -> (..., 64, 9) swapaxes relayout (a ~200 MB f32 copy per
    OFE call at the CVO-6 serving shape)."""
    import numpy as np

    c = np.arange(num)
    return (c % 9) * (num // 9) + c // 9


def convex_upsample(
    flow: jnp.ndarray, mask: jnp.ndarray, s_major: bool = False
) -> jnp.ndarray:
    """Upsample flow (N, H, W, 2) to (N, 8H, 8W, 2) via learned convex weights.

    mask: (N, H, W, 576) with channel layout (k, r, s) = (3x3 tap, sub-row,
    sub-col) — the NHWC image of the reference's (N, 9*64, H, W) tensor —
    or, with s_major=True, the (r*8+s, k) layout produced by a mask head
    whose output channels were permuted with mask_s_major_perm.
    Computation runs in float32 regardless of input dtype (the reference
    computes this outside autocast).
    """
    n, h, w, _ = flow.shape
    # Keep the softmax reduction on the MINOR axis: (..., 64, 9) instead of
    # the 6D (..., 9, 8, 8) view — the latter makes XLA relayout the whole
    # mask around the axis-3 reduce (two ~400 MB copies per call at 512^2).
    if s_major:
        logits = mask.reshape(n, h, w, 64, 9).astype(jnp.float32)
    else:
        logits = (
            mask.reshape(n, h, w, 9, 64).astype(jnp.float32).swapaxes(-1, -2)
        )  # (N, H, W, 64, 9)
    probs = jax.nn.softmax(logits, axis=-1)

    nbh = neighborhood3x3(8.0 * flow.astype(jnp.float32))  # (N, H, W, 9, 2)
    # (N, H, W, 64, 2): convex combination over the 9 taps; s = r*8 + c.
    up = jnp.einsum("nhwsk,nhwkc->nhwsc", probs, nbh, precision="highest")
    up = up.reshape(n, h, w, 8, 8, 2)
    # (i, r, j, s) -> rows 8i+r, cols 8j+s.
    up = up.transpose(0, 1, 3, 2, 4, 5)  # (N, H, 8, W, 8, 2)
    return up.reshape(n, 8 * h, 8 * w, 2)
