"""Modulated deformable convolution (DCNv2) for TPU.

The reference's AccPlus cell uses torchvision.ops.DeformConv2d
(networks/AccFlow_.py:83,104) — a CUDA op. This is the TPU-native
equivalent, decomposed into hardware-friendly stages:

1. For every output pixel p and kernel tap k: sampling location
   p + p_k + offset_k (3x3 grid, stride 1, pad 1, dilation 1), bilinearly
   interpolated with zeros padding (torchvision semantics).
2. The 9 sampled feature vectors are scaled by the per-tap sigmoid masks.
3. Contraction with the kernel weights is one (N*H*W, 9*Cin) x (9*Cin, Cout)
   matmul — the FLOP-heavy part rides the MXU.

Offset channel layout matches torchvision's C++ kernel
(torchvision/csrc/ops/cpu/deform_conv2d_kernel.cpp): channel 2*k is the
*y* (row) offset and 2*k+1 the *x* (column) offset for tap k = ky*kw + kx.
Mask channels are ordered by k. Released AccFlow checkpoints were trained
against this layout, so parity requires it.

NHWC calling convention: offsets (N, H, W, 18), mask (N, H, W, 9),
weight in torch layout transformed to (kh, kw, Cin, Cout).
"""

from __future__ import annotations

import jax.numpy as jnp

from accflow_tpu.ops.sampling import bilinear_sample


def deform_conv3x3(
    x: jnp.ndarray,
    offsets: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Modulated 3x3 deformable conv, stride 1, padding 1, dilation 1.

    x: (N, H, W, Cin); offsets: (N, H, W, 18) with (dy, dx) pairs per tap;
    mask: (N, H, W, 9); weight: (3, 3, Cin, Cout); bias: (Cout,) or None.
    Sampling/interp runs float32; the contraction follows x.dtype.
    """
    n, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    assert (kh, kw) == (3, 3), "only 3x3 deform conv is used by AccFlow"

    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")  # (H, W)

    off = offsets.reshape(n, h, w, 9, 2).astype(jnp.float32)
    dy = off[..., 0]
    dx = off[..., 1]

    # Base tap positions: tap k = ky*3 + kx at (y + ky - 1, x + kx - 1).
    ky = jnp.array([k // 3 for k in range(9)], dtype=jnp.float32)
    kx = jnp.array([k % 3 for k in range(9)], dtype=jnp.float32)
    py = gy[None, :, :, None] + (ky - 1.0)[None, None, None, :] + dy
    px = gx[None, :, :, None] + (kx - 1.0)[None, None, None, :] + dx
    coords = jnp.stack([px, py], axis=-1)  # (N, H, W, 9, 2), (x, y) order

    # Sample in x's own dtype: the tap weights/coords stay float32, only
    # the gathered VALUES and the 4-tap blend carry x.dtype. For bfloat16
    # inputs this halves the (N, H, W, 9, Cin) intermediate's traffic; the
    # reference runs DeformConv2d under autocast (fp16) so a bf16 blend is
    # within the documented AMP policy. float32 inputs (parity paths) are
    # bit-identical to before.
    sampled = bilinear_sample(x, coords)  # (N, H, W, 9, Cin)
    sampled = sampled * mask.astype(sampled.dtype)[..., None]

    sampled = sampled.reshape(n, h, w, 9 * cin)
    wmat = weight.reshape(9 * cin, cout).astype(x.dtype)
    # Tap-major flatten (k, cin) matches sampled's (9, Cin) flatten above:
    # weight (3, 3, Cin, Cout) -> (ky, kx, cin) = (k, cin) row-major. OK.
    # precision="highest" keeps float32 inputs exact on the MXU (for bf16
    # inputs it is a no-op — native bf16 multiply, f32 accumulate).
    out = jnp.einsum("nhwi,io->nhwo", sampled, wmat, precision="highest")
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
