"""Bilinear sampling with torch.grid_sample semantics (align_corners=True).

Reproduces the behavior of the reference's `bilinear_sampler`
(networks/raft/utils/utils.py:66-80) and the core of `backwarp`
(networks/raft/utils/utils.py:96-126): bilinear interpolation at pixel
coordinates with *zeros* padding — each of the four corner taps contributes
0 when it falls outside the image.

Formulation: one flattened gather per corner tap (4 gathers total) followed
by a weighted sum on the VPU. Out-of-range corners are masked rather than
clamped-and-kept, which matches grid_sample's padding_mode="zeros".
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample `img` (B, H, W, C) at pixel `coords` (B, ..., 2) -> (B, ..., C).

    coords[..., 0] is x (column), coords[..., 1] is y (row), in pixel units
    (align_corners=True convention: integer coords hit pixel centers, the
    valid ranges are [0, W-1] and [0, H-1]). Outside taps contribute zero.
    """
    b, h, w, c = img.shape
    out_shape = coords.shape[:-1] + (c,)
    coords = coords.reshape(b, -1, 2).astype(jnp.float32)
    x = coords[..., 0]
    y = coords[..., 1]

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    flat = img.reshape(b, h * w, c)

    def tap(xi, yi, weight):
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        idx = yi_c * w + xi_c  # (B, P)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)  # (B, P, C)
        wgt = (weight * valid.astype(weight.dtype))[..., None]
        return vals * wgt.astype(vals.dtype)

    out = (
        tap(x0, y0, (1.0 - fx) * (1.0 - fy))
        + tap(x0 + 1.0, y0, fx * (1.0 - fy))
        + tap(x0, y0 + 1.0, (1.0 - fx) * fy)
        + tap(x0 + 1.0, y0 + 1.0, fx * fy)
    )
    return out.reshape(out_shape)


def backwarp(image: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp (B, H, W, C) by flow (B, H, W, 2): out(p) = image(p + flow).

    Matches the reference backwarp (zeros padding, align_corners=True,
    (W-1)/(H-1) normalization round-trip — which is identity in pixel space).
    """
    b, h, w, _ = image.shape
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    grid = jnp.stack([xs, ys], axis=-1)[None]  # (1, H, W, 2), (x, y)
    coords = grid + flow.astype(jnp.float32)
    return bilinear_sample(image, coords)
