"""Coordinate grids and align_corners-exact bilinear resizing.

Reference behaviors reproduced here (file:line cites into /root/reference):
- coords_grid: networks/raft/utils/utils.py:83-87 — (x, y) channel order.
- upflow8: networks/raft/utils/utils.py:90-93 — 8x bilinear upsample with
  align_corners=True, values scaled by 8.
- downflow8: networks/AccFlow_.py:138-142 — 8x bilinear downsample with
  align_corners=True, values divided by 8.

TPU note: `F.interpolate(..., align_corners=True)` is a *linear* map along
each spatial axis, so we implement it as two small dense matmuls (one per
axis). This is exact, differentiable, and runs on the MXU instead of a
gather — the idiomatic XLA formulation of bilinear resize.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def coords_grid(batch: int, ht: int, wd: int, dtype=jnp.float32) -> jnp.ndarray:
    """Pixel-coordinate grid, shape (batch, ht, wd, 2), channel order (x, y)."""
    ys, xs = jnp.meshgrid(
        jnp.arange(ht, dtype=dtype), jnp.arange(wd, dtype=dtype), indexing="ij"
    )
    grid = jnp.stack([xs, ys], axis=-1)  # (H, W, 2) with (x, y)
    return jnp.broadcast_to(grid[None], (batch, ht, wd, 2))


@functools.lru_cache(maxsize=64)
def _resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) interpolation matrix for align_corners=True."""
    if out_size == 1 or in_size == 1:
        # Degenerate axes: every output sample reads input position 0.
        mat = np.zeros((out_size, in_size), dtype=np.float32)
        mat[:, 0] = 1.0
        return mat
    scale = (in_size - 1) / (out_size - 1)
    pos = np.arange(out_size, dtype=np.float64) * scale
    lo = np.floor(pos).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 2)
    frac = pos - lo
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    mat[rows, lo] = (1.0 - frac).astype(np.float32)
    mat[rows, lo + 1] = frac.astype(np.float32)
    return mat


def resize_bilinear_align_corners(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of (N, H, W, C) to (N, h2, w2, C), align_corners=True.

    Matches torch.nn.functional.interpolate(mode="bilinear",
    align_corners=True) to float rounding.
    """
    n, h, w, c = x.shape
    h2, w2 = out_hw
    if (h2, w2) == (h, w):
        return x
    mat_h = jnp.asarray(_resize_matrix(h, h2))  # (h2, h)
    mat_w = jnp.asarray(_resize_matrix(w, w2))  # (w2, w)
    # Interpolation is separable: rows then columns, each a dense matmul.
    x = jnp.einsum("oh,nhwc->nowc", mat_h, x.astype(jnp.float32),
                   precision="highest")
    x = jnp.einsum("ow,nhwc->nhoc", mat_w, x, precision="highest")
    return x


def upflow8(flow: jnp.ndarray) -> jnp.ndarray:
    """8x bilinear upsample of a flow field (N, H, W, 2); values scaled by 8."""
    n, h, w, _ = flow.shape
    return 8.0 * resize_bilinear_align_corners(flow, (8 * h, 8 * w))


def downflow8(flow: jnp.ndarray) -> jnp.ndarray:
    """8x bilinear downsample of a flow field; values divided by 8."""
    n, h, w, _ = flow.shape
    if h % 8 != 0 or w % 8 != 0:
        raise ValueError(f"downflow8 requires /8 divisible dims, got {(h, w)}")
    return resize_bilinear_align_corners(flow, (h // 8, w // 8)) / 8.0
