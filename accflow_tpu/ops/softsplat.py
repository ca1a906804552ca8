"""Softmax splatting (forward warping) for TPU.

The reference's legacy AccPlus variants import a CuPy CUDA softsplat kernel
that is absent from its tree (networks/AccPlus.py:8 — the module
networks/raft/softsplat.py does not exist; SURVEY.md §2.4), and its README
lists occlusion-aware warm-starting as future work. This is the TPU-native
equivalent: bilinear forward-splatting via scatter-add — the same math as
the scatter-based fallback the reference carries in
networks/gma/utils/utils.py:150-214 — with summation / average / linear /
softmax weighting modes from the softmax-splatting paper.

XLA's `scatter-add` handles colliding targets deterministically, so unlike
CUDA atomics this op is bit-reproducible run to run.
"""

from __future__ import annotations

import jax.numpy as jnp


def _splat_add(values: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Bilinear scatter-add of `values` (B, H, W, C) along `flow` -> same shape."""
    b, h, w, c = values.shape
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    tx = xs[None] + flow[..., 0]
    ty = ys[None] + flow[..., 1]

    x0 = jnp.floor(tx)
    y0 = jnp.floor(ty)
    fx = tx - x0
    fy = ty - y0

    out = jnp.zeros((b, h * w, c), values.dtype)
    vals = values.reshape(b, h * w, c)

    def corner(xi, yi, weight):
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        idx = (yi_c * w + xi_c).reshape(b, h * w)
        wgt = (weight * valid.astype(weight.dtype)).reshape(b, h * w, 1)
        return idx, wgt

    acc = out
    for xi, yi, wgt in (
        (x0, y0, (1 - fx) * (1 - fy)),
        (x0 + 1, y0, fx * (1 - fy)),
        (x0, y0 + 1, (1 - fx) * fy),
        (x0 + 1, y0 + 1, fx * fy),
    ):
        idx, wv = corner(xi, yi, wgt)
        acc = acc.at[
            jnp.arange(b)[:, None], idx
        ].add(vals * wv.astype(vals.dtype))
    return acc.reshape(b, h, w, c)


def softsplat(
    image: jnp.ndarray,
    flow: jnp.ndarray,
    metric: jnp.ndarray | None = None,
    mode: str = "average",
    eps: float = 1e-7,
) -> jnp.ndarray:
    """Forward-warp `image` (B, H, W, C) by `flow` (B, H, W, 2).

    mode: "summation" | "average" | "linear" (weight=metric) |
    "softmax" (weight=exp(metric)). metric: (B, H, W, 1) for the weighted
    modes.
    """
    image = image.astype(jnp.float32)
    flow = flow.astype(jnp.float32)
    if mode == "summation":
        return _splat_add(image, flow)
    if mode == "average":
        weight = jnp.ones(image.shape[:3] + (1,), jnp.float32)
    elif mode == "linear":
        assert metric is not None
        weight = metric.astype(jnp.float32)
    elif mode == "softmax":
        assert metric is not None
        weight = jnp.exp(metric.astype(jnp.float32))
    else:
        raise ValueError(mode)
    num = _splat_add(image * weight, flow)
    den = _splat_add(weight, flow)
    return num / (den + eps)
