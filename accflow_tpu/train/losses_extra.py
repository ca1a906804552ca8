"""Generic loss zoo (reference networks/losses.py — defined there but never
imported by any entry point; provided for API completeness).

L1 / L2 (charbonnier-eps style), multi-scale weighted variants, and the
`get_loss(loss_type)` factory keyed the same way the configs' `loss_type`
field is spelled.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp

from accflow_tpu.ops.grids import resize_bilinear_align_corners


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(pred - target).mean()


def l2_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return ((pred - target) ** 2).mean()


def charbonnier_loss(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    return jnp.sqrt((pred - target) ** 2 + eps**2).mean()


def multiscale_loss(
    preds: Sequence[jnp.ndarray],
    target: jnp.ndarray,
    weights: Sequence[float] | None = None,
    base: Callable = l1_loss,
) -> jnp.ndarray:
    """Weighted sum over multi-resolution predictions; the target is
    resized (align_corners, values scaled with resolution) per level."""
    if weights is None:
        weights = [0.32 / (2**i) for i in range(len(preds))]
    total = 0.0
    th, tw = target.shape[1:3]
    for w, p in zip(weights, preds):
        ph, pw = p.shape[1:3]
        if (ph, pw) != (th, tw):
            scaled = resize_bilinear_align_corners(target, (ph, pw))
            scaled = scaled * (pw / tw)
        else:
            scaled = target
        total = total + w * base(p, scaled)
    return total


def get_loss(loss_type: str) -> Callable:
    table = {
        "l1": l1_loss,
        "l2": l2_loss,
        "charbonnier": charbonnier_loss,
    }
    key = loss_type.lower()
    if key not in table:
        raise NotImplementedError(f"loss {loss_type!r} not supported")
    return table[key]
