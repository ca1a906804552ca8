"""Flow warm-starting helpers.

- forward_interpolate_flow: the reference's scipy-griddata forward splat
  (networks/raft/utils/utils.py:31-63) used by upstream RAFT to warm-start
  the next frame's flow; host-side numpy/scipy, kept for API parity.
- forward_splat_flow: the TPU-native equivalent — on-device splatting of
  the flow field along an advection field (see ops/softsplat.py), usable
  inside jit and batched. Consumers: models/accflow.py
  (_accflow_forward_warmstart, AccFlowConfig.warm_start) and
  train/evaluate.py (evaluate_sequence).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from accflow_tpu.ops.softsplat import softsplat


def forward_interpolate_flow(flow: np.ndarray) -> np.ndarray:
    """Reference-parity scipy version. flow: (H, W, 2) numpy -> (H, W, 2).

    Nearest-neighbor scattered interpolation of the forward-advected flow
    field (fill 0 outside the convex hull)."""
    from scipy import interpolate

    dx, dy = flow[..., 0], flow[..., 1]
    ht, wd = dx.shape
    x0, y0 = np.meshgrid(np.arange(wd), np.arange(ht))
    x1 = (x0 + dx).reshape(-1)
    y1 = (y0 + dy).reshape(-1)
    dxf = dx.reshape(-1)
    dyf = dy.reshape(-1)
    valid = (x1 > 0) & (x1 < wd) & (y1 > 0) & (y1 < ht)
    if valid.sum() == 0:
        return np.zeros_like(flow)
    flow_x = interpolate.griddata(
        (x1[valid], y1[valid]), dxf[valid], (x0, y0), method="nearest", fill_value=0
    )
    flow_y = interpolate.griddata(
        (x1[valid], y1[valid]), dyf[valid], (x0, y0), method="nearest", fill_value=0
    )
    return np.stack([flow_x, flow_y], axis=-1).astype(np.float32)


def forward_splat_flow(
    flow: jnp.ndarray, advect: jnp.ndarray | None = None
) -> jnp.ndarray:
    """On-device warm start: splat `flow` forward along `advect` (average
    mode), batched (B, H, W, 2) -> (B, H, W, 2). advect=None splats the
    flow along itself — upstream RAFT's constant-velocity warm start for
    consecutive forward pairs; pass -dflow for backward pair flows (the
    grid advances one frame, AccFlow convention). Holes become 0 — the
    same prior the scipy version uses outside its hull."""
    return softsplat(flow, flow if advect is None else advect, mode="average")
