"""Occlusion estimation ops.

- calc_occ_mask: bidirectional-consistency occlusion for evaluation
  (test_cvo.py:53-78): thresh = 0.01*(|f| + |b|) + 0.5.
- photometric_occ: the AccFlow `getOcc` (networks/AccFlow_.py:127-135):
  backwarp features by the flow, mean-abs error, binary threshold <= 1.0
  (or the raw per-channel error map when binary=False).
"""

from __future__ import annotations

import jax.numpy as jnp

from accflow_tpu.ops.sampling import backwarp


def _length(x: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel L2 magnitude over the flow channel dim, keepdims."""
    return jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))


def calc_occ_mask(bflow: jnp.ndarray, fflow: jnp.ndarray):
    """Bidirectional occlusion masks for FN0/F0N pairs in (N, H, W, 2).

    Returns (occ_bw, occ_fw) binary maps (N, H, W, 1); 1 = occluded.
    """
    occ_alpha_1 = 0.01
    occ_alpha_2 = 0.5
    mag = _length(fflow) + _length(bflow)
    flow_bw_warped = backwarp(bflow, fflow)
    flow_fw_warped = backwarp(fflow, bflow)
    diff_fw = fflow + flow_bw_warped
    diff_bw = bflow + flow_fw_warped
    thresh = occ_alpha_1 * mag + occ_alpha_2
    occ_fw = (_length(diff_fw) > thresh).astype(jnp.float32)
    occ_bw = (_length(diff_bw) > thresh).astype(jnp.float32)
    return occ_bw, occ_fw


def photometric_occ(
    flow12: jnp.ndarray, feat1: jnp.ndarray, feat2: jnp.ndarray, binary: bool = True
) -> jnp.ndarray:
    """AccFlow getOcc: warp feat2 by flow12, compare to feat1.

    binary=True: (N, H, W, 1) map, 1 where mean-abs error <= 1.0 (visible).
    binary=False: raw abs error map (N, H, W, C).
    """
    feat1_w = backwarp(feat2, flow12)
    err = jnp.abs(feat1 - feat1_w)
    if binary:
        err = jnp.mean(err, axis=-1, keepdims=True)
        return jnp.where(err <= 1.0, 1.0, 0.0).astype(jnp.float32)
    return err
