"""Sequence losses + metrics (reference loss.py).

- sequence_loss_raft (loss.py:4-25): gamma-weighted L1 over the
  per-iteration prediction sequence, weight gamma^(n-1-i).
- sequence_loss_acc (loss.py:28-44): unweighted L1 over matched
  prediction/GT lists.
- metrics: EPE + 1px/3px/5px rates of the final prediction.

The reference's committed fine_tune.py degenerates here: RAFT.forward
returns a single tensor so `len(flow_preds)` iterates the *batch* dim
(SURVEY.md §3.4). We restore upstream semantics — predictions are the
(iters, N, H, W, 2) sequence our models return.

All inputs channels-last; predictions stacked on a leading axis.
"""

from __future__ import annotations

import jax.numpy as jnp


def epe_metrics(flow_final: jnp.ndarray, flow_gt: jnp.ndarray) -> dict:
    epe = jnp.sqrt(jnp.sum((flow_final - flow_gt) ** 2, axis=-1))
    epe = epe.reshape(-1)
    return {
        "epe": epe.mean(),
        "1px": (epe < 1).astype(jnp.float32).mean(),
        "3px": (epe < 3).astype(jnp.float32).mean(),
        "5px": (epe < 5).astype(jnp.float32).mean(),
    }


def sequence_loss_raft(predictions: jnp.ndarray, flow_gt: jnp.ndarray, gamma: float = 0.8):
    """predictions: (T, N, H, W, 2); flow_gt: (N, H, W, 2)."""
    t = predictions.shape[0]
    weights = gamma ** jnp.arange(t - 1, -1, -1, dtype=jnp.float32)
    l1 = jnp.abs(predictions - flow_gt[None]).mean(axis=(1, 2, 3, 4))
    loss = jnp.sum(weights * l1)
    return loss, epe_metrics(predictions[-1], flow_gt)


def sequence_loss_acc(predictions: jnp.ndarray, flow_gts: jnp.ndarray):
    """predictions, flow_gts: (S, N, H, W, 2) matched accumulation outputs
    [F_{2,0}..F_{N,0}] vs bflows [F20..F60]."""
    assert predictions.shape == flow_gts.shape, "length not match!"
    loss = jnp.abs(predictions - flow_gts).mean(axis=(1, 2, 3, 4)).sum()
    return loss, epe_metrics(predictions[-1], flow_gts[-1])
