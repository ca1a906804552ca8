"""Device mesh + sharding plans (replacing nn.DataParallel, SURVEY.md §2.7).

The reference's only parallelism is single-process DataParallel (replicate
module, scatter batch, gather outputs — train_acc.py:166). The TPU-native
equivalent is SPMD under jit: one `Mesh` with a "data" axis, batch-sharded
inputs, replicated params, and compiler-inserted psums for gradient
reduction. Multi-host scale-out is the same program over a bigger mesh
(jax.distributed.initialize over DCN); nothing in the step function
changes.

An optional "spatial" mesh axis shards image height: XLA GSPMD inserts
halo exchanges for the convolutions automatically, which is the
TPU-native path to frames too large for one chip's HBM.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_spatial: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_spatial
    if n_data * n_spatial != len(devices):
        devices = devices[: n_data * n_spatial]
    arr = np.array(devices).reshape(n_data, n_spatial)
    return Mesh(arr, axis_names=("data", "spatial"))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard axis 0 (batch) over "data"; replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def clip_batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """For (T, N, H, W, C) clip tensors: shard axis 1 (batch)."""
    return NamedSharding(mesh, P(None, "data", *([None] * (ndim - 2))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """device_put a pytree of (N, ...) arrays batch-sharded over the mesh."""
    return jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh, x.ndim)), batch
    )


def shard_params(mesh: Mesh, params):
    return jax.device_put(params, replicated(mesh))
