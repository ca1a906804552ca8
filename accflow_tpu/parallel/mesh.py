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

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed(logger=None) -> bool:
    """Multi-host entry point (SURVEY.md §5.8): join a multi-process JAX
    job over DCN when the launch environment says so; single-host no-op.

    Triggers, checked in order:
    - ACCFLOW_DISTRIBUTED=1|auto  -> jax.distributed.initialize() with
      auto-detection (TPU pod metadata / cluster env);
    - JAX_COORDINATOR_ADDRESS (+ JAX_NUM_PROCESSES, JAX_PROCESS_ID) ->
      explicit initialize(...) for generic clusters.

    Launch recipe (one process per host, same command on every host):

        ACCFLOW_DISTRIBUTED=1 python -m accflow_tpu.cli.train_acc ...   # TPU pod
        JAX_COORDINATOR_ADDRESS=host0:1234 JAX_NUM_PROCESSES=4 \
        JAX_PROCESS_ID=$i python -m accflow_tpu.cli.train_acc ...       # generic

    After this, jax.devices() spans all hosts and make_mesh() builds the
    global mesh; the jitted SPMD step functions are unchanged (GSPMD
    shards the same program over the bigger mesh). Call before any other
    JAX API touches a backend.
    """
    called = False
    flag = os.environ.get("ACCFLOW_DISTRIBUTED", "").lower()
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if flag in ("1", "true", "auto"):
        jax.distributed.initialize()
        called = True
    elif addr:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
        called = True
    if called and logger is not None:
        logger.info(
            "jax.distributed initialized: process %d/%d, %d global devices",
            jax.process_index(), jax.process_count(), len(jax.devices()),
        )
    return called


def is_main_process() -> bool:
    """True on the one process that owns host-side side effects (result
    files, PNG dumps, log files, TensorBoard, run-dir archiving). The
    reference is single-process so everything writes; on a pod every
    process would otherwise append the same result lines and race the
    archive renames (train_acc.py:39-45,283-301). Orbax checkpoint
    saves stay UNGUARDED — they are collective (every process must
    participate; orbax coordinates the writes itself)."""
    return jax.process_index() == 0


def sync_processes(tag: str = "sync") -> None:
    """Barrier across processes (no-op single-process): keeps non-main
    processes from touching a run dir while process 0 is still archiving
    or creating it."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def host_array(x) -> np.ndarray:
    """Global jax.Array -> full numpy value on EVERY process. Single
    process this is np.asarray; multi-process, a batch-sharded output is
    neither fully addressable nor fully replicated (np.asarray would
    raise), so it is resharded to replicated first — a jitted identity
    whose out_sharding makes GSPMD insert the all-gather. Engines use
    this on per-sample metric vectors and visual-sample flows; every
    process must call it at the same point (it is a collective)."""
    if (
        getattr(x, "is_fully_addressable", True)
        or getattr(x.sharding, "is_fully_replicated", False)
    ):
        return np.asarray(x)
    rep = jax.jit(
        lambda a: a, out_shardings=NamedSharding(x.sharding.mesh, P())
    )(x)
    return np.asarray(rep)


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
