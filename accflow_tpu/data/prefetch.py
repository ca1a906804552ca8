"""Host->device prefetching.

The reference leans on torch DataLoader worker processes + pin_memory
(train_acc.py:48,135). The TPU-native equivalent: a small thread pool
decodes/crops/collates batches ahead of time, and the device feeder keeps
`depth` batches in flight on-device so the input pipeline overlaps with
step computation instead of serializing host->HBM transfers."""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

import jax


def threaded_batches(iterator: Iterable, num_threads: int = 2, buffer: int = 4) -> Iterator:
    """Run `iterator` in background threads, yielding in order.

    The upstream iterator is consumed by a single producer (order matters
    for determinism); worker threads are most useful when the per-batch
    work (decode + crop + collate) dominates. With num_threads=0 this is a
    passthrough."""
    if num_threads <= 0:
        yield from iterator
        return

    q: "queue.Queue" = queue.Queue(maxsize=buffer)
    _END = object()

    def producer():
        try:
            for item in iterator:
                q.put(item)
        finally:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        yield item


def device_prefetch(
    iterator: Iterable,
    depth: int = 2,
    sharding=None,
    transform: Optional[Callable] = None,
) -> Iterator:
    """Keep `depth` batches resident on device ahead of the consumer.

    sharding: optional jax.sharding.Sharding (e.g. batch-sharded
    NamedSharding) applied at transfer time so multi-chip feeding never
    materializes a replicated copy."""
    buf = []
    it = iter(iterator)

    def put(batch):
        if transform is not None:
            # The transform owns device placement (the engines' in_shard
            # device_puts to a global batch sharding). A second bare
            # device_put would be a no-op single-process but REJECTS
            # non-fully-addressable global arrays on a multi-process mesh.
            return transform(batch)
        if sharding is not None:
            return jax.device_put(batch, sharding)
        return jax.device_put(batch)

    try:
        for _ in range(depth):
            buf.append(put(next(it)))
    except StopIteration:
        pass

    while buf:
        out = buf.pop(0)
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out
