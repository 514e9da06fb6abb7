"""Host -> device input pipeline.

Replaces the reference's 32 DataLoader worker processes
(reference train.py:94-104) with a thread-pooled batch assembler and a
double-buffered device prefetcher: while the TPU runs step N, the next batch
is already being assembled and transferred, so the feed never blocks the
device. Batches land directly with a data-axis NamedSharding.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import jax

from soccerdiffusion_tpu.parallel.mesh import MeshRules, shard_batch


def prefetch_to_device(
    batch_iter: Iterator,
    mesh=None,
    rules: MeshRules | None = None,
    buffer_size: int = 2,
) -> Iterator:
    """Wrap a host batch iterator with async device transfer.

    If ``mesh`` is None batches are device_put to the default device;
    otherwise they are sharded over the mesh's data axis.
    """
    q: queue.Queue = queue.Queue(maxsize=buffer_size)
    _SENTINEL = object()

    def put(batch):
        if mesh is not None:
            return shard_batch(mesh, batch, rules)
        return jax.device_put(batch)

    def producer():
        try:
            for batch in batch_iter:
                q.put(put(batch))
        finally:
            q.put(_SENTINEL)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            break
        yield item
