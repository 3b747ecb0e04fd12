"""Host->device prefetching input pipeline.

The reference overlaps data loading with compute via DataLoader worker
processes (num_workers, models/darts_searchable.py:39-41). The TPU-native
equivalent: a background thread stages the next host batch onto the device
(optionally sharded over the mesh) while the current step runs, so the
device never waits on host IO for these small batches.
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Iterator, Optional

import jax


def device_prefetch(iterator: Iterator[Any], size: int = 2,
                    sharding: Optional[Any] = None,
                    place: Optional[Any] = None) -> Iterator[Any]:
    """Wrap a host-batch iterator; yields device-resident batches.

    ``place`` (e.g. ``ParallelContext.shard_batch``) takes precedence over a
    bare ``sharding`` — it is required under multi-process runs, where each
    process must keep only its slice of the global batch (a plain device_put
    onto a global NamedSharding cannot address other hosts' devices)."""

    def _put(batch):
        if place is not None:
            return place(batch)
        if sharding is not None:
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding), batch)
        return jax.tree_util.tree_map(jax.device_put, batch)

    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()
    err_holder = []
    stop = threading.Event()

    def _put_q(item) -> bool:
        # bounded put that notices consumer abandonment (generator closed
        # mid-epoch, e.g. the --unrolled dev phase cycling a train iterator):
        # otherwise the worker would block forever pinning device batches.
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        import gc
        try:
            for n, batch in enumerate(iterator):
                if not _put_q(_put(batch)):
                    return
                # The TPU-relay client leaves its host-side transfer buffers
                # in reference CYCLES; CPython's generational GC never fires
                # because the allocation pressure sits in untracked C
                # buffers, so a streaming run leaks the full fp32 footprint
                # of every batch ever sent (measured: 130 GB anon RSS ->
                # OOM kill after 4 NTU epochs). A periodic collect fully
                # reclaims them (measured: 0.0-0.2 MB/batch residual).
                if (n + 1) % 8 == 0:
                    gc.collect()
        except Exception as e:  # surface loader errors on the consumer side
            err_holder.append(e)
        finally:
            _put_q(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if err_holder:
                    raise err_holder[0]
                return
            yield item
    finally:
        stop.set()  # runs on GeneratorExit too — unblocks + ends the worker
