"""Host->device prefetching input pipeline.

The reference overlaps data loading with compute via DataLoader worker
processes (num_workers, models/darts_searchable.py:39-41). The TPU-native
equivalent: a background thread stages the next host batch onto the device
(optionally sharded over the mesh) while the current step runs, so the
device never waits on host IO for these small batches.
"""
from __future__ import annotations

import functools
import queue
import threading
from typing import Any, Iterator, Optional

import jax


def device_prefetch(iterator: Iterator[Any], size: int = 2,
                    sharding: Optional[Any] = None,
                    place: Optional[Any] = None,
                    put_threads: int = 1) -> Iterator[Any]:
    """Wrap a host-batch iterator; yields device-resident batches.

    ``place`` (e.g. ``ParallelContext.shard_batch``) takes precedence over a
    bare ``sharding`` — it is required under multi-process runs, where each
    process must keep only its slice of the global batch (a plain device_put
    onto a global NamedSharding cannot address other hosts' devices).

    ``put_threads > 1`` issues device_puts from a pool of threads while a
    reader thread preserves batch ORDER (futures are enqueued in iterator
    order; the consumer resolves them in order). Through the axon TPU
    relay a single transfer stream moves ~15-17 MB/s — the measured wall of
    every full-scale video-search epoch (benchmarks/h2d_probe.json) — and
    concurrent streams multiply aggregate H2D throughput; on a local
    PCIe-attached TPU the default single async stream is already optimal."""

    def _put(batch):
        try:
            if place is not None:
                return place(batch)
            if sharding is not None:
                return jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, sharding), batch)
            return jax.tree_util.tree_map(jax.device_put, batch)
        except Exception as e:
            if "RESOURCE_EXHAUSTED" in str(e):
                # R5HYB3 postmortem: an 8 GB train pool survived the whole
                # train phase, then the dev (arch-step) phase's first
                # streamed batches over-booked HBM — the bare device_put
                # error gave no lever to pull. Same hint as the loop's
                # preflight sync.
                raise RuntimeError(
                    "host->device staging of a streamed batch failed with "
                    "RESOURCE_EXHAUSTED: the device data cache/pool plus "
                    "this phase's step workspace over-book HBM. Lower "
                    "--device_cache_budget_gb or raise "
                    "BMNAS_CACHE_HEADROOM_GB (cli/common.clamp_cache_budget)"
                ) from e
            raise

    # plain function (no yield): dispatch returns the chosen generator —
    # a `return <gen>` inside a generator function would end iteration
    # immediately instead of delegating
    if put_threads > 1:
        return _device_prefetch_pooled(iterator, size, _put, put_threads)
    return _device_prefetch_single(iterator, size, _put)


def _device_prefetch_single(iterator, size, _put):
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


def _device_prefetch_pooled(iterator, size, put_fn, put_threads):
    """Order-preserving concurrent device_put pipeline.

    A reader thread walks the host iterator and submits each batch's put to
    a ThreadPoolExecutor, enqueuing the FUTURES in iterator order on a
    bounded queue (backpressure: at most ``max(size, put_threads)`` batches
    are staged host-side at once). The consumer resolves futures in order,
    so downstream sees exactly the single-threaded sequence while up to
    ``put_threads`` relay transfers proceed concurrently."""
    import concurrent.futures as cf
    import gc

    q: "queue.Queue" = queue.Queue(maxsize=max(size, put_threads))
    sentinel = object()
    stop = threading.Event()
    pool = cf.ThreadPoolExecutor(max_workers=put_threads)

    def _put_q(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def reader():
        try:
            for n, batch in enumerate(iterator):
                if not _put_q(pool.submit(put_fn, batch)):
                    return
                if (n + 1) % 8 == 0:
                    gc.collect()  # same relay-buffer-cycle hygiene as above
        except Exception as e:  # loader error -> surface on consumer side
            f: "cf.Future" = cf.Future()
            f.set_exception(e)
            _put_q(f)
        finally:
            _put_q(sentinel)

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                return
            yield item.result()
    finally:
        stop.set()
        pool.shutdown(wait=False, cancel_futures=True)


def device_put_chunked(arr, streams: int = 1, chunk_mb: int = None,
                       device=None):
    """Upload one large host array as concurrent chunk transfers.

    The --device_data_cache/frame-pool builds upload multi-GB split arrays
    with a single ``jax.device_put`` — one relay stream at ~15-17 MB/s
    (benchmarks/h2d_probe.json), ~7 min for the 7-8 GB video dev caches.
    With ``streams > 1`` the array is sliced into ``chunk_mb`` row blocks,
    ``streams`` of them transfer concurrently, and each is folded into a
    preallocated device buffer by a DONATED dynamic_update_slice (in-place
    on TPU), so peak HBM = result + streams*chunk — never 2x the split.

    ``streams <= 1`` or a small array degrades to plain device_put.
    """
    import concurrent.futures as cf

    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    if chunk_mb is None:
        chunk_mb = int(os.environ.get("BMNAS_H2D_CHUNK_MB", 128))
    if streams <= 1 or arr.nbytes <= (chunk_mb << 20) or arr.ndim == 0:
        return jax.device_put(arr, device)

    rows = max(1, int(len(arr) * (chunk_mb << 20) / arr.nbytes))
    starts = list(range(0, len(arr), rows))

    @functools.partial(jax.jit, donate_argnums=0)
    def fold(buf, chunk, start):
        zeros = (jnp.int32(0),) * (buf.ndim - 1)
        return jax.lax.dynamic_update_slice(
            buf, chunk, (start,) + zeros)

    buf = jnp.zeros(arr.shape, arr.dtype, device=device)

    def put(s):
        return jax.device_put(np.ascontiguousarray(arr[s:s + rows]), device)

    with cf.ThreadPoolExecutor(max_workers=streams) as pool:
        pending = []
        for s in starts:
            pending.append((s, pool.submit(put, s)))
            if len(pending) > streams:
                s0, f = pending.pop(0)
                buf = fold(buf, f.result(), jnp.int32(s0))
        for s0, f in pending:
            buf = fold(buf, f.result(), jnp.int32(s0))
    return buf
