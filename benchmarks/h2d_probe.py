"""Measure effective host->device transfer throughput through the TPU relay.

The full-scale NTU search epoch wall is the train-split stream (~17.7 GB of
uint8 video per epoch; benchmarks/ntu_fullscale_search.json) moving at an
observed ~15 MB/s — 30x slower than the device step consumes it. This probe
isolates the H2D path and answers the questions that decide whether the
epoch wall is physics or protocol:

  1. single-stream throughput vs array size (is the relay RTT/chunk-bound?)
  2. does issuing K async device_puts back-to-back before syncing pipeline?
  3. do K PYTHON THREADS each device_put-ing concurrently scale aggregate
     throughput (separate relay streams vs one serialized channel)?

Sync protocol: ``jax.block_until_ready`` is a no-op through the axon relay
(README 'Measured performance' note), so each transfer is forced by a
device-side reduction fetched as one host scalar — the only reliable
barrier here. The reduction touches every byte, so a transfer cannot be
reported complete before all its bytes arrived.

Writes benchmarks/h2d_probe.json and prints one JSON line.
Run ONLY when no other TPU process holds the relay (one process at a time).
"""
import json
import os
import sys
import threading
import time

import numpy as np


def _sync(dev_arr):
    import jax.numpy as jnp
    return int(jnp.sum(dev_arr, dtype=jnp.int32))


def _mk(mb, seed):
    n = mb * (1 << 20)
    return np.random.RandomState(seed).randint(
        0, 255, size=(n,), dtype=np.uint8)


def serial(mb, reps):
    """One device_put at a time, scalar-synced after each."""
    import jax
    arrs = [_mk(mb, i) for i in range(reps)]
    t0 = time.monotonic()
    for a in arrs:
        _sync(jax.device_put(a))
    dt = time.monotonic() - t0
    return mb * reps / dt


def pipelined(mb, reps):
    """All device_puts issued async back-to-back, then synced."""
    import jax
    arrs = [_mk(mb, i) for i in range(reps)]
    t0 = time.monotonic()
    devs = [jax.device_put(a) for a in arrs]
    for d in devs:
        _sync(d)
    dt = time.monotonic() - t0
    return mb * reps / dt


def threaded(mb, reps, nthreads):
    """reps transfers spread over nthreads concurrent worker threads."""
    import jax
    arrs = [_mk(mb, i) for i in range(reps)]
    errs = []

    def worker(idx):
        try:
            for a in arrs[idx::nthreads]:
                _sync(jax.device_put(a))
        except Exception as e:  # pragma: no cover - surfaced below
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(nthreads)]
    t0 = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.monotonic() - t0
    if errs:
        raise errs[0]
    return mb * reps / dt


def main():
    import jax
    dev = jax.devices()[0]
    out = {"device": str(getattr(dev, "device_kind", dev.platform))}
    # warm the dispatch path + sum executable once
    _sync(jax.device_put(_mk(1, 0)))

    total_mb = int(os.environ.get("H2D_PROBE_MB", 384))  # per config
    for mb in (8, 32, 128):
        reps = max(2, total_mb // mb)
        out[f"serial_{mb}mb_MBps"] = round(serial(mb, reps), 1)
        out[f"pipelined_{mb}mb_MBps"] = round(pipelined(mb, reps), 1)
    mb = 32
    reps = max(2, total_mb // mb)
    for nt in (2, 4, 8):
        out[f"threads{nt}_{mb}mb_MBps"] = round(threaded(mb, reps, nt), 1)
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "h2d_probe.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
