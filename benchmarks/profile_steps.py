#!/usr/bin/env python
"""Capture an on-device profile of the hot search/found steps and print the
top time-sink ops: ``python benchmarks/profile_steps.py {ego_search,
ntu_found,mmimdb_search} [--steps N] [--out DIR]``.

Drives the same step builders bench.py measures (so the trace matches the
published numbers), wraps a steady-state chain in jax.profiler.trace, then
converts the xplane capture with tensorboard_plugin_profile and prints the
top-15 self-time HLO ops — the evidence base for MFU work (VERDICT r03 #4:
where do the missing 70-83% of the roof go?)."""
import argparse
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def run_workload(name, steps):
    import jax

    import bench

    if name == "mmimdb_search":
        # reuse bench's builder via measure()'s internals is awkward; the
        # bisect script's builder is the same step at the same scale
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from bisect_bf16 import build
        fns, state = build(frozen=True)
        batches = [bench.make_batch(i) for i in range(2)]
        eta = np.float32(1e-3)
        step = lambda s, i: fns.weight_step(s, batches[i % 2], eta)  # noqa: E731
    elif name == "ntu_found":
        sps, t_step, *_ = bench.measure_ntu_found(iters=2, warm=2)
        print(f"# warmup measure: {sps:.1f} samples/s")
        # re-enter with a fresh chain for the traced portion
        return run_traced_ntu(steps)
    elif name == "ego_search":
        sps, t_step, *_ = bench.measure_ego_search(iters=2, warm=2)
        print(f"# warmup measure: {sps:.1f} samples/s")
        return run_traced_ego(steps)
    else:
        raise SystemExit(f"unknown workload {name}")
    # mmimdb path: warm then trace
    s = state
    for i in range(10):
        s, c = step(s, i)
    float(c["loss_sum"])
    return lambda out: _trace_chain(out, step, s, steps)


def _trace_chain(out, step, s, steps):
    import jax
    with jax.profiler.trace(out):
        for i in range(steps):
            s, c = step(s, i)
        float(c["loss_sum"])


def run_traced_ntu(steps):
    import bench
    return _generic_traced(bench.measure_ntu_found, steps)


def run_traced_ego(steps):
    import bench
    return _generic_traced(bench.measure_ego_search, steps)


def _generic_traced(measure_fn, steps):
    """bench's measure_* functions own their state; re-run them inside the
    trace window with iters=steps (warm handled by the pre-call above, but
    the fresh call recompiles from cache so only the timed chain lands in
    the trace)."""
    import jax

    def go(out):
        with jax.profiler.trace(out):
            measure_fn(iters=steps, warm=2)
    return go


def top_ops(profile_dir, k=15):
    """Parse the xplane capture directly (the baked tensorboard_plugin_profile
    2.13 converter is incompatible with TF 2.20's pywrap) and return the
    top-k ops by total duration per device plane:
    {plane: [{"name", "total_ms", "count"}, ...]}."""
    xs = sorted(glob.glob(os.path.join(profile_dir, "**", "*.xplane.pb"),
                          recursive=True))
    if not xs:
        return None, ("no xplane.pb captured (relay may not export device "
                      "traces)")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    space = xplane_pb2.XSpace()
    with open(xs[-1], "rb") as f:
        space.ParseFromString(f.read())
    device_planes = [p for p in space.planes
                     if "TPU" in p.name or "/device" in p.name.lower()
                     or "XLA" in p.name]
    if not device_planes:
        # CPU-mode fallback (validation without the chip): the host compute
        # plane carries the op events instead
        device_planes = [p for p in space.planes if p.name == "/host:CPU"]
    out = {}
    for plane in device_planes:
        pname = plane.name
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        agg = {}
        for line in plane.lines:
            if line.name and "step" in line.name.lower():
                continue  # step-markers double-count their ops
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                tot, cnt = agg.get(name, (0, 0))
                agg[name] = (tot + ev.duration_ps, cnt + 1)
        rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:k]
        if rows:
            out[pname] = [{"name": n[:120],
                           "total_ms": round(t / 1e9, 3),
                           "count": c} for n, (t, c) in rows]
    if not out:
        return None, "no device planes in capture"
    return out, None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workload",
                    choices=["ego_search", "ntu_found", "mmimdb_search"])
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = args.out or f"/tmp/profile_{args.workload}_{int(time.time())}"
    os.makedirs(out, exist_ok=True)
    go = run_workload(args.workload, args.steps)
    go(out)
    print(f"# trace written to {out}")
    rows, err = top_ops(out)
    if err:
        print(f"# analysis: {err}")
    else:
        print(json.dumps(rows if isinstance(rows, list) else str(rows)[:4000],
                         default=str)[:6000])


if __name__ == "__main__":
    main()
