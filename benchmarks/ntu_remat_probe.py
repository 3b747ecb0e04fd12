#!/usr/bin/env python
"""On-chip probe: does the NTU found-phase step even need remat at batch 48?

The published config (bench.measure_ntu_found, README) is batch 48 +
block-level remat + bf16 backbone — chosen in round 2 because batch 96
OOMs one 16 GB chip. Block remat recomputes every Bottleneck3D forward in
the backward pass (~+33% of forward FLOPs; benchmarks/ROOFLINE.md puts the
step's compute floor at 209 ms *including* that recompute), but whether
batch 48 *without* remat fits a single chip was never measured. If it
fits, the no-remat step should shave roughly the recompute fraction off
the 480 ms step.

Tries remat=False at batch 48, falls back to batch 32 on OOM, and
re-measures the remat=True baseline in the same process so the comparison
shares relay conditions. Prints ONE JSON line; tpu_queue.sh runs it after
the grouped-conv probe and bench.py's ntu_found_note can then cite the
faster supported config.

Reference workload: main_darts_found_ntu.py:122-139 (whole-net training,
inflated-3D ResNet-50 + HCN).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def try_measure(batch, remat, iters=40, warm=6):
    try:
        sps, t_step, flops, spread = bench.measure_ntu_found(
            batch=batch, iters=iters, warm=warm, remat=remat)
        return {"samples_per_sec": round(sps, 2),
                "step_ms": round(t_step * 1e3, 2),
                "step_ms_range": [round(t * 1e3, 2) for t in spread],
                "mfu": bench.mfu(flops, t_step),
                "achieved_tflops": bench.achieved_tflops(flops, t_step)}
    except Exception as e:  # RESOURCE_EXHAUSTED lands here
        return {"error": f"{type(e).__name__}: {e}"[:300]}


def main():
    bench.devices_or_die()
    out = {"metric": "ntu_found_remat_probe", "unit": "samples/s"}
    for name, batch, remat in (("noremat_b48", 48, False),
                               ("noremat_b32", 32, False),
                               ("remat_b48", 48, True)):
        if name == "noremat_b32" and "error" not in out.get(
                "noremat_b48", {"error": ""}):
            continue  # b48 fit; skip the fallback
        out[name] = try_measure(batch, remat)
    best_noremat = out.get("noremat_b48", out.get("noremat_b32", {}))
    base = out.get("remat_b48", {})
    if "samples_per_sec" in best_noremat and "samples_per_sec" in base:
        out["noremat_speedup"] = round(
            best_noremat["samples_per_sec"] / base["samples_per_sec"], 3)
    print(json.dumps(out))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "ntu_remat_probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
