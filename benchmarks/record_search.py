"""Write benchmarks/<task>_fullscale_search.json from a finished full-scale
search experiment dir: ``python benchmarks/record_search.py <exp_dir>``
(task is inferred from the exp path, or forced with --task {ntu,ego}).

Reads the experiment's log.txt for the 'Searching complete' line and the args
line, derives the flag set and the steady-state per-epoch wall from the
inter-'Epoch: N' log gaps (epoch 0 carries compile + data-index build).
bench.py folds the record into the BENCH detail (recorded_search)."""
import datetime
import json
import os
import re
import sys

WORKLOADS = {
    # split-size notes for the measured synthetic corpora (reference scales:
    # main_darts_searchable_ntu.py:38-59, main_darts_searchable_ego.py:39-67)
    "ntu": "11376 train / 5688 dev samples (8x256x256 uint8 clips + "
           "32-frame skeletons)",
    "ego": "EgoGesture-scale train/val subsets (32x112x112 uint8 RGB + "
           "depth clips, per-clip NV transforms on host)",
}


def steady_epoch_minutes(log):
    """Mean wall minutes per epoch from the inter-'Epoch: N' log-timestamp
    gaps, skipping the first gap (epoch 0 carries compile + data-index build
    + cache/pool upload)."""
    times = [t for t, _ in re.findall(
        r"(\d+/\d+ \d+:\d+:\d+ [AP]M) (Epoch: \d+|Searching complete)", log)]
    if len(times) < 3:
        return None
    stamps = [datetime.datetime.strptime("2026/" + t, "2026/%m/%d %I:%M:%S %p")
              for t in times]
    gaps = [(b - a).total_seconds() / 60.0
            for a, b in zip(stamps[1:-1], stamps[2:])]
    return round(sum(gaps) / len(gaps), 1)


def main(exp_dir, task=None, out_dir=None):
    if task is None:
        for t in WORKLOADS:
            if f"/{t}/" in exp_dir or f"exp/{t}" in exp_dir:
                task = t
                break
    if task not in WORKLOADS:
        raise SystemExit(f"cannot infer task from {exp_dir}; pass --task")
    log = open(os.path.join(exp_dir, "log.txt")).read()
    m = re.search(r"Searching complete in (\d+)m (\d+)s", log)
    if not m:
        raise SystemExit("no 'Searching complete' line yet in " + exp_dir)
    minutes = int(m.group(1)) + int(m.group(2)) / 60.0
    args_m = re.search(r"args = Namespace\((.*)\)", log)
    epochs = re.search(r"epochs=(\d+)", args_m.group(1)).group(1)
    batch = re.search(r"batchsize=(\d+)", args_m.group(1)).group(1)
    flags = []
    if "bf16_backbone=True" in args_m.group(1):
        flags.append("--bf16_backbone")
    if "device_data_cache=True" in args_m.group(1):
        flags.append("--device_data_cache")
        budget = re.search(r"device_cache_budget_gb=([\d.]+)", args_m.group(1))
        if budget:
            flags.append(f"--device_cache_budget_gb {budget.group(1)}")
    cache_gb = re.search(r"host_decode_cache_gb=([\d.]+)", args_m.group(1))
    if cache_gb and float(cache_gb.group(1)) > 0:
        flags.append(f"--host_decode_cache_gb {cache_gb.group(1)}")
    spd = re.search(r"steps_per_dispatch=(\d+)", args_m.group(1)).group(1)
    if spd != "1":
        flags.append(f"--steps_per_dispatch {spd}")
    per_epoch = steady_epoch_minutes(log)
    rec = {
        "wall_minutes": round(minutes, 1),
        "epochs": int(epochs),
        "steady_state_minutes_per_epoch": per_epoch,
        "note": (f"measured end-to-end {epochs}-epoch {task} search on one "
                 f"chip, batch {batch}, {WORKLOADS[task]}, "
                 + " ".join(flags) +
                 "; wall includes data-index build and compile"),
        "exp_dir": os.path.basename(exp_dir.rstrip("/")),
    }
    out = os.path.join(out_dir or os.path.dirname(os.path.abspath(__file__)),
                       f"{task}_fullscale_search.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))
    return rec


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("exp_dir")
    p.add_argument("--task", choices=sorted(WORKLOADS), default=None)
    a = p.parse_args()
    main(a.exp_dir, a.task)
