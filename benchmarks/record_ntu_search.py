"""Write benchmarks/ntu_fullscale_search.json from a finished full-scale
NTU search experiment dir (reads its log.txt for the 'Searching complete'
line and the args line). bench.py folds the record into BENCH detail."""
import json
import os
import re
import sys


def main(exp_dir):
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
    spd = re.search(r"steps_per_dispatch=(\d+)", args_m.group(1)).group(1)
    if spd != "1":
        flags.append(f"--steps_per_dispatch {spd}")
    # steady-state per-epoch wall from the inter-'Epoch: N' log gaps
    # (epoch 0 carries compile + data-index build)
    times = [t for t, _ in re.findall(
        r"(\d+/\d+ \d+:\d+:\d+ [AP]M) (Epoch: \d+|Searching complete)", log)]
    per_epoch = None
    if len(times) >= 3:
        import datetime
        stamps = [datetime.datetime.strptime("2026/" + t,
                                             "2026/%m/%d %I:%M:%S %p")
                  for t in times]
        gaps = [(b - a).total_seconds() / 60.0
                for a, b in zip(stamps[1:-1], stamps[2:])]
        per_epoch = round(sum(gaps) / len(gaps), 1)
    rec = {
        "wall_minutes": round(minutes, 1),
        "epochs": int(epochs),
        "steady_state_minutes_per_epoch": per_epoch,
        "note": (f"measured end-to-end {epochs}-epoch NTU search on one "
                 f"chip, batch {batch}, 11376 train / 5688 dev samples "
                 "(8x256x256 uint8 clips + 32-frame skeletons), "
                 + " ".join(flags) +
                 "; wall includes data-index build and compile"),
        "exp_dir": os.path.basename(exp_dir.rstrip("/")),
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ntu_fullscale_search.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main(sys.argv[1])
