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
    rec = {
        "wall_minutes": round(minutes, 1),
        "note": (f"measured end-to-end {epochs}-epoch NTU search on one "
                 f"chip, batch {batch}, 11376 train / 5688 dev samples "
                 "(8x256x256 uint8 clips + 32-frame skeletons), "
                 "--bf16_backbone --device_data_cache (dev split in HBM) "
                 "--steps_per_dispatch 8; includes cache build+upload and "
                 "compile"),
        "exp_dir": os.path.basename(exp_dir.rstrip("/")),
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ntu_fullscale_search.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main(sys.argv[1])
