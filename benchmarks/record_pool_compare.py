"""Record the NTU train-frame-pool vs streaming comparison (VERDICT r03 #2):

    python benchmarks/record_pool_compare.py <pool_exp_dir> <stream_exp_dir>

Both experiments must be the same corpus/flags except the train-split frame
pool (the queue runs them with --device_cache_budget_gb 10 vs 2.5 so the dev
cache is identical and only the train path differs). Derives each run's
steady-state minutes-per-epoch from the log timestamps, checks the two runs
reached the same genotype (the pool is an execution-plan change, not a
semantic one — tests/test_e2e_ntu.py proves equality at small scale), and
writes benchmarks/ntu_pool_vs_stream.json, which bench.py folds into the
BENCH detail. Reference workload being scaled:
/root/reference/main_darts_searchable_ntu.py:38-59."""
import json
import os
import re
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.dirname(_HERE))  # repo root: bmnas_tpu imports
from record_search import steady_epoch_minutes  # noqa: E402


def describe(exp_dir):
    log = open(os.path.join(exp_dir, "log.txt")).read()
    rec = {"exp_dir": os.path.basename(exp_dir.rstrip("/")),
           "steady_minutes_per_epoch": steady_epoch_minutes(log)}
    m = re.search(r"Searching complete in (\d+)m (\d+)s", log)
    if m:
        rec["wall_minutes"] = round(int(m.group(1)) + int(m.group(2)) / 60, 1)
    m = re.search(r"device frame pool \[train\]: (\d+ samples[^\n]*)", log)
    rec["frame_pool"] = m.group(1) if m else "streaming"
    try:
        # NOT plain pickle.load: the pickles carry the reference's
        # models.search.darts.genotypes class paths, which only resolve
        # through the shim load_genotype registers (verified: plain load
        # raises ModuleNotFoundError and would silently drop the
        # same_genotype evidence)
        from bmnas_tpu.genotype import load_genotype
        rec["genotype"] = repr(load_genotype(
            os.path.join(exp_dir, "best", "best_genotype.pkl")))[:400]
    except Exception as e:
        rec["genotype_error"] = f"{type(e).__name__}: {e}"[:120]
    return rec


def main(pool_dir, stream_dir, out_dir=None):
    pool, stream = describe(pool_dir), describe(stream_dir)
    out = {"pool": pool, "stream": stream}
    p, s = pool["steady_minutes_per_epoch"], stream["steady_minutes_per_epoch"]
    if p and s:
        out["epoch_speedup"] = round(s / p, 2)
    if pool.get("genotype") and stream.get("genotype"):
        out["same_genotype"] = pool["genotype"] == stream["genotype"]
    out["note"] = ("NTU search, pool-fit corpus (2400 train / 1200 dev full-"
                   "shape samples): train decoded-frame pool resident in HBM "
                   "+ per-epoch on-device frame-index gather, vs the same "
                   "run streaming the train split each epoch")
    path = os.path.join(out_dir or os.path.dirname(os.path.abspath(__file__)),
                        "ntu_pool_vs_stream.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
