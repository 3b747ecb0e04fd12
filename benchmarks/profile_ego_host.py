"""Host-side breakdown of one EgoGesture train sample (VERDICT r04 #3).

Ego full-scale search was 22.3 min/epoch steady against <1 min of device
compute per epoch (benchmarks/ego_fullscale_search.json): the wall is the
1-core host. This script splits the per-sample cost into JPEG decode vs
spatial transform vs everything else (temporal crop, stacking, python), and
projects host-only throughput — chip-free, so it runs anywhere the corpus
exists. Writes benchmarks/ego_host_profile.json.

Measured on the full-scale corpus (320x240 sources, 32-frame RGB-D clips):
decode ~27 ms (75%), transform ~3 ms, other ~6 ms -> 28 samples/s host-only
vs 562 samples/s device. Verdict: JPEG decode dominates; the fix is the
decode-once host RAM cache (data/ego.EgoDataset host_decode_cache_gb — the
unique-frame working set is ~47 GB vs 125 GB host RAM, and gestures share
video frames ~4x within one epoch). Reference pipeline being profiled:
datasets/ego.py:330-374 + nv_spatial_transforms.py:16-377.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--datadir", default="/root/ego_fullscale")
    ap.add_argument("--samples", type=int, default=24)
    ap.add_argument("--cache_gb", type=float, default=0.0,
                    help="also measure with the decode cache (second pass "
                         "= warm-cache rate)")
    args = ap.parse_args()

    from bmnas_tpu.data.ego import (
        EgoDataset,
        _depth_dir,
        _load_jpg,
        multiscale_random_crop,
    )

    ds = EgoDataset(args.datadir,
                    os.path.join(args.datadir, "annotation.json"),
                    "training", train_transform=True, num_workers=1,
                    host_decode_cache_gb=args.cache_gb)
    rng = np.random.RandomState(0)
    idxs = rng.randint(0, len(ds), args.samples)

    t0 = time.perf_counter()
    for i in idxs:
        ds.load_sample(int(i), int(i) * 7 + 1)
    t_full = (time.perf_counter() - t0) / len(idxs)

    t0 = time.perf_counter()
    for i in idxs:
        rec = ds.data[int(i)]
        dd = _depth_dir(rec["video"])
        for f in rec["frame_indices"][:ds.sample_duration]:
            _load_jpg(os.path.join(rec["video"], f"{f:06d}.jpg"), False)
            _load_jpg(os.path.join(dd, f"{f:06d}.jpg"), True)
    t_dec = (time.perf_counter() - t0) / len(idxs)

    rec = ds.data[int(idxs[-1])]
    dd = _depth_dir(rec["video"])
    f0 = rec["frame_indices"][0]
    rgb = _load_jpg(os.path.join(rec["video"], f"{f0:06d}.jpg"), False)
    dep = _load_jpg(os.path.join(dd, f"{f0:06d}.jpg"), True)
    t0 = time.perf_counter()
    for _ in range(ds.sample_duration * len(idxs)):
        multiscale_random_crop(rgb, 0.71, 0.3, 0.4, ds.sample_size)
        multiscale_random_crop(dep, 0.71, 0.3, 0.4, ds.sample_size)
    t_tr = (time.perf_counter() - t0) / len(idxs)

    out = {
        "per_sample_ms": {
            "full": round(t_full * 1e3, 1),
            "jpeg_decode": round(t_dec * 1e3, 1),
            "spatial_transform": round(t_tr * 1e3, 1),
            "other": round((t_full - t_dec - t_tr) * 1e3, 1),
        },
        "host_only_samples_per_sec": round(1 / t_full, 1),
        "n_samples": int(args.samples),
        "corpus": args.datadir,
    }
    if args.cache_gb > 0:
        t0 = time.perf_counter()
        for i in idxs:  # second pass: every frame now cache-resident
            ds.load_sample(int(i), int(i) * 11 + 3)
        t_warm = (time.perf_counter() - t0) / len(idxs)
        out["warm_cache_per_sample_ms"] = round(t_warm * 1e3, 1)
        out["warm_cache_samples_per_sec"] = round(1 / t_warm, 1)
        out["cache_stats"] = ds.decode_cache_stats()
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "ego_host_profile.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
