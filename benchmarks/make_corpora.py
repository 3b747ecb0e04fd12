"""Regenerate the round-4 on-chip measurement corpora under /root.

The container holding the staged corpora was reset mid-round (see
ROUND4_STATUS.md); this script rebuilds them reproducibly so
``benchmarks/tpu_queue.sh`` stays turnkey:

* ``/root/ntu_poolfit`` — NTU search corpus sized so the train frame pool
  (2,400 clips x 8x256x256x3 uint8 = 3.77 GB) and the dev cache (1,200
  clips = 1.9 GB) fit ONE 16 GB chip together: 300 videos per search
  subject (train_exp 8 + dev 4, datasets/ntu.py:212-217 slicing), plus a
  100-clip test split so the search CLI's test stage loads.
* ``/root/ego_fullscale`` — EgoGesture-scale corpus: the real split sizes
  (14,416 train / 4,768 val gestures, main_darts_searchable_ego.py:39-67),
  320x240 source frames, ~12 gestures sharing each video's decoded frames
  like the real corpus. Runtime cost (JPEG decode + crop/resize + H2D) is
  what the measurement needs, so frames come from a 256-image pool of
  distinct low-frequency JPEGs HARDLINKED into the video dirs — identical
  loader work per frame, ~40x faster to generate on this 1-core host than
  encoding 307k unique JPEGs.

Each corpus gets a ``.ready`` marker the queue waits on.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ntu_poolfit(root="/root/ntu_poolfit"):
    from bmnas_tpu.data.synthetic import make_ntu_synthetic
    t0 = time.time()
    # Search subjects: train_exp (1,8,15,17,19,27,31,35) + dev (2,5,9,14).
    make_ntu_synthetic(root, n_videos_per_subject=300,
                       subjects=(1, 8, 15, 17, 19, 27, 31, 35, 2, 5, 9, 14),
                       num_actions=60, hw=256, frames=8, ske_frames=64,
                       seed=7)
    # Tiny test split (subjects from the test list) so stage loading works.
    make_ntu_synthetic(root, n_videos_per_subject=25,
                       subjects=(3, 6, 7, 10), num_actions=60,
                       hw=256, frames=8, ske_frames=64, seed=11)
    open(os.path.join(root, ".ready"), "w").close()
    print(f"ntu_poolfit done in {time.time() - t0:.0f}s", flush=True)


def ntu_fullscale(root="/root/ntu_fullscale"):
    """Reference-scale NTU search corpus: 1,422 clips per subject (the real
    corpus's density) -> 11,376 train_exp / 5,688 dev samples, 8x256x256
    uint8 clips + 64-frame skeletons (~27 GB on disk). This is the workload
    behind benchmarks/ntu_fullscale_search.json and the hybrid pool+stream
    measurement (VERDICT r04 #2)."""
    from bmnas_tpu.data.synthetic import make_ntu_synthetic
    t0 = time.time()
    make_ntu_synthetic(root, n_videos_per_subject=1422,
                       subjects=(1, 8, 15, 17, 19, 27, 31, 35, 2, 5, 9, 14),
                       num_actions=60, hw=256, frames=8, ske_frames=64,
                       seed=13)
    make_ntu_synthetic(root, n_videos_per_subject=25,
                       subjects=(3, 6, 7, 10), num_actions=60,
                       hw=256, frames=8, ske_frames=64, seed=17)
    open(os.path.join(root, ".ready"), "w").close()
    print(f"ntu_fullscale done in {time.time() - t0:.0f}s", flush=True)


def _frame_pool(root, n=256, wh=(320, 240), seed=3):
    """Distinct low-frequency JPEGs (same construction as
    bmnas_tpu.data.synthetic.make_ego_synthetic smooth=True)."""
    from PIL import Image
    rng = np.random.RandomState(seed)
    w, h = wh
    yy = np.linspace(0.0, 1.0, h, dtype=np.float32)[:, None]
    xx = np.linspace(0.0, 1.0, w, dtype=np.float32)[None, :]
    pool_dir = os.path.join(root, ".pool")
    os.makedirs(pool_dir, exist_ok=True)
    rgb, dep = [], []
    for i in range(n):
        a, b, c = rng.rand(3) * 4 + 1
        base = (np.sin(a * np.pi * xx + c)
                + np.cos(b * np.pi * yy)) * 0.25 + 0.5
        chans = [np.clip(base * s, 0, 1) for s in rng.rand(3) + 0.5]
        p = os.path.join(pool_dir, f"rgb{i:04d}.jpg")
        Image.fromarray((np.stack(chans, -1) * 255).astype(np.uint8)).save(p)
        rgb.append(p)
        p = os.path.join(pool_dir, f"dep{i:04d}.jpg")
        Image.fromarray((base * 255).astype(np.uint8), mode="L").save(p)
        dep.append(p)
    return rgb, dep


def ego_fullscale(root="/root/ego_fullscale", frames=32,
                  gestures_per_video=12, num_classes=83):
    t0 = time.time()
    counts = {"training": 14416, "validation": 4768, "testing": 8}
    rng = np.random.RandomState(0)
    rgb_pool, dep_pool = _frame_pool(root)
    npool = len(rgb_pool)
    labels = [f"gesture{i}" for i in range(num_classes)]
    database = {}
    vid = 0
    for subset in ("training", "validation", "testing"):
        todo = counts[subset]
        while todo > 0:
            g = min(gestures_per_video, todo)
            n_frames = frames if g == 1 else max(frames, g * frames // 4)
            subj = f"sub{vid:04d}"
            rgb_dir = os.path.join(root, subj, "scene1", "Color", "rgb1")
            depth_dir = os.path.join(root, subj, "scene1", "Depth", "depth1")
            os.makedirs(rgb_dir, exist_ok=True)
            os.makedirs(depth_dir, exist_ok=True)
            off = vid % npool
            for f in range(1, n_frames + 1):
                os.link(rgb_pool[(off + f) % npool],
                        os.path.join(rgb_dir, f"{f:06d}.jpg"))
                os.link(dep_pool[(off + f) % npool],
                        os.path.join(depth_dir, f"{f:06d}.jpg"))
            for k in range(g):
                start = (1 if n_frames == frames
                         else int(rng.randint(1, n_frames - frames + 2)))
                key = f"{subj}/scene1/Color/rgb1_{vid}_{k}"
                database[key] = {
                    "subset": subset,
                    "annotations": {
                        "label": labels[rng.randint(num_classes)],
                        "start_frame": start,
                        "end_frame": start + frames - 1},
                }
            todo -= g
            vid += 1
    with open(os.path.join(root, "annotation.json"), "w") as f:
        json.dump({"labels": labels, "database": database}, f)
    open(os.path.join(root, ".ready"), "w").close()
    print(f"ego_fullscale done in {time.time() - t0:.0f}s "
          f"({vid} videos)", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "ntu"):
        ntu_poolfit()
    if which in ("all", "ego"):
        ego_fullscale()
    if which in ("all", "ntu_fullscale"):
        ntu_fullscale()
