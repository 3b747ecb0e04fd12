"""Synthetic dataset generators (mm-imdb / ntu / ego shaped).

The reference's de-facto integration-test mode is ``--small_dataset`` (64
samples, datasets/mmimdb.py:104-105). We go further: generate tiny synthetic
datasets on disk in the exact npy layout so the full CLI path (search ->
genotype.pkl -> found retrain) runs hermetically in CI (SURVEY.md §4).
"""
from __future__ import annotations

import os

import numpy as np

from bmnas_tpu.data.mmimdb import NUM_CLASSES, TEXT_DIM


def make_mmimdb_synthetic(root: str, n_per_stage: int = 8,
                          image_hw=(32, 32), seed: int = 0,
                          correlated: bool = False,
                          counts: dict = None) -> str:
    """``correlated=True`` makes label k a function of text block k's mean —
    a learnable rule, so end-to-end runs can demonstrate metric improvement
    rather than chance-level noise. ``counts`` overrides the per-stage sample
    count (e.g. the reference split sizes {'train': 15552, 'dev': 2608,
    'test': 7799}) for full-scale wall-clock runs."""
    rng = np.random.RandomState(seed)
    block = TEXT_DIM // NUM_CLASSES
    for stage in ("train", "dev", "test"):
        d = os.path.join(root, stage)
        os.makedirs(d, exist_ok=True)
        n_stage = counts.get(stage, n_per_stage) if counts else n_per_stage
        for i in range(n_stage):
            img = rng.randn(*image_hw, 3).astype(np.float32)
            txt = rng.randn(TEXT_DIM).astype(np.float32)
            if correlated:
                lab = (txt[:block * NUM_CLASSES].reshape(NUM_CLASSES, block)
                       .mean(axis=1) > 0).astype(np.float32)
            else:
                lab = (rng.rand(NUM_CLASSES) < 0.2).astype(np.float32)
            np.save(os.path.join(d, f"image_{i:06}.npy"), img)
            np.save(os.path.join(d, f"text_{i:06}.npy"), txt)
            np.save(os.path.join(d, f"label_{i:06}.npy"), lab)
    return root


def make_ego_synthetic(root: str, n_per_subset: int = 4, num_classes: int = 5,
                       hw: int = 48, frames: int = 12, seed: int = 0,
                       counts: dict = None, gestures_per_video: int = 1,
                       frame_wh: tuple = None, smooth: bool = False) -> str:
    """EgoGesture-layout dataset: JPEG frame dirs + annotation JSON
    (structure per datasets/ego.py:51-115). Returns the annotation path.

    Full-scale knobs (reference workload: main_darts_searchable_ego.py:39-67
    over the 24k-gesture corpus):
      * ``counts`` — per-subset sample counts, e.g. the real EgoGesture
        split {'training': 14416, 'validation': 4768, 'testing': 8};
      * ``gestures_per_video`` — pack G annotated gestures into one video
        dir of G*frames//4 frames with overlapping segments, mirroring the
        real corpus (~12 gestures/video share decoded frames) and dividing
        the on-disk frame count 4x;
      * ``frame_wh`` — source frame size, e.g. (320, 240) = the real
        corpus's resolution (the loader crops min(w,h)*scale then resizes);
      * ``smooth`` — low-frequency gradient images instead of noise: they
        JPEG-compress ~10x better (noise frames would need ~30 GB at full
        scale) and decode slightly faster than real frames."""
    import json

    from PIL import Image

    rng = np.random.RandomState(seed)
    labels = [f"gesture{i}" for i in range(num_classes)]
    database = {}
    w, h = frame_wh if frame_wh else (hw, hw)
    yy = np.linspace(0.0, 1.0, h, dtype=np.float32)[:, None]
    xx = np.linspace(0.0, 1.0, w, dtype=np.float32)[None, :]

    def frame_img(gray):
        if not smooth:
            shape = (h, w) if gray else (h, w, 3)
            return (rng.rand(*shape) * 255).astype(np.uint8)
        # cheap low-frequency pattern, distinct per draw
        a, b, c = rng.rand(3) * 4 + 1
        base = (np.sin(a * np.pi * xx + c) + np.cos(b * np.pi * yy)) * 0.25 + 0.5
        if gray:
            return (base * 255).astype(np.uint8)
        chans = [np.clip(base * s, 0, 1) for s in rng.rand(3) + 0.5]
        return (np.stack(chans, -1) * 255).astype(np.uint8)

    vid = 0
    for subset in ("training", "validation", "testing"):
        n_samples = counts.get(subset, n_per_subset) if counts else n_per_subset
        todo = n_samples
        while todo > 0:
            g = min(gestures_per_video, todo)
            n_frames = frames if g == 1 else max(frames, g * frames // 4)
            subj = f"sub{vid:04d}"
            rgb_dir = os.path.join(root, subj, "scene1", "Color", "rgb1")
            depth_dir = os.path.join(root, subj, "scene1", "Depth", "depth1")
            os.makedirs(rgb_dir, exist_ok=True)
            os.makedirs(depth_dir, exist_ok=True)
            for f in range(1, n_frames + 1):
                Image.fromarray(frame_img(False)).save(
                    os.path.join(rgb_dir, f"{f:06d}.jpg"))
                Image.fromarray(frame_img(True), mode="L").save(
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
    ann_path = os.path.join(root, "annotation.json")
    with open(ann_path, "w") as f:
        json.dump({"labels": labels, "database": database}, f)
    return ann_path


def _write_skeleton_file(path: str, num_frames: int, rng) -> None:
    """Minimal NTU .skeleton text format (datasets/ntu.py:38-78 parser)."""
    lines = [str(num_frames)]
    for _ in range(num_frames):
        lines.append("2")                      # persons
        for _p in range(2):
            lines.append("0 0 0 0 0 0 0 0 0 2")  # body info line
            lines.append("25")                    # joint count line
            for _j in range(25):
                xyz = rng.randn(3) * 0.1
                lines.append(" ".join(f"{v:.4f}" for v in xyz) + " 0 0 0 0 0 0 0 2")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def make_ntu_synthetic(root: str, n_videos_per_subject: int = 1,
                       subjects=(1, 2, 3, 8, 5, 6), num_actions: int = 6,
                       hw: int = 32, frames: int = 70, seed: int = 0,
                       ske_frames: int = None) -> str:
    """NTU-layout dataset: ``*_rgb.npy`` clips + .skeleton text files,
    filenames following S###C###P###R###A### so the subject/label slicing
    (datasets/ntu.py:212-217) applies.

    Scales to reference-sized splits (~1,422 clips/subject): the R field is
    3 digits, so clips past 900 per subject roll into higher camera numbers
    (C002, C003, ...), exactly like the real corpus's multi-camera naming.
    ``ske_frames`` decouples skeleton length from clip length (full-scale
    runs use 8-frame clips + >=64-frame skeletons so AugCrop's 64-frame
    minimum, datasets/ntu.py:139-162, stays exercised)."""
    rng = np.random.RandomState(seed)
    ske_frames = frames if ske_frames is None else ske_frames
    rgb_dir = os.path.join(root, "nturgb+d_rgb_256x256_30")
    ske_dir = os.path.join(root, "nturgb+d_skeletons")
    os.makedirs(rgb_dir, exist_ok=True)
    os.makedirs(ske_dir, exist_ok=True)
    for subj in subjects:
        for r in range(n_videos_per_subject):
            action = rng.randint(1, num_actions + 1)
            name = (f"S001C{1 + r // 900:03d}P{subj:03d}"
                    f"R{(r % 900) + 1:03d}A{action:03d}")
            clip = rng.randint(0, 256, (frames, hw, hw, 3), dtype=np.uint8)
            np.save(os.path.join(rgb_dir, name + "_rgb.npy"), clip)
            _write_skeleton_file(os.path.join(ske_dir, name + ".skeleton"),
                                 ske_frames, rng)
    return root
