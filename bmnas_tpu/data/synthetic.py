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
                       hw: int = 48, frames: int = 12, seed: int = 0) -> str:
    """Tiny EgoGesture-layout dataset: JPEG frame dirs + annotation JSON
    (structure per datasets/ego.py:51-115). Returns (root, annotation_path)."""
    import json

    from PIL import Image

    rng = np.random.RandomState(seed)
    labels = [f"gesture{i}" for i in range(num_classes)]
    database = {}
    vid = 0
    for subset in ("training", "validation", "testing"):
        for _ in range(n_per_subset):
            subj = f"sub{vid:02d}"
            rgb_dir = os.path.join(root, subj, "scene1", "Color", "rgb1")
            depth_dir = os.path.join(root, subj, "scene1", "Depth", "depth1")
            os.makedirs(rgb_dir, exist_ok=True)
            os.makedirs(depth_dir, exist_ok=True)
            for f in range(1, frames + 1):
                arr = (rng.rand(hw, hw, 3) * 255).astype(np.uint8)
                Image.fromarray(arr).save(
                    os.path.join(rgb_dir, f"{f:06d}.jpg"))
                dep = (rng.rand(hw, hw) * 255).astype(np.uint8)
                Image.fromarray(dep, mode="L").save(
                    os.path.join(depth_dir, f"{f:06d}.jpg"))
            key = f"{subj}/scene1/Color/rgb1_{vid}"
            database[key] = {
                "subset": subset,
                "annotations": {"label": labels[rng.randint(num_classes)],
                                "start_frame": 1, "end_frame": frames},
            }
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
