"""NTU RGB+D preprocessing: rescale raw videos to 256x256@30fps.

Rebuild of ``datasets/prepare_ntu.py:11-113`` (ffmpeg rescale + id->length
pickle) using OpenCV so no external ffmpeg binary is required. Output layout
matches what :class:`bmnas_tpu.data.ntu.NTUDataset` consumes:
``<out>/nturgb+d_rgb_256x256_30/<name>_rgb.avi``.
"""
from __future__ import annotations

import os
import pickle
from concurrent.futures import ThreadPoolExecutor
from typing import Optional


def rescale_video(src: str, dst: str, dim: int = 256, fps: int = 30) -> int:
    """Rescale one video; returns its frame count."""
    import cv2
    cap = cv2.VideoCapture(src)
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    fourcc = cv2.VideoWriter_fourcc(*"MJPG")
    out = cv2.VideoWriter(dst, fourcc, fps, (dim, dim))
    while True:
        ret, frame = cap.read()
        if not ret:
            break
        out.write(cv2.resize(frame, (dim, dim), interpolation=cv2.INTER_AREA))
    cap.release()
    out.release()
    return n


def prepare(raw_rgb_dir: str, out_dir: str, dim: int = 256, fps: int = 30,
            num_workers: int = 8, limit: Optional[int] = None) -> str:
    """Rescale all ``*_rgb.avi`` under ``raw_rgb_dir`` and write the
    id->length pickle (reference: prepare_ntu.py:95-113)."""
    dst_dir = os.path.join(out_dir, f"nturgb+d_rgb_{dim}x{dim}_{fps}")
    os.makedirs(dst_dir, exist_ok=True)
    files = sorted(f for f in os.listdir(raw_rgb_dir) if f.endswith("_rgb.avi"))
    if limit:
        files = files[:limit]
    lengths = {}

    def work(f):
        n = rescale_video(os.path.join(raw_rgb_dir, f),
                          os.path.join(dst_dir, f), dim, fps)
        return f[:-8], n  # strip '_rgb.avi'

    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        for vid, n in pool.map(work, files):
            lengths[vid] = n

    with open(os.path.join(out_dir, "video_lengths.pkl"), "wb") as fh:
        pickle.dump(lengths, fh)
    return dst_dir


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser(description="NTU video preprocessing")
    p.add_argument("--raw", required=True, help="dir of raw *_rgb.avi files")
    p.add_argument("--out", required=True, help="output dataset root")
    p.add_argument("--dim", type=int, default=256)
    p.add_argument("--fps", type=int, default=30)
    p.add_argument("--j", type=int, default=8)
    a = p.parse_args()
    print(prepare(a.raw, a.out, a.dim, a.fps, a.j))
