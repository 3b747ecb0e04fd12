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
                          image_hw=(32, 32), seed: int = 0) -> str:
    rng = np.random.RandomState(seed)
    for stage in ("train", "dev", "test"):
        d = os.path.join(root, stage)
        os.makedirs(d, exist_ok=True)
        for i in range(n_per_stage):
            img = rng.randn(*image_hw, 3).astype(np.float32)
            txt = rng.randn(TEXT_DIM).astype(np.float32)
            lab = (rng.rand(NUM_CLASSES) < 0.2).astype(np.float32)
            np.save(os.path.join(d, f"image_{i:06}.npy"), img)
            np.save(os.path.join(d, f"text_{i:06}.npy"), txt)
            np.save(os.path.join(d, f"label_{i:06}.npy"), lab)
    return root
