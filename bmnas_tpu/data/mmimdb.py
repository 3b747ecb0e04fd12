"""MM-IMDB dataset: per-sample .npy triples -> static-shape device batches.

Rebuild of ``datasets/mmimdb.py:83-135`` (directory layout
``<root>/<stage>/{image,text,label}_{idx:06}.npy``, hardcoded split sizes
train=15552 / dev=2608 / test=7799, ``small_dataset`` -> 64) and of
``datasets/prepare_mmimdb.py`` (hdf5 -> npy splitter, see prepare()).

TPU-first differences from the reference's DataLoader:
  * all batches have STATIC shapes — the final partial batch is zero-padded
    to the batch size and carries a ``mask`` row-validity vector (XLA
    recompiles on shape changes; the reference's dynamic last batch would
    force one extra compile per epoch per split);
  * images are normalized to NHWC float32 on the host;
  * file reads are fanned out over a thread pool (numpy .npy reads release
    the GIL) — the role of the reference's 32 DataLoader workers.
"""
from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np

SPLIT_SIZES = {"train": 15552, "dev": 2608, "test": 7799}
SMALL_SIZE = 64  # --small_dataset (datasets/mmimdb.py:104-105)
NUM_CLASSES = 23
TEXT_DIM = 300


class MMIMDBDataset:
    def __init__(self, root_dir: str, stage: str, small_dataset: bool = False,
                 num_workers: int = 8, length: Optional[int] = None,
                 use_native: Optional[bool] = None):
        assert stage in SPLIT_SIZES, stage
        self.root_dir = root_dir
        self.stage = stage
        self.len_data = length if length is not None else (
            SMALL_SIZE if small_dataset else SPLIT_SIZES[stage])
        # clamp to the files actually present (synthetic/partial datasets)
        d = os.path.join(root_dir, stage)
        if os.path.isdir(d):
            available = len([f for f in os.listdir(d) if f.startswith("label_")])
            if 0 < available < self.len_data:
                self.len_data = available
        self._pool = ThreadPoolExecutor(max_workers=max(1, num_workers))
        # native C++ batch loader (bmnas_tpu/native): uniform-shape float32
        # npy fast path; auto-detected unless explicitly disabled.
        self._native = None
        self._shapes = None
        if use_native is not False:
            try:
                from bmnas_tpu.native import NativeNpyLoader, native_available
                if native_available():
                    self._native = NativeNpyLoader(num_threads=num_workers)
            except Exception:
                self._native = None

    def _probe_shapes(self):
        if self._shapes is None:
            s = self.load_sample(0)
            ip, _, _ = self._paths(0)
            raw_image = np.load(ip)
            self._shapes = {
                "raw_image": raw_image.shape,
                "image": s["image"].shape,
                "label": s["label"].shape,
                "needs_transpose": raw_image.shape != s["image"].shape,
                "raw_dtype_ok": raw_image.dtype == np.float32,
            }
        return self._shapes

    def __len__(self) -> int:
        return self.len_data

    def _paths(self, idx: int):
        d = os.path.join(self.root_dir, self.stage)
        return (os.path.join(d, f"image_{idx:06}.npy"),
                os.path.join(d, f"text_{idx:06}.npy"),
                os.path.join(d, f"label_{idx:06}.npy"))

    def load_sample(self, idx: int) -> Dict[str, np.ndarray]:
        ip, tp, lp = self._paths(idx)
        image = np.load(ip).astype(np.float32)
        text = np.load(tp).astype(np.float32)
        label = np.load(lp).astype(np.float32)
        # normalize image layout to HWC
        if image.ndim == 3 and image.shape[0] in (1, 3) and image.shape[-1] not in (1, 3):
            image = np.transpose(image, (1, 2, 0))
        # text: reference data is a flat (300,) feature vector; a (T,300)
        # word-vector sequence (the shape the reference's collate_imdb pads,
        # datasets/mmimdb.py:138-169) is mean-pooled over T — never silently
        # truncated to the first word.
        if text.ndim == 2 and text.shape[-1] == TEXT_DIM:
            text = text.mean(axis=0)
        else:
            text = text.reshape(-1)
            if text.shape[0] != TEXT_DIM:
                raise ValueError(
                    f"text_{idx:06}.npy has {text.shape[0]} features; "
                    f"expected {TEXT_DIM} (flat) or (T,{TEXT_DIM}) sequence")
        return {"image": image, "text": text, "label": label}

    def batches(self, batch_size: int, shuffle: bool, seed: int = 0,
                pad_to_full: bool = True) -> Iterator[Dict[str, np.ndarray]]:
        """Yield host batches with a 'mask' validity vector."""
        order = np.arange(self.len_data)
        if shuffle:
            np.random.RandomState(seed % (2**32)).shuffle(order)
        native = self._native
        shapes = self._probe_shapes() if native is not None else None
        if shapes is not None and not shapes["raw_dtype_ok"]:
            native = None  # non-f32 on disk: numpy path casts

        for start in range(0, self.len_data, batch_size):
            idxs = order[start:start + batch_size]
            n = len(idxs)
            b = batch_size if pad_to_full else n
            if native is not None:
                try:
                    paths = [self._paths(i) for i in idxs]
                    raw = native.load_batch([p[0] for p in paths],
                                            shapes["raw_image"])
                    if shapes["needs_transpose"]:
                        raw = np.transpose(raw, (0, 2, 3, 1))
                    image = np.zeros((b,) + shapes["image"], np.float32)
                    image[:n] = raw
                    text = np.zeros((b, TEXT_DIM), np.float32)
                    text[:n] = native.load_batch(
                        [p[1] for p in paths], (TEXT_DIM,))
                    label = np.zeros((b,) + shapes["label"], np.float32)
                    label[:n] = native.load_batch(
                        [p[2] for p in paths], shapes["label"])
                    mask = np.zeros((b,), np.float32)
                    mask[:n] = 1.0
                    yield {"image": image, "text": text, "label": label,
                           "mask": mask}
                    continue
                except (IOError, AssertionError):
                    native = None  # fall back for the rest of the epoch
            samples = list(self._pool.map(self.load_sample, idxs))
            image = np.zeros((b,) + samples[0]["image"].shape, np.float32)
            text = np.zeros((b, TEXT_DIM), np.float32)
            label = np.zeros((b,) + samples[0]["label"].shape, np.float32)
            mask = np.zeros((b,), np.float32)
            for i, s in enumerate(samples):
                image[i] = s["image"]
                text[i] = s["text"]
                label[i] = s["label"]
                mask[i] = 1.0
            yield {"image": image, "text": text, "label": label, "mask": mask}

    def num_batches(self, batch_size: int) -> int:
        return -(-self.len_data // batch_size)


def prepare(hdf5_path: str, split_json: str, out_dir: str) -> None:
    """hdf5 -> per-sample npy splitter (datasets/prepare_mmimdb.py:8-59).

    ``split_json`` maps stage -> list of imdb ids; the hdf5 carries keys
    ``imdb_ids/images/features/genres``.
    """
    import json

    import h5py

    with open(split_json) as f:
        split = json.load(f)
    with h5py.File(hdf5_path, "r") as h:
        ids = [i.decode() if isinstance(i, bytes) else str(i) for i in h["imdb_ids"][:]]
        id_to_idx = {v: i for i, v in enumerate(ids)}
        for stage, id_list in split.items():
            d = os.path.join(out_dir, stage)
            os.makedirs(d, exist_ok=True)
            for out_idx, imdb_id in enumerate(id_list):
                src = id_to_idx[imdb_id]
                np.save(os.path.join(d, f"image_{out_idx:06}.npy"), h["images"][src])
                np.save(os.path.join(d, f"text_{out_idx:06}.npy"), h["features"][src])
                np.save(os.path.join(d, f"label_{out_idx:06}.npy"), h["genres"][src])
