"""NTU RGB+D dataset: video + skeleton -> static-shape device batches.

Rebuild of ``datasets/ntu.py``: subject-ID splits encoded in filename chars
[9:12] (train 16 / train_val 20 / train_exp 8 / test 20 / dev 4 subjects,
:179-188), label = chars [17:20] - 1 (:216,268), cv2 uniform frame sampling
(:12-30), text skeleton parsing to (3, T, 25, 2) (:38-78), normalization
(RGB /255 + ImageNet mean/std; skeleton centered on joint 2 of person 0,
:274-289), temporal transforms AugCrop/NormalizeLen/CenterCrop (:89-162).

Layout: batches carry rgb (B, 8, H, W, 3) — **uint8** by default, normalized
on device inside the model (models/ntu.normalize_uint8_clip; 4x less
host->device traffic than shipping fp32) — and skeleton (B, 32, 25, 2, 3)
fp32 channels-last plus a 'mask' validity vector (static shapes for XLA).
Videos stored as ``*_rgb.npy`` arrays are also accepted (the reference has
the same fallback, :32-35) — used by the synthetic test fixtures; float npy
sources keep the legacy host-side normalization.
"""
from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

SUBJECTS = {
    "train": [1, 4, 8, 13, 15, 16, 17, 18, 19, 25, 27, 28, 31, 34, 35, 38],
    "train_val": [1, 2, 4, 5, 8, 9, 13, 14, 15, 16, 17, 18, 19, 25, 27, 28,
                  31, 34, 35, 38],
    "train_exp": [1, 8, 15, 17, 19, 27, 31, 35],
    "test": [3, 6, 7, 10, 11, 12, 20, 21, 22, 23, 24, 26, 29, 30, 32, 33, 36,
             37, 39, 40],
    "dev": [2, 5, 9, 14],
}

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def load_video(path: str, vid_len: int = 24) -> np.ndarray:
    """Decode + uniform vid_len frame sample. Returns (vid_len, H, W, 3)
    uint8 (BGR) — pixel bytes stay uint8 all the way to the device, where the
    model normalizes them (4x less host->device traffic than fp32).

    Sampling contract matches ``datasets/ntu.py:12-30`` exactly: indices from
    ``linspace(0, N, vid_len)``; index N never lands (its slot stays zero),
    duplicate indices (short videos) collapse to one slot each. Unlike the
    reference's read-every-frame loop, frames outside the sample set are only
    ``grab()``-ed (no color conversion/copy) and decoding stops after the
    last sampled index."""
    if path.endswith(".npy"):
        arr = np.load(path)
        # float fixtures stay float (already-normalized or raw-valued data)
        return arr if arr.dtype == np.uint8 else arr.astype(np.float32)
    import cv2
    cap = cv2.VideoCapture(path)
    num_frames = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    width = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    height = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    video = np.zeros((vid_len, height, width, 3), np.uint8)
    taken = np.unique(np.linspace(0, num_frames, vid_len).astype(int))
    taken = taken[taken < num_frames]
    slot = 0
    for fr_idx in range(int(taken[-1]) + 1 if len(taken) else 0):
        if not cap.grab():
            break
        if fr_idx == taken[slot]:
            ret, frame = cap.retrieve()
            if not ret:
                break
            video[slot] = frame
            slot += 1
    cap.release()
    return video


def get_3d_skeleton(path: str) -> np.ndarray:
    """Parse the NTU text skeleton format -> (3, T, 25, 2)
    (datasets/ntu.py:38-78)."""
    with open(path) as f:
        content = [c.strip() for c in f.readlines()]
    num_frames = int(content[0])
    xyz = np.zeros((3, num_frames, 25, 2), np.float32)
    i = 1
    for t in range(num_frames):
        nb_person = int(content[i])
        for p in range(nb_person):
            i += 2
            for j in range(25):
                i += 1
                vals = [float(c) for c in content[i].split(" ")]
                if p < 2:
                    xyz[:, t, j, p] = vals[:3]
        i += 1
    return np.nan_to_num(xyz)


def _linear_interp_T(data: np.ndarray, out_len: int) -> np.ndarray:
    """Bilinear re-interpolation along T with half-pixel centers
    (align_corners=False), matching ``interpole`` (datasets/ntu.py:109-116).
    data: (C, T, V, M) -> (C, out_len, V, M)."""
    T = data.shape[1]
    src = (np.arange(out_len) + 0.5) * T / out_len - 0.5
    src = np.clip(src, 0, T - 1)
    lo = np.floor(src).astype(int)
    hi = np.minimum(lo + 1, T - 1)
    w = (src - lo).astype(np.float32)
    return (data[:, lo] * (1 - w)[None, :, None, None]
            + data[:, hi] * w[None, :, None, None])


def aug_crop_select(n_rgb: int, ske: np.ndarray, rng: np.random.RandomState,
                    p_interval: float = 0.5) -> Tuple[np.ndarray, np.ndarray]:
    """``aug_crop`` with the video half expressed as pure FRAME SELECTION:
    returns the indices (into the n_rgb decoded frames) the crop keeps,
    instead of the cropped pixels. Identical rng draw order to aug_crop
    (video ratio first, then the skeleton crop — datasets/ntu.py:139-162),
    so a caller holding only a frame *pool* reproduces the streamed
    augmentation bit for bit (--device_data_cache train pool)."""
    ratio = 1.0 - p_interval * rng.rand()
    if n_rgb > 0:
        begin = (n_rgb - int(n_rgb * ratio)) // 2
        rgb_idx = np.arange(begin, n_rgb - begin)
    else:
        rgb_idx = np.arange(0)
    if ske.ndim > 1:
        valid = ske.shape[1]
        p = float(rng.rand(1)[0]) * (1.0 - p_interval) + p_interval
        cropped = int(np.minimum(np.maximum(int(np.floor(valid * p)), 64), valid))
        bias = rng.randint(0, valid - cropped + 1)
        ske = ske[:, bias:bias + cropped]
    return rgb_idx, ske


def aug_crop(rgb: np.ndarray, ske: np.ndarray, rng: np.random.RandomState,
             p_interval: float = 0.5) -> Tuple[np.ndarray, np.ndarray]:
    """Random temporal crop (datasets/ntu.py:139-162)."""
    n_rgb = len(rgb) if rgb.ndim > 1 else 0
    rgb_idx, ske = aug_crop_select(n_rgb, ske, rng, p_interval)
    if rgb.ndim > 1:
        rgb = rgb[rgb_idx]
    return rgb, ske


def center_crop(rgb: np.ndarray, ske: np.ndarray,
                p_interval: float = 0.9) -> Tuple[np.ndarray, np.ndarray]:
    """datasets/ntu.py:118-137."""
    if ske.ndim > 1:
        valid = ske.shape[1]
        bias = int((1 - p_interval) * valid / 2)
        ske = ske[:, bias:valid - bias]
    if rgb.ndim > 1:
        n = len(rgb)
        bias = int((1 - p_interval) * n / 2)
        rgb = rgb[bias:n - bias]
    return rgb, ske


def normalize_len(rgb: np.ndarray, ske: np.ndarray,
                  vid_len: Tuple[int, int] = (8, 32)):
    """Uniform resample to (vid_len_rgb, vid_len_ske) (datasets/ntu.py:89-107)."""
    if rgb.ndim > 1:
        idx = np.linspace(0, len(rgb) - 1, vid_len[0]).astype(int)
        rgb = rgb[idx]
    if ske.ndim > 1:
        ske = _linear_interp_T(ske, vid_len[1])
    return rgb, ske


def normalize_sample(rgb: np.ndarray, ske: np.ndarray,
                     image_on_host: bool = True):
    """RGB /255 + ImageNet stats; skeleton centered on joint 2 of person 0
    (datasets/ntu.py:274-289).

    ``image_on_host=False`` keeps uint8 pixels unnormalized — the model
    applies the identical fp32 normalization on device (models/ntu.Visual),
    cutting host->device traffic 4x. Valid because the downstream temporal
    transforms (aug_crop / normalize_len) are pure frame selections that
    commute with per-pixel normalization."""
    if image_on_host or rgb.dtype != np.uint8:
        rgb = rgb / 255.0
        rgb = ((rgb - IMAGENET_MEAN.reshape(1, 1, 1, 3))
               / IMAGENET_STD.reshape(1, 1, 1, 3)).astype(np.float32)
    origin = ske[:, :, 1, 0]
    ske = ske - origin[:, :, None, None]
    return rgb, ske.astype(np.float32)


class NTUDataset:
    """File-list dataset over the NTU directory layout
    (``nturgb+d_rgb_256x256_30/*_rgb.{avi,npy}`` + ``nturgb+d_skeletons``)."""

    def __init__(self, root_dir: str, stage: str, small_dataset: bool = False,
                 vid_len: Tuple[int, int] = (8, 32), vid_dim: int = 256,
                 vid_fr: int = 30, num_workers: int = 8,
                 train_transform: bool = False,
                 host_image_norm: bool = False):
        # host_image_norm=True forces the legacy fp32 host-side image
        # normalization even for uint8 sources (used by the equivalence test;
        # the default ships uint8 and normalizes on device).
        self.host_image_norm = host_image_norm
        subjects = SUBJECTS[stage]
        basename_rgb = os.path.join(
            root_dir, "nturgb+d_rgb_{0}x{0}_{1}".format(vid_dim, vid_fr))
        basename_ske = os.path.join(root_dir, "nturgb+d_skeletons")
        self.vid_len = vid_len
        self.train_transform = train_transform

        rgb_files = sorted(os.listdir(basename_rgb))
        self.rgb_list = [os.path.join(basename_rgb, f) for f in rgb_files
                         if (f.endswith("_rgb.avi") or f.endswith("_rgb.npy"))
                         and int(f[9:12]) in subjects]
        self.ske_list = [os.path.join(basename_ske, f)
                         for f in sorted(os.listdir(basename_ske))
                         if f.split(".")[-1] == "skeleton"
                         and int(f[9:12]) in subjects]
        self.labels = [int(f[17:20]) for f in rgb_files
                       if (f.endswith("_rgb.avi") or f.endswith("_rgb.npy"))
                       and int(f[9:12]) in subjects]
        # rgb/skeleton lists are built by two independent directory scans; a
        # missing file in either directory would silently pair sample i's
        # video with sample j's skeleton. Assert setup-name alignment
        # (chars [:20] = SsssCcccPpppRrrrAaaa) up front.
        if len(self.rgb_list) != len(self.ske_list):
            raise ValueError(
                f"NTU rgb/skeleton list length mismatch for stage {stage!r}: "
                f"{len(self.rgb_list)} videos vs {len(self.ske_list)} skeletons")
        for rp, sp in zip(self.rgb_list, self.ske_list):
            rb, sb = os.path.basename(rp), os.path.basename(sp)
            if rb[:20] != sb[:20]:
                raise ValueError(
                    f"NTU rgb/skeleton filename misalignment: {rb} vs {sb}")
        if small_dataset:
            self.rgb_list = self.rgb_list[:64]
            self.ske_list = self.ske_list[:64]
            self.labels = self.labels[:64]
        self._pool = ThreadPoolExecutor(max_workers=max(1, num_workers))
        # C++ skeleton parser (bmnas_tpu/native): ~8x the Python parse AND
        # GIL-released, so the thread pool above actually parallelizes it.
        # The pure-Python parser (13 ms/file, GIL-bound) was the NTU host
        # bottleneck at batch 96.
        self._ske_parser = None
        try:
            from bmnas_tpu.native.loader import NativeSkeletonParser
            self._ske_parser = NativeSkeletonParser()
        except Exception:
            self._ske_parser = None

    def _parse_skeleton(self, path: str) -> np.ndarray:
        if self._ske_parser is not None:
            try:
                return self._ske_parser.parse(path)
            except IOError:
                pass  # malformed/oversized: fall back to the Python parser
        return get_3d_skeleton(path)

    def __len__(self):
        return len(self.labels)

    def load_sample(self, idx: int, seed: int) -> Dict[str, np.ndarray]:
        rng = np.random.RandomState(seed % (2**32))
        rgb = load_video(self.rgb_list[idx])
        ske = self._parse_skeleton(self.ske_list[idx])
        rgb, ske = normalize_sample(rgb, ske,
                                    image_on_host=self.host_image_norm)
        if self.train_transform:
            rgb, ske = aug_crop(rgb, ske, rng)
        rgb, ske = normalize_len(rgb, ske, self.vid_len)
        # channels-last skeleton: (3, T, V, M) -> (T, V, M, 3)
        ske = np.transpose(ske, (1, 2, 3, 0))
        return {"image": rgb, "skeleton": ske,
                "label": np.int32(self.labels[idx] - 1)}

    def batches(self, batch_size: int, shuffle: bool, seed: int = 0,
                pad_to_full: bool = True) -> Iterator[Dict[str, np.ndarray]]:
        seed = seed % (2**32)
        order = np.arange(len(self))
        rs = np.random.RandomState(seed)
        if shuffle:
            rs.shuffle(order)
        for start in range(0, len(self), batch_size):
            idxs = order[start:start + batch_size]
            seeds = [int(seed * 7919 + i) for i in idxs]
            samples = list(self._pool.map(self.load_sample, idxs, seeds))
            # Mixed-source split (.avi/uint8-npy next to float npy): uint8
            # samples stay raw while float ones are already host-normalized;
            # a batch must be one dtype, so normalize the uint8 minority on
            # host (identical math to the device path) instead of silently
            # casting into samples[0]'s dtype.
            dtypes = {s["image"].dtype for s in samples}
            if len(dtypes) > 1:
                for s in samples:
                    if s["image"].dtype == np.uint8:
                        img = s["image"] / 255.0
                        s["image"] = (
                            (img - IMAGENET_MEAN.reshape(1, 1, 1, 3))
                            / IMAGENET_STD.reshape(1, 1, 1, 3)
                        ).astype(np.float32)
            n = len(samples)
            b = batch_size if pad_to_full else n
            out = {
                "image": np.zeros((b,) + samples[0]["image"].shape,
                                  samples[0]["image"].dtype),
                "skeleton": np.zeros((b,) + samples[0]["skeleton"].shape,
                                     np.float32),
                "label": np.zeros((b,), np.int32),
                "mask": np.zeros((b,), np.float32),
            }
            for i, s in enumerate(samples):
                out["image"][i] = s["image"]
                out["skeleton"][i] = s["skeleton"]
                out["label"][i] = s["label"]
                out["mask"][i] = 1.0
            yield out

    def num_batches(self, batch_size: int) -> int:
        return -(-len(self) // batch_size)

    # -- device frame pool (--device_data_cache for the augmented train split)
    #
    # The train augmentation's video half is PURE FRAME SELECTION
    # (aug_crop_select + the normalize_len linspace), so the decoded frames
    # can live in HBM once and each epoch only ships per-sample frame-index
    # arrays + the (small) skeletons. The host replays the exact rng stream
    # of load_sample, so pooled batches are bit-identical to streamed ones.

    def pool_frame_count(self):
        """Frames per decoded sample, or None if the split cannot pool
        (non-uniform decode shapes / mixed dtypes)."""
        probe = load_video(self.rgb_list[0])
        if probe.ndim != 4:
            return None
        return probe.shape[0]

    def build_frame_pool(self, limit: Optional[int] = None) -> np.ndarray:
        """Decode every video once -> (N, F, H, W, 3) pool array (uint8 for
        device-normalized sources; float sources are host-normalized here,
        exactly as load_sample would). Raises ValueError on non-uniform
        shapes or mixed dtypes (caller falls back to streaming).

        ``limit``: pool only the first ``limit`` dataset rows — the hybrid
        pool+stream path for splits whose full pool exceeds the HBM budget
        (rows >= limit stream per epoch via hybrid_batches)."""
        rgb_list = self.rgb_list if limit is None else self.rgb_list[:limit]
        vids = list(self._pool.map(load_video, rgb_list))
        shapes = {v.shape for v in vids}
        dtypes = {v.dtype for v in vids}
        if len(shapes) != 1 or len(dtypes) != 1:
            raise ValueError(
                f"non-uniform video decode (shapes {shapes}, dtypes {dtypes})"
                " - split cannot pool")
        pool = np.stack(vids)
        if pool.dtype != np.uint8 or self.host_image_norm:
            pool = pool.astype(np.float32) / 255.0
            pool = ((pool - IMAGENET_MEAN.reshape(1, 1, 1, 1, 3))
                    / IMAGENET_STD.reshape(1, 1, 1, 1, 3)).astype(np.float32)
        return pool

    def pool_sample(self, idx: int, seed: int) -> Dict[str, np.ndarray]:
        """Host half of the pooled path: everything ``load_sample`` does
        except touching pixels. Returns the skeleton/label plus the frame
        indices (into the pooled decode) load_sample would have selected —
        same RandomState stream, same draw order."""
        rng = np.random.RandomState(seed % (2**32))
        ske = self._parse_skeleton(self.ske_list[idx])
        origin = ske[:, :, 1, 0]
        ske = (ske - origin[:, :, None, None]).astype(np.float32)
        n = getattr(self, "_pool_frames", None)
        if n is None:
            n = self._pool_frames = self.pool_frame_count()
        if self.train_transform:
            rgb_idx, ske = aug_crop_select(n, ske, rng)
        else:
            rgb_idx = np.arange(n)
        sel = rgb_idx[np.linspace(0, len(rgb_idx) - 1,
                                  self.vid_len[0]).astype(int)]
        ske = _linear_interp_T(ske, self.vid_len[1])
        ske = np.transpose(ske, (1, 2, 3, 0))
        return {"skeleton": ske, "label": np.int32(self.labels[idx] - 1),
                "frame_idx": sel.astype(np.int32)}

    def pool_batches(self, batch_size: int, shuffle: bool, seed: int = 0,
                     pad_to_full: bool = True) -> Iterator[Dict[str, np.ndarray]]:
        """Pooled analog of ``batches``: identical order/seed stream, but
        batches carry {skeleton, label, mask, sample_idx, frame_idx} — the
        device gathers pixels from the resident pool
        (bilevel.build_pool_step_functions)."""
        self._pool_frames = self.pool_frame_count()
        seed = seed % (2**32)
        order = np.arange(len(self))
        rs = np.random.RandomState(seed)
        if shuffle:
            rs.shuffle(order)
        F = self.vid_len[0]
        for start in range(0, len(self), batch_size):
            idxs = order[start:start + batch_size]
            seeds = [int(seed * 7919 + i) for i in idxs]
            samples = list(self._pool.map(self.pool_sample, idxs, seeds))
            n = len(samples)
            b = batch_size if pad_to_full else n
            out = {
                "skeleton": np.zeros((b,) + samples[0]["skeleton"].shape,
                                     np.float32),
                "label": np.zeros((b,), np.int32),
                "mask": np.zeros((b,), np.float32),
                "sample_idx": np.full((b,), -1, np.int32),
                "frame_idx": np.zeros((b, F), np.int32),
            }
            for i, s in enumerate(samples):
                out["skeleton"][i] = s["skeleton"]
                out["label"][i] = s["label"]
                out["mask"][i] = 1.0
                out["sample_idx"][i] = idxs[i]
                out["frame_idx"][i] = s["frame_idx"]
            yield out

    def hybrid_batches(self, batch_size: int, shuffle: bool, seed: int = 0,
                       pool_n: Optional[int] = None, spd: int = 1,
                       pad_to_full: bool = True
                       ) -> Iterator[Dict[str, np.ndarray]]:
        """Hybrid pool+stream epoch for splits whose full frame pool exceeds
        the HBM budget (VERDICT r04 #2; reference workload
        main_darts_searchable_ntu.py:38-59 feeds the whole split from host
        RAM across ~128 GB aggregate GPU memory — one 16 GB chip cannot).

        Rows < ``pool_n`` (resident via build_frame_pool(limit=pool_n))
        yield POOL-kind batches ({skeleton,label,mask,sample_idx,frame_idx},
        ~KBs of H2D); rows >= pool_n yield STREAM-kind batches (full pixels,
        exactly load_sample's output). Batches are homogeneous by kind and
        grouped into runs of ``spd`` so the training loop's scanned dispatch
        stays intact; run kinds interleave in a seed-deterministic order.

        Per-sample augmentation seeds match ``batches``/``pool_batches``
        (seed*7919 + dataset idx), so a sample's temporal crop is identical
        whether it is pooled or streamed. When pool_n >= len(self) the
        stream side is empty and the output is batch-for-batch identical to
        ``pool_batches`` (the equivalence tests pin pool == stream)."""
        if pool_n is None or pool_n >= len(self):
            yield from self.pool_batches(batch_size, shuffle, seed,
                                         pad_to_full)
            return
        self._pool_frames = self.pool_frame_count()
        seed = seed % (2**32)
        order = np.arange(len(self))
        rs = np.random.RandomState(seed)
        if shuffle:
            rs.shuffle(order)
        pooled = order[order < pool_n]
        streamed = order[order >= pool_n]
        spd = max(1, int(spd))

        def pool_kind(idxs):
            seeds = [int(seed * 7919 + i) for i in idxs]
            samples = list(self._pool.map(self.pool_sample, idxs, seeds))
            F = self.vid_len[0]
            b = batch_size if pad_to_full else len(samples)
            out = {
                "skeleton": np.zeros((b,) + samples[0]["skeleton"].shape,
                                     np.float32),
                "label": np.zeros((b,), np.int32),
                "mask": np.zeros((b,), np.float32),
                "sample_idx": np.full((b,), -1, np.int32),
                "frame_idx": np.zeros((b, F), np.int32),
            }
            for i, s in enumerate(samples):
                out["skeleton"][i] = s["skeleton"]
                out["label"][i] = s["label"]
                out["mask"][i] = 1.0
                out["sample_idx"][i] = idxs[i]
                out["frame_idx"][i] = s["frame_idx"]
            return out

        def stream_kind(idxs):
            seeds = [int(seed * 7919 + i) for i in idxs]
            samples = list(self._pool.map(self.load_sample, idxs, seeds))
            # mixed-source dtype unification — same rule as batches()
            if len({s["image"].dtype for s in samples}) > 1:
                for s in samples:
                    if s["image"].dtype == np.uint8:
                        img = s["image"] / 255.0
                        s["image"] = (
                            (img - IMAGENET_MEAN.reshape(1, 1, 1, 3))
                            / IMAGENET_STD.reshape(1, 1, 1, 3)
                        ).astype(np.float32)
            b = batch_size if pad_to_full else len(samples)
            out = {
                "image": np.zeros((b,) + samples[0]["image"].shape,
                                  samples[0]["image"].dtype),
                "skeleton": np.zeros((b,) + samples[0]["skeleton"].shape,
                                     np.float32),
                "label": np.zeros((b,), np.int32),
                "mask": np.zeros((b,), np.float32),
            }
            for i, s in enumerate(samples):
                out["image"][i] = s["image"]
                out["skeleton"][i] = s["skeleton"]
                out["label"][i] = s["label"]
                out["mask"][i] = 1.0
            return out

        # runs of spd batches per kind; kind order shuffled run-wise so the
        # SGD stream does not see all-pooled-then-all-streamed drift
        def runs(idx_arr):
            batches = [idx_arr[s:s + batch_size]
                       for s in range(0, len(idx_arr), batch_size)]
            return [batches[s:s + spd] for s in range(0, len(batches), spd)]

        p_runs, s_runs = runs(pooled), runs(streamed)
        tags = ["P"] * len(p_runs) + ["S"] * len(s_runs)
        np.random.RandomState(seed + 1).shuffle(tags)
        pi = si = 0
        for tag in tags:
            if tag == "P":
                run, pi = p_runs[pi], pi + 1
                for idxs in run:
                    yield pool_kind(idxs)
            else:
                run, si = s_runs[si], si + 1
                for idxs in run:
                    yield stream_kind(idxs)
