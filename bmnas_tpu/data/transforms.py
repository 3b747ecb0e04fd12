"""Video-frame spatial transforms (numpy, once-per-clip randomization).

Rebuild of the NV transform library used by the EgoGesture pipeline
(``datasets/nv_spatial_transforms.py``): each transform draws its random
parameters ONCE per clip via :meth:`randomize_parameters` and applies them
to every frame (ego.py:244), so all frames of a clip get identical
augmentation. Frames are float32 HWC numpy arrays.

Transforms present in the reference and rebuilt here: Compose, Normalize,
Scale, CenterCrop, CornerCrop, RandomHorizontalFlip, MultiScaleCornerCrop,
MultiScaleRandomCrop (the last also exists functionally in data/ego.py for
the hot path). The elastic/blur/salt/dropout/multiply augmenters of the
reference (nv_spatial_transforms.py:378-568) are not used by any BM-NAS
pipeline and are intentionally omitted (README "Intentionally not rebuilt").
"""
from __future__ import annotations

import random
from typing import Sequence

import numpy as np

from bmnas_tpu.data.ego import _resize


class Compose:
    def __init__(self, transforms: Sequence):
        self.transforms = list(transforms)

    def __call__(self, img):
        for t in self.transforms:
            img = t(img)
        return img

    def randomize_parameters(self):
        for t in self.transforms:
            if hasattr(t, "randomize_parameters"):
                t.randomize_parameters()


class Normalize:
    """Per-channel (x - mean) / std; zips like torch (extra channels pass
    through untouched — the reference's RGB-D quirk)."""

    def __init__(self, mean, std):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, img):
        img = img.astype(np.float32).copy()
        k = min(img.shape[-1], len(self.mean))
        img[..., :k] = (img[..., :k] - self.mean[:k]) / self.std[:k]
        return img


class ToTensor:
    """Scale by 1/norm_value (norm_value=1 keeps 0-255 range)."""

    def __init__(self, norm_value: float = 1.0):
        self.norm_value = float(norm_value)

    def __call__(self, img):
        return np.asarray(img, np.float32) / self.norm_value


class Scale:
    """Resize so the SHORT side equals size (aspect preserved)."""

    def __init__(self, size: int):
        self.size = size

    def __call__(self, img):
        h, w = img.shape[:2]
        if w <= h:
            nw, nh = self.size, int(round(self.size * h / w))
        else:
            nh, nw = self.size, int(round(self.size * w / h))
        return _resize(img, (nh, nw))


class CenterCrop:
    def __init__(self, size: int):
        self.size = size

    def __call__(self, img):
        h, w = img.shape[:2]
        y1 = (h - self.size) // 2
        x1 = (w - self.size) // 2
        return img[y1:y1 + self.size, x1:x1 + self.size]


class CornerCrop:
    """Crop one of c/tl/tr/bl/br; position drawn once per clip when
    randomize=True (nv_spatial_transforms.py CornerCrop)."""
    POSITIONS = ["c", "tl", "tr", "bl", "br"]

    def __init__(self, size: int, crop_position: str = None):
        self.size = size
        self.randomize = crop_position is None
        self.crop_position = crop_position or "c"

    def __call__(self, img):
        h, w = img.shape[:2]
        s = self.size
        pos = self.crop_position
        if pos == "c":
            y1, x1 = (h - s) // 2, (w - s) // 2
        elif pos == "tl":
            y1, x1 = 0, 0
        elif pos == "tr":
            y1, x1 = 0, w - s
        elif pos == "bl":
            y1, x1 = h - s, 0
        else:  # br
            y1, x1 = h - s, w - s
        return img[y1:y1 + s, x1:x1 + s]

    def randomize_parameters(self):
        if self.randomize:
            self.crop_position = self.POSITIONS[
                random.randint(0, len(self.POSITIONS) - 1)]


class RandomHorizontalFlip:
    def __init__(self):
        self.p = 0.5
        self._flip = False

    def __call__(self, img):
        return img[:, ::-1] if self._flip else img

    def randomize_parameters(self):
        self._flip = random.random() < 0.5


class MultiScaleRandomCrop:
    def __init__(self, scales: Sequence[float], size: int):
        self.scales = list(scales)
        self.size = size
        self.randomize_parameters()

    def __call__(self, img):
        h, w = img.shape[:2]
        crop = int(min(h, w) * self.scale)
        x1 = int(self.tl_x * (w - crop))
        y1 = int(self.tl_y * (h - crop))
        return _resize(img[y1:y1 + crop, x1:x1 + crop],
                       (self.size, self.size))

    def randomize_parameters(self):
        self.scale = self.scales[random.randint(0, len(self.scales) - 1)]
        self.tl_x = random.random()
        self.tl_y = random.random()


class MultiScaleCornerCrop:
    def __init__(self, scales: Sequence[float], size: int):
        self.scales = list(scales)
        self.size = size
        self.randomize_parameters()

    def __call__(self, img):
        h, w = img.shape[:2]
        crop = int(min(h, w) * self.scale)
        cc = CornerCrop(crop, self.crop_position)
        return _resize(cc(img), (self.size, self.size))

    def randomize_parameters(self):
        self.scale = self.scales[random.randint(0, len(self.scales) - 1)]
        self.crop_position = CornerCrop.POSITIONS[
            random.randint(0, len(CornerCrop.POSITIONS) - 1)]
