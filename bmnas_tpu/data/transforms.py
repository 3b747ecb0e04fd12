"""Video-frame spatial transforms (numpy, once-per-clip randomization).

Rebuild of the NV transform library used by the EgoGesture pipeline
(``datasets/nv_spatial_transforms.py``): each transform draws its random
parameters ONCE per clip via :meth:`randomize_parameters` and applies them
to every frame (ego.py:244), so all frames of a clip get identical
augmentation. Frames are float32 HWC numpy arrays.

Transforms present in the reference and rebuilt here: Compose, Normalize,
Scale, CenterCrop, CornerCrop, RandomHorizontalFlip, MultiScaleCornerCrop,
MultiScaleRandomCrop (the last also exists functionally in data/ego.py for
the hot path), plus the augmenter tail SpatialElasticDisplacement,
RandomRotate, RandomResize, GaussianBlur, SaltImage, Dropout,
MultiplyValues (nv_spatial_transforms.py:378-568; unused by the BM-NAS
entry points but part of the component inventory).
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


class SpatialElasticDisplacement:
    """Elastic warp applied with probability 0.65 per clip
    (nv_spatial_transforms.py:378-435). The smoothed displacement field is
    drawn once per clip in randomize_parameters (the reference redraws per
    frame inside __call__, which tears the clip temporally — randomize-once
    is the protocol the rest of the library follows, ego.py:244)."""

    def __init__(self, sigma: float = 3.0, alpha: float = 1.0, order: int = 3,
                 cval: float = 0.0, mode: str = "constant"):
        self.sigma = sigma
        self.alpha = alpha
        self.order = order
        self.cval = cval
        self.mode = mode
        self.p = 1.0  # inactive until randomize_parameters
        self._field = None

    def __call__(self, img):
        if self.p >= 0.65:
            return img
        from scipy import ndimage
        img = np.asarray(img)
        h, w = img.shape[:2]
        if self._field is None or self._field[0].shape != (h * w, 1):
            dx = ndimage.gaussian_filter(
                self._rng.rand(h, w) * 2 - 1, self.sigma,
                mode="constant", cval=0) * self.alpha
            dy = ndimage.gaussian_filter(
                self._rng.rand(h, w) * 2 - 1, self.sigma,
                mode="constant", cval=0) * self.alpha
            x, y = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
            self._field = (np.reshape(x + dx, (-1, 1)),
                           np.reshape(y + dy, (-1, 1)))
        ix, iy = self._field
        out = np.copy(img)
        chans = img.shape[2] if img.ndim == 3 else 1
        src = img if img.ndim == 3 else img[..., None]
        dst = out if out.ndim == 3 else out[..., None]
        for c in range(chans):
            dst[..., c] = ndimage.map_coordinates(
                src[..., c], (ix, iy), order=self.order, cval=self.cval,
                mode=self.mode).reshape(h, w)
        return out

    def randomize_parameters(self):
        self.p = random.random()
        self._rng = np.random.RandomState(random.randint(0, 2**31 - 1))
        self._field = None


class RandomRotate:
    """Rotate by a per-clip angle in [-10, 10] degrees, bilinear
    (nv_spatial_transforms.py:439-451)."""

    def __init__(self):
        self.rotate_angle = 0

    def __call__(self, img):
        from scipy import ndimage
        return ndimage.rotate(np.asarray(img), self.rotate_angle,
                              reshape=False, order=1, mode="nearest")

    def randomize_parameters(self):
        self.rotate_angle = random.randint(-10, 10)


class RandomResize:
    """Resize by a per-clip factor in [0.9, 1.1]
    (nv_spatial_transforms.py:454-467)."""

    def __init__(self):
        self.resize_const = 1.0

    def __call__(self, img):
        h, w = img.shape[:2]
        return _resize(np.asarray(img), (int(h * self.resize_const),
                                         int(w * self.resize_const)))

    def randomize_parameters(self):
        self.resize_const = random.uniform(0.9, 1.1)


class GaussianBlur:
    """Blur with sigma=(5,5,0) with probability 0.2 per clip
    (nv_spatial_transforms.py:471-485, class Gaussian_blur)."""

    def __init__(self, radius: float = 0.0):
        self.radius = radius
        self.p = 1.0

    def __call__(self, img):
        if self.p >= 0.2:
            return img
        from scipy import ndimage
        img = np.asarray(img)
        sigma = (5, 5, 0)[:img.ndim]
        return ndimage.gaussian_filter(img, sigma=sigma, order=0)

    def randomize_parameters(self):
        self.p = random.random()
        # radius is drawn but unused, exactly as in the reference
        # (nv_spatial_transforms.py:482-485 draws it; __call__ hardcodes
        # sigma=(5,5,0) at :478) — kept for behavioral parity.
        self.radius = random.uniform(0.0, 0.1)


Gaussian_blur = GaussianBlur  # reference spelling


class SaltImage:
    """Salt noise: ~1/ratio of pixels set to 255, with probability 0.10 per
    clip; ratio drawn per clip in [80, 120] (nv_spatial_transforms.py:488-511).
    The noise mask is drawn per frame (matches the reference)."""

    def __init__(self, ratio: int = 100):
        self.ratio = ratio
        self.p = 1.0

    def __call__(self, img):
        if self.p >= 0.10:
            return img
        img = np.asarray(img).astype(np.float64)
        noise = np.random.randint(self.ratio, size=img.shape)
        return np.where(noise == 0, 255.0, img)

    def randomize_parameters(self):
        self.p = random.random()
        self.ratio = random.randint(80, 120)


class Dropout:
    """Pepper noise: ~1/ratio of pixels zeroed, with probability 0.10 per
    clip; ratio in [30, 50] (nv_spatial_transforms.py:514-537)."""

    def __init__(self, ratio: int = 100):
        self.ratio = ratio
        self.p = 1.0

    def __call__(self, img):
        if self.p >= 0.10:
            return img
        img = np.asarray(img).astype(np.float64)
        noise = np.random.randint(self.ratio, size=img.shape)
        return np.where(noise == 0, 0.0, img)

    def randomize_parameters(self):
        self.p = random.random()
        self.ratio = random.randint(30, 50)


class MultiplyValues:
    """Brightness scale by a per-clip factor in [1-value, 1+value], clipped
    to [0, 255] (nv_spatial_transforms.py:540-568)."""

    def __init__(self, value: float = 0.2, per_channel: bool = False):
        self.value = value
        # accepted-but-unused in the reference too
        # (nv_spatial_transforms.py:542-544); kept for signature parity.
        self.per_channel = per_channel
        self.sample = 1.0

    def __call__(self, img):
        image = np.asarray(img).astype(np.float64) * self.sample
        return np.clip(image, 0.0, 255.0)

    def randomize_parameters(self):
        self.sample = random.uniform(1.0 - self.value, 1.0 + self.value)
