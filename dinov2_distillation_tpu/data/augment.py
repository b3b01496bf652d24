"""DINO augmentation pipeline — native PIL/numpy implementation.

Capability parity with the reference ``datasets/augmentations.py`` (which
composes torchvision transforms): RandomResizedCrop(224, scale=[0.08, 1.0],
bicubic) -> HFlip(0.5) -> RandAugment(num_ops=9, magnitude=9, 31 bins,
bilinear) -> ImageNet normalize -> RandomErasing(p=.25, scale=(.02, 1/3),
ratio=(.3, 3.3)).

TPU-split: everything through RandAugment runs here on host and yields a
**uint8** HWC crop; normalization and the erase (value 0 *after*
normalization, exactly torchvision's ``RandomErasing(value=0)`` placement)
are fused into the jitted device step (train/state.py:preprocess_batch), so
the host->HBM transfer is 1 byte/pixel and the host does no float math.
The erase rectangle is sampled here (host RNG) and shipped as 4 ints.

RandAugment op set and magnitude spaces follow torchvision's
``RandAugment._augmentation_space`` (31 bins, signed magnitudes); geometric
ops use the AutoAugment-lineage PIL affine forms torchvision reproduces.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageEnhance, ImageOps

IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)

_BILINEAR = Image.BILINEAR
_BICUBIC = Image.BICUBIC


# --- RandomResizedCrop (torchvision.RandomResizedCrop.get_params parity) ----

def sample_resized_crop(
    rng: np.random.Generator,
    height: int,
    width: int,
    scale: Tuple[float, float],
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
) -> Tuple[int, int, int, int]:
    """Return (top, left, h, w): 10 attempts of area/log-ratio sampling, then
    the deterministic center-crop fallback."""
    area = height * width
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(scale[0], scale[1])
        aspect = math.exp(rng.uniform(log_ratio[0], log_ratio[1]))
        w = int(round(math.sqrt(target_area * aspect)))
        h = int(round(math.sqrt(target_area / aspect)))
        if 0 < w <= width and 0 < h <= height:
            top = int(rng.integers(0, height - h + 1))
            left = int(rng.integers(0, width - w + 1))
            return top, left, h, w
    # fallback: center crop at the closest valid aspect
    in_ratio = width / height
    if in_ratio < ratio[0]:
        w = width
        h = int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        h = height
        w = int(round(h * ratio[1]))
    else:
        w, h = width, height
    top = (height - h) // 2
    left = (width - w) // 2
    return top, left, h, w


# --- RandAugment ops ---------------------------------------------------------

def _shear_x(img: Image.Image, mag: float) -> Image.Image:
    return img.transform(img.size, Image.AFFINE, (1, mag, 0, 0, 1, 0), _BILINEAR)


def _shear_y(img: Image.Image, mag: float) -> Image.Image:
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, mag, 1, 0), _BILINEAR)


def _translate_x(img: Image.Image, mag: float) -> Image.Image:
    return img.transform(img.size, Image.AFFINE, (1, 0, mag, 0, 1, 0), _BILINEAR)


def _translate_y(img: Image.Image, mag: float) -> Image.Image:
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, 0, 1, mag), _BILINEAR)


def _rotate(img: Image.Image, mag: float) -> Image.Image:
    return img.rotate(mag, resample=_BILINEAR)


def _auto_contrast(img: Image.Image, _mag: float) -> Image.Image:
    return ImageOps.autocontrast(img)


def _equalize(img: Image.Image, _mag: float) -> Image.Image:
    return ImageOps.equalize(img)


def _solarize(img: Image.Image, mag: float) -> Image.Image:
    return ImageOps.solarize(img, int(mag))


def _posterize(img: Image.Image, mag: float) -> Image.Image:
    return ImageOps.posterize(img, max(1, int(mag)))


def _enhance(cls):
    def op(img: Image.Image, mag: float) -> Image.Image:
        return cls(img).enhance(1.0 + mag)
    return op


@dataclass(frozen=True)
class _OpSpec:
    name: str
    fn: object
    magnitudes: Optional[np.ndarray]  # len-31 bin table, or None
    signed: bool


def _build_op_table(num_bins: int, image_size: Tuple[int, int]) -> List[_OpSpec]:
    """torchvision RandAugment._augmentation_space(num_bins, image_size)."""
    w, h = image_size
    lin = np.linspace
    return [
        _OpSpec("Identity", lambda im, m: im, None, False),
        _OpSpec("ShearX", _shear_x, lin(0.0, 0.3, num_bins), True),
        _OpSpec("ShearY", _shear_y, lin(0.0, 0.3, num_bins), True),
        _OpSpec("TranslateX", _translate_x, lin(0.0, 150.0 / 331.0 * w, num_bins), True),
        _OpSpec("TranslateY", _translate_y, lin(0.0, 150.0 / 331.0 * h, num_bins), True),
        _OpSpec("Rotate", _rotate, lin(0.0, 30.0, num_bins), True),
        _OpSpec("Brightness", _enhance(ImageEnhance.Brightness), lin(0.0, 0.9, num_bins), True),
        _OpSpec("Color", _enhance(ImageEnhance.Color), lin(0.0, 0.9, num_bins), True),
        _OpSpec("Contrast", _enhance(ImageEnhance.Contrast), lin(0.0, 0.9, num_bins), True),
        _OpSpec("Sharpness", _enhance(ImageEnhance.Sharpness), lin(0.0, 0.9, num_bins), True),
        _OpSpec("Posterize",
                _posterize,
                8 - np.round(np.arange(num_bins) / ((num_bins - 1) / 4)),
                False),
        _OpSpec("Solarize", _solarize, lin(255.0, 0.0, num_bins), False),
        _OpSpec("AutoContrast", _auto_contrast, None, False),
        _OpSpec("Equalize", _equalize, None, False),
    ]


class RandAugment:
    """torchvision-parity RandAugment (reference augmentations.py:53-59:
    num_ops=9, magnitude=9, num_magnitude_bins=31, bilinear)."""

    def __init__(self, num_ops: int = 9, magnitude: int = 9, num_bins: int = 31):
        self.num_ops = num_ops
        self.magnitude = magnitude
        self.num_bins = num_bins

    def __call__(self, img: Image.Image, rng: np.random.Generator) -> Image.Image:
        ops = _build_op_table(self.num_bins, img.size)
        for _ in range(self.num_ops):
            spec = ops[int(rng.integers(0, len(ops)))]
            if spec.magnitudes is None:
                mag = 0.0
            else:
                mag = float(spec.magnitudes[self.magnitude])
                if spec.signed and rng.random() < 0.5:
                    mag = -mag
            img = spec.fn(img, mag)
        return img


# --- RandomErasing rect sampling (applied on device) -------------------------

def sample_erase_rect(
    rng: np.random.Generator,
    height: int,
    width: int,
    p: float = 0.25,
    scale: Tuple[float, float] = (0.02, 1.0 / 3.0),
    ratio: Tuple[float, float] = (0.3, 3.3),
) -> Tuple[int, int, int, int]:
    """(top, left, h, w); all-zero when no erase (torchvision RandomErasing
    get_params, 10 attempts)."""
    if rng.random() >= p:
        return (0, 0, 0, 0)
    area = height * width
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        erase_area = area * rng.uniform(scale[0], scale[1])
        aspect = math.exp(rng.uniform(log_ratio[0], log_ratio[1]))
        h = int(round(math.sqrt(erase_area * aspect)))
        w = int(round(math.sqrt(erase_area / aspect)))
        if h < height and w < width and h > 0 and w > 0:
            top = int(rng.integers(0, height - h + 1))
            left = int(rng.integers(0, width - w + 1))
            return (top, left, h, w)
    return (0, 0, 0, 0)


class StagingTransform:
    """Host half of the *device* augmentation path: decode + fixed resize to
    a square staging frame (uint8); every stochastic op then runs under jit
    (data/device_augment.py). Shrinks the 1-CPU-host duty to JPEG decode.

    Note: the square staging resize distorts aspect ratio before the
    RandomResizedCrop (the host path crops the original geometry); the
    aspect-ratio sampling of the crop largely compensates, and the trade is
    host throughput — documented divergence.
    """

    def __init__(self, staging_size: int = 256, use_native: bool = True):
        self.staging_size = int(staging_size)
        self.global_crops_size = (self.staging_size, self.staging_size)
        self.use_native = use_native

    def from_path(self, path: str, rng: np.random.Generator):
        """Fast path: native C++ JPEG decode+resize (data/native_loader.py),
        bypassing PIL entirely. Returns None to request the PIL fallback."""
        if not self.use_native:
            return None
        from .native_loader import stage_jpeg_file

        s = self.staging_size
        arr = stage_jpeg_file(path, s, s)
        if arr is None:
            return None
        return arr, (0, 0, 0, 0)

    def __call__(self, image: Image.Image, rng: np.random.Generator):
        s = self.staging_size
        arr = np.asarray(image.resize((s, s), _BILINEAR), dtype=np.uint8)
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, axis=-1)
        return arr, (0, 0, 0, 0)


class DataAugmentationDINO:
    """Host half of the reference pipeline (augmentations.py:24-78).

    ``__call__(pil_image, rng)`` -> (uint8 HWC crop, erase rect). The device
    half (normalize + erase) lives in ``train.state.preprocess_batch``.
    """

    def __init__(
        self,
        global_crops_scale: Tuple[float, float] = (0.08, 1.0),
        global_crops_size: Sequence[int] = (224, 224),
        rand_augment: Optional[RandAugment] = None,
    ):
        self.global_crops_scale = tuple(global_crops_scale)
        size = global_crops_size
        if isinstance(size, int):
            size = (size, size)
        self.global_crops_size = (int(size[0]), int(size[1]))
        self.rand_augment = RandAugment() if rand_augment is None else rand_augment

    def __call__(
        self, image: Image.Image, rng: np.random.Generator
    ) -> Tuple[np.ndarray, Tuple[int, int, int, int]]:
        oh, ow = self.global_crops_size
        top, left, h, w = sample_resized_crop(
            rng, image.height, image.width, self.global_crops_scale)
        img = image.resize((ow, oh), _BICUBIC, box=(left, top, left + w, top + h))
        if rng.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        img = self.rand_augment(img, rng)
        arr = np.asarray(img, dtype=np.uint8)
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, axis=-1)
        erase = sample_erase_rect(rng, oh, ow)
        return arr, erase
