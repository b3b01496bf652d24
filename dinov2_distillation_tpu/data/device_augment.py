"""Device-side DINO augmentation — the full randomized pipeline under jit.

The reference runs every augmentation op on host CPU through PIL/torchvision
(``datasets/augmentations.py``); at TPU batch sizes the host becomes the
bottleneck (the north-star explicitly calls for the augmentation pipeline to
fuse into the XLA host->HBM prefetch path). This module implements the whole
stochastic pipeline as jittable JAX:

  RandomResizedCrop(224, scale, bicubic)  -> per-sample scale_and_translate
  RandomHorizontalFlip(0.5)
  RandAugment(num_ops=9, magnitude=9, 31 bins, bilinear)  -> lax.switch over
      the 14 torchvision ops, geometric warps via map_coordinates
  ImageNet normalize + RandomErasing(p=.25) -> train.state.preprocess_batch

Host duty shrinks to JPEG decode + fixed resize to a staging size (uint8);
all randomness comes from a jax PRNG folded per (step, sample), so results
are reproducible regardless of host worker count.

Parity notes: pixel-exact for the point ops (posterize, solarize, invert-free
ops, autocontrast, equalize per PIL's LUT algorithm, brightness/color/
contrast/sharpness per PIL ImageEnhance blends); geometric warps share
torchvision's conventions (bilinear, zero fill, center-origin for rotate,
corner-origin for shear) but may differ by interpolation details at edges.
"""

from __future__ import annotations

import functools
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# geometry helpers
# ---------------------------------------------------------------------------


def _affine_sample(img: jnp.ndarray, matrix: jnp.ndarray) -> jnp.ndarray:
    """Sample img (H, W, C) at output coords mapped by the 2x3 inverse-affine
    ``matrix`` (output (x, y, 1) -> input (x, y)); bilinear, zero fill."""
    h, w, c = img.shape
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    in_x = matrix[0, 0] * xx + matrix[0, 1] * yy + matrix[0, 2]
    in_y = matrix[1, 0] * xx + matrix[1, 1] * yy + matrix[1, 2]
    coords = jnp.stack([in_y, in_x], axis=0)

    def sample_channel(ch):
        return jax.scipy.ndimage.map_coordinates(ch, coords, order=1, mode="constant")

    return jnp.stack([sample_channel(img[..., i]) for i in range(c)], axis=-1)


def _shear_x(img, mag):
    m = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]) + \
        jnp.zeros((2, 3)).at[0, 1].set(mag)
    return _affine_sample(img, m)


def _shear_y(img, mag):
    m = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]) + \
        jnp.zeros((2, 3)).at[1, 0].set(mag)
    return _affine_sample(img, m)


def _translate_x(img, mag):
    m = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]) + \
        jnp.zeros((2, 3)).at[0, 2].set(mag)
    return _affine_sample(img, m)


def _translate_y(img, mag):
    m = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]) + \
        jnp.zeros((2, 3)).at[1, 2].set(mag)
    return _affine_sample(img, m)


def _rotate(img, mag):
    """Rotate by ``mag`` degrees about the image center (PIL Image.rotate)."""
    h, w, _ = img.shape
    a = -mag * math.pi / 180.0  # inverse mapping
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    cos, sin = jnp.cos(a), jnp.sin(a)
    m = jnp.asarray([
        [cos, -sin, cx - cos * cx + sin * cy],
        [sin, cos, cy - sin * cx - cos * cy],
    ])
    return _affine_sample(img, m)


# ---------------------------------------------------------------------------
# point ops (img float32 in [0, 255])
# ---------------------------------------------------------------------------

_L_WEIGHTS = jnp.asarray([0.299, 0.587, 0.114])  # PIL ITU-R 601-2 luma


def _blend(a, b, factor):
    """PIL ImageEnhance: a + factor * (b - a), clipped."""
    return jnp.clip(a + factor * (b - a), 0.0, 255.0)


def _brightness(img, mag):
    return _blend(jnp.zeros_like(img), img, 1.0 + mag)


def _color(img, mag):
    gray = jnp.tensordot(img, _L_WEIGHTS, axes=[[-1], [0]])[..., None]
    gray = jnp.broadcast_to(gray, img.shape)
    return _blend(gray, img, 1.0 + mag)


def _contrast(img, mag):
    # PIL: blend with the mean of the rounded L channel
    gray = jnp.round(jnp.tensordot(img, _L_WEIGHTS, axes=[[-1], [0]]))
    mean = jnp.round(jnp.mean(gray))  # PIL uses the integer mean
    return _blend(jnp.full_like(img, mean), img, 1.0 + mag)


_SMOOTH = jnp.asarray([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]]) / 13.0


def _sharpness(img, mag):
    # PIL SMOOTH filter; PIL leaves the 1px border unfiltered
    h, w, c = img.shape
    blurred = jax.lax.conv_general_dilated(
        img[None].transpose(0, 3, 1, 2),
        jnp.broadcast_to(_SMOOTH[None, None], (c, 1, 3, 3)),
        (1, 1), "SAME", feature_group_count=c,
    )[0].transpose(1, 2, 0)
    border = jnp.zeros((h, w, 1), bool).at[1:-1, 1:-1].set(True)
    smoothed = jnp.where(border, blurred, img)
    return _blend(smoothed, img, 1.0 + mag)


def _posterize(img, mag):
    bits = jnp.clip(mag.astype(jnp.int32), 1, 8)
    mask = (0xFF << (8 - bits)) & 0xFF
    return (img.astype(jnp.int32) & mask).astype(jnp.float32)


def _solarize(img, mag):
    return jnp.where(img >= mag, 255.0 - img, img)


def _autocontrast(img, _mag):
    lo = jnp.min(img, axis=(0, 1), keepdims=True)
    hi = jnp.max(img, axis=(0, 1), keepdims=True)
    scale = jnp.where(hi > lo, 255.0 / (hi - lo), 1.0)
    offset = jnp.where(hi > lo, -lo * scale, 0.0)
    return jnp.clip(img * scale + offset, 0.0, 255.0)


def _equalize(img, _mag):
    """PIL ImageOps.equalize LUT, per channel (integer arithmetic)."""

    def eq_channel(ch):
        x = jnp.clip(ch, 0, 255).astype(jnp.int32).reshape(-1)
        h = jnp.bincount(x, length=256)
        nonzero = h > 0
        # count of the last nonzero bin
        idx_last = 255 - jnp.argmax(nonzero[::-1])
        total = x.size
        step = (total - h[idx_last]) // 255
        n = step // 2 + jnp.concatenate([jnp.zeros(1, h.dtype), jnp.cumsum(h)[:-1]])
        lut = jnp.where(step > 0, n // jnp.maximum(step, 1), jnp.arange(256))
        lut = jnp.clip(lut, 0, 255)
        return lut[x].reshape(ch.shape).astype(jnp.float32)

    return jnp.stack([eq_channel(img[..., i]) for i in range(img.shape[-1])], axis=-1)


def _identity(img, _mag):
    return img


# op table mirroring augment._build_op_table (torchvision RandAugment space)
def _magnitude_table(num_bins: int, size: int) -> jnp.ndarray:
    lin = jnp.linspace
    return jnp.stack([
        jnp.zeros(num_bins),                        # Identity
        lin(0.0, 0.3, num_bins),                    # ShearX
        lin(0.0, 0.3, num_bins),                    # ShearY
        lin(0.0, 150.0 / 331.0 * size, num_bins),   # TranslateX
        lin(0.0, 150.0 / 331.0 * size, num_bins),   # TranslateY
        lin(0.0, 30.0, num_bins),                   # Rotate
        lin(0.0, 0.9, num_bins),                    # Brightness
        lin(0.0, 0.9, num_bins),                    # Color
        lin(0.0, 0.9, num_bins),                    # Contrast
        lin(0.0, 0.9, num_bins),                    # Sharpness
        8 - jnp.round(jnp.arange(num_bins) / ((num_bins - 1) / 4)),  # Posterize
        lin(255.0, 0.0, num_bins),                  # Solarize
        jnp.zeros(num_bins),                        # AutoContrast
        jnp.zeros(num_bins),                        # Equalize
    ])


_OPS = (
    _identity, _shear_x, _shear_y, _translate_x, _translate_y, _rotate,
    _brightness, _color, _contrast, _sharpness, _posterize, _solarize,
    _autocontrast, _equalize,
)
_SIGNED = jnp.asarray([0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0], jnp.float32)


def _rand_augment_one(img: jnp.ndarray, rng: jax.Array, *, num_ops: int,
                      magnitude: int, num_bins: int) -> jnp.ndarray:
    mags = _magnitude_table(num_bins, img.shape[1])[:, magnitude]

    def body(i, img):
        r = jax.random.fold_in(rng, i)
        r_op, r_sign = jax.random.split(r)
        op_idx = jax.random.randint(r_op, (), 0, len(_OPS))
        sign = jnp.where(
            (jax.random.uniform(r_sign) < 0.5) & (_SIGNED[op_idx] > 0), -1.0, 1.0)
        mag = mags[op_idx] * sign
        return jax.lax.switch(op_idx, _OPS, img, mag)

    return jax.lax.fori_loop(0, num_ops, body, img)


# ---------------------------------------------------------------------------
# RandomResizedCrop via per-sample scale_and_translate
# ---------------------------------------------------------------------------


def _sample_crop(rng: jax.Array, height: int, width: int,
                 scale: Tuple[float, float],
                 ratio: Tuple[float, float] = (3 / 4, 4 / 3)):
    """torchvision get_params: 10 area/log-ratio attempts, first valid wins,
    else center fallback. Vectorized: draw all 10, pick via argmax."""
    area = height * width
    r_area, r_ratio, r_top, r_left = jax.random.split(rng, 4)
    target_area = area * jax.random.uniform(
        r_area, (10,), minval=scale[0], maxval=scale[1])
    aspect = jnp.exp(jax.random.uniform(
        r_ratio, (10,), minval=math.log(ratio[0]), maxval=math.log(ratio[1])))
    ws = jnp.round(jnp.sqrt(target_area * aspect)).astype(jnp.int32)
    hs = jnp.round(jnp.sqrt(target_area / aspect)).astype(jnp.int32)
    valid = (ws > 0) & (ws <= width) & (hs > 0) & (hs <= height)
    any_valid = jnp.any(valid)
    first = jnp.argmax(valid)  # first True
    w = ws[first]
    h = hs[first]
    u_top = jax.random.uniform(r_top, (10,))
    u_left = jax.random.uniform(r_left, (10,))
    top = (u_top[first] * (height - h + 1).astype(jnp.float32)).astype(jnp.int32)
    left = (u_left[first] * (width - w + 1).astype(jnp.float32)).astype(jnp.int32)

    # center fallback at the clamped aspect
    in_ratio = width / height
    fw = jnp.where(in_ratio < ratio[0], width,
                   jnp.where(in_ratio > ratio[1],
                             jnp.round(height * ratio[1]).astype(jnp.int32), width))
    fh = jnp.where(in_ratio < ratio[0],
                   jnp.round(width / ratio[0]).astype(jnp.int32),
                   jnp.where(in_ratio > ratio[1], height, height))
    ftop = (height - fh) // 2
    fleft = (width - fw) // 2

    top = jnp.where(any_valid, top, ftop)
    left = jnp.where(any_valid, left, fleft)
    h = jnp.where(any_valid, h, fh)
    w = jnp.where(any_valid, w, fw)
    return top, left, h, w


def _crop_resize(img: jnp.ndarray, rect, out_size: int) -> jnp.ndarray:
    """Crop rect (top, left, h, w) and resize to (out, out) bicubic via
    scale_and_translate (half-pixel centers == align_corners=False)."""
    top, left, h, w = [r.astype(jnp.float32) for r in rect]
    scale = jnp.stack([out_size / h, out_size / w])
    # output coord o maps to input (o + 0.5)/s - 0.5 + top; translation in
    # scale_and_translate is: in = (out - t) / s  =>  t = -s*(top - 0.5/s + 0.5... )
    translation = -scale * jnp.stack([top, left])
    return jax.image.scale_and_translate(
        img, (out_size, out_size, img.shape[-1]), (0, 1),
        scale, translation, method="cubic", antialias=False)


# ---------------------------------------------------------------------------
# pipeline entry
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("crop_size", "scale", "num_ops", "magnitude", "num_bins"))
def _augment_chunk(
    images: jnp.ndarray,
    rngs: jnp.ndarray,     # (B, key) per-sample keys
    *,
    crop_size: int,
    scale: Tuple[float, float],
    num_ops: int,
    magnitude: int,
    num_bins: int,
):
    b, h, w, _ = images.shape

    def one(img, rng):
        r_crop, r_flip, r_aug, r_erase = jax.random.split(rng, 4)
        rect = _sample_crop(r_crop, h, w, scale)
        out = _crop_resize(img.astype(jnp.float32), rect, crop_size)
        out = jnp.clip(out, 0.0, 255.0)
        out = jnp.where(jax.random.uniform(r_flip) < 0.5, out[:, ::-1], out)
        out = _rand_augment_one(out, r_aug, num_ops=num_ops,
                                magnitude=magnitude, num_bins=num_bins)
        erase = _sample_erase(r_erase, crop_size, crop_size)
        return jnp.round(out).astype(jnp.uint8), erase

    return jax.vmap(one)(images, rngs)


_AUGMENT_CHUNK = 32


def augment_batch(
    images: jnp.ndarray,   # (B, H, W, 3) uint8 staged frames
    rng: jax.Array,
    *,
    crop_size: int = 224,
    scale: Tuple[float, float] = (0.08, 1.0),
    num_ops: int = 9,
    magnitude: int = 9,
    num_bins: int = 31,
) -> Dict[str, jnp.ndarray]:
    """Full DINO train-time augmentation on device.

    Returns the same batch dict contract as the host pipeline
    ({'image': uint8, 'erase': int32 rects}) so train.state.preprocess_batch
    finishes the job (normalize + erase).

    Dispatched in host-level chunks of 32 samples: the single-program
    version (one vmap or a lax.map over chunks) faults the TPU worker at
    B=256 — every 32-key chunk of the same key split passes in isolation,
    so it is the whole-program scale, not any draw, that trips the
    compiler. Separate dispatches bound the program size; outputs are
    device-concatenated (results are bit-identical to the fused form since
    per-sample keys are pre-split)."""
    b = images.shape[0]
    kw = dict(crop_size=crop_size, scale=tuple(scale), num_ops=num_ops,
              magnitude=magnitude, num_bins=num_bins)
    rngs = jax.random.split(rng, b)
    if b <= _AUGMENT_CHUNK or b % _AUGMENT_CHUNK != 0:
        images_out, erase = _augment_chunk(images, rngs, **kw)
        return {"image": images_out, "erase": erase}
    outs = [
        _augment_chunk(images[i:i + _AUGMENT_CHUNK], rngs[i:i + _AUGMENT_CHUNK], **kw)
        for i in range(0, b, _AUGMENT_CHUNK)
    ]
    return {
        "image": jnp.concatenate([o[0] for o in outs]),
        "erase": jnp.concatenate([o[1] for o in outs]),
    }


def _sample_erase(rng: jax.Array, height: int, width: int,
                  p: float = 0.25, scale=(0.02, 1 / 3), ratio=(0.3, 3.3)):
    """RandomErasing rect sampling on device (mirrors augment.sample_erase_rect)."""
    r_p, r_area, r_ratio, r_top, r_left = jax.random.split(rng, 5)
    area = height * width
    erase_area = area * jax.random.uniform(r_area, (10,), minval=scale[0], maxval=scale[1])
    aspect = jnp.exp(jax.random.uniform(
        r_ratio, (10,), minval=math.log(ratio[0]), maxval=math.log(ratio[1])))
    hs = jnp.round(jnp.sqrt(erase_area * aspect)).astype(jnp.int32)
    ws = jnp.round(jnp.sqrt(erase_area / aspect)).astype(jnp.int32)
    valid = (hs > 0) & (hs < height) & (ws > 0) & (ws < width)
    first = jnp.argmax(valid)
    h = hs[first]
    w = ws[first]
    top = (jax.random.uniform(r_top, (10,))[first]
           * (height - h + 1).astype(jnp.float32)).astype(jnp.int32)
    left = (jax.random.uniform(r_left, (10,))[first]
            * (width - w + 1).astype(jnp.float32)).astype(jnp.int32)
    keep = (jax.random.uniform(r_p) < p) & jnp.any(valid)
    z = jnp.zeros((), jnp.int32)
    return jnp.where(keep, jnp.stack([top, left, h, w]),
                     jnp.stack([z, z, z, z]))
