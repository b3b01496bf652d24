"""Device-side augmentation: point-op parity vs PIL, pipeline contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image, ImageEnhance, ImageOps

from dinov2_distillation_tpu.data import device_augment as da


@pytest.fixture
def img_u8(rng):
    return rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)


def _f(img_u8):
    return jnp.asarray(img_u8, jnp.float32)


def test_posterize_matches_pil(img_u8):
    for bits in (1, 4, 7):
        got = np.asarray(da._posterize(_f(img_u8), jnp.float32(bits)))
        want = np.asarray(ImageOps.posterize(Image.fromarray(img_u8), bits))
        np.testing.assert_array_equal(got.astype(np.uint8), want)


def test_solarize_matches_pil(img_u8):
    got = np.asarray(da._solarize(_f(img_u8), jnp.float32(128)))
    want = np.asarray(ImageOps.solarize(Image.fromarray(img_u8), 128))
    np.testing.assert_array_equal(got.astype(np.uint8), want)


def test_autocontrast_matches_pil(img_u8):
    got = np.asarray(da._autocontrast(_f(img_u8), jnp.float32(0)))
    want = np.asarray(ImageOps.autocontrast(Image.fromarray(img_u8)))
    np.testing.assert_allclose(got, want.astype(np.float32), atol=1.0)


def test_equalize_matches_pil(img_u8):
    got = np.asarray(da._equalize(_f(img_u8), jnp.float32(0)))
    want = np.asarray(ImageOps.equalize(Image.fromarray(img_u8)))
    np.testing.assert_allclose(got, want.astype(np.float32), atol=1.0)


def test_brightness_matches_pil(img_u8):
    got = np.asarray(da._brightness(_f(img_u8), jnp.float32(-0.5)))
    want = np.asarray(ImageEnhance.Brightness(Image.fromarray(img_u8)).enhance(0.5))
    np.testing.assert_allclose(got, want.astype(np.float32), atol=1.0)


def test_color_matches_pil(img_u8):
    got = np.asarray(da._color(_f(img_u8), jnp.float32(0.4)))
    want = np.asarray(ImageEnhance.Color(Image.fromarray(img_u8)).enhance(1.4))
    np.testing.assert_allclose(got, want.astype(np.float32), atol=2.0)


def test_contrast_close_to_pil(img_u8):
    got = np.asarray(da._contrast(_f(img_u8), jnp.float32(0.4)))
    want = np.asarray(ImageEnhance.Contrast(Image.fromarray(img_u8)).enhance(1.4))
    np.testing.assert_allclose(got, want.astype(np.float32), atol=2.5)


def test_translate_moves_content(img_u8):
    x = _f(img_u8)
    got = np.asarray(da._translate_x(x, jnp.float32(5.0)))
    # inverse-mapped: output col c samples input col c+5
    np.testing.assert_allclose(got[:, :27], np.asarray(x)[:, 5:], atol=1e-3)
    assert np.all(got[:, 27:] == 0)  # zero fill


def test_rotate_center_invariant(img_u8):
    x = _f(img_u8)
    got = np.asarray(da._rotate(x, jnp.float32(90.0)))
    # center pixel block is preserved under rotation about center
    c = 16
    assert got.shape == x.shape
    np.testing.assert_allclose(
        got[c - 1:c + 1, c - 1:c + 1].mean(), np.asarray(x)[c - 1:c + 1, c - 1:c + 1].mean(),
        rtol=0.5)


def test_augment_batch_contract(rng):
    imgs = jnp.asarray(rng.integers(0, 256, (4, 64, 64, 3), dtype=np.uint8))
    out = da.augment_batch(imgs, jax.random.PRNGKey(0), crop_size=32,
                           num_ops=2)
    assert out["image"].shape == (4, 32, 32, 3)
    assert out["image"].dtype == jnp.uint8
    assert out["erase"].shape == (4, 4)
    # different rngs give different augmentations
    out2 = da.augment_batch(imgs, jax.random.PRNGKey(1), crop_size=32,
                            num_ops=2)
    assert not np.array_equal(np.asarray(out["image"]), np.asarray(out2["image"]))
    # same rng reproduces exactly
    out3 = da.augment_batch(imgs, jax.random.PRNGKey(0), crop_size=32,
                            num_ops=2)
    np.testing.assert_array_equal(np.asarray(out["image"]), np.asarray(out3["image"]))


def test_crop_resize_identity():
    """Cropping the full frame and resizing to the same size is identity."""
    x = jnp.arange(16 * 16 * 3, dtype=jnp.float32).reshape(16, 16, 3)
    rect = tuple(jnp.asarray(v, jnp.int32) for v in (0, 0, 16, 16))
    out = da._crop_resize(x, rect, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-2)


def test_erase_rect_device_distribution(rng):
    key = jax.random.PRNGKey(0)
    hits = 0
    rects = jax.vmap(lambda k: da._sample_erase(k, 64, 64))(
        jax.random.split(key, 1000))
    rects = np.asarray(rects)
    for top, left, h, w in rects:
        if h > 0:
            hits += 1
            assert top + h <= 64 and left + w <= 64
    assert 0.15 < hits / 1000 < 0.33
