"""Data pipeline: augmentation statistics/shapes, loader sharding and
determinism, on-device normalize+erase parity."""

import numpy as np
import pytest
from PIL import Image

from dinov2_distillation_tpu.data.augment import (
    DataAugmentationDINO,
    RandAugment,
    sample_erase_rect,
    sample_resized_crop,
)
from dinov2_distillation_tpu.data.dataset import SyntheticDataset, train_val_split, ImageFolderDataset
from dinov2_distillation_tpu.data.loader import DataLoader


def test_augment_output_contract(rng):
    aug = DataAugmentationDINO((0.08, 1.0), (64, 64))
    img = Image.fromarray(rng.integers(0, 256, (100, 120, 3), dtype=np.uint8))
    out, erase = aug(img, rng)
    assert out.shape == (64, 64, 3) and out.dtype == np.uint8
    assert len(erase) == 4


def test_resized_crop_bounds(rng):
    for _ in range(50):
        top, left, h, w = sample_resized_crop(rng, 97, 123, (0.08, 1.0))
        assert 0 <= top and top + h <= 97
        assert 0 <= left and left + w <= 123
        assert h > 0 and w > 0


def test_erase_rect_distribution(rng):
    hits = 0
    for _ in range(2000):
        top, left, h, w = sample_erase_rect(rng, 64, 64)
        if h > 0:
            hits += 1
            assert top + h <= 64 and left + w <= 64
            area = h * w / (64 * 64)
            assert 0.01 < area < 0.45  # rounding slack around (0.02, 1/3)
    # p=0.25 with ~5% failure-to-place slack
    assert 0.18 < hits / 2000 < 0.30


def test_randaugment_applies_ops(rng):
    ra = RandAugment(num_ops=9, magnitude=9)
    img = Image.fromarray(rng.integers(0, 256, (64, 64, 3), dtype=np.uint8))
    out = ra(img, rng)
    assert out.size == (64, 64)
    assert not np.array_equal(np.asarray(out), np.asarray(img))


def test_loader_shapes_and_determinism():
    ds = SyntheticDataset(32, size=(48, 48))
    aug = DataAugmentationDINO((0.08, 1.0), (32, 32))

    def collect(seed):
        loader = DataLoader(ds, aug, batch_size=8, seed=seed, num_workers=2)
        return [b for b in loader]

    a, b = collect(7), collect(7)
    assert len(a) == 4
    for x, y in zip(a, b):
        assert x["image"].shape == (8, 32, 32, 3)
        assert x["erase"].shape == (8, 4)
        np.testing.assert_array_equal(x["image"], y["image"])
    c = collect(8)
    assert not np.array_equal(a[0]["image"], c[0]["image"])


def test_loader_per_host_sharding():
    ds = SyntheticDataset(64, size=(40, 40))
    aug = DataAugmentationDINO((0.08, 1.0), (32, 32))
    shards = []
    for pi in range(2):
        loader = DataLoader(ds, aug, batch_size=4, seed=3, num_workers=1,
                            process_index=pi, process_count=2, shuffle=False)
        shards.append({tuple(b["image"][j, 0, :3, 0]) for b in loader for j in range(4)})
    # loose check: the two hosts saw disjoint sample streams
    assert len(shards[0] & shards[1]) < len(shards[0])


def test_train_val_split_fractions(tmp_path):
    ds = SyntheticDataset(200)
    train, val = train_val_split(ds, 0.99, seed=1)
    assert len(train) == 198 and len(val) == 2
    assert set(train.images).isdisjoint(val.images)


def test_image_folder_listing(tmp_path, rng):
    for i, ext in enumerate([".jpg", ".jpeg", ".png", ".txt", ".gif"]):
        p = tmp_path / f"f{i}{ext}"
        if ext != ".txt":
            Image.fromarray(rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)).save(p)
        else:
            p.write_text("nope")
    ds = ImageFolderDataset(str(tmp_path))
    assert len(ds) == 3  # jpg/jpeg/png only (reference CustomDataset:44)


def test_device_preprocess_normalize_and_erase():
    import jax.numpy as jnp

    from dinov2_distillation_tpu.train.state import preprocess_batch

    img = np.full((1, 8, 8, 3), 128, np.uint8)
    batch = {
        "image": jnp.asarray(img),
        "erase": jnp.asarray([[2, 3, 4, 2]], np.int32),  # top=2,left=3,h=4,w=2
    }
    x = np.asarray(preprocess_batch(batch, dtype=jnp.float32))
    want = (128 / 255 - 0.485) / 0.229
    np.testing.assert_allclose(x[0, 0, 0, 0], want, atol=1e-3)
    assert np.all(x[0, 2:6, 3:5, :] == 0.0)        # erased region -> 0 post-norm
    assert np.all(x[0, 0:2, :, :] != 0.0)          # untouched rows
