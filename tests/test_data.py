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


# ---------------------------------------------------------------------------
# Sharded device frame cache (r4): frames live in HBM sharded over the mesh
# data axis; gathers are shard-local (no collectives). Multi-host analog of
# torch DistributedSampler (/root/reference/datasets/CustomDataset.py:156-182)
# with the rank<->sample assignment fixed at staging time.
# ---------------------------------------------------------------------------


class _FrameIdTransform:
    """Staging transform stub: frame pixels encode the dataset index."""

    staging_size = 8

    def __call__(self, img, rng):
        return img, None


class _IdDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def load(self, i):
        return np.full((8, 8, 3), i % 256, np.uint8)


@pytest.fixture(scope="module")
def data_mesh():
    from dinov2_distillation_tpu.parallel.mesh import create_mesh

    return create_mesh()  # (data=8, model=1) on the virtual CPU mesh


def test_device_cache_sharded_layout_and_alignment(data_mesh):
    """Frames are padded/sharded over the data axis; every batch keeps
    device d's slice inside shard d (the invariant that makes the
    shard_map gather collective-free)."""
    from dinov2_distillation_tpu.data.device_cache import DeviceFrameCache

    n = 37  # not divisible by the 8-wide data axis
    cache = DeviceFrameCache(_IdDataset(n), _FrameIdTransform(),
                             batch_size=16, mesh=data_mesh, shuffle=True,
                             seed=0, drop_last=True)
    assert cache.n_pad == cache.shard_size * 8
    assert cache.frames.shape[0] == cache.n_pad
    host = np.asarray(cache.frames)
    for r in range(cache.n_pad):  # pad rows wrap onto real frames
        assert host[r, 0, 0, 0] == (r % n) % 256
    for epoch in range(2):
        cache.set_epoch(epoch)
        for item in cache:
            idx = item["indices"].reshape(8, cache.per_device)
            for d in range(8):
                lo, hi = d * cache.shard_size, (d + 1) * cache.shard_size
                assert ((idx[d] >= lo) & (idx[d] < hi)).all()


def test_device_cache_gather_matches_take(data_mesh):
    """shard_map shard-local gather == plain global take."""
    import jax
    import jax.numpy as jnp

    from dinov2_distillation_tpu.data.device_cache import (
        DeviceFrameCache, gather_frames)

    cache = DeviceFrameCache(_IdDataset(64), _FrameIdTransform(),
                             batch_size=16, mesh=data_mesh, shuffle=True,
                             seed=3, drop_last=True)
    item = next(iter(cache))
    got = jax.jit(lambda f, i: gather_frames(
        f, i, mesh=data_mesh, shard_size=cache.shard_size,
        per_device=cache.per_device))(cache.frames, jnp.asarray(item["indices"]))
    ref = np.take(np.asarray(cache.frames), item["indices"], axis=0)
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_device_cache_epoch_coverage_and_reshuffle(data_mesh):
    """Each epoch covers every row exactly once (up to drop_last tails) and
    epochs reshuffle within shards."""
    from dinov2_distillation_tpu.data.device_cache import DeviceFrameCache

    cache = DeviceFrameCache(_IdDataset(64), _FrameIdTransform(),
                             batch_size=16, mesh=data_mesh, shuffle=True,
                             seed=0, drop_last=True)
    def epoch_rows(e):
        cache.set_epoch(e)
        return [tuple(item["indices"]) for item in cache]

    e0, e1 = epoch_rows(0), epoch_rows(1)
    flat0 = [i for b in e0 for i in b]
    assert sorted(flat0) == list(range(64))  # 64 rows, 4 batches of 16
    assert e0 != e1, "epochs must reshuffle"
    assert sorted(i for b in e1 for i in b) == list(range(64))


def test_device_cache_val_mask_unbiased(data_mesh):
    """Validation masks are 1 exactly once per REAL sample: global pad rows
    and tail wraps get 0, so val metrics are unbiased."""
    from dinov2_distillation_tpu.data.device_cache import (
        CachedLoader, DeviceFrameCache)

    n = 37
    cache = DeviceFrameCache(_IdDataset(n), _FrameIdTransform(),
                             batch_size=16, mesh=data_mesh, shuffle=False,
                             seed=1, drop_last=False)
    loader = CachedLoader(cache, with_mask=True)
    valid_rows = []
    for b in loader:
        for v, m in zip(b["indices"], b["mask"]):
            if m:
                valid_rows.append(int(v))
    assert len(valid_rows) == n
    assert sorted(valid_rows) == list(range(n))


def test_device_cache_single_device_mesh_parity():
    """A 1-wide data axis degenerates to the r3 single-chip behavior
    (global permutation, plain take gather)."""
    import jax

    from dinov2_distillation_tpu.parallel.mesh import create_mesh
    from dinov2_distillation_tpu.data.device_cache import DeviceFrameCache

    mesh1 = create_mesh(jax.devices()[:1])
    cache = DeviceFrameCache(_IdDataset(32), _FrameIdTransform(),
                             batch_size=8, mesh=mesh1, shuffle=True,
                             seed=0, drop_last=True)
    assert cache.shard_size == 32 and cache.per_device == 8
    rows = [i for item in cache for i in item["indices"]]
    assert sorted(rows) == list(range(32))
