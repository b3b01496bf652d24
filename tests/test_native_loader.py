"""Native C++ staging loader: decode/resize correctness + fallbacks."""

import numpy as np
import pytest
from PIL import Image

from dinov2_distillation_tpu.data.native_loader import native_available, stage_jpeg_file


@pytest.fixture(scope="module")
def jpeg(tmp_path_factory, ):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (96, 128, 3), dtype=np.uint8)
    p = d / "t.jpg"
    Image.fromarray(arr).save(p, quality=95)
    return str(p)


def test_native_builds():
    assert native_available(), "native staging loader failed to build/load"


def test_decode_matches_pil(jpeg):
    out = stage_jpeg_file(jpeg, 64, 64)
    assert out is not None and out.shape == (64, 64, 3) and out.dtype == np.uint8
    ref = np.asarray(Image.open(jpeg).convert("RGB").resize((64, 64), Image.BILINEAR))
    diff = np.abs(out.astype(np.float32) - ref.astype(np.float32)).mean()
    assert diff < 2.0, f"mean abs diff vs PIL: {diff}"


def test_grayscale_jpeg(tmp_path):
    arr = np.random.default_rng(1).integers(0, 256, (64, 64), dtype=np.uint8)
    p = tmp_path / "g.jpg"
    Image.fromarray(arr).save(p)
    out = stage_jpeg_file(str(p), 32, 32)
    assert out is not None and out.shape == (32, 32, 3)


def test_non_jpeg_falls_back(tmp_path):
    arr = np.zeros((16, 16, 3), np.uint8)
    p = tmp_path / "x.png"
    Image.fromarray(arr).save(p)
    assert stage_jpeg_file(str(p), 16, 16) is None


def test_corrupt_jpeg_falls_back(tmp_path):
    p = tmp_path / "bad.jpg"
    p.write_bytes(b"\xff\xd8\xff\xe0garbage")
    assert stage_jpeg_file(str(p), 16, 16) is None


def test_loader_uses_native_path(tmp_path, rng):
    from dinov2_distillation_tpu.data.augment import StagingTransform
    from dinov2_distillation_tpu.data.dataset import ImageFolderDataset
    from dinov2_distillation_tpu.data.loader import DataLoader

    for i in range(4):
        arr = rng.integers(0, 256, (80, 80, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / f"{i}.jpg")
    ds = ImageFolderDataset(str(tmp_path))
    loader = DataLoader(ds, StagingTransform(staging_size=48), batch_size=4,
                        num_workers=2, shuffle=False)
    batch = next(iter(loader))
    assert batch["image"].shape == (4, 48, 48, 3)
    assert np.all(batch["erase"] == 0)  # staging path defers erase to device
