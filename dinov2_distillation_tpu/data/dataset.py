"""Image datasets: flat-directory listing, split, synthetic fixtures.

Parity with the reference ``datasets/CustomDataset.py``: list ``*.jpg/.png/
.jpeg`` files across a list of directories (:38-46), images only (no labels,
:53-69); when no val dir is given, split train 99/1 (:113, 141-149) — we use
a seeded permutation so the split is reproducible across hosts/restarts
(torch ``random_split`` used the global torch RNG).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np
from PIL import Image

_EXTS = (".jpg", ".png", ".jpeg")


class ImageFolderDataset:
    """Flat-directory image dataset (reference CustomDataset:14-69)."""

    def __init__(self, img_dirs: Union[str, Sequence[str]], paths: Optional[List[str]] = None):
        if paths is not None:
            self.images = list(paths)
            self.img_dirs = []
            return
        if isinstance(img_dirs, str):
            img_dirs = [img_dirs]
        self.img_dirs = list(img_dirs)
        self.images: List[str] = []
        for d in self.img_dirs:
            for name in sorted(os.listdir(d)):
                if name.lower().endswith(_EXTS):
                    self.images.append(os.path.join(d, name))

    def __len__(self) -> int:
        return len(self.images)

    def load(self, idx: int) -> Image.Image:
        return Image.open(self.images[idx]).convert("RGB")


def train_val_split(
    dataset: ImageFolderDataset,
    train_fraction: float = 0.99,
    seed: int = 42,
) -> Tuple[ImageFolderDataset, ImageFolderDataset]:
    """Seeded 99/1 split (reference CustomDataModule:141-149)."""
    n = len(dataset)
    n_train = int(train_fraction * n)
    perm = np.random.default_rng(seed).permutation(n)
    paths = np.asarray(dataset.images)
    train = ImageFolderDataset([], paths=list(paths[perm[:n_train]]))
    val = ImageFolderDataset([], paths=list(paths[perm[n_train:]]))
    return train, val


class SyntheticDataset:
    """Random-image stand-in for benchmarks and tests (no reference
    counterpart — the reference had no test fixtures at all, SURVEY.md §4)."""

    def __init__(self, n: int = 1024, size: Tuple[int, int] = (256, 256), seed: int = 0):
        self.n = n
        self.size = size
        self.seed = seed
        self.images = [f"synthetic://{i}" for i in range(n)]

    def __len__(self) -> int:
        return self.n

    def load(self, idx: int) -> Image.Image:
        rng = np.random.default_rng(self.seed * 100003 + idx)
        h, w = self.size
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        return Image.fromarray(arr, "RGB")
