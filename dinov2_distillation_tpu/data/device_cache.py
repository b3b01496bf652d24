"""Device-resident frame cache: the dataset lives in HBM, batches never
cross the host link.

Motivation (r3 measurement): this host has ONE cpu (~2.7 ms/JPEG decode ->
~365 img/s ceiling) and the host->device link moves ~0.03 GB/s (a 50 MB
staged batch costs >1 s) — either one starves a chip that trains at
1800 img/s. For datasets that fit in HBM (a 224-class staging frame is
~196 KB; 16 GB holds ~80k frames), the TPU-native answer is to pay decode +
transfer ONCE and serve every epoch from device memory: per-epoch shuffling
is a host permutation of INDICES (bytes, not images), and the batch
"loader" is a device gather fused into the augmentation program.

The stochastic pipeline stays fully intact — RandomResizedCrop/flip/
RandAugment/erase re-randomize every epoch on device (device_augment) — so
caching the deterministic staging frame loses nothing. For datasets larger
than HBM, fall back to the streaming ``DataLoader``.

Reference counterpart: none — the reference re-decodes and re-augments on
12 CPU workers per GPU epoch after epoch (``datasets/CustomDataset.py:156-
182``); this module exists because a TPU host may have neither the cores
nor the link for that.
"""

from __future__ import annotations

import time
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.logger import get_logger

logger = get_logger()


class DeviceFrameCache:
    """Decode + stage every frame once into a device array; serve shuffled
    batches by on-device index gather.

    ``dataset`` yields file paths (data.dataset.ImageFolderDataset);
    ``transform`` is the host StagingTransform (native JPEG decode + fixed
    resize to a square uint8 frame)."""

    def __init__(
        self,
        dataset,
        transform,
        batch_size: int,
        *,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        max_bytes: Optional[int] = None,
    ):
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = 0

        n = len(dataset)
        s = transform.staging_size
        frame_bytes = s * s * 3
        if max_bytes is not None and n * frame_bytes > max_bytes:
            raise ValueError(
                f"dataset ({n} frames x {frame_bytes} B) exceeds the device "
                f"cache budget {max_bytes} B; use the streaming DataLoader")

        t0 = time.time()
        frames = np.empty((n, s, s, 3), np.uint8)
        rng = np.random.default_rng(seed)
        paths = getattr(dataset, "images", None)
        for i in range(n):
            arr = None
            if paths is not None and hasattr(transform, "from_path"):
                got = transform.from_path(paths[i], rng)
                if got is not None:
                    arr = got[0]
            if arr is None:
                img = dataset.load(i) if hasattr(dataset, "load") else dataset[i]
                arr = transform(img, rng)[0]
            frames[i] = arr
        t_decode = time.time() - t0
        t0 = time.time()
        self.frames = jax.device_put(frames)
        self.frames.block_until_ready()
        t_put = time.time() - t0
        logger.info(
            f"DeviceFrameCache: staged {n} frames ({n * frame_bytes / 1e6:.0f}"
            f" MB) — decode {t_decode:.1f}s, device_put {t_put:.1f}s")
        self.n = n

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        if self.drop_last:
            return self.n // self.batch_size
        return (self.n + self.batch_size - 1) // self.batch_size

    def epoch_indices(self) -> np.ndarray:
        if not self.shuffle:
            return np.arange(self.n)
        rng = np.random.default_rng((self.seed, self.epoch))
        return rng.permutation(self.n)

    def __iter__(self) -> Iterator[jnp.ndarray]:
        """Yields per-batch device index arrays (the gather runs inside the
        consumer's jitted program via ``take``)."""
        idx = self.epoch_indices()
        nb = len(self)
        for b in range(nb):
            chunk = idx[b * self.batch_size:(b + 1) * self.batch_size]
            if len(chunk) < self.batch_size:
                pad = np.take(idx, np.arange(self.batch_size - len(chunk))
                              % self.n, mode="wrap")
                chunk = np.concatenate([chunk, pad])
            yield jnp.asarray(chunk, jnp.int32)

    def take(self, indices: jnp.ndarray) -> jnp.ndarray:
        """(B,) indices -> (B, S, S, 3) uint8 staged frames (device gather —
        row-major DMA, call under jit fused with the augmentation)."""
        return jnp.take(self.frames, indices, axis=0)


class CachedLoader:
    """DataLoader facade over a DeviceFrameCache: yields INDEX batches
    ({'indices': (B,) i32 device, 'erase': zeros[, 'mask']}) — the trainer
    skips host sharding (``device_resident``) and fuses the frame gather
    into the jitted augmentation program (train/loop._augment_on_device),
    exactly like bench.py's measured configuration. The erase placeholder
    is replaced by the device augmentation, which samples its own rects."""

    device_resident = True

    def __init__(self, cache: DeviceFrameCache, with_mask: bool = False):
        self.cache = cache
        self.with_mask = with_mask

    def __len__(self) -> int:
        return len(self.cache)

    def set_epoch(self, epoch: int) -> None:
        self.cache.set_epoch(epoch)

    def __iter__(self):
        bsz = self.cache.batch_size
        n_real = self.cache.n
        for b, idx in enumerate(self.cache):
            batch = {"indices": idx,
                     "erase": jnp.zeros((bsz, 4), jnp.int32)}
            if self.with_mask:
                real = min(bsz, n_real - b * bsz)  # tail wrap size
                batch["mask"] = jnp.asarray(
                    (np.arange(bsz) < real).astype(np.float32))
            yield batch


def build_cached_loaders(cfg, transform, seed: int = 42):
    """Train/val CachedLoaders per the config (``data_loader.cache: device``).
    Single-process only: the cache is per-host HBM. Raises ValueError when
    the dataset exceeds the HBM budget (``data_loader.cache_budget_gb``,
    default 8) — the trainer falls back to the streaming loader."""
    import jax as _jax

    if _jax.process_count() > 1:
        raise ValueError("data_loader.cache=device is single-host; use the "
                         "streaming DataLoader for multi-host runs")
    from .loader import build_datasets

    budget = int(float(cfg.data_loader.get("cache_budget_gb", 8.0)) * 2**30)
    train_ds, val_ds = build_datasets(cfg, seed)
    s = transform.staging_size
    need = (len(train_ds) + len(val_ds)) * s * s * 3
    if need > budget:
        raise ValueError(
            f"dataset needs {need / 2**30:.1f} GiB of staged frames, over the "
            f"{budget / 2**30:.1f} GiB device-cache budget "
            f"(data_loader.cache_budget_gb)")
    bsz = int(cfg.data_loader.batch_size)
    train_cache = DeviceFrameCache(train_ds, transform, batch_size=bsz,
                                   shuffle=True, seed=seed, drop_last=True,
                                   max_bytes=budget)
    val_cache = DeviceFrameCache(val_ds, transform, batch_size=bsz,
                                 shuffle=False, seed=seed + 1, drop_last=False,
                                 max_bytes=budget)
    return CachedLoader(train_cache), CachedLoader(val_cache, with_mask=True)
