"""Host-side batch loader: threaded decode/augment + background prefetch.

Replaces the reference's torch ``DataLoader`` (``datasets/CustomDataset.py:
156-182``). Differences, all TPU-motivated:

  * **per-host sharding** — each JAX process loads a strided shard of the
    global index permutation (replaces DistributedSampler; reference had one
    process per GPU, we have one per TPU host);
  * **static shapes** — ``drop_last`` defaults True for train so every step
    compiles once (torch's default ragged final batch would retrigger XLA
    compilation); val wraps around to fill the final batch instead;
  * **threads, not processes** — PIL decode/resize release the GIL, and the
    batch assembly is numpy; a background thread keeps a small prefetch
    queue ahead of the device;
  * **deterministic RNG** — per (seed, epoch, sample) Philox streams, so a
    restart mid-training resumes the same augmentation sequence regardless
    of worker count (torch used the global RNG).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np


class DataLoader:
    def __init__(
        self,
        dataset,
        transform,
        batch_size: int,
        *,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 4,
        drop_last: bool = True,
        prefetch: int = 2,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.dataset = dataset
        self.transform = transform
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.process_index = process_index
        self.process_count = process_count
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _local_indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            order = np.random.default_rng((self.seed, self.epoch)).permutation(n)
        else:
            order = np.arange(n)
        if self.process_count > 1:
            # wrap-pad so every host gets the SAME sample count (torch
            # DistributedSampler semantics) — unequal per-host batch counts
            # desync the cross-host collectives in the jitted step (found by
            # scripts/multihost_smoke.py, r3)
            per = (n + self.process_count - 1) // self.process_count
            order = np.take(order, np.arange(per * self.process_count) % n)
        return order[self.process_index::self.process_count]

    def __len__(self) -> int:
        n = len(self.dataset)
        n_local = ((n + self.process_count - 1) // self.process_count
                   if self.process_count > 1 else n)
        if self.drop_last:
            return n_local // self.batch_size
        return (n_local + self.batch_size - 1) // self.batch_size

    def _load_one(self, idx: int):
        rng = np.random.default_rng((self.seed, self.epoch, int(idx)))
        if hasattr(self.transform, "from_path"):
            # native decode fast path (GIL-free C++); None -> PIL fallback
            out = self.transform.from_path(self.dataset.images[int(idx)], rng)
            if out is not None:
                return out
        img = self.dataset.load(int(idx))
        return self.transform(img, rng)

    def _make_batch(self, idxs: np.ndarray, pool: ThreadPoolExecutor) -> Dict[str, np.ndarray]:
        results = list(pool.map(self._load_one, idxs))
        images = np.stack([r[0] for r in results])
        erase = np.asarray([r[1] for r in results], np.int32)
        return {"image": images, "erase": erase}

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        idxs = self._local_indices()
        bs = self.batch_size
        n_steps = len(self)
        if n_steps == 0:
            return
        # wrap-around fill for the non-drop_last final batch (static shapes)
        if not self.drop_last and len(idxs) % bs != 0:
            pad = bs - (len(idxs) % bs)
            idxs = np.concatenate([idxs, idxs[:pad]])

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                for step in range(n_steps):
                    if stop.is_set():
                        return
                    batch = self._make_batch(idxs[step * bs:(step + 1) * bs], pool)
                    q.put(batch)
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()
            # drain so the producer can exit
            while not q.empty():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break


def build_datasets(cfg, seed: int = 42):
    """Train/val dataset pair from the config (reference
    CustomDataModule:106-182: flat dirs or the seeded 99/1 split)."""
    from .dataset import ImageFolderDataset, SyntheticDataset, train_val_split

    dl_cfg = cfg.data_loader
    data_dir = dl_cfg.get("data_dir", None)
    if data_dir in (None, "synthetic") or (
            isinstance(data_dir, (list, tuple)) and list(data_dir) == ["synthetic"]):
        n = int(dl_cfg.get("synthetic_size", 2048))
        train_ds: object = SyntheticDataset(n)
        val_ds: object = SyntheticDataset(max(1, n // 99), seed=1)
    else:
        full = ImageFolderDataset(data_dir)
        val_dir = dl_cfg.get("val_dir", None)
        if val_dir is None:
            train_ds, val_ds = train_val_split(full, 0.99, seed=seed)
        else:
            train_ds, val_ds = full, ImageFolderDataset(val_dir)
    return train_ds, val_ds


def build_loaders(cfg, transform, *, process_index: int = 0, process_count: int = 1,
                  seed: int = 42):
    """Datamodule-equivalent: train/val loaders from the config
    (reference CustomDataModule:106-182 + train.py:144-165)."""
    dl_cfg = cfg.data_loader
    train_ds, val_ds = build_datasets(cfg, seed)

    common = dict(
        transform=transform,
        batch_size=int(dl_cfg.batch_size),
        num_workers=int(dl_cfg.get("num_workers", 4)),
        process_index=process_index,
        process_count=process_count,
        seed=seed,
    )
    train_loader = DataLoader(train_ds, shuffle=True, drop_last=True, **common)
    # Validation reuses the stochastic train transform — reference parity
    # (SURVEY.md §3.3: no eval transform exists; val runs on augmented images).
    val_loader = DataLoader(val_ds, shuffle=False, drop_last=False, **common)
    return train_loader, val_loader
