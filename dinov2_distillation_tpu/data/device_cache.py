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

Multi-chip / multi-host layout (r4): the staged frames form ONE global
array sharded over the mesh ``data`` axis — each host decodes and stages
only its ``1/world`` of the dataset, and the per-step gather runs inside a
``shard_map`` so every device reads exclusively from its own HBM shard
(zero gather collectives; the per-epoch permutation is drawn within each
shard, so device ``d``'s slice of the global batch always lands in shard
``d``). Every host derives the same permutation from the shared seed, so
the tiny (B,) index vector rides into the jitted program as a replicated
host value — no cross-host index exchange.

The stochastic pipeline stays fully intact — RandomResizedCrop/flip/
RandAugment/erase re-randomize every epoch on device (device_augment) — so
caching the deterministic staging frame loses nothing. For datasets larger
than HBM, fall back to the streaming ``DataLoader``.

Reference counterpart: none — the reference re-decodes and re-augments on
12 CPU workers per GPU epoch after epoch (``datasets/CustomDataset.py:156-
182``); this module exists because a TPU host may have neither the cores
nor the link for that. The within-shard shuffle mirrors torch
``DistributedSampler``'s per-rank subset semantics
(``datasets/CustomDataset.py:156-182`` via Lightning DDP), with the
distinction that the rank<->sample assignment is fixed at staging time.
"""

from __future__ import annotations

import time
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..parallel.mesh import DATA_AXIS
from ..utils.logger import get_logger

logger = get_logger()


def gather_frames(frames: jnp.ndarray, indices: jnp.ndarray, *,
                  mesh=None, shard_size: int = 0,
                  per_device: int = 0) -> jnp.ndarray:
    """(B,) global row ids -> (B, S, S, 3) staged frames.

    With a >1-wide data axis the gather runs under ``shard_map``: device
    ``d`` slices its ``per_device`` rows out of the (replicated) index
    vector and gathers them from its local frame shard (the loader
    guarantees slice ``d`` only holds shard-``d`` rows), so no collective
    is ever emitted — the XLA SPMD partitioner would otherwise have to
    mask+psum the gathered batch across the axis. Call under jit, fused
    with the augmentation program.
    """
    if mesh is None or mesh.shape[DATA_AXIS] == 1:
        out = jnp.take(frames, indices, axis=0)
        if mesh is not None:
            # pin the batch layout for the augmentation program (ADVICE r3)
            out = jax.lax.with_sharding_constraint(
                out, NamedSharding(mesh, P(DATA_AXIS)))
        return out

    def local_gather(f, i):
        d = jax.lax.axis_index(DATA_AXIS)
        li = jax.lax.dynamic_slice_in_dim(i, d * per_device, per_device)
        return jnp.take(f, li - d * shard_size, axis=0)

    return jax.shard_map(
        local_gather, mesh=mesh,
        in_specs=(P(DATA_AXIS), P()), out_specs=P(DATA_AXIS))(frames, indices)


class DeviceFrameCache:
    """Decode + stage every frame once into a (sharded) device array; serve
    shuffled global batches by shard-local on-device index gather.

    ``dataset`` yields file paths (data.dataset.ImageFolderDataset);
    ``transform`` is the host StagingTransform (native JPEG decode + fixed
    resize to a square uint8 frame); ``batch_size`` is the GLOBAL batch.
    """

    def __init__(
        self,
        dataset,
        transform,
        batch_size: int,
        *,
        mesh=None,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        max_bytes: Optional[int] = None,
    ):
        self.batch_size = int(batch_size)
        self.mesh = mesh
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = 0

        n_data = mesh.shape[DATA_AXIS] if mesh is not None else 1
        if self.batch_size % n_data != 0:
            raise ValueError(f"global batch {batch_size} not divisible by "
                             f"data-axis size {n_data}")
        self.per_device = self.batch_size // n_data
        self.n = n = len(dataset)
        s = transform.staging_size
        # frames per data shard; rows >= n wrap onto real frames (the same
        # ceil-divide padding as torch DistributedSampler's total_size)
        self.shard_size = max(1, (n + n_data - 1) // n_data)
        self.n_pad = self.shard_size * n_data
        self.n_data = n_data

        frame_bytes = s * s * 3
        global_shape = (self.n_pad, s, s, 3)
        if mesh is not None:
            sharding = NamedSharding(mesh, P(DATA_AXIS))
            idx_map = sharding.addressable_devices_indices_map(global_shape)
            starts = [sl[0].start or 0 for sl in idx_map.values()]
            stops = [sl[0].stop if sl[0].stop is not None else self.n_pad
                     for sl in idx_map.values()]
            lo, hi = min(starts), max(stops)
        else:
            sharding = None
            lo, hi = 0, self.n_pad
        if max_bytes is not None and (hi - lo) * frame_bytes > max_bytes:
            raise ValueError(
                f"host shard ({hi - lo} frames x {frame_bytes} B) exceeds the "
                f"device cache budget {max_bytes} B; use the streaming "
                f"DataLoader")

        t0 = time.time()
        frames = np.empty((hi - lo, s, s, 3), np.uint8)
        rng = np.random.default_rng(seed)
        paths = getattr(dataset, "images", None)
        for j, row in enumerate(range(lo, hi)):
            i = row % n  # global padding rows duplicate real frames
            arr = None
            if paths is not None and hasattr(transform, "from_path"):
                got = transform.from_path(paths[i], rng)
                if got is not None:
                    arr = got[0]
            if arr is None:
                img = dataset.load(i) if hasattr(dataset, "load") else dataset[i]
                arr = transform(img, rng)[0]
            frames[j] = arr
        t_decode = time.time() - t0
        t0 = time.time()
        if sharding is not None:
            self.frames = jax.make_array_from_process_local_data(
                sharding, frames, global_shape)
        else:
            self.frames = jax.device_put(frames)
        jax.block_until_ready(self.frames)
        t_put = time.time() - t0
        logger.info(
            f"DeviceFrameCache: staged {hi - lo} frames locally "
            f"({(hi - lo) * frame_bytes / 1e6:.0f} MB, {self.n_pad} global "
            f"over {n_data} shard(s)) — decode {t_decode:.1f}s, "
            f"device_put {t_put:.1f}s")

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        if self.drop_last:
            return self.shard_size // self.per_device
        return (self.shard_size + self.per_device - 1) // self.per_device

    def epoch_rows(self) -> np.ndarray:
        """(n_data, shard_size) absolute row ids, permuted within each shard
        (so step slices stay shard-aligned for the collective-free gather).
        Derived purely from (seed, epoch): identical on every host."""
        rows = np.arange(self.n_pad).reshape(self.n_data, self.shard_size)
        if not self.shuffle:
            return rows
        rng = np.random.default_rng((self.seed, self.epoch))
        return rng.permuted(rows, axis=1)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        """Yields {'indices': (B,) int32, 'mask': (B,) f32} host-replicated
        values; the consumer runs the gather under jit via
        ``gather_frames``. mask is 1 for real unique samples — global
        padding rows and tail wraps get 0 (unbiased val metrics)."""
        rows = self.epoch_rows()
        valid = rows < self.n
        pd = self.per_device
        for b in range(len(self)):
            sl = rows[:, b * pd:(b + 1) * pd]
            vl = valid[:, b * pd:(b + 1) * pd]
            if sl.shape[1] < pd:  # tail batch: wrap within shard, mask 0
                wrap = np.arange(pd - sl.shape[1]) % self.shard_size
                sl = np.concatenate([sl, rows[:, wrap]], axis=1)
                vl = np.concatenate(
                    [vl, np.zeros((self.n_data, len(wrap)), bool)], axis=1)
            yield {"indices": sl.reshape(-1).astype(np.int32),
                   "mask": vl.reshape(-1).astype(np.float32)}


class CachedLoader:
    """DataLoader facade over a DeviceFrameCache: yields INDEX batches
    ({'indices': (B,) i32, 'erase': zeros[, 'mask']}) — the trainer skips
    host sharding (``device_resident``) and fuses the shard-local frame
    gather into the jitted augmentation program
    (train/loop._augment_on_device), exactly like bench.py's measured
    configuration. The erase placeholder is replaced by the device
    augmentation, which samples its own rects."""

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
        for item in self.cache:
            batch = {"indices": item["indices"],
                     "erase": np.zeros((bsz, 4), np.int32)}
            if self.with_mask:
                batch["mask"] = item["mask"]
            yield batch


def build_cached_loaders(cfg, transform, *, mesh=None,
                         global_batch: Optional[int] = None, seed: int = 42):
    """Train/val CachedLoaders per the config (``data_loader.cache: device``).
    Works single- AND multi-host: each host stages only its shard of the
    global frame array. Raises ValueError when the host's shard exceeds the
    HBM budget (``data_loader.cache_budget_gb``, default 8) — the trainer
    falls back to the streaming loader."""
    from .loader import build_datasets

    budget = int(float(cfg.data_loader.get("cache_budget_gb", 8.0)) * 2**30)
    train_ds, val_ds = build_datasets(cfg, seed)
    n_hosts = jax.process_count()
    s = transform.staging_size
    need = (len(train_ds) + len(val_ds)) * s * s * 3 // n_hosts
    if need > budget:
        raise ValueError(
            f"dataset needs ~{need / 2**30:.1f} GiB of staged frames per "
            f"host, over the {budget / 2**30:.1f} GiB device-cache budget "
            f"(data_loader.cache_budget_gb)")
    bsz = int(global_batch if global_batch is not None
              else cfg.data_loader.batch_size)
    train_cache = DeviceFrameCache(train_ds, transform, batch_size=bsz,
                                   mesh=mesh, shuffle=True, seed=seed,
                                   drop_last=True, max_bytes=budget)
    val_cache = DeviceFrameCache(val_ds, transform, batch_size=bsz,
                                 mesh=mesh, shuffle=False, seed=seed + 1,
                                 drop_last=False, max_bytes=budget)
    return CachedLoader(train_cache), CachedLoader(val_cache, with_mask=True)
