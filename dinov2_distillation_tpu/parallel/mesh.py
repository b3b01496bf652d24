"""Device mesh and sharding layout.

TPU-native replacement for the reference's Lightning-DDP/NCCL layer
(``config/config.yaml:62-67``, ``train.py:256-270``): instead of one process
per GPU with gradient allreduce, we build a ``jax.sharding.Mesh`` over the
slice and annotate shardings — XLA inserts the collectives over ICI/DCN.

The reference only needs data parallelism (models are <=30M params), but the
mesh keeps a ``model`` axis available so larger teachers / future TP work slot
in without restructuring (SURVEY.md §2.6).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    *,
    model_parallel: int = 1,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    ``model_parallel`` divides the device count; the remaining factor becomes
    the data axis. With the default ``model_parallel=1`` this is pure DP —
    the parity configuration with the reference's DDP.
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    n = devices.size
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = devices.reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names=(DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))

def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_batch_size(global_batch_size: int, mesh: Mesh) -> int:
    """Per-host batch size for a per-host-sharded input pipeline.

    The reference's ``batch_size`` is per-GPU (``config/config.yaml:75``);
    ours is per-chip. Each host feeds its local shard of the global batch
    (replaces torch's DistributedSampler).
    """
    n_data = mesh.shape[DATA_AXIS]
    if global_batch_size % n_data != 0:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by data-parallel size {n_data}"
        )
    return global_batch_size // jax.process_count()


def shard_batch(batch, mesh: Mesh):
    """Device-put a host-local numpy batch as a globally sharded array.

    Partial final batches (e.g. the 1% val split) are padded up to a
    data-axis multiple by wrapping samples — the same semantics as torch's
    ``DistributedSampler`` (used implicitly by the reference's Lightning DDP
    val loader), which repeats indices so every rank gets an equal count.
    """
    sharding = batch_sharding(mesh)
    n_data = mesh.shape[DATA_AXIS]

    def put(x, pad_zero=False):
        x = np.asarray(x)
        b = x.shape[0]
        if b % n_data:
            target = ((b + n_data - 1) // n_data) * n_data
            if pad_zero:
                x = np.concatenate(
                    [x, np.zeros((target - b,) + x.shape[1:], x.dtype)])
            else:
                x = np.take(x, np.arange(target) % b, axis=0)
        return jax.make_array_from_process_local_data(sharding, x)

    if isinstance(batch, dict):
        # 'mask' marks sample validity: pads get 0, not wrapped duplicates,
        # so downstream masked metrics ignore them (VERDICT r2 #10)
        return {k: jax.tree_util.tree_map(
                    lambda x, z=(k == "mask"): put(x, z), v)
                for k, v in batch.items()}
    return jax.tree_util.tree_map(put, batch)
