"""Host-level distributed communication helpers.

TPU-native counterpart of the reference's detectron2 ``comm`` copy
(``utils/logger.py:18-248``, duplicated in ``models/backbones/timm.py:22-252``
— one module here). NCCL/gloo process groups become the JAX multi-host
runtime: rank = ``jax.process_index()``, world = ``jax.process_count()``,
object collectives ride ``jax.experimental.multihost_utils``.

The per-machine "local process group" concept maps to
``jax.local_devices()``; there is exactly one process per host in the JAX
runtime, so local rank/size are host-local device facts.
"""

from __future__ import annotations

import pickle
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return get_rank() == 0


def get_local_size() -> int:
    """Devices on this host (reference local-group :43-107 analog)."""
    return jax.local_device_count()


def synchronize() -> None:
    """Barrier across hosts (reference :114-131)."""
    if get_world_size() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("dinov2_distillation_tpu.barrier")


def all_gather(data: Any) -> List[Any]:
    """All-gather an arbitrary picklable per host (reference :146-180)."""
    world = get_world_size()
    if world == 1:
        return [data]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(data), dtype=np.uint8)
    # pad to the max length across hosts
    n = np.asarray([payload.size], np.int32)
    all_n = np.asarray(multihost_utils.process_allgather(n)).reshape(-1)
    max_n = int(all_n.max())
    padded = np.zeros(max_n, np.uint8)
    padded[:payload.size] = payload
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    return [pickle.loads(gathered[i, :int(all_n[i])].tobytes()) for i in range(world)]


def gather(data: Any, dst: int = 0) -> List[Any]:
    """Gather picklables on one host (reference :183-202). The collective is
    an allgather under the hood; non-destination hosts get []."""
    out = all_gather(data)
    return out if get_rank() == dst else []


def shared_random_seed() -> int:
    """A random seed agreed on by all hosts (reference :205-216)."""
    seed = int(np.random.randint(2 ** 31))
    return int(all_gather(seed)[0])


def reduce_dict(input_dict: Dict[str, Any], average: bool = True) -> Dict[str, Any]:
    """Mean/sum-reduce scalar dicts across hosts (reference :219-248)."""
    world = get_world_size()
    if world < 2:
        return {k: float(v) for k, v in input_dict.items()}
    keys = sorted(input_dict.keys())
    values = np.asarray([float(input_dict[k]) for k in keys], np.float32)
    from jax.experimental import multihost_utils

    stacked = np.asarray(multihost_utils.process_allgather(values))
    reduced = stacked.mean(axis=0) if average else stacked.sum(axis=0)
    return {k: float(v) for k, v in zip(keys, reduced)}
