from .mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    create_mesh,
    local_batch_size,
    replicated,
    shard_batch,
)
