from .mesh import (
    DATA_AXIS,
    create_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    replicate_tree,
    local_batch_to_global,
)
