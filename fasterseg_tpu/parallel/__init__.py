from .mesh import (
    DATA_AXIS,
    SPATIAL_AXIS,
    make_mesh,
    replicated,
    batch_sharding,
    spatial_sharding,
    shard_batch,
    replicate,
)
