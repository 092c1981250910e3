from .mesh import (
    make_mesh,
    replicate,
    shard_batch,
    shard_batch_points,
)
