from .mesh import (
    global_batch_points,
    make_mesh,
    replicate,
    shard_batch,
    shard_batch_points,
)
