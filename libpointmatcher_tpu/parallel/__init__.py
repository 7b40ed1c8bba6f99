from .sharding import (  # noqa: F401
    make_mesh,
    shard_cloud,
    replicate_cloud,
    sharded_knn,
    sharded_block_nn1,
    sharded_tile_nn1,
)
from .batch import register_batch, register_batch_to_map  # noqa: F401
from .stream import register_queue_to_map, queue_eligible  # noqa: F401
