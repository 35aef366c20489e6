from .mesh import (  # noqa: F401
    DATA_AXIS,
    batch_sharding,
    device_prefetch,
    make_mesh,
    pad_batch_to,
    replicate_tree,
    replicated,
    shard_batch,
    warmup_collectives,
)
