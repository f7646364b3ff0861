from hanabi_sad_tpu.parallel.mesh import (
    make_mesh,
    data_sharding,
    replicated_sharding,
    shard_train_state,
    initialize_multihost,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated_sharding",
    "shard_train_state",
    "initialize_multihost",
]
