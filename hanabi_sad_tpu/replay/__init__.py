from hanabi_sad_tpu.replay.bitpack import pack_bits, unpack_bits, packed_size
from hanabi_sad_tpu.replay.prioritized import (
    ReplayConfig,
    ReplayState,
    init_replay,
    add,
    sample,
    update_priority,
)

__all__ = [
    "pack_bits",
    "unpack_bits",
    "packed_size",
    "ReplayConfig",
    "ReplayState",
    "init_replay",
    "add",
    "sample",
    "update_priority",
]
