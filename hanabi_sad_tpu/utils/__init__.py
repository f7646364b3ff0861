from hanabi_sad_tpu.utils.logger import Logger
from hanabi_sad_tpu.utils.saver import TopkSaver
from hanabi_sad_tpu.utils.counters import MultiCounter, ValueStats
from hanabi_sad_tpu.utils.stopwatch import Stopwatch
from hanabi_sad_tpu.utils.tachometer import Tachometer
from hanabi_sad_tpu.utils.helper import (
    enable_compilation_cache,
    generate_log_uniform,
    get_mem_usage,
    set_all_seeds,
)
from hanabi_sad_tpu.utils import belief
from hanabi_sad_tpu.utils import asserts

__all__ = [
    "Logger",
    "TopkSaver",
    "MultiCounter",
    "ValueStats",
    "Stopwatch",
    "Tachometer",
    "set_all_seeds",
    "generate_log_uniform",
    "get_mem_usage",
    "enable_compilation_cache",
    "belief",
]
