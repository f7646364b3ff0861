from hanabi_sad_tpu.utils.logger import Logger
from hanabi_sad_tpu.utils.saver import TopkSaver
from hanabi_sad_tpu.utils.counters import MultiCounter, ValueStats
from hanabi_sad_tpu.utils.stopwatch import Stopwatch
from hanabi_sad_tpu.utils.tachometer import Tachometer

__all__ = ["Logger", "TopkSaver", "MultiCounter", "ValueStats", "Stopwatch", "Tachometer"]
