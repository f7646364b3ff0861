"""Retired experimental pallas kernels — NOT on any production path.

Both kernels were A/B'd in the real train chunk on a v5e chip (commit
a0eb949): XLA's fused `lax.scan` LSTM and native gather were as fast or
faster at this framework's sizes, so the flags routing production traffic
here were removed. The kernels stay correctness-tested (tests/test_ops.py)
as working pallas references for larger models or future hardware.

- `pallas_lstm.lstm_seq_pallas`: fused multi-layer LSTM sequence kernel
  (batch-tiled, custom VJP via scan backward).
- `pallas_replay.gather_unpack_pallas`: fused prioritized-replay gather +
  bitfield unpack from HBM.
"""

from hanabi_sad_tpu.ops.experimental.pallas_lstm import (
    lstm_seq_pallas,
    pallas_lstm_available,
)
from hanabi_sad_tpu.ops.experimental.pallas_replay import gather_unpack_pallas

__all__ = ["lstm_seq_pallas", "pallas_lstm_available", "gather_unpack_pallas"]
