from hanabi_sad_tpu.ops.pallas_lstm import lstm_seq_pallas, pallas_lstm_available
from hanabi_sad_tpu.ops.pallas_replay import gather_unpack_pallas

__all__ = ["lstm_seq_pallas", "pallas_lstm_available", "gather_unpack_pallas"]
