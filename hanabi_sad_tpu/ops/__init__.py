"""Custom TPU kernels.

Production compute runs entirely on XLA-generated kernels: the on-chip A/B
(commit a0eb949, BENCHMARKS.md "pallas A/B") showed XLA's fused scan beats the
hand-written pallas LSTM and replay-gather kernels at this model's sizes
(512-dim LSTM, [batch, 838] features), so nothing here is imported by the
training or eval paths.

`ops.experimental` keeps the retired-but-correct pallas kernels (with their
tests) as reference implementations should a future TPU generation or model
size flip the trade-off.
"""
