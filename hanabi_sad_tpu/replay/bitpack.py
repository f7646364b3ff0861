"""Bit packing for binary observation vectors.

The canonical Hanabi observation is {0,1}-valued, so replay stores it as
packed uint8 — 8x smaller than the reference's float32 CPU storage
(rela/transition.h obs tensors), which is what makes an HBM-resident replay
of 2^17 80-step episodes fit in a single chip's memory (~1.2 GB instead of
~35 GB). Pack on ingest, unpack on sample; both are pure vectorized ops.
"""

from __future__ import annotations

import jax.numpy as jnp

def _powers() -> jnp.ndarray:
    # Little-endian bit order. Computed lazily: a module-level jnp constant
    # would initialize the XLA backend at import time, which breaks
    # jax.distributed.initialize() (train/selfplay.py multihost guard).
    return 2 ** jnp.arange(8, dtype=jnp.uint8)


def packed_size(n_bits: int) -> int:
    return (n_bits + 7) // 8


def pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """[..., n_bits] 0/1 (any dtype) -> [..., ceil(n_bits/8)] uint8."""
    n_bits = bits.shape[-1]
    n_bytes = packed_size(n_bits)
    pad = n_bytes * 8 - n_bits
    b = bits.astype(jnp.uint8)
    if pad:
        b = jnp.concatenate(
            [b, jnp.zeros(b.shape[:-1] + (pad,), jnp.uint8)], axis=-1
        )
    b = b.reshape(b.shape[:-1] + (n_bytes, 8))
    return (b * _powers()).sum(-1).astype(jnp.uint8)


def unpack_bits(packed: jnp.ndarray, n_bits: int, dtype=jnp.float32) -> jnp.ndarray:
    """[..., n_bytes] uint8 -> [..., n_bits] of `dtype` (0/1)."""
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (packed[..., None] >> shifts) & 1
    bits = bits.reshape(packed.shape[:-1] + (packed.shape[-1] * 8,))
    return bits[..., :n_bits].astype(dtype)
