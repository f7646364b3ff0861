"""Pallas fused replay gather + bit-unpack.

STATUS — retired from the training path (round-2 decision, same A/B as
ops/pallas_lstm.py): measured within noise of the XLA gather + unpack inside
the real train chunk, so replay/prioritized.py uses the XLA path
unconditionally. Kept as a tested, standalone building block.

Sampling gathers B episodes of bitpacked observations from the [capacity, ...]
HBM buffer and expands them 8x to 0/1 features. Doing this as two XLA ops
materializes the gathered packed bytes; this kernel fuses the indexed gather
(via scalar-prefetched indices driving the BlockSpec index_map) with the
unpack, so only the unpacked tile ever exists — and it's written straight to
the consumer's layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except ImportError:  # pragma: no cover
    _PALLAS_OK = False


def _kernel(idx_ref, packed_ref, out_ref):
    # packed_ref: [1, R, NB] uint8 for the episode selected by idx_ref[i];
    # out_ref: [1, R, NB*8] float32
    p = packed_ref[0].astype(jnp.int32)  # [R, NB]
    bits = []
    for shift in range(8):
        bits.append((p >> shift) & 1)
    stacked = jnp.stack(bits, axis=-1)  # [R, NB, 8]
    out_ref[0] = stacked.reshape(out_ref.shape[1], -1).astype(jnp.float32)


def gather_unpack_pallas(
    packed: jnp.ndarray, idx: jnp.ndarray, *, interpret: bool = False
) -> jnp.ndarray:
    """packed: [cap, T, Pi, NB] uint8; idx: [B] int32 ->
    [B, T, Pi, NB*8] float32 (callers slice off the padding bits)."""
    assert _PALLAS_OK
    cap, T, Pi, NB = packed.shape
    B = idx.shape[0]
    rows = T * Pi
    packed2 = packed.reshape(cap, rows, NB)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, rows, NB),
                lambda i, idx_ref: (idx_ref[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, rows, NB * 8), lambda i, idx_ref: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, rows, NB * 8), jnp.float32),
        interpret=interpret,
    )(idx.astype(jnp.int32), packed2)
    return out.reshape(B, T, Pi, NB * 8)
