"""Pallas fused multi-timestep LSTM.

STATUS — retired from the training path (round-2 decision). On-chip A/B in
the full sad_2p train chunk (BENCHMARKS.md "Round 2 A/B"): XLA lax.scan
172 ms/chunk vs pallas 177 ms/chunk — the kernel does not beat XLA's
scan+fused-matmul at [batch<=2048, hidden 512, T 80], so the production
net uses lax.scan unconditionally. The kernel stays as a tested, standalone
building block (tests/test_ops.py) for shapes where weight-streaming
dominates (much larger hidden sizes or batches).

The hot recurrent op of this framework: lax.scan over an LSTM re-reads the
weight matrices from HBM every timestep (80x per rollout/learner pass). This
kernel runs ALL T timesteps for a batch tile inside one pallas program with
the weights resident in VMEM — weight traffic drops from T reads to 1 — and
streams x_t in / o_t out with double-buffered async DMA.

VMEM budget (bf16, H=512, L=2, tile B=256): weights ~8.4 MB, h/c ~1 MB,
x/o staging ~1 MB — comfortably under the ~16 MB/core budget.

Layout notes:
  * weights are passed stacked: w_ih [L, H, 4H], w_hh [L, H, 4H], b [L, 4H]
    (layer 0 consumes the trunk output, so in_dim == hid_dim here — true for
    the R2D2 net whose trunk projects to hid_dim first, r2d2.py:42-51);
  * grid over batch tiles; each grid step owns a tile's full time loop, so
    the weight blocks are grid-invariant and stay resident.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except ImportError:  # pragma: no cover
    _PALLAS_OK = False


def pallas_lstm_available() -> bool:
    return _PALLAS_OK


def pick_block_b(B: int, cap: int = 256) -> int:
    """Largest divisor of B that is <= cap and a multiple of 8 (sublane
    alignment); falls back to B itself for small batches."""
    if B <= cap:
        return B
    best = 8
    for tb in range(cap, 7, -8):
        if B % tb == 0:
            best = tb
            break
    return best


def _kernel(x_hbm, h0, c0, w_ih, w_hh, b, out_hbm, hT, cT, x_buf, o_buf, h, c, sems):
    """One batch tile, all T steps.

    x_hbm: [T, B, H] full array (ANY/HBM; Mosaic requires trivial index maps
    for ANY-space operands, so the batch tile is sliced inside the DMA)
    h0/c0: [L, TB, H] (VMEM)       w_ih/w_hh: [L, H, 4H] (VMEM)  b: [L, 4H]
    out_hbm: [T, B, H] (ANY/HBM)   hT/cT: [L, TB, H] (VMEM out)
    scratch: x_buf/o_buf [2, TB, H] VMEM, h/c [L, TB, H] VMEM, sems DMA[4]
    """
    T = x_hbm.shape[0]
    L = h0.shape[0]
    tb = h0.shape[1]
    b0 = pl.multiple_of(pl.program_id(0) * tb, tb)

    h[...] = h0[...]
    c[...] = c0[...]

    def in_dma(slot, t):
        return pltpu.make_async_copy(
            x_hbm.at[t, pl.ds(b0, tb)], x_buf.at[slot], sems.at[slot]
        )

    def out_dma(slot, t):
        return pltpu.make_async_copy(
            o_buf.at[slot], out_hbm.at[t, pl.ds(b0, tb)], sems.at[2 + slot]
        )

    in_dma(0, 0).start()

    def step(t, _):
        slot = t % 2
        nxt = (t + 1) % 2

        @pl.when(t + 1 < T)
        def _():
            in_dma(nxt, t + 1).start()

        in_dma(slot, t).wait()
        x = x_buf[slot]
        for l in range(L):
            gates = (
                jnp.dot(x, w_ih[l], preferred_element_type=jnp.float32)
                + jnp.dot(h[l], w_hh[l], preferred_element_type=jnp.float32)
                + b[l].astype(jnp.float32)
            )
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c_new = jax.nn.sigmoid(f) * c[l].astype(jnp.float32) + jax.nn.sigmoid(
                i
            ) * jnp.tanh(g)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            h[l] = h_new.astype(h.dtype)
            c[l] = c_new.astype(c.dtype)
            x = h[l]

        # ship the top-layer output; wait for the previous write of this slot
        @pl.when(t >= 2)
        def _():
            out_dma(slot, t - 2).wait()

        o_buf[slot] = h[L - 1]
        out_dma(slot, t).start()
        return 0

    jax.lax.fori_loop(0, T, step, 0)
    # drain the last two in-flight writes
    @pl.when(T >= 2)
    def _():
        out_dma((T - 2) % 2, T - 2).wait()

    out_dma((T - 1) % 2, T - 1).wait()
    hT[...] = h[...]
    cT[...] = c[...]


def lstm_seq_pallas(
    params,
    xs: jnp.ndarray,
    hidden: Tuple[jnp.ndarray, jnp.ndarray],
    *,
    block_b: int = 256,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Drop-in for models.lstm.lstm_seq: xs [T, B, H] -> (outs [T, B, H],
    (h, c) [L, B, H]). Requires in_dim == hid_dim for every layer.

    params: list of {"w_ih","w_hh","b"} (models.lstm layout)."""
    assert _PALLAS_OK
    T, B, H = xs.shape
    L = len(params)
    for p in params:
        assert p["w_ih"].shape[0] == H, "pallas LSTM needs in_dim == hid_dim"

    dt = xs.dtype
    w_ih = jnp.stack([p["w_ih"] for p in params]).astype(dt)
    w_hh = jnp.stack([p["w_hh"] for p in params]).astype(dt)
    b = jnp.stack([p["b"] for p in params]).astype(dt)
    h0, c0 = hidden
    h0 = h0.astype(dt)
    c0 = c0.astype(dt)

    tb = min(block_b, B)
    assert B % tb == 0, f"batch {B} not divisible by tile {tb}"

    grid = (B // tb,)
    kernel = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # full xs; tile sliced in-kernel
            pl.BlockSpec((L, tb, H), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, tb, H), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, H, 4 * H), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, H, 4 * H), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 4 * H), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # full out; tile sliced in-kernel
            pl.BlockSpec((L, tb, H), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, tb, H), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), dt),
            jax.ShapeDtypeStruct((L, B, H), dt),
            jax.ShapeDtypeStruct((L, B, H), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, tb, H), dt),
            pltpu.VMEM((2, tb, H), dt),
            pltpu.VMEM((L, tb, H), dt),
            pltpu.VMEM((L, tb, H), dt),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )
    outs, hT, cT = kernel(xs, h0, c0, w_ih, w_hh, b)
    return outs, (hT, cT)


# ---------------------------------------------------------------------------
# Differentiable wrapper: pallas forward, scan-based backward.
#
# The kernel itself has no transpose rule; the learner differentiates through
# the sequence forward (r2d2_agent.td_error), so we pair the fast pallas
# forward with a backward that calls the lax.scan implementation's VJP. The
# backward recomputes its own forward (rematerialized BPTT — the same cost
# profile the scan path already has), so gradients are exact and only the
# forward gets cheaper.
# ---------------------------------------------------------------------------


@jax.custom_vjp
def lstm_seq_pallas_diff(params, xs, hidden):
    return lstm_seq_pallas(params, xs, hidden, block_b=pick_block_b(xs.shape[1]))


def _diff_fwd(params, xs, hidden):
    out = lstm_seq_pallas_diff(params, xs, hidden)
    return out, (params, xs, hidden)


def _diff_bwd(res, g):
    from hanabi_sad_tpu.models import lstm as lstm_mod

    params, xs, hidden = res
    _, vjp = jax.vjp(lstm_mod.lstm_seq, params, xs, hidden)
    return vjp(g)


lstm_seq_pallas_diff.defvjp(_diff_fwd, _diff_bwd)
