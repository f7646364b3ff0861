"""Fused multi-layer LSTM for TPU.

Gate layout is torch-compatible (i, f, g, o order, separate input/hidden
kernels) so released reference checkpoints (.pthw state dicts for
torch.nn.LSTM — reference r2d2.py:48-51) map 1:1 onto these params. Each step
is two fused [B, in] @ [in, 4H] matmuls — exactly the shape the MXU wants —
and the sequence unroll is a lax.scan.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

LSTMLayerParams = Dict[str, jnp.ndarray]  # {"w_ih": [in,4H], "w_hh": [H,4H], "b": [4H]}
LSTMParams = List[LSTMLayerParams]
Hidden = Tuple[jnp.ndarray, jnp.ndarray]  # (h, c) each [L, B, H]


def init_lstm(key: jax.Array, in_dim: int, hid_dim: int, num_layers: int) -> LSTMParams:
    """torch.nn.LSTM default init: U(-k, k) with k = 1/sqrt(hid_dim) for every
    weight and bias (the two torch biases b_ih+b_hh collapse into one here, so
    b ~ sum of two U(-k,k))."""
    k = 1.0 / jnp.sqrt(hid_dim)
    params = []
    for layer in range(num_layers):
        d_in = in_dim if layer == 0 else hid_dim
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        params.append(
            {
                "w_ih": jax.random.uniform(k1, (d_in, 4 * hid_dim), jnp.float32, -k, k),
                "w_hh": jax.random.uniform(k2, (hid_dim, 4 * hid_dim), jnp.float32, -k, k),
                "b": (
                    jax.random.uniform(k3, (4 * hid_dim,), jnp.float32, -k, k)
                    + jax.random.uniform(k4, (4 * hid_dim,), jnp.float32, -k, k)
                ),
            }
        )
    return params


def _cell(p: LSTMLayerParams, x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray):
    """One LSTM cell step in x.dtype (bf16-friendly: the two fused matmuls hit
    the MXU; the cell state keeps x's dtype). x: [B, in], h/c: [B, H]."""
    dt = x.dtype
    gates = x @ p["w_ih"].astype(dt) + h @ p["w_hh"].astype(dt) + p["b"].astype(dt)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def lstm_step(params: LSTMParams, x: jnp.ndarray, hidden: Hidden) -> Tuple[jnp.ndarray, Hidden]:
    """One time step through all layers. x: [B, in], hidden: ([L,B,H], [L,B,H]).
    Returns (top-layer output [B, H], new hidden). Compute runs in x.dtype;
    the returned hidden keeps the incoming hidden's dtype so scan carries
    stay stable."""
    h, c = hidden
    hdt = h.dtype
    hs, cs = [], []
    out = x
    for layer, p in enumerate(params):
        h_new, c_new = _cell(p, out, h[layer].astype(x.dtype), c[layer].astype(x.dtype))
        hs.append(h_new.astype(hdt))
        cs.append(c_new.astype(hdt))
        out = h_new
    return out, (jnp.stack(hs), jnp.stack(cs))


def lstm_seq(
    params: LSTMParams, xs: jnp.ndarray, hidden: Hidden, unroll: int = 1
) -> Tuple[jnp.ndarray, Hidden]:
    """Full sequence. xs: [T, B, in] -> (outputs [T, B, H], final hidden).
    scan over time; layers fused per step (the standard recurrent tradeoff —
    batch width, not time, is the TPU parallelism axis). unroll > 1 widens
    the compiled loop body by that many time steps — the per-step matmuls
    here are far below MXU saturation, so letting XLA software-pipeline
    consecutive steps can cut fixed per-iteration overhead."""

    def body(hid, x):
        out, hid = lstm_step(params, x, hid)
        return hid, out

    hidden, outs = jax.lax.scan(body, hidden, xs, unroll=unroll)
    return outs, hidden


def zero_hidden(num_layers: int, batch: int, hid_dim: int, dtype=jnp.float32) -> Hidden:
    shape = (num_layers, batch, hid_dim)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)
