"""One-hot replacements for tiny-axis dynamic gathers/scatters.

XLA lowers dynamic gathers and scatters to the TPU *scalar* core with S(1)
(scalar-memory) buffers — ~10 ns/element. Under vmap over thousands of envs,
every innocent `table[idx]` over a players/hand/color/rank/deck axis becomes
a scalar-unit gather of thousands of elements: the round-2 profile measured
219 us *per rollout step* for the (identity!) color-permutation gather at
game/encoder.py:44 and 84 us for `fireworks[color]` — together ~26% of the
rollout chunk. The same math as a one-hot select + reduction runs on the
8x128 vector unit instead, where a C=5- or H=5-wide contraction is a few
cycles per lane.

Use these for axes of size O(players/hand/colors/ranks/deck)=O(50); leave
genuinely large gathers (replay sampling over the capacity axis) to XLA's
native gather, which is memory-bound and fine.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def onehot(idx: jnp.ndarray, n: int) -> jnp.ndarray:
    """[..., n] bool; all-False for out-of-range (e.g. -1 = empty card)."""
    return idx[..., None] == jnp.arange(n, dtype=jnp.int32)


def take_vec(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table[..., n][idx] elementwise over the last axis: table may be [n] or
    broadcastable against idx's shape + [n]. Out-of-range idx -> 0/False."""
    oh = onehot(idx, table.shape[-1])
    if table.dtype == jnp.bool_:
        return jnp.any(oh & table, axis=-1)
    return jnp.sum(jnp.where(oh, table, 0), axis=-1).astype(table.dtype)


def take_row(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """arr[idx] for a scalar idx over arr's leading axis [n, ...]."""
    oh = onehot(idx, arr.shape[0]).reshape((arr.shape[0],) + (1,) * (arr.ndim - 1))
    if arr.dtype == jnp.bool_:
        return jnp.any(oh & arr, axis=0)
    return jnp.sum(jnp.where(oh, arr, 0), axis=0).astype(arr.dtype)


def take_rows(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """arr[idx] for a vector of indices over arr's leading axis:
    [n, ...][k] -> [k, ...]."""
    return jax.vmap(take_row, in_axes=(None, 0))(arr, idx)


def put_row(arr: jnp.ndarray, idx: jnp.ndarray, value: jnp.ndarray) -> jnp.ndarray:
    """arr.at[idx].set(value) over the leading axis (value broadcasts)."""
    oh = onehot(idx, arr.shape[0]).reshape((arr.shape[0],) + (1,) * (arr.ndim - 1))
    return jnp.where(oh, value, arr)


def add_at_vec(arr: jnp.ndarray, idx: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """arr.at[idx].add(delta) for a [n] vector."""
    return arr + jnp.where(onehot(idx, arr.shape[-1]), delta, 0).astype(arr.dtype)


def add_at_2d(
    arr: jnp.ndarray, i: jnp.ndarray, j: jnp.ndarray, delta: jnp.ndarray
) -> jnp.ndarray:
    """arr.at[i, j].add(delta) for a [n, m] matrix."""
    oh = onehot(i, arr.shape[0])[..., :, None] & onehot(j, arr.shape[1])[..., None, :]
    return arr + jnp.where(oh, delta, 0).astype(arr.dtype)


def permute_last(x: jnp.ndarray, perm: jnp.ndarray) -> jnp.ndarray:
    """x[..., inv] where inv = argsort(perm), WITHOUT the argsort + gather:
    out[..., d] = x[..., perm^-1(d)] = sum_c x[..., c] * (perm[c] == d).
    I.e. relabel the last axis from true to displayed colors."""
    oh = onehot(perm, perm.shape[-1])  # [C, C]: oh[c, d] = (perm[c] == d)
    if x.dtype == jnp.bool_:
        return jnp.any(x[..., :, None] & oh, axis=-2)
    return jnp.sum(jnp.where(oh, x[..., :, None], 0), axis=-2).astype(x.dtype)
