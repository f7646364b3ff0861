"""HBM-resident prioritized sequence replay.

TPU-native redesign of rela::PrioritizedReplay<RNNTransition>
(rela/prioritized_replay.h:180-368): the reference keeps episodes in a mutex-
guarded CPU ring buffer with a linear-scan stratified sampler and async
prefetch threads; here the whole buffer is a fixed-shape pytree living in
device memory, writes are ring-cursor scatters, and the stratified
proportional sampler is a cumsum + searchsorted — all inside jit, so sampling
fuses into the training step and nothing ever crosses to the host.

Semantics preserved:
  * priorities are raised to alpha on add/update (prioritized_replay.h:192-197,
    242-257);
  * sampling is stratified proportional — one uniform draw per equal-weight
    segment (prioritized_replay.h:274-326);
  * importance weights (size * p / sum)^-beta, normalized by the batch max
    (prioritized_replay.h:337-339);
  * capacity eviction drops the oldest items (ring overwrite vs. the
    reference's sample-time head eviction — statistically equivalent for an
    asynchronous buffer).

Observations are stored bitpacked (see bitpack.py).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from hanabi_sad_tpu.agent.r2d2_agent import Batch
from hanabi_sad_tpu.replay.bitpack import pack_bits, packed_size, unpack_bits


@dataclasses.dataclass(frozen=True)
class ReplayConfig:
    capacity: int  # episodes
    seq_len: int  # T (max episode length, 80)
    num_player: int  # Pi: players per item (VDN = P, IQL = 1)
    obs_dim: int  # priv_s feature size
    num_actions: int
    hand_size: int = 5
    alpha: float = 0.9  # priority exponent (--priority_exponent)
    beta: float = 0.6  # IS exponent (--priority_weight)

    @property
    def bits_per_step(self) -> int:
        return self.obs_dim + self.num_actions + 3 * self.hand_size

    @property
    def bytes_per_step(self) -> int:
        return packed_size(self.bits_per_step)


class ReplayState(NamedTuple):
    packed: jnp.ndarray  # [cap, T, Pi, bytes] uint8: priv_s | legal | own_hand
    action: jnp.ndarray  # [cap, T, Pi] i32
    reward: jnp.ndarray  # [cap, T] f32 (n-step discounted)
    bootstrap: jnp.ndarray  # [cap, T] f32
    seq_len: jnp.ndarray  # [cap] f32
    weight: jnp.ndarray  # [cap] f32 = priority**alpha
    write_ptr: jnp.ndarray  # i32 ring cursor
    size: jnp.ndarray  # i32 valid items
    num_add: jnp.ndarray  # i32 lifetime adds


def init_replay(cfg: ReplayConfig) -> ReplayState:
    cap, T, Pi = cfg.capacity, cfg.seq_len, cfg.num_player
    return ReplayState(
        packed=jnp.zeros((cap, T, Pi, cfg.bytes_per_step), jnp.uint8),
        action=jnp.zeros((cap, T, Pi), jnp.int32),
        reward=jnp.zeros((cap, T), jnp.float32),
        bootstrap=jnp.zeros((cap, T), jnp.float32),
        seq_len=jnp.ones((cap,), jnp.float32),
        weight=jnp.zeros((cap,), jnp.float32),
        write_ptr=jnp.asarray(0, jnp.int32),
        size=jnp.asarray(0, jnp.int32),
        num_add=jnp.asarray(0, jnp.int32),
    )


class EpisodeBatch(NamedTuple):
    """M new episodes to ingest (already n-step processed and padded)."""

    priv_s: jnp.ndarray  # [M, T, Pi, F]
    legal_move: jnp.ndarray  # [M, T, Pi, A]
    own_hand: jnp.ndarray  # [M, T, Pi, 3*hand]
    action: jnp.ndarray  # [M, T, Pi] i32
    reward: jnp.ndarray  # [M, T]
    bootstrap: jnp.ndarray  # [M, T]
    seq_len: jnp.ndarray  # [M]


def add(state: ReplayState, cfg: ReplayConfig, ep: EpisodeBatch, priority: jnp.ndarray) -> ReplayState:
    """Ring-scatter M episodes with priority^alpha weights."""
    bits = jnp.concatenate([ep.priv_s, ep.legal_move, ep.own_hand], axis=-1)
    return add_packed(
        state, cfg, pack_bits(bits), ep.action, ep.reward, ep.bootstrap, ep.seq_len,
        priority,
    )


def add_packed(
    state: ReplayState,
    cfg: ReplayConfig,
    packed: jnp.ndarray,  # [M, T, Pi, bytes] uint8 (priv|legal|own_hand bits)
    action: jnp.ndarray,
    reward: jnp.ndarray,
    bootstrap: jnp.ndarray,
    seq_len: jnp.ndarray,
    priority: jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,
) -> ReplayState:
    """add() for already-bitpacked episodes (the continuous rollout keeps its
    stream packed end to end). `valid` masks empty slots: valid items compact
    onto consecutive ring positions; all invalid items scatter onto the single
    position just past the last valid write, where they collide only with
    each other, carry weight 0 (never sampled), and get overwritten by the
    next call's first valid item. `valid=None` means all M are real."""
    M = seq_len.shape[0]
    if valid is None:
        idx = (state.write_ptr + jnp.arange(M, dtype=jnp.int32)) % cfg.capacity
        advance = jnp.asarray(M, jnp.int32)
        w = jnp.power(priority, cfg.alpha)
    else:
        valid = valid.astype(bool)
        offsets = jnp.cumsum(valid.astype(jnp.int32)) - valid.astype(jnp.int32)
        advance = valid.sum().astype(jnp.int32)
        scratch = (state.write_ptr + advance) % cfg.capacity
        idx = jnp.where(valid, (state.write_ptr + offsets) % cfg.capacity, scratch)
        w = jnp.where(valid, jnp.power(priority, cfg.alpha), 0.0)
    return ReplayState(
        packed=state.packed.at[idx].set(packed),
        action=state.action.at[idx].set(action.astype(jnp.int32)),
        reward=state.reward.at[idx].set(reward.astype(jnp.float32)),
        bootstrap=state.bootstrap.at[idx].set(bootstrap.astype(jnp.float32)),
        seq_len=state.seq_len.at[idx].set(jnp.maximum(seq_len.astype(jnp.float32), 1.0)),
        weight=state.weight.at[idx].set(w),
        write_ptr=(state.write_ptr + advance) % cfg.capacity,
        size=jnp.minimum(state.size + advance, cfg.capacity),
        num_add=state.num_add + advance,
    )


def sample_indices(
    state: ReplayState, cfg: ReplayConfig, keys: jax.Array, batchsize: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stratified proportional draw of indices + IS weights from the CURRENT
    priority state, for one or many batches at once.

    `keys` is either a single PRNG key (returns idx/is_w of shape [B]) or a
    stack of U keys (returns [U, B]). All U batches share one weight prefix
    sum — this is the reference prefetcher's priority-snapshot semantics
    (prioritized_replay.h:216-239: up to `prefetch` future batches are drawn
    before the learner's updatePriority feedback lands); each batch is its
    own stratified draw, matching U successive sample() calls against a
    frozen priority state."""
    single = keys.ndim == 1
    if single:
        keys = keys[None]
    valid = jnp.arange(cfg.capacity) < state.size
    w = jnp.where(valid, state.weight, 0.0)
    cum = jnp.cumsum(w)
    total = cum[-1]
    seg = total / batchsize

    def one(key):
        u = jax.random.uniform(key, (batchsize,))
        targets = (jnp.arange(batchsize) + u) * seg
        targets = jnp.minimum(targets, total * (1 - 1e-6))
        idx = jnp.searchsorted(cum, targets, side="right").astype(jnp.int32)
        return jnp.minimum(idx, cfg.capacity - 1)

    idx = jax.vmap(one)(keys)  # [U, B]
    w_sel = w[idx]
    p = w_sel / jnp.maximum(total, 1e-30)
    is_w = jnp.power(state.size.astype(jnp.float32) * p, -cfg.beta)
    is_w = is_w / jnp.maximum(is_w.max(axis=-1, keepdims=True), 1e-30)
    if single:
        return idx[0], is_w[0]
    return idx, is_w


class ReplayRows(NamedTuple):
    """Raw (still bitpacked) replay rows for a set of sampled indices —
    the prefetch payload handed into the update scan by snapshot sampling."""

    packed: jnp.ndarray  # [..., T, Pi, bytes] uint8
    action: jnp.ndarray  # [..., T, Pi] i32
    reward: jnp.ndarray  # [..., T] f32
    bootstrap: jnp.ndarray  # [..., T] f32
    seq_len: jnp.ndarray  # [...] f32


def gather_rows(state: ReplayState, idx: jnp.ndarray) -> ReplayRows:
    return ReplayRows(
        packed=state.packed[idx],
        action=state.action[idx],
        reward=state.reward[idx],
        bootstrap=state.bootstrap[idx],
        seq_len=state.seq_len[idx],
    )


def rows_to_batch(cfg: ReplayConfig, rows: ReplayRows) -> Batch:
    """Unpack one batch of gathered rows ([B, T, ...]) into the time-major
    learner Batch ([T, B, ...])."""
    bits = unpack_bits(rows.packed, cfg.bits_per_step)  # [B, T, Pi, n_bits]
    F, A = cfg.obs_dim, cfg.num_actions
    priv_s = bits[..., :F]
    legal = bits[..., F : F + A]
    own_hand = bits[..., F + A :]

    seq_len = rows.seq_len
    T = cfg.seq_len
    t_idx = jnp.arange(T, dtype=jnp.float32)[:, None]
    terminal = (t_idx >= (seq_len[None, :] - 1)).astype(jnp.float32)

    to_time_major = lambda x: jnp.swapaxes(x, 0, 1)  # [B, T, ...] -> [T, B, ...]
    return Batch(
        priv_s=to_time_major(priv_s),
        legal_move=to_time_major(legal),
        action=to_time_major(rows.action),
        own_hand=to_time_major(own_hand),
        reward=to_time_major(rows.reward),
        terminal=terminal,
        bootstrap=to_time_major(rows.bootstrap),
        seq_len=seq_len,
    )


def sample(
    state: ReplayState, cfg: ReplayConfig, key: jax.Array, batchsize: int
) -> Tuple[Batch, jnp.ndarray, jnp.ndarray]:
    """Stratified proportional sample of `batchsize` episodes.

    Returns (Batch [T, B, Pi, ...], is_weight [B], indices [B]). The caller
    must feed the indices back through update_priority after the gradient
    step (the reference enforces this protocol with a runtime assert,
    prioritized_replay.h:209-212; here the training loop is synchronous by
    construction)."""
    idx, is_w = sample_indices(state, cfg, key, batchsize)
    batch = rows_to_batch(cfg, gather_rows(state, idx))
    return batch, is_w, idx


def update_priority(
    state: ReplayState, cfg: ReplayConfig, idx: jnp.ndarray, priority: jnp.ndarray
) -> ReplayState:
    """Learner feedback: weight[idx] = priority^alpha (prioritized_replay.h:242-257).

    Duplicate indices (stratified sampling can return the same episode twice)
    scatter in unspecified order, but the duplicate writes always carry
    identical values: duplicate rows of the sampled batch are bit-identical
    inputs, and the per-row TD-error compute is deterministic, so every write
    to a given slot is the same number and the order is immaterial. (The
    reference resolves dupes by sequential overwrite, prioritized_replay.h:
    242-257 — same outcome for the same reason.)"""
    return state._replace(weight=state.weight.at[idx].set(jnp.power(priority, cfg.alpha)))
