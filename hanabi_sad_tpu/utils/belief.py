"""Card-belief helpers (reference utils.py:390-443, OBL lineage).

v0: the hint-consistent card distribution per slot, normalized by remaining
card counts — what the canonical encoder's knowledge section encodes as a
mask, here weighted by availability.

get_v1: the iterative fixed-point refinement of v0 that discounts cards
visibly held in other hands (utils.py get_v1 — jit-scripted there, a jitted
lax.fori_loop here). check_v1 is the golden-recompute validator
(utils.py:430-443)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_v1(
    v0_joined: jnp.ndarray,
    card_counts: jnp.ndarray,
    max_count: int = 100,
    weight: float = 0.1,
) -> jnp.ndarray:
    """Iterated belief: v0_joined [batch, num_slots, 25] per-slot unnormalized
    hint-consistent distributions; card_counts [batch, 25] remaining copies.

    Matches the reference's damped iteration (utils.py:390-427): at each step,
    subtract the expected cards sitting in *other* slots from the count,
    re-mask, damp by `weight`, renormalize."""
    mask = (v0_joined > 0).astype(v0_joined.dtype)

    def body(_, v1_old):
        hand_cards = v1_old.sum(axis=1)  # [batch, 25]
        total = card_counts - hand_cards
        excluding_self = jnp.maximum(total[:, None, :] + v1_old, 0.0)
        v1_new = excluding_self * mask
        v1_new = v1_old * (1 - weight) + weight * v1_new
        v1_new = v1_new / (v1_new.sum(-1, keepdims=True) + 1e-8)
        return v1_new

    v0 = v0_joined / (v0_joined.sum(-1, keepdims=True) + 1e-8)
    return jax.lax.fori_loop(0, max_count, body, v0)


def check_v1(v0, v1, card_counts, atol: float = 1e-4) -> bool:
    """Golden recompute: does v1 match get_v1(v0)? (utils.py:430-443)."""
    ref = get_v1(v0, card_counts)
    return bool(jnp.max(jnp.abs(ref - v1)) <= atol)


def v0_from_state(cfg, state, player: jnp.ndarray) -> jnp.ndarray:
    """Public V0 belief for a player's own hand: per slot, the hint-consistent
    plausibility mask weighted by publicly-remaining card counts (full deck
    minus discards, fireworks piles, and other players' visible hands) —
    the standard Hanabi V0 (OBL lineage; the encoder's knowledge section is
    its unweighted mask). Returns [hand_size, num_cards], unnormalized."""
    from hanabi_sad_tpu.game.state import card_counts

    R = cfg.num_ranks
    counts = card_counts(cfg).astype(jnp.float32)  # [25]
    # discards
    counts = counts - state.discards.reshape(-1).astype(jnp.float32)
    # fireworks piles: color c has cards rank 0..h-1 played
    ranks = jnp.arange(R)[None, :]  # [1, R]
    played = (ranks < state.fireworks[:, None]).astype(jnp.float32).reshape(-1)
    counts = counts - played
    # other players' visible hands
    P = cfg.players
    others = jnp.arange(P) != player
    hands = state.hands  # [P, H]
    onehot = (hands[..., None] == jnp.arange(cfg.num_cards)) & (hands[..., None] >= 0)
    visible = (onehot & others[:, None, None]).sum((0, 1)).astype(jnp.float32)
    counts = jnp.maximum(counts - visible, 0.0)

    plaus = (
        state.color_plausible[player][:, :, None]
        & state.rank_plausible[player][:, None, :]
    ).reshape(cfg.hand_size, -1)
    occupied = (state.hands[player] >= 0)[:, None]
    return plaus.astype(jnp.float32) * counts[None, :] * occupied


def check_trajectory(priv_s: jnp.ndarray, terminal: jnp.ndarray) -> int:
    """Padding validation (utils.py:446-461): terminals form a suffix; returns
    the episode end index. priv_s [T, ...], terminal [T]."""
    import numpy as np

    t = np.asarray(terminal).astype(bool)
    ends = np.where(t)[0]
    assert ends.size > 0, "no terminal in trajectory"
    end = int(ends[0])
    assert t[end:].all(), "terminal flags must be a suffix"
    return end
