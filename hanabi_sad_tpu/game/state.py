"""Hanabi game state as a struct-of-arrays pytree.

One `GameState` holds a single game; the env layer vmaps every function over
thousands of games. All fields are fixed-shape jnp arrays so the whole game
steps inside jit with no host round-trips — this replaces hle::HanabiState
(reference cpp/hanabi_env.h:11, submodule interface in SURVEY.md §2.8).

Card code convention: code = color * num_ranks + rank, in [0, 25); -1 = empty.
Hands are kept compact: occupied slots form a prefix, removal shifts left and
a drawn card is appended at the end (HLE hand semantics).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hanabi_sad_tpu.game.config import CARDS_PER_RANK, GameConfig

# Move-type enum — matches the HLE uid layout order (discard, play,
# reveal-color, reveal-rank); NONE means "no non-deal move yet".
DISCARD = 0
PLAY = 1
REVEAL_COLOR = 2
REVEAL_RANK = 3
NO_OP = 4
NONE = 5


class LastAction(NamedTuple):
    """Record of the most recent non-deal move, with the outcome fields the
    canonical encoder needs (HLE HanabiHistoryItem equivalent)."""

    move_type: jnp.ndarray  # i32, one of the enum values above
    player: jnp.ndarray  # i32 absolute seat of the actor
    target: jnp.ndarray  # i32 absolute seat of hint target (reveal moves)
    color: jnp.ndarray  # i32 hinted color (reveal-color) else -1
    rank: jnp.ndarray  # i32 hinted rank (reveal-rank) else -1
    reveal_mask: jnp.ndarray  # [hand_size] bool, slots touched by the hint
    position: jnp.ndarray  # i32 slot played/discarded else -1
    card: jnp.ndarray  # i32 card code played/discarded else -1
    scored: jnp.ndarray  # bool, play succeeded
    info_add: jnp.ndarray  # bool, successful 5 regained an info token


class GameState(NamedTuple):
    deck: jnp.ndarray  # [deck_size] i32 card codes in deal order
    deck_ptr: jnp.ndarray  # i32, number of cards dealt so far
    hands: jnp.ndarray  # [P, H] i32 card code or -1
    # Hint-derived card knowledge (the "V0" belief of the canonical encoder):
    color_plausible: jnp.ndarray  # [P, H, C] bool
    rank_plausible: jnp.ndarray  # [P, H, R] bool
    color_hinted: jnp.ndarray  # [P, H, C] bool, direct positive color hint
    rank_hinted: jnp.ndarray  # [P, H, R] bool
    fireworks: jnp.ndarray  # [C] i32 in [0, R]
    info: jnp.ndarray  # i32 information tokens
    life: jnp.ndarray  # i32 life tokens
    discards: jnp.ndarray  # [C, R] i32 count of discarded copies
    cur_player: jnp.ndarray  # i32
    turns_left: jnp.ndarray  # i32 endgame countdown once deck is empty
    last: LastAction
    terminal: jnp.ndarray  # bool


def full_deck(cfg: GameConfig) -> jnp.ndarray:
    """The 50-card multiset as card codes, in (color, rank, copy) order."""
    cards = []
    for c in range(cfg.num_colors):
        for r in range(cfg.num_ranks):
            cards.extend([c * cfg.num_ranks + r] * CARDS_PER_RANK[r])
    return jnp.asarray(cards, dtype=jnp.int32)


def card_counts(cfg: GameConfig) -> jnp.ndarray:
    """[num_cards] copies of each card type in the deck."""
    counts = [CARDS_PER_RANK[r] for _ in range(cfg.num_colors) for r in range(cfg.num_ranks)]
    return jnp.asarray(counts, dtype=jnp.int32)


def empty_last_action(cfg: GameConfig) -> LastAction:
    i32 = lambda v: jnp.asarray(v, dtype=jnp.int32)
    return LastAction(
        move_type=i32(NONE),
        player=i32(-1),
        target=i32(-1),
        color=i32(-1),
        rank=i32(-1),
        reveal_mask=jnp.zeros((cfg.hand_size,), dtype=jnp.bool_),
        position=i32(-1),
        card=i32(-1),
        scored=jnp.asarray(False),
        info_add=jnp.asarray(False),
    )


def new_game(cfg: GameConfig, key: jax.Array) -> GameState:
    """Shuffle and deal a fresh game.

    Matches the reference reset (cpp/hanabi_env.cc:9-16): a new state's chance
    deals run to completion, leaving player 0 to move. Deal order is the HLE
    one — hand_size cards to player 0, then player 1, ... — so with a fixed
    shuffled deck the deal is deterministic.
    """
    P, H = cfg.players, cfg.hand_size
    deck = jax.random.permutation(key, full_deck(cfg))
    dealt = P * H
    hands = deck[:dealt].reshape(P, H)
    return GameState(
        deck=deck,
        deck_ptr=jnp.asarray(dealt, dtype=jnp.int32),
        hands=hands,
        color_plausible=jnp.ones((P, H, cfg.num_colors), dtype=jnp.bool_),
        rank_plausible=jnp.ones((P, H, cfg.num_ranks), dtype=jnp.bool_),
        color_hinted=jnp.zeros((P, H, cfg.num_colors), dtype=jnp.bool_),
        rank_hinted=jnp.zeros((P, H, cfg.num_ranks), dtype=jnp.bool_),
        fireworks=jnp.zeros((cfg.num_colors,), dtype=jnp.int32),
        info=jnp.asarray(cfg.max_info_tokens, dtype=jnp.int32),
        life=jnp.asarray(cfg.start_life, dtype=jnp.int32),
        discards=jnp.zeros((cfg.num_colors, cfg.num_ranks), dtype=jnp.int32),
        cur_player=jnp.asarray(0, dtype=jnp.int32),
        turns_left=jnp.asarray(P, dtype=jnp.int32),
        last=empty_last_action(cfg),
        terminal=jnp.asarray(False),
    )


def hand_sizes(state: GameState) -> jnp.ndarray:
    """[P] number of cards in each hand."""
    return jnp.sum(state.hands >= 0, axis=1, dtype=jnp.int32)


def score(state: GameState) -> jnp.ndarray:
    """Game score: sum of fireworks, zeroed on bomb-out (the SAD convention —
    the hengyuan-hu HLE fork scores a lost game as 0)."""
    raw = jnp.sum(state.fireworks, dtype=jnp.int32)
    return jnp.where(state.life > 0, raw, 0)
