"""Core Hanabi rules: apply a move to a GameState, fully branchless.

Re-implements the behavior of hle::HanabiState::ApplyMove + ApplyRandomChance
as used by the reference env (cpp/hanabi_env.cc:49-113; interface in
SURVEY.md §2.8), as pure fixed-shape array ops suitable for vmap/jit:

  * play/discard remove a card (hand shifts left), then draw from the deck
    (appended at the end of the hand) — the chance "deal" move is folded in.
  * hints consume an info token and update the target's plausible/hinted
    knowledge masks.
  * once the deck is empty every player gets exactly one more move
    (turns_left countdown), then the game is terminal.
  * terminal when life <= 0, score == 25, or countdown exhausted.

The no-op uid advances the turn without touching the board (it is only ever
legal when a player has no real legal move).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hanabi_sad_tpu.game import tpuops
from hanabi_sad_tpu.game.config import GameConfig
from hanabi_sad_tpu.game.moves import Move
from hanabi_sad_tpu.game.state import (
    DISCARD,
    PLAY,
    REVEAL_COLOR,
    REVEAL_RANK,
    GameState,
    LastAction,
    hand_sizes,
)


class MoveOutcome(NamedTuple):
    """What applying `move` to `state` does — computed *before* mutating, so
    the SAD greedy-action channel can be encoded without cloning the state
    (the reference clones hle::HanabiState instead, cpp/hanabi_env.cc:82-91)."""

    last: LastAction


def _remove_and_draw(
    cfg: GameConfig, state: GameState, player: jnp.ndarray, pos: jnp.ndarray, do: jnp.ndarray
):
    """Remove hand[player][pos], shift left, draw a card to the end if the deck
    has one. Returns (hands, knowledge arrays, deck_ptr). `do` gates the whole
    operation (False for hint/no-op moves)."""
    H = cfg.hand_size
    idx = jnp.arange(H, dtype=jnp.int32)
    # source index for each slot after removing `pos`: slots < pos unchanged,
    # slots >= pos pull from the right; the last slot becomes empty.
    src = jnp.where(idx >= pos, jnp.minimum(idx + 1, H - 1), idx)
    keep = idx < H - 1
    shifted_valid = keep | (idx < pos)  # last slot only valid if pos == H (never)

    hand = tpuops.take_row(state.hands, player)
    new_hand = jnp.where(shifted_valid, tpuops.take_rows(hand, src), -1)

    def shift_k(k_all):  # [P, H, D] knowledge arrays; select player's, shift
        k = tpuops.take_row(k_all, player)
        return jnp.where(shifted_valid[:, None], tpuops.take_rows(k, src), False)

    cp = shift_k(state.color_plausible)
    rp = shift_k(state.rank_plausible)
    ch = shift_k(state.color_hinted)
    rh = shift_k(state.rank_hinted)

    # Draw: the hand is compact, so the first empty slot is old_size - 1.
    old_size = jnp.sum(hand >= 0, dtype=jnp.int32)
    draw_slot = old_size - 1
    can_draw = state.deck_ptr < cfg.deck_size
    draw_card = tpuops.take_vec(state.deck, jnp.minimum(state.deck_ptr, cfg.deck_size - 1))
    at_slot = idx == draw_slot
    new_hand = jnp.where(at_slot & can_draw, draw_card, new_hand)
    # Fresh knowledge for the drawn card.
    cp = jnp.where(at_slot[:, None] & can_draw, True, cp)
    rp = jnp.where(at_slot[:, None] & can_draw, True, rp)
    ch = jnp.where(at_slot[:, None] & can_draw, False, ch)
    rh = jnp.where(at_slot[:, None] & can_draw, False, rh)

    new_deck_ptr = state.deck_ptr + jnp.where(can_draw, 1, 0)

    # Gate by `do` and write back into the [P, H, ...] arrays.
    sel = do
    hands = tpuops.put_row(state.hands, player, jnp.where(sel, new_hand, hand))
    color_plausible = tpuops.put_row(
        state.color_plausible, player,
        jnp.where(sel, cp, tpuops.take_row(state.color_plausible, player)),
    )
    rank_plausible = tpuops.put_row(
        state.rank_plausible, player,
        jnp.where(sel, rp, tpuops.take_row(state.rank_plausible, player)),
    )
    color_hinted = tpuops.put_row(
        state.color_hinted, player,
        jnp.where(sel, ch, tpuops.take_row(state.color_hinted, player)),
    )
    rank_hinted = tpuops.put_row(
        state.rank_hinted, player,
        jnp.where(sel, rh, tpuops.take_row(state.rank_hinted, player)),
    )
    deck_ptr = jnp.where(sel, new_deck_ptr, state.deck_ptr)
    return hands, color_plausible, rank_plausible, color_hinted, rank_hinted, deck_ptr


def move_outcome(cfg: GameConfig, state: GameState, move: Move) -> LastAction:
    """The LastAction record that applying `move` to `state` would produce.
    Pure function of the pre-move state — used both for the real move and for
    the SAD greedy-action channel."""
    R = cfg.num_ranks
    player = state.cur_player
    target = (player + move.target_offset) % cfg.players

    is_pd = (move.move_type == PLAY) | (move.move_type == DISCARD)
    pos = jnp.clip(move.position, 0, cfg.hand_size - 1)
    card = jnp.where(is_pd, tpuops.take_vec(tpuops.take_row(state.hands, player), pos), -1)
    ccolor = jnp.maximum(card, 0) // R
    crank = jnp.maximum(card, 0) % R

    scored = (
        (move.move_type == PLAY)
        & (card >= 0)
        & (tpuops.take_vec(state.fireworks, ccolor) == crank)
    )
    info_add = scored & (crank == R - 1) & (state.info < cfg.max_info_tokens)

    t_hand = tpuops.take_row(state.hands, target)
    t_occ = t_hand >= 0
    color_match = t_occ & (t_hand // R == move.color)
    rank_match = t_occ & (t_hand % R == move.rank)
    reveal_mask = jnp.where(
        move.move_type == REVEAL_COLOR,
        color_match,
        jnp.where(move.move_type == REVEAL_RANK, rank_match, jnp.zeros_like(color_match)),
    )

    is_reveal = (move.move_type == REVEAL_COLOR) | (move.move_type == REVEAL_RANK)
    return LastAction(
        move_type=move.move_type.astype(jnp.int32),
        player=player.astype(jnp.int32),
        target=jnp.where(is_reveal, target, -1).astype(jnp.int32),
        color=jnp.where(move.move_type == REVEAL_COLOR, move.color, -1).astype(jnp.int32),
        rank=jnp.where(move.move_type == REVEAL_RANK, move.rank, -1).astype(jnp.int32),
        reveal_mask=reveal_mask,
        position=jnp.where(is_pd, pos, -1).astype(jnp.int32),
        card=card.astype(jnp.int32),
        scored=scored,
        info_add=info_add,
    )


def apply_move(cfg: GameConfig, state: GameState, move: Move) -> GameState:
    """Apply a (legal) move for the current player. Terminal states pass
    through unchanged (the env layer handles resets)."""
    P, R = cfg.players, cfg.num_ranks
    player = state.cur_player
    last = move_outcome(cfg, state, move)

    is_play = move.move_type == PLAY
    is_discard = move.move_type == DISCARD
    is_rc = move.move_type == REVEAL_COLOR
    is_rr = move.move_type == REVEAL_RANK
    is_pd = is_play | is_discard

    # Endgame countdown: decremented once the deck is empty, *before* the move
    # applies (so exactly P moves happen after exhaustion — HLE semantics).
    deck_empty = state.deck_ptr >= cfg.deck_size
    turns_left = state.turns_left - jnp.where(deck_empty, 1, 0)

    # --- play / discard effects ---
    card = last.card
    ccolor = jnp.maximum(card, 0) // R
    crank = jnp.maximum(card, 0) % R
    scored = last.scored

    fireworks = tpuops.add_at_vec(state.fireworks, ccolor, jnp.where(scored, 1, 0))
    life = state.life - jnp.where(is_play & (card >= 0) & ~scored, 1, 0)
    # Failed plays and discards go to the discard pile; successful plays don't.
    to_discard = (is_discard & (card >= 0)) | (is_play & (card >= 0) & ~scored)
    discards = tpuops.add_at_2d(state.discards, ccolor, crank, jnp.where(to_discard, 1, 0))
    info = (
        state.info
        + jnp.where(is_discard, 1, 0)
        + jnp.where(last.info_add, 1, 0)
        - jnp.where(is_rc | is_rr, 1, 0)
    )
    info = jnp.clip(info, 0, cfg.max_info_tokens)

    (
        hands,
        color_plausible,
        rank_plausible,
        color_hinted,
        rank_hinted,
        deck_ptr,
    ) = _remove_and_draw(cfg, state, player, jnp.clip(move.position, 0, cfg.hand_size - 1), is_pd)

    # --- hint knowledge updates on the target's hand ---
    target = (player + move.target_offset) % P
    t_hand = tpuops.take_row(state.hands, target)
    t_occ = t_hand >= 0
    colors_eye = jnp.arange(cfg.num_colors, dtype=jnp.int32)
    ranks_eye = jnp.arange(cfg.num_ranks, dtype=jnp.int32)

    c_match = t_occ & (t_hand // R == move.color)  # [H]
    cp_t = tpuops.take_row(color_plausible, target)
    # touched: plausible collapses to the hinted color; untouched: hinted color
    # ruled out. Only occupied slots update.
    hint_col_onehot = colors_eye[None, :] == move.color  # [1, C] -> broadcast [H, C]
    cp_new = jnp.where(
        c_match[:, None],
        cp_t & hint_col_onehot,
        cp_t & ~hint_col_onehot,
    )
    cp_new = jnp.where(t_occ[:, None], cp_new, cp_t)
    ch_t = tpuops.take_row(color_hinted, target)
    ch_new = ch_t | (c_match[:, None] & hint_col_onehot)
    color_plausible = tpuops.put_row(
        color_plausible, target, jnp.where(is_rc, cp_new, cp_t)
    )
    color_hinted = tpuops.put_row(color_hinted, target, jnp.where(is_rc, ch_new, ch_t))

    r_match = t_occ & (t_hand % R == move.rank)
    rp_t = tpuops.take_row(rank_plausible, target)
    hint_rank_onehot = ranks_eye[None, :] == move.rank
    rp_new = jnp.where(
        r_match[:, None],
        rp_t & hint_rank_onehot,
        rp_t & ~hint_rank_onehot,
    )
    rp_new = jnp.where(t_occ[:, None], rp_new, rp_t)
    rh_t = tpuops.take_row(rank_hinted, target)
    rh_new = rh_t | (r_match[:, None] & hint_rank_onehot)
    rank_plausible = tpuops.put_row(
        rank_plausible, target, jnp.where(is_rr, rp_new, rp_t)
    )
    rank_hinted = tpuops.put_row(rank_hinted, target, jnp.where(is_rr, rh_new, rh_t))

    # --- advance turn, check terminal ---
    cur_player = (player + 1) % P
    new_score = jnp.where(life > 0, jnp.sum(fireworks), 0)
    terminal = (life <= 0) | (new_score >= cfg.max_score) | (turns_left <= 0)

    new_state = GameState(
        deck=state.deck,
        deck_ptr=deck_ptr,
        hands=hands,
        color_plausible=color_plausible,
        rank_plausible=rank_plausible,
        color_hinted=color_hinted,
        rank_hinted=rank_hinted,
        fireworks=fireworks,
        info=info,
        life=life,
        discards=discards,
        cur_player=cur_player,
        turns_left=turns_left,
        last=last,
        terminal=terminal,
    )
    # Freeze terminal states (apply_move on a terminal state is a no-op).
    return jax.tree_util.tree_map(
        lambda new, old: jnp.where(state.terminal, old, new), new_state, state
    )
