"""Canonical observation encoder, TPU-native.

Produces the exact bit layout of the hengyuan-hu HLE fork's
CanonicalObservationEncoder as consumed by the reference
(cpp/hanabi_env.cc:115-205; section math documented at reference
pyhanabi/utils.py:335-341 and asserted at tools/obl_model.py:264):

  per-player observation (2p / hand 5 -> 783):
    hands          players*(hand_size*25 + 1)   = 252   own hand zeroed
    board          (50 - P*H) + 25 + 8 + 3      = 76    deck/fireworks/info/life
    discards       50                                   per-(color,rank) thermometer
    last action    2P + 4 + 5 + 5 + 2H + 25 + 2 = 55
    card knowledge P*H*(25+5+5)                 = 350   V0 plausible + direct hints
  SAD appends one more last-action block for the partner's greedy action -> 838.

All sections are encoded for a given observer with players re-indexed
relative to the observer, and (for Other-Play) an optional per-observer color
permutation relabeling every color-indexed feature.

Everything returns float32 0/1 vectors of static shape.
"""

from __future__ import annotations

import jax.numpy as jnp

from hanabi_sad_tpu.game import tpuops
from hanabi_sad_tpu.game.config import CARDS_PER_RANK, GameConfig
from hanabi_sad_tpu.game.moves import Move
from hanabi_sad_tpu.game.state import (
    DISCARD,
    PLAY,
    REVEAL_COLOR,
    REVEAL_RANK,
    GameState,
    LastAction,
)

F32 = jnp.float32


def _permute_color_idx(color: jnp.ndarray, perm: jnp.ndarray) -> jnp.ndarray:
    """Displayed color index for a true color (perm[c]); -1 passes through.
    One-hot contraction, not a gather — this line was the single hottest op
    of the round-2 rollout profile (219 us/step on the scalar core)."""
    return jnp.where(color >= 0, tpuops.take_vec(perm, color), color)


def _card_onehot(cfg: GameConfig, card: jnp.ndarray, perm: jnp.ndarray) -> jnp.ndarray:
    """[..., num_cards] one-hot of card code with color permutation applied;
    empty (-1) encodes as zeros."""
    R = cfg.num_ranks
    color = _permute_color_idx(jnp.where(card >= 0, card // R, -1), perm)
    rank = card % R
    code = color * R + rank
    eye = jnp.arange(cfg.num_cards, dtype=jnp.int32)
    return ((code[..., None] == eye) & (card[..., None] >= 0)).astype(F32)


def _thermometer(value: jnp.ndarray, length: int) -> jnp.ndarray:
    return (jnp.arange(length, dtype=jnp.int32) < value).astype(F32)


def encode_hands(
    cfg: GameConfig,
    state: GameState,
    observer: jnp.ndarray,
    perm: jnp.ndarray,
    hand_shuffle: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Hands section. Players in relative order starting at the observer; the
    observer's own card block is zeroed (hidden hand). Trailing P bits flag
    hands holding fewer than hand_size cards.

    hand_shuffle ([H] i32, shuffle_obs mode, 2p only): displayed slot j of the
    partner's hand (relative player 1) shows true slot hand_shuffle[j]
    (cpp/hanabi_env.cc:134-143 samples this per encode)."""
    P, H = cfg.players, cfg.hand_size
    rel = (observer + jnp.arange(P, dtype=jnp.int32)) % P  # absolute seat per rel slot
    hands = tpuops.take_rows(state.hands, rel)  # [P, H]
    if hand_shuffle is not None:
        shuffled = tpuops.take_rows(hands[1], hand_shuffle)
        hands = hands.at[1].set(shuffled)
    onehots = _card_onehot(cfg, hands, perm)  # [P, H, 25]
    own = jnp.arange(P) == 0  # rel slot 0 is the observer
    onehots = jnp.where(own[:, None, None], 0.0, onehots)
    card_bits = onehots.reshape(-1)
    short = (jnp.sum(hands >= 0, axis=1) < H).astype(F32)  # [P]
    return jnp.concatenate([card_bits, short])


def encode_board(cfg: GameConfig, state: GameState, perm: jnp.ndarray) -> jnp.ndarray:
    P, H, C, R = cfg.players, cfg.hand_size, cfg.num_colors, cfg.num_ranks
    deck_size = cfg.deck_size - state.deck_ptr
    deck_bits = _thermometer(deck_size, cfg.deck_size - P * H)
    # Fireworks: per displayed color, one-hot of (height - 1); height 0 = zeros.
    fw = tpuops.permute_last(state.fireworks, perm)  # [C] heights by displayed color
    fw_bits = (
        (jnp.arange(R, dtype=jnp.int32)[None, :] == (fw[:, None] - 1)).astype(F32).reshape(-1)
    )
    info_bits = _thermometer(state.info, cfg.max_info_tokens)
    life_bits = _thermometer(state.life, cfg.max_life_tokens)
    return jnp.concatenate([deck_bits, fw_bits, info_bits, life_bits])


def encode_discards(cfg: GameConfig, state: GameState, perm: jnp.ndarray) -> jnp.ndarray:
    """Per displayed color, per rank, a thermometer over that rank's copy
    count (3/2/2/2/1 bits)."""
    counts = jnp.moveaxis(
        tpuops.permute_last(jnp.moveaxis(state.discards, 0, -1), perm), -1, 0
    )  # [C, R] by displayed color
    bits = []
    for r, copies in enumerate(CARDS_PER_RANK[: cfg.num_ranks]):
        bits.append(
            (jnp.arange(copies, dtype=jnp.int32)[None, :] < counts[:, r : r + 1]).astype(F32)
        )  # [C, copies]
    per_color = jnp.concatenate(bits, axis=1)  # [C, 10] (rank-major within color)
    # Re-order to rank-ascending within each color: bits were appended
    # rank0..rank4 already, so per_color rows are correct as-is.
    return per_color.reshape(-1)


def encode_last_action(
    cfg: GameConfig,
    last: LastAction,
    observer: jnp.ndarray,
    perm: jnp.ndarray,
    hand_shuffle: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Last (non-deal) action section; zeros if no move has been made yet.

    hand_shuffle (shuffle_obs mode): partner-slot-indexed bits are remapped to
    the shuffled view — the play/discard position when the partner acted, and
    the reveal mask when the partner was the hint target (the reference
    threads the same shuffleOrder into EncodeLastAction,
    cpp/hanabi_env.cc:157-158)."""
    P, H, C, R = cfg.players, cfg.hand_size, cfg.num_colors, cfg.num_ranks
    valid = last.move_type < 4  # NONE / NO_OP encode as zeros

    rel_actor = (last.player - observer) % P
    actor_bits = ((jnp.arange(P) == rel_actor) & valid).astype(F32)

    # Move type one-hot in encoder order: play, discard, reveal-color, reveal-rank.
    type_bits = jnp.stack(
        [
            (last.move_type == PLAY).astype(F32),
            (last.move_type == DISCARD).astype(F32),
            (last.move_type == REVEAL_COLOR).astype(F32),
            (last.move_type == REVEAL_RANK).astype(F32),
        ]
    )

    is_reveal = (last.move_type == REVEAL_COLOR) | (last.move_type == REVEAL_RANK)
    rel_target = (last.target - observer) % P
    target_bits = ((jnp.arange(P) == rel_target) & is_reveal).astype(F32)

    disp_color = _permute_color_idx(last.color, perm)
    color_bits = (jnp.arange(C) == disp_color).astype(F32)
    rank_bits = (jnp.arange(R) == last.rank).astype(F32)

    reveal_bits = (last.reveal_mask & is_reveal).astype(F32)
    if hand_shuffle is not None:
        # Displayed reveal slot j reflects true slot hand_shuffle[j] when the
        # hint target is the partner (relative player 1).
        reveal_bits = jnp.where(
            rel_target == 1, tpuops.take_rows(reveal_bits, hand_shuffle), reveal_bits
        )

    is_pd = (last.move_type == PLAY) | (last.move_type == DISCARD)
    pos_bits = ((jnp.arange(H) == last.position) & is_pd).astype(F32)
    if hand_shuffle is not None:
        shuffled_pos = ((hand_shuffle == last.position) & is_pd).astype(F32)
        pos_bits = jnp.where(rel_actor == 1, shuffled_pos, pos_bits)

    card_bits = _card_onehot(cfg, jnp.where(is_pd, last.card, -1), perm)

    scored_bit = last.scored.astype(F32)[None]
    info_bit = last.info_add.astype(F32)[None]

    return jnp.concatenate(
        [
            actor_bits,
            type_bits,
            target_bits,
            color_bits,
            rank_bits,
            reveal_bits,
            pos_bits,
            card_bits,
            scored_bit,
            info_bit,
        ]
    )


def encode_knowledge(
    cfg: GameConfig,
    state: GameState,
    observer: jnp.ndarray,
    perm: jnp.ndarray,
    hand_shuffle: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Card-knowledge section: per relative player, per slot — 25 plausible
    bits (outer product of hint-derived color/rank plausibility), 5 direct
    color-hint bits, 5 direct rank-hint bits. Empty slots are all zero.

    hand_shuffle (shuffle_obs mode): the partner's knowledge slots follow the
    same displayed order as the hands section."""
    P = cfg.players
    rel = (observer + jnp.arange(P, dtype=jnp.int32)) % P
    occupied = (tpuops.take_rows(state.hands, rel) >= 0)[..., None]  # [P, H, 1]

    cp = tpuops.permute_last(tpuops.take_rows(state.color_plausible, rel), perm)
    rp = tpuops.take_rows(state.rank_plausible, rel)  # [P, H, R]
    ch = tpuops.permute_last(tpuops.take_rows(state.color_hinted, rel), perm)
    rh = tpuops.take_rows(state.rank_hinted, rel)
    if hand_shuffle is not None:
        cp = cp.at[1].set(tpuops.take_rows(cp[1], hand_shuffle))
        rp = rp.at[1].set(tpuops.take_rows(rp[1], hand_shuffle))
        ch = ch.at[1].set(tpuops.take_rows(ch[1], hand_shuffle))
        rh = rh.at[1].set(tpuops.take_rows(rh[1], hand_shuffle))
        occupied = occupied.at[1].set(tpuops.take_rows(occupied[1], hand_shuffle))

    plausible = (cp[..., :, None] & rp[..., None, :]).astype(F32)  # [P, H, C, R]
    plausible = plausible * occupied[..., None]
    per_slot = jnp.concatenate(
        [
            plausible.reshape(*plausible.shape[:-2], -1),
            (ch & occupied).astype(F32),
            (rh & occupied).astype(F32),
        ],
        axis=-1,
    )  # [P, H, 35]
    return per_slot.reshape(-1)


def encode_observation(
    cfg: GameConfig,
    state: GameState,
    observer: jnp.ndarray,
    perm: jnp.ndarray,
    hand_shuffle: jnp.ndarray | None = None,
    hide_action: bool = False,
) -> jnp.ndarray:
    """Full per-player canonical observation (783 for 2p), before SAD.

    hide_action: leave the last-action section as zeros while keeping its
    length — the fork encoder's hideAction flag (OBL lineage; the reference
    trainer always passes false, cpp/hanabi_env.cc:145-152, and only its
    bit-rotted OBL-era eval path reads the flag, pyhanabi/eval.py:81-107).
    """
    last_action = encode_last_action(cfg, state.last, observer, perm, hand_shuffle)
    if hide_action:
        last_action = jnp.zeros_like(last_action)
    return jnp.concatenate(
        [
            encode_hands(cfg, state, observer, perm, hand_shuffle),
            encode_board(cfg, state, perm),
            encode_discards(cfg, state, perm),
            last_action,
            encode_knowledge(cfg, state, observer, perm, hand_shuffle),
        ]
    )


def encode_own_hand_trinary(cfg: GameConfig, state: GameState, player: jnp.ndarray) -> jnp.ndarray:
    """Aux-task target (EncodeOwnHandTrinary): per own card slot, one-hot over
    {playable now, useless (rank already played), neither}; empty slots all
    zero — the zero row doubles as the slot mask (r2d2.py:430-441)."""
    R = cfg.num_ranks
    hand = tpuops.take_row(state.hands, player)  # [H]
    occ = hand >= 0
    color = jnp.maximum(hand, 0) // R
    rank = jnp.maximum(hand, 0) % R
    fw = tpuops.take_vec(state.fireworks, color)
    playable = occ & (rank == fw)
    useless = occ & (rank < fw)
    neither = occ & ~playable & ~useless
    tri = jnp.stack([playable, useless, neither], axis=-1).astype(F32)  # [H, 3]
    return tri.reshape(-1)


def greedy_action_channel(
    cfg: GameConfig,
    state: GameState,
    greedy_move: Move,
    observer: jnp.ndarray,
    perm: jnp.ndarray,
    hand_shuffle: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """The SAD channel: last-action encoding of the partner's *greedy* move as
    if it were applied to the pre-move state. The reference clones the state
    and applies the greedy move (cpp/hanabi_env.cc:82-91,154-160); the
    outcome fields are a pure function of (state, move), so we compute them
    directly."""
    from hanabi_sad_tpu.game.engine import move_outcome

    record = move_outcome(cfg, state, greedy_move)
    return encode_last_action(cfg, record, observer, perm, hand_shuffle)
