"""Move uid layout and legal-move computation.

The uid layout is HLE's (reconstructed from its call sites, SURVEY.md §2.8,
and the action labels in reference pyhanabi/tools/action_matrix.py:110-131):

    [0, H)                      Discard(slot)
    [H, 2H)                     Play(slot)
    [2H, 2H + (P-1)*C)          RevealColor(target_offset=1+uid//C, color=uid%C)
    [.., 2H + (P-1)*(C+R))      RevealRank(target_offset, rank)
    max_moves                   no-op (only "legal" when nothing else is)

Everything is computed as fixed-shape masks — one [num_actions] bool vector per
player — so legality lives on-device (replacing hle::HanabiState::LegalMoves
as used at cpp/hanabi_env.cc:171-191).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from hanabi_sad_tpu.game.config import GameConfig
from hanabi_sad_tpu.game.state import DISCARD, NO_OP, PLAY, REVEAL_COLOR, REVEAL_RANK, GameState


class Move(NamedTuple):
    """Decomposed move; unused fields are arbitrary for a given type."""

    move_type: jnp.ndarray  # i32 enum (state.DISCARD..state.NO_OP)
    position: jnp.ndarray  # i32 hand slot (play/discard)
    target_offset: jnp.ndarray  # i32 in [1, P) (reveal moves)
    color: jnp.ndarray  # i32 (reveal-color)
    rank: jnp.ndarray  # i32 (reveal-rank)


def decode_uid(cfg: GameConfig, uid: jnp.ndarray) -> Move:
    """uid -> Move, branchless."""
    H, C, R = cfg.hand_size, cfg.num_colors, cfg.num_ranks
    uid = uid.astype(jnp.int32)

    is_discard = uid < H
    is_play = (uid >= H) & (uid < 2 * H)
    rc_base = 2 * H
    rr_base = 2 * H + (cfg.players - 1) * C
    is_rc = (uid >= rc_base) & (uid < rr_base)
    is_rr = (uid >= rr_base) & (uid < cfg.max_moves)

    move_type = jnp.where(
        is_discard,
        DISCARD,
        jnp.where(is_play, PLAY, jnp.where(is_rc, REVEAL_COLOR, jnp.where(is_rr, REVEAL_RANK, NO_OP))),
    ).astype(jnp.int32)
    position = jnp.where(is_discard, uid, uid - H)
    rc_off = uid - rc_base
    rr_off = uid - rr_base
    target_offset = jnp.where(is_rc, 1 + rc_off // C, 1 + rr_off // R)
    color = rc_off % C
    rank = rr_off % R
    return Move(
        move_type=move_type,
        position=position.astype(jnp.int32),
        target_offset=target_offset.astype(jnp.int32),
        color=color.astype(jnp.int32),
        rank=rank.astype(jnp.int32),
    )


def encode_uid(cfg: GameConfig, move: Move) -> jnp.ndarray:
    """Move -> uid (inverse of decode_uid)."""
    H, C, R = cfg.hand_size, cfg.num_colors, cfg.num_ranks
    rc_base = 2 * H
    rr_base = 2 * H + (cfg.players - 1) * C
    uid = jnp.where(
        move.move_type == DISCARD,
        move.position,
        jnp.where(
            move.move_type == PLAY,
            H + move.position,
            jnp.where(
                move.move_type == REVEAL_COLOR,
                rc_base + (move.target_offset - 1) * C + move.color,
                jnp.where(
                    move.move_type == REVEAL_RANK,
                    rr_base + (move.target_offset - 1) * R + move.rank,
                    cfg.no_op_uid,
                ),
            ),
        ),
    )
    return uid.astype(jnp.int32)


def legal_moves_current(cfg: GameConfig, state: GameState) -> jnp.ndarray:
    """[num_actions] bool legal mask for the *current* player.

    HLE rules: discard needs an occupied slot and info < max; play needs an
    occupied slot; hints need info > 0 and a non-empty match in the target's
    hand. If nothing is legal, the no-op uid lights up (hanabi_env.cc:189-191).
    """
    P, H, C, R = cfg.players, cfg.hand_size, cfg.num_colors, cfg.num_ranks
    cur = state.cur_player
    hand = state.hands[cur]  # [H]
    occupied = hand >= 0  # [H]

    discard_ok = occupied & (state.info < cfg.max_info_tokens)  # [H]
    play_ok = occupied  # [H]

    # Hints: for each target offset o in [1, P) the target is (cur + o) % P.
    offsets = jnp.arange(1, P, dtype=jnp.int32)  # [P-1]
    targets = (cur + offsets) % P  # [P-1]
    target_hands = state.hands[targets]  # [P-1, H]
    t_occ = target_hands >= 0
    t_colors = jnp.where(t_occ, target_hands // R, -1)
    t_ranks = jnp.where(t_occ, target_hands % R, -1)
    has_info = state.info > 0

    # [P-1, C]: target has >= 1 card of that color
    color_present = jnp.any(
        t_colors[:, :, None] == jnp.arange(C, dtype=jnp.int32)[None, None, :], axis=1
    )
    rank_present = jnp.any(
        t_ranks[:, :, None] == jnp.arange(R, dtype=jnp.int32)[None, None, :], axis=1
    )
    rc_ok = (color_present & has_info).reshape(-1)  # [(P-1)*C]
    rr_ok = (rank_present & has_info).reshape(-1)  # [(P-1)*R]

    real = jnp.concatenate([discard_ok, play_ok, rc_ok, rr_ok])
    no_op = ~jnp.any(real)
    return jnp.concatenate([real, no_op[None]])


def legal_moves_all(cfg: GameConfig, state: GameState) -> jnp.ndarray:
    """[P, num_actions] legal mask per player: the current player gets the real
    mask, everyone else only the no-op (matching hle LegalMoves(player) being
    empty for non-current players; cpp/hanabi_env.cc:171-191)."""
    P = cfg.players
    cur_mask = legal_moves_current(cfg, state)  # [A]
    noop_only = jnp.zeros((cfg.num_actions,), dtype=jnp.bool_).at[cfg.no_op_uid].set(True)
    is_cur = jnp.arange(P, dtype=jnp.int32) == state.cur_player  # [P]
    # Terminal states have no mover; give everyone the no-op so downstream
    # argmaxes stay well-defined (padding steps are masked out of the loss).
    is_cur = is_cur & ~state.terminal
    return jnp.where(is_cur[:, None], cur_mask[None, :], noop_only[None, :])


def permute_hint_colors(cfg: GameConfig, legal: jnp.ndarray, perm: jnp.ndarray) -> jnp.ndarray:
    """Apply a per-player color permutation to the reveal-color block of a
    legal mask (Other-Play; cpp/hanabi_env.cc:175-181). `perm[c]` is the color
    shown to the agent for true color c. legal: [..., num_actions],
    perm: [..., C] broadcastable."""
    H, C = cfg.hand_size, cfg.num_colors
    rc_base = 2 * H
    n_rc = (cfg.players - 1) * C
    rc = legal[..., rc_base : rc_base + n_rc]
    shape = rc.shape[:-1] + (cfg.players - 1, C)
    rc = rc.reshape(shape)
    # displayed[perm[c]] = true[c]  ->  displayed[d] = true[inv[d]]; scatter
    # via one-hot matmul keeps it branchless for batched perms.
    perm_onehot = perm[..., None] == jnp.arange(C, dtype=jnp.int32)  # [..., C, C]
    displayed = jnp.einsum("...tc,...cd->...td", rc.astype(jnp.float32), perm_onehot.astype(jnp.float32))
    displayed = displayed > 0.5
    out = legal.at[..., rc_base : rc_base + n_rc].set(displayed.reshape(legal.shape[:-1] + (n_rc,)))
    return out
