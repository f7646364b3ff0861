"""Scalar transcription of the upstream DeepMind hanabi-learning-environment
(HLE) rules + canonical observation encoder, used as a THIRD independent
oracle for the JAX engine/encoder (the first two being the JAX code itself
and the repo's clean-room C++ oracle, which share an author and a spec).

This file is hand-transcribed from the *public upstream* sources'
semantics — hanabi_lib/hanabi_state.cc, hanabi_hand.cc,
canonical_encoders.cc — NOT from /root/reference and NOT from the repo's
implementation. Where the reference fork (hengyuan-hu/hanabi-learning-
environment) extends upstream, the extension is taken from the reference's
*documented* behavior only:

  * hands section encodes ALL players with the observer's own block zeroed
    (126*P bits; reference pyhanabi/utils.py:335-341, Encode(..., false)
    call at cpp/hanabi_env.cc:145-152). Upstream skips the observer.
  * a trailing no-op uid, legal only when nothing else is
    (cpp/hanabi_env.cc:183-191).

Everything is deliberately scalar/loopy Python so the control flow mirrors
the upstream C++ line by line rather than the repo's branchless array code.
"""

from __future__ import annotations

import numpy as np

CARDS_PER_RANK = [3, 2, 2, 2, 1]

# HLE move-uid layout (HanabiGame::ConstructMoves order):
# discard x H, play x H, reveal-color x (P-1)*C, reveal-rank x (P-1)*R, no-op.


class CardKnowledge:
    """hanabi_hand.h ValueKnowledge pair: plausible sets track both positive
    (hinted value) and negative (ruled-out value) hint information; hinted_*
    records a direct positive hint."""

    def __init__(self, num_colors: int, num_ranks: int):
        self.color_plausible = [True] * num_colors
        self.rank_plausible = [True] * num_ranks
        self.hinted_color = None
        self.hinted_rank = None


class HistoryItem:
    """hanabi_history_item.h fields used by the canonical encoder."""

    def __init__(self, move_type, player, position=None, target_offset=None,
                 color=None, rank=None):
        self.move_type = move_type  # 'play'|'discard'|'reveal_color'|'reveal_rank'
        self.player = player  # absolute seat
        self.position = position
        self.target_offset = target_offset
        self.color = color  # hinted color, or played/discarded card color
        self.rank = rank
        self.scored = False
        self.information_token = False
        self.reveal_bitmask = 0


class UpstreamHanabiState:
    """hle::HanabiState over a pre-shuffled deck of card codes
    (code = color * num_ranks + rank), dealt player-major like the JAX
    new_game. Draw order = increasing deck index."""

    def __init__(self, deck_codes, players=2, hand_size=5, num_colors=5,
                 num_ranks=5, max_info=8, max_life=3):
        self.P, self.H = players, hand_size
        self.C, self.R = num_colors, num_ranks
        self.max_info, self.max_life = max_info, max_life
        self.deck = [int(c) for c in deck_codes]
        self.cursor = players * hand_size
        self.hands = [
            [self.deck[p * hand_size + i] for i in range(hand_size)]
            for p in range(players)
        ]
        self.knowledge = [
            [CardKnowledge(num_colors, num_ranks) for _ in range(hand_size)]
            for _ in range(players)
        ]
        self.fireworks = [0] * num_colors
        self.info = max_info
        self.life = max_life
        self.discard_pile = []  # list of card codes, append order
        self.cur_player = 0
        self.turns_to_play = players  # hanabi_state.cc turns_to_play_
        self.last_move = None  # most recent non-deal HistoryItem

    # --- uid layout -------------------------------------------------------
    @property
    def max_moves(self):
        return 2 * self.H + (self.P - 1) * (self.C + self.R)

    @property
    def num_actions(self):
        return self.max_moves + 1  # + no-op (fork extension)

    def decode_uid(self, uid):
        H, C, R, P = self.H, self.C, self.R, self.P
        if uid < H:
            return ("discard", uid, None, None, None)
        if uid < 2 * H:
            return ("play", uid - H, None, None, None)
        rc_base, rr_base = 2 * H, 2 * H + (P - 1) * C
        if uid < rr_base:
            off = uid - rc_base
            return ("reveal_color", None, 1 + off // C, off % C, None)
        if uid < self.max_moves:
            off = uid - rr_base
            return ("reveal_rank", None, 1 + off // R, None, off % R)
        return ("no_op", None, None, None, None)

    # --- rules (hanabi_state.cc) -----------------------------------------
    def score(self):
        return sum(self.fireworks)

    def is_terminal(self):
        return (
            self.life <= 0
            or self.score() >= self.C * self.R
            or self.turns_to_play <= 0
        )

    def legal_uids(self):
        """hle::HanabiState::MoveIsLegal over all uids, + fork no-op rule."""
        assert not self.is_terminal()
        hand = self.hands[self.cur_player]
        legal = []
        for pos in range(len(hand)):  # discard: occupied slot, info below max
            if self.info < self.max_info:
                legal.append(pos)
        for pos in range(len(hand)):  # play: occupied slot
            legal.append(self.H + pos)
        if self.info > 0:
            rc_base, rr_base = 2 * self.H, 2 * self.H + (self.P - 1) * self.C
            for off in range(1, self.P):
                target_hand = self.hands[(self.cur_player + off) % self.P]
                for c in range(self.C):  # reveal needs >=1 matching card
                    if any(card // self.R == c for card in target_hand):
                        legal.append(rc_base + (off - 1) * self.C + c)
                for r in range(self.R):
                    if any(card % self.R == r for card in target_hand):
                        legal.append(rr_base + (off - 1) * self.R + r)
        if not legal:
            legal = [self.max_moves]  # no-op (cpp/hanabi_env.cc:183-191)
        return legal

    def _draw(self, player):
        if self.cursor < len(self.deck):
            self.hands[player].append(self.deck[self.cursor])
            self.knowledge[player].append(CardKnowledge(self.C, self.R))
            self.cursor += 1

    def _increment_information_tokens(self):
        if self.info < self.max_info:
            self.info += 1
            return True
        return False

    def apply_uid(self, uid):
        assert not self.is_terminal()
        assert uid in self.legal_uids(), uid
        move_type, pos, target_offset, color, rank = self.decode_uid(uid)
        cur = self.cur_player

        # Deck empty at move start: endgame countdown (hanabi_state.cc).
        if self.cursor >= len(self.deck):
            self.turns_to_play -= 1

        hist = HistoryItem(move_type, cur, position=pos,
                           target_offset=target_offset, color=color, rank=rank)

        if move_type == "discard":
            card = self.hands[cur].pop(pos)
            self.knowledge[cur].pop(pos)
            hist.color, hist.rank = card // self.R, card % self.R
            hist.information_token = self._increment_information_tokens()
            self.discard_pile.append(card)
            self._draw(cur)
        elif move_type == "play":
            card = self.hands[cur].pop(pos)
            self.knowledge[cur].pop(pos)
            c, r = card // self.R, card % self.R
            hist.color, hist.rank = c, r
            if self.fireworks[c] == r:  # AddToFireworks success
                self.fireworks[c] += 1
                hist.scored = True
                if r == self.R - 1:  # completed a stack: regain a token
                    hist.information_token = self._increment_information_tokens()
            else:
                self.life -= 1
                self.discard_pile.append(card)  # failed play is discarded
            self._draw(cur)
        elif move_type in ("reveal_color", "reveal_rank"):
            target = (cur + target_offset) % self.P
            self.info -= 1
            for i, card in enumerate(self.hands[target]):
                k = self.knowledge[target][i]
                if move_type == "reveal_color":
                    if card // self.R == color:
                        hist.reveal_bitmask |= 1 << i
                        k.hinted_color = color
                        k.color_plausible = [c == color for c in range(self.C)]
                    else:  # negative information
                        k.color_plausible[color] = False
                else:
                    if card % self.R == rank:
                        hist.reveal_bitmask |= 1 << i
                        k.hinted_rank = rank
                        k.rank_plausible = [r == rank for r in range(self.R)]
                    else:
                        k.rank_plausible[rank] = False
        else:  # no-op: advances the turn, touches nothing
            pass

        if move_type != "no_op":
            self.last_move = hist
        self.cur_player = (cur + 1) % self.P

    # --- canonical encoder (canonical_encoders.cc) ------------------------
    def obs_dim(self):
        P, H, C, R = self.P, self.H, self.C, self.R
        hands = P * H * C * R + P
        board = (len(self.deck) - P * H) + C * R + self.max_info + self.max_life
        discards = C * sum(CARDS_PER_RANK[:R])
        last_action = P + 4 + P + C + R + H + H + C * R + 2
        knowledge = P * H * (C * R + C + R)
        return hands + board + discards + last_action + knowledge

    def encode(self, observer, hide_action=False):
        """Fork-variant canonical observation (783 bits for 2p/H5).

        hide_action: skip EncodeLastAction_, leaving its section zeroed while
        keeping the layout length — the fork's hideAction branch
        (`offset += LastActionSectionLength(game)` instead of encoding).
        """
        P, H, C, R = self.P, self.H, self.C, self.R
        bits = np.zeros(self.obs_dim(), dtype=np.float32)
        off = 0

        # ---- EncodeHands (fork: all players, own block zeroed) ----
        for rel in range(P):
            if rel == 0:
                off += H * C * R  # own hand hidden
                continue
            p = (observer + rel) % P
            for card in self.hands[p]:
                bits[off + card] = 1  # card code IS color*R+rank
                off += C * R
            off += (H - len(self.hands[p])) * C * R  # short-hand padding
        for rel in range(P):  # one bit per player: hand below full size
            if len(self.hands[(observer + rel) % P]) < H:
                bits[off + rel] = 1
        off += P

        # ---- EncodeBoard ----
        remaining = len(self.deck) - self.cursor
        bits[off : off + remaining] = 1  # deck thermometer
        off += len(self.deck) - P * H
        for c in range(C):  # fireworks: one-hot of height-1 (0 = all zero)
            if self.fireworks[c] > 0:
                bits[off + self.fireworks[c] - 1] = 1
            off += R
        bits[off : off + self.info] = 1
        off += self.max_info
        bits[off : off + self.life] = 1
        off += self.max_life

        # ---- EncodeDiscards ----
        counts = np.zeros((C, R), dtype=int)
        for card in self.discard_pile:
            counts[card // R][card % R] += 1
        for c in range(C):
            for r in range(R):
                bits[off : off + counts[c][r]] = 1
                off += CARDS_PER_RANK[r]

        # ---- EncodeLastAction_ ----
        la_len = P + 4 + P + C + R + H + H + C * R + 2
        m = None if hide_action else self.last_move
        if m is None:
            off += la_len
        else:
            bits[off + (m.player - observer) % P] = 1  # acting player, relative
            off += P
            type_idx = {"play": 0, "discard": 1, "reveal_color": 2,
                        "reveal_rank": 3}[m.move_type]
            bits[off + type_idx] = 1
            off += 4
            is_reveal = m.move_type in ("reveal_color", "reveal_rank")
            if is_reveal:  # target player, relative to observer
                bits[off + (m.player + m.target_offset - observer) % P] = 1
            off += P
            if m.move_type == "reveal_color":
                bits[off + m.color] = 1
            off += C
            if m.move_type == "reveal_rank":
                bits[off + m.rank] = 1
            off += R
            if is_reveal:  # outcome: which slots were touched
                for i in range(H):
                    if m.reveal_bitmask & (1 << i):
                        bits[off + i] = 1
            off += H
            is_pd = m.move_type in ("play", "discard")
            if is_pd:
                bits[off + m.position] = 1
            off += H
            if is_pd:  # identity of the played/discarded card
                bits[off + m.color * R + m.rank] = 1
            off += C * R
            if m.move_type == "play":  # scored / regained token: play only
                if m.scored:
                    bits[off] = 1
                if m.information_token:
                    bits[off + 1] = 1
            off += 2

        # ---- EncodeCardKnowledge ----
        for rel in range(P):
            p = (observer + rel) % P
            for k in self.knowledge[p]:
                for c in range(C):
                    if k.color_plausible[c]:
                        for r in range(R):
                            if k.rank_plausible[r]:
                                bits[off + c * R + r] = 1
                off += C * R
                if k.hinted_color is not None:
                    bits[off + k.hinted_color] = 1
                off += C
                if k.hinted_rank is not None:
                    bits[off + k.hinted_rank] = 1
                off += R
            off += (H - len(self.knowledge[p])) * (C * R + C + R)

        assert off == self.obs_dim()
        return bits
