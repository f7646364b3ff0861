"""Unit tests for the Hanabi rules engine (game/state.py, game/engine.py,
game/moves.py) against hand-computed fixtures — the test layer the reference
lacks entirely (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hanabi_sad_tpu.game import GameConfig
from hanabi_sad_tpu.game.engine import apply_move, move_outcome
from hanabi_sad_tpu.game.moves import (
    Move,
    decode_uid,
    encode_uid,
    legal_moves_all,
    legal_moves_current,
)
from hanabi_sad_tpu.game.state import (
    DISCARD,
    PLAY,
    REVEAL_COLOR,
    REVEAL_RANK,
    full_deck,
    hand_sizes,
    new_game,
    score,
)

CFG = GameConfig(players=2, hand_size=5)


def card(c, r):
    return c * 5 + r


def make_game(deck_order, cfg=CFG):
    """Deterministic game: deal from the given full-deck ordering."""
    state = new_game(cfg, jax.random.PRNGKey(0))
    deck = jnp.asarray(deck_order, dtype=jnp.int32)
    assert deck.shape[0] == cfg.deck_size
    hands = deck[: cfg.players * cfg.hand_size].reshape(cfg.players, cfg.hand_size)
    return state._replace(deck=deck, hands=hands)


def sorted_deck():
    return np.asarray(full_deck(CFG))


def mv(**kw):
    d = dict(move_type=0, position=0, target_offset=1, color=0, rank=0)
    d.update(kw)
    return Move(**{k: jnp.asarray(v, dtype=jnp.int32) for k, v in d.items()})


class TestConfig:
    def test_feature_sizes_2p(self):
        assert CFG.obs_dim == 783
        assert CFG.feature_size(sad=True) == 838
        assert CFG.num_actions == 21
        assert CFG.hands_section == 252
        assert CFG.board_section == 76
        assert CFG.discard_section == 50
        assert CFG.last_action_section == 55
        assert CFG.knowledge_section == 350

    @pytest.mark.parametrize("p,h", [(2, 5), (3, 5), (4, 4), (5, 4)])
    def test_feature_size_formula(self, p, h):
        # reference utils.py:335-341: 126P + 76 + 50 + (51+2P) + 35*5P for h=5
        cfg = GameConfig(players=p, hand_size=h)
        expected = (
            p * (h * 25 + 1)
            + (50 - p * h + 25 + 8 + 3)
            + 50
            + (51 + 2 * p - 10 + 2 * h)
            + p * h * 35
        )
        assert cfg.obs_dim == expected

    def test_deck_composition(self):
        deck = sorted_deck()
        counts = np.bincount(deck, minlength=25)
        assert deck.shape == (50,)
        expected = np.tile([3, 2, 2, 2, 1], 5)
        np.testing.assert_array_equal(counts, expected)


class TestMoves:
    def test_uid_roundtrip(self):
        for uid in range(CFG.max_moves):
            m = decode_uid(CFG, jnp.asarray(uid))
            assert int(encode_uid(CFG, m)) == uid

    def test_uid_layout(self):
        # D1..D5, P1..P5, C1..C5, R1..R5 (action_matrix.py:110-131)
        assert int(decode_uid(CFG, jnp.asarray(0)).move_type) == DISCARD
        assert int(decode_uid(CFG, jnp.asarray(4)).position) == 4
        m = decode_uid(CFG, jnp.asarray(7))
        assert int(m.move_type) == PLAY and int(m.position) == 2
        m = decode_uid(CFG, jnp.asarray(13))
        assert int(m.move_type) == REVEAL_COLOR and int(m.color) == 3
        assert int(m.target_offset) == 1
        m = decode_uid(CFG, jnp.asarray(19))
        assert int(m.move_type) == REVEAL_RANK and int(m.rank) == 4

    def test_uid_layout_3p(self):
        cfg = GameConfig(players=3)
        assert cfg.max_moves == 30
        m = decode_uid(cfg, jnp.asarray(10 + 5 + 2))  # second target's color block
        assert int(m.move_type) == REVEAL_COLOR
        assert int(m.target_offset) == 2 and int(m.color) == 2


class TestDeal:
    def test_new_game_deal(self):
        state = new_game(CFG, jax.random.PRNGKey(123))
        assert int(state.deck_ptr) == 10
        np.testing.assert_array_equal(
            np.asarray(state.hands), np.asarray(state.deck[:10]).reshape(2, 5)
        )
        assert np.all(np.asarray(hand_sizes(state)) == 5)
        assert int(state.info) == 8 and int(state.life) == 3
        assert int(state.cur_player) == 0 and not bool(state.terminal)
        # shuffle is a permutation of the multiset
        counts = np.bincount(np.asarray(state.deck), minlength=25)
        np.testing.assert_array_equal(counts, np.tile([3, 2, 2, 2, 1], 5))

    def test_bomb_start(self):
        cfg = GameConfig(players=2, bomb=2)
        state = new_game(cfg, jax.random.PRNGKey(0))
        assert int(state.life) == 1


class TestLegality:
    def test_initial_legal(self):
        state = make_game(sorted_deck())
        legal = np.asarray(legal_moves_current(CFG, state))
        # info == max: discards illegal; plays legal; hints legal where the
        # partner holds the color/rank.
        assert not legal[:5].any()
        assert legal[5:10].all()
        # partner hand (sorted deck): cards 10..14 = color2 r0,r0,r1,r1,r2
        # wait: sorted deck = [c0r0 x3, c0r1 x2, ...]; hands p1 = deck[5:10]
        assert not legal[20]

    def test_hint_requires_info(self):
        state = make_game(sorted_deck())
        state = state._replace(info=jnp.asarray(0, dtype=jnp.int32))
        legal = np.asarray(legal_moves_current(CFG, state))
        assert not legal[10:20].any()
        assert legal[5:10].all()  # plays fine
        # discards now legal (info < max)
        assert legal[:5].all()

    def test_hint_color_presence(self):
        deck = sorted_deck()
        state = make_game(deck)
        # p1 hand = deck[5:10] = [c0r2(5? no...)]: deck layout is
        # [c0r0,c0r0,c0r0,c0r1,c0r1, c0r2,c0r2,c0r3,c0r3,c0r4, c1r0...]
        # so p1 holds only color 0 cards.
        legal = np.asarray(legal_moves_current(CFG, state))
        assert legal[10]  # reveal color 0
        assert not legal[11:15].any()
        # ranks present in p1 hand: r2, r3, r4
        assert not legal[15] and not legal[16]
        assert legal[17] and legal[18] and legal[19]

    def test_non_current_players_noop(self):
        state = make_game(sorted_deck())
        legal = np.asarray(legal_moves_all(CFG, state))
        assert legal[0].sum() > 1
        assert legal[1].sum() == 1 and legal[1][20]


class TestApplyMove:
    def test_successful_play(self):
        deck = sorted_deck()
        state = make_game(deck)  # p0 holds [c0r0,c0r0,c0r0,c0r1,c0r1]
        nxt = apply_move(CFG, state, mv(move_type=PLAY, position=0))
        assert int(nxt.fireworks[0]) == 1
        assert int(nxt.life) == 3
        assert int(nxt.discards.sum()) == 0  # successful play not discarded
        assert int(nxt.deck_ptr) == 11  # drew a card
        assert int(nxt.cur_player) == 1
        assert int(score(nxt)) == 1
        # hand shifted left, new card at the end
        np.testing.assert_array_equal(
            np.asarray(nxt.hands[0]), [card(0, 0), card(0, 0), card(0, 1), card(0, 1), deck[10]]
        )
        la = nxt.last
        assert int(la.move_type) == PLAY and bool(la.scored)
        assert int(la.card) == card(0, 0) and int(la.position) == 0
        assert not bool(la.info_add)

    def test_failed_play(self):
        state = make_game(sorted_deck())
        nxt = apply_move(CFG, state, mv(move_type=PLAY, position=3))  # c0r1 on empty firework
        assert int(nxt.fireworks[0]) == 0
        assert int(nxt.life) == 2
        assert int(nxt.discards[0, 1]) == 1  # failed play goes to discard pile
        assert not bool(nxt.last.scored)

    def test_play_five_regains_info(self):
        deck = sorted_deck()
        state = make_game(deck)
        state = state._replace(
            fireworks=jnp.asarray([4, 0, 0, 0, 0], dtype=jnp.int32),
            info=jnp.asarray(4, dtype=jnp.int32),
            hands=state.hands.at[0, 0].set(card(0, 4)),
        )
        nxt = apply_move(CFG, state, mv(move_type=PLAY, position=0))
        assert int(nxt.fireworks[0]) == 5
        assert int(nxt.info) == 5
        assert bool(nxt.last.info_add)

    def test_play_five_no_info_when_full(self):
        state = make_game(sorted_deck())
        state = state._replace(
            fireworks=jnp.asarray([4, 0, 0, 0, 0], dtype=jnp.int32),
            hands=state.hands.at[0, 0].set(card(0, 4)),
        )
        nxt = apply_move(CFG, state, mv(move_type=PLAY, position=0))
        assert int(nxt.info) == 8
        assert not bool(nxt.last.info_add)

    def test_discard(self):
        state = make_game(sorted_deck())
        state = state._replace(info=jnp.asarray(3, dtype=jnp.int32))
        nxt = apply_move(CFG, state, mv(move_type=DISCARD, position=2))
        assert int(nxt.info) == 4
        assert int(nxt.discards[0, 0]) == 1
        assert int(nxt.life) == 3
        assert int(nxt.deck_ptr) == 11

    def test_reveal_color_knowledge(self):
        deck = sorted_deck()
        state = make_game(deck)
        # hint color 0 to partner (all 5 cards are color 0)
        nxt = apply_move(CFG, state, mv(move_type=REVEAL_COLOR, color=0))
        assert int(nxt.info) == 7
        cp = np.asarray(nxt.color_plausible[1])
        ch = np.asarray(nxt.color_hinted[1])
        assert cp[:, 0].all() and not cp[:, 1:].any()
        assert ch[:, 0].all()
        la = nxt.last
        assert int(la.move_type) == REVEAL_COLOR
        assert np.asarray(la.reveal_mask).all()
        assert int(la.target) == 1 and int(la.color) == 0

    def test_reveal_rank_negative_info(self):
        deck = sorted_deck()
        state = make_game(deck)
        # p1 hand: [c0r2,c0r2,c0r3,c0r3,c0r4] -> hint rank 3 touches slots 2,3
        nxt = apply_move(CFG, state, mv(move_type=REVEAL_RANK, rank=3))
        rp = np.asarray(nxt.rank_plausible[1])
        rh = np.asarray(nxt.rank_hinted[1])
        mask = np.asarray(nxt.last.reveal_mask)
        np.testing.assert_array_equal(mask, [False, False, True, True, False])
        # touched: only rank 3 plausible
        assert rp[2, 3] and rp[2].sum() == 1
        # untouched: rank 3 ruled out, others still plausible
        assert not rp[0, 3] and rp[0].sum() == 4
        assert rh[2, 3] and not rh[0].any()

    def test_turn_rotation_3p(self):
        cfg = GameConfig(players=3)
        state = new_game(cfg, jax.random.PRNGKey(7))
        nxt = apply_move(cfg, state, mv(move_type=REVEAL_COLOR, color=int(state.hands[1, 0]) // 5))
        assert int(nxt.cur_player) == 1
        assert int(nxt.last.target) == 1

    def test_endgame_countdown(self):
        state = make_game(sorted_deck())
        state = state._replace(deck_ptr=jnp.asarray(50, dtype=jnp.int32))
        assert int(state.turns_left) == 2
        n1 = apply_move(CFG, state, mv(move_type=REVEAL_COLOR, color=0))
        assert int(n1.turns_left) == 1 and not bool(n1.terminal)
        n2 = apply_move(CFG, n1, mv(move_type=REVEAL_COLOR, color=0))
        assert int(n2.turns_left) == 0 and bool(n2.terminal)

    def test_no_draw_when_deck_empty(self):
        state = make_game(sorted_deck())
        state = state._replace(deck_ptr=jnp.asarray(50, dtype=jnp.int32))
        nxt = apply_move(CFG, state, mv(move_type=PLAY, position=0))
        assert int(np.asarray(hand_sizes(nxt))[0]) == 4
        assert int(nxt.deck_ptr) == 50

    def test_bomb_out_terminal_and_zero_score(self):
        state = make_game(sorted_deck())
        state = state._replace(
            life=jnp.asarray(1, dtype=jnp.int32),
            fireworks=jnp.asarray([0, 3, 0, 0, 0], dtype=jnp.int32),
        )
        nxt = apply_move(CFG, state, mv(move_type=PLAY, position=3))  # c0r1 fails
        assert int(nxt.life) == 0
        assert bool(nxt.terminal)
        assert int(score(nxt)) == 0  # SAD convention: bomb-out = 0 points

    def test_perfect_game_terminal(self):
        state = make_game(sorted_deck())
        state = state._replace(
            fireworks=jnp.asarray([5, 5, 5, 5, 4], dtype=jnp.int32),
            hands=state.hands.at[0, 0].set(card(4, 4)),
        )
        nxt = apply_move(CFG, state, mv(move_type=PLAY, position=0))
        assert int(score(nxt)) == 25
        assert bool(nxt.terminal)

    def test_terminal_state_frozen(self):
        state = make_game(sorted_deck())
        state = state._replace(terminal=jnp.asarray(True))
        nxt = apply_move(CFG, state, mv(move_type=PLAY, position=0))
        for a, b in zip(jax.tree_util.tree_leaves(nxt), jax.tree_util.tree_leaves(state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_knowledge_shifts_with_hand(self):
        deck = sorted_deck()
        state = make_game(deck)
        # hint rank 3 to p1 (touches slots 2,3), then p1 discards slot 0:
        # knowledge should shift left and the drawn slot resets.
        s1 = apply_move(CFG, state, mv(move_type=REVEAL_RANK, rank=3))
        s1 = s1._replace(info=jnp.asarray(3, dtype=jnp.int32))
        s2 = apply_move(CFG, s1, mv(move_type=DISCARD, position=0))
        rp = np.asarray(s2.rank_plausible[1])
        rh = np.asarray(s2.rank_hinted[1])
        # old slots 2,3 (hinted rank 3) now at 1,2
        assert rh[1, 3] and rh[2, 3]
        assert rp[1].sum() == 1 and rp[2].sum() == 1
        # fresh card at slot 4: everything plausible, nothing hinted
        assert rp[4].all() and not rh[4].any()


class TestMoveOutcome:
    def test_outcome_pure(self):
        """move_outcome must not depend on post-move state (SAD channel)."""
        state = make_game(sorted_deck())
        rec = move_outcome(CFG, state, mv(move_type=PLAY, position=0))
        assert bool(rec.scored)
        # state unchanged
        assert int(state.fireworks[0]) == 0
