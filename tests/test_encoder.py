"""Canonical-encoder tests: exact section layout of the 783/838-dim
observation (reference utils.py:335-341; cpp/hanabi_env.cc:115-205)."""

import jax
import jax.numpy as jnp
import numpy as np

from hanabi_sad_tpu.game import GameConfig, encoder
from hanabi_sad_tpu.game.engine import apply_move, move_outcome
from hanabi_sad_tpu.game.moves import Move
from hanabi_sad_tpu.game.state import DISCARD, PLAY, REVEAL_COLOR, REVEAL_RANK, full_deck, new_game

CFG = GameConfig(players=2, hand_size=5)
IDENT = jnp.arange(5, dtype=jnp.int32)


def card(c, r):
    return c * 5 + r


def make_game(deck_order, cfg=CFG):
    state = new_game(cfg, jax.random.PRNGKey(0))
    deck = jnp.asarray(deck_order, dtype=jnp.int32)
    hands = deck[: cfg.players * cfg.hand_size].reshape(cfg.players, cfg.hand_size)
    return state._replace(deck=deck, hands=hands)


def sorted_deck():
    return np.asarray(full_deck(CFG))


def mv(**kw):
    d = dict(move_type=0, position=0, target_offset=1, color=0, rank=0)
    d.update(kw)
    return Move(**{k: jnp.asarray(v, dtype=jnp.int32) for k, v in d.items()})


def sections(cfg, vec):
    """Split a per-player obs into named sections."""
    out = {}
    i = 0
    for name, size in [
        ("hands", cfg.hands_section),
        ("board", cfg.board_section),
        ("discard", cfg.discard_section),
        ("last_action", cfg.last_action_section),
        ("knowledge", cfg.knowledge_section),
    ]:
        out[name] = np.asarray(vec[i : i + size])
        i += size
    assert i == cfg.obs_dim
    return out


class TestHandsSection:
    def test_own_hand_hidden_partner_visible(self):
        state = make_game(sorted_deck())
        obs0 = encoder.encode_observation(CFG, state, jnp.asarray(0), IDENT)
        s = sections(CFG, obs0)
        hands = s["hands"]
        own, partner, short = hands[:125], hands[125:250], hands[250:]
        assert own.sum() == 0  # observer's own cards hidden
        partner = partner.reshape(5, 25)
        # p1 holds deck[5:10] = [c0r2,c0r2,c0r3,c0r3,c0r4]
        expected = [card(0, 2), card(0, 2), card(0, 3), card(0, 3), card(0, 4)]
        for slot, c in enumerate(expected):
            assert partner[slot, c] == 1 and partner[slot].sum() == 1
        np.testing.assert_array_equal(short, [0, 0])

    def test_relative_order(self):
        """Observer 1 sees player 0's hand in the 'next player' block."""
        state = make_game(sorted_deck())
        obs1 = encoder.encode_observation(CFG, state, jnp.asarray(1), IDENT)
        s = sections(CFG, obs1)
        partner = s["hands"][125:250].reshape(5, 25)
        expected = [card(0, 0), card(0, 0), card(0, 0), card(0, 1), card(0, 1)]
        for slot, c in enumerate(expected):
            assert partner[slot, c] == 1

    def test_short_hand_bit(self):
        state = make_game(sorted_deck())
        state = state._replace(
            hands=state.hands.at[1, 4].set(-1),
            deck_ptr=jnp.asarray(50, dtype=jnp.int32),
        )
        obs0 = encoder.encode_observation(CFG, state, jnp.asarray(0), IDENT)
        s = sections(CFG, obs0)
        np.testing.assert_array_equal(s["hands"][250:], [0, 1])


class TestBoardSection:
    def test_fixture(self):
        state = make_game(sorted_deck())
        state = state._replace(
            fireworks=jnp.asarray([0, 2, 5, 0, 1], dtype=jnp.int32),
            info=jnp.asarray(3, dtype=jnp.int32),
            life=jnp.asarray(2, dtype=jnp.int32),
            deck_ptr=jnp.asarray(15, dtype=jnp.int32),
        )
        s = sections(CFG, encoder.encode_observation(CFG, state, jnp.asarray(0), IDENT))
        board = s["board"]
        deck_bits, fw, info, life = board[:40], board[40:65], board[65:73], board[73:76]
        assert deck_bits.sum() == 35  # 50 - 15 dealt
        np.testing.assert_array_equal(deck_bits[:35], np.ones(35))
        fw = fw.reshape(5, 5)
        np.testing.assert_array_equal(fw[0], [0, 0, 0, 0, 0])  # height 0 -> zeros
        np.testing.assert_array_equal(fw[1], [0, 1, 0, 0, 0])  # height 2 -> bit 1
        np.testing.assert_array_equal(fw[2], [0, 0, 0, 0, 1])
        np.testing.assert_array_equal(fw[4], [1, 0, 0, 0, 0])
        np.testing.assert_array_equal(info, [1, 1, 1, 0, 0, 0, 0, 0])
        np.testing.assert_array_equal(life, [1, 1, 0])


class TestDiscardSection:
    def test_thermometer(self):
        state = make_game(sorted_deck())
        d = jnp.zeros((5, 5), dtype=jnp.int32)
        d = d.at[1, 0].set(2).at[1, 4].set(1).at[3, 2].set(1)
        state = state._replace(discards=d)
        s = sections(CFG, encoder.encode_observation(CFG, state, jnp.asarray(0), IDENT))
        disc = s["discard"].reshape(5, 10)
        # per color: [r0 x3][r1 x2][r2 x2][r3 x2][r4 x1]
        np.testing.assert_array_equal(disc[0], np.zeros(10))
        np.testing.assert_array_equal(disc[1], [1, 1, 0, 0, 0, 0, 0, 0, 0, 1])
        np.testing.assert_array_equal(disc[3], [0, 0, 0, 0, 0, 1, 0, 0, 0, 0])


class TestLastActionSection:
    def la(self, state, observer=0):
        s = sections(
            CFG, encoder.encode_observation(CFG, state, jnp.asarray(observer), IDENT)
        )
        la = s["last_action"]
        return {
            "actor": la[:2],
            "type": la[2:6],
            "target": la[6:8],
            "color": la[8:13],
            "rank": la[13:18],
            "reveal": la[18:23],
            "pos": la[23:28],
            "card": la[28:53],
            "scored": la[53],
            "info_add": la[54],
        }

    def test_initial_zeros(self):
        state = make_game(sorted_deck())
        la = self.la(state)
        assert sum(v.sum() if hasattr(v, "sum") else v for v in la.values()) == 0

    def test_play_encoding(self):
        state = make_game(sorted_deck())
        nxt = apply_move(CFG, state, mv(move_type=PLAY, position=0))
        # observer 1: actor (player 0) is relative slot 1
        la = self.la(nxt, observer=1)
        np.testing.assert_array_equal(la["actor"], [0, 1])
        np.testing.assert_array_equal(la["type"], [1, 0, 0, 0])  # play first
        np.testing.assert_array_equal(la["target"], [0, 0])
        np.testing.assert_array_equal(la["pos"], [1, 0, 0, 0, 0])
        assert la["card"][card(0, 0)] == 1 and la["card"].sum() == 1
        assert la["scored"] == 1 and la["info_add"] == 0
        # observer 0 (the actor): relative slot 0
        la0 = self.la(nxt, observer=0)
        np.testing.assert_array_equal(la0["actor"], [1, 0])

    def test_discard_encoding(self):
        state = make_game(sorted_deck())._replace(info=jnp.asarray(3, dtype=jnp.int32))
        nxt = apply_move(CFG, state, mv(move_type=DISCARD, position=2))
        la = self.la(nxt)
        np.testing.assert_array_equal(la["type"], [0, 1, 0, 0])
        assert la["card"][card(0, 0)] == 1
        assert la["scored"] == 0

    def test_reveal_rank_encoding(self):
        state = make_game(sorted_deck())
        nxt = apply_move(CFG, state, mv(move_type=REVEAL_RANK, rank=3))
        la = self.la(nxt, observer=1)  # observer is the hint target
        np.testing.assert_array_equal(la["type"], [0, 0, 0, 1])
        np.testing.assert_array_equal(la["target"], [1, 0])  # target rel 0 of obs1...
        np.testing.assert_array_equal(la["rank"], [0, 0, 0, 1, 0])
        np.testing.assert_array_equal(la["color"], np.zeros(5))
        np.testing.assert_array_equal(la["reveal"], [0, 0, 1, 1, 0])
        assert la["card"].sum() == 0 and la["pos"].sum() == 0


class TestKnowledgeSection:
    def test_initial_all_plausible(self):
        state = make_game(sorted_deck())
        s = sections(CFG, encoder.encode_observation(CFG, state, jnp.asarray(0), IDENT))
        k = s["knowledge"].reshape(2, 5, 35)
        np.testing.assert_array_equal(k[:, :, :25], np.ones((2, 5, 25)))
        np.testing.assert_array_equal(k[:, :, 25:], np.zeros((2, 5, 10)))

    def test_after_color_hint(self):
        state = make_game(sorted_deck())
        nxt = apply_move(CFG, state, mv(move_type=REVEAL_COLOR, color=0))
        # observer 1's own knowledge is the first relative block
        s = sections(CFG, encoder.encode_observation(CFG, nxt, jnp.asarray(1), IDENT))
        k = s["knowledge"].reshape(2, 5, 35)
        own = k[0]  # observer-relative slot 0 = own hand
        # plausible: color 0 only (all 5 ranks)
        np.testing.assert_array_equal(own[0, :25].reshape(5, 5).sum(axis=1), [5, 0, 0, 0, 0])
        # direct color hint bit
        np.testing.assert_array_equal(own[0, 25:30], [1, 0, 0, 0, 0])
        np.testing.assert_array_equal(own[0, 30:35], np.zeros(5))

    def test_empty_slot_zeros(self):
        state = make_game(sorted_deck())
        state = state._replace(hands=state.hands.at[1, 4].set(-1))
        s = sections(CFG, encoder.encode_observation(CFG, state, jnp.asarray(0), IDENT))
        k = s["knowledge"].reshape(2, 5, 35)
        np.testing.assert_array_equal(k[1, 4], np.zeros(35))


class TestOwnHandTrinary:
    def test_categories(self):
        state = make_game(sorted_deck())
        state = state._replace(
            fireworks=jnp.asarray([2, 0, 0, 0, 0], dtype=jnp.int32),
            hands=state.hands.at[0].set(
                jnp.asarray([card(0, 2), card(0, 1), card(0, 4), card(1, 0), -1], jnp.int32)
            ),
        )
        tri = np.asarray(encoder.encode_own_hand_trinary(CFG, state, jnp.asarray(0))).reshape(5, 3)
        np.testing.assert_array_equal(tri[0], [1, 0, 0])  # rank2 == fw -> playable
        np.testing.assert_array_equal(tri[1], [0, 1, 0])  # rank1 < fw -> useless
        np.testing.assert_array_equal(tri[2], [0, 0, 1])  # rank4 -> neither
        np.testing.assert_array_equal(tri[3], [1, 0, 0])  # c1r0 on fw 0 -> playable
        np.testing.assert_array_equal(tri[4], [0, 0, 0])  # empty slot = mask 0


class TestColorPermutation:
    def test_consistent_relabel(self):
        """A permuted encoding equals encoding the state with colors
        physically relabeled (OP invariance; cpp/hanabi_env.cc:22-44)."""
        perm = jnp.asarray([2, 0, 3, 4, 1], dtype=jnp.int32)
        deck = sorted_deck()
        state = make_game(deck)
        state = apply_move(CFG, state, mv(move_type=PLAY, position=0))
        state = apply_move(CFG, state, mv(move_type=REVEAL_COLOR, color=0))
        obs_perm = encoder.encode_observation(CFG, state, jnp.asarray(0), perm)

        # physically relabel the state: card codes, fireworks, discards,
        # knowledge, last-action color
        p = np.asarray(perm)

        def relabel_card(c):
            return np.where(c >= 0, p[np.maximum(c, 0) // 5] * 5 + c % 5, -1)

        relabeled = state._replace(
            hands=jnp.asarray(relabel_card(np.asarray(state.hands)), jnp.int32),
            deck=jnp.asarray(relabel_card(np.asarray(state.deck)), jnp.int32),
            fireworks=jnp.asarray(np.asarray(state.fireworks)[np.argsort(p)], jnp.int32),
            discards=jnp.asarray(np.asarray(state.discards)[np.argsort(p)], jnp.int32),
            color_plausible=jnp.asarray(np.asarray(state.color_plausible)[:, :, np.argsort(p)]),
            color_hinted=jnp.asarray(np.asarray(state.color_hinted)[:, :, np.argsort(p)]),
            last=state.last._replace(
                color=jnp.asarray(int(p[int(state.last.color)]), jnp.int32),
                card=jnp.asarray(int(relabel_card(np.asarray(state.last.card))), jnp.int32),
            ),
        )
        obs_relabel = encoder.encode_observation(CFG, relabeled, jnp.asarray(0), IDENT)
        np.testing.assert_array_equal(np.asarray(obs_perm), np.asarray(obs_relabel))


class TestSadChannel:
    def test_greedy_block_matches_applied_move(self):
        """The SAD block for a greedy move must equal the regular last-action
        block that appears if that move is actually applied."""
        state = make_game(sorted_deck())
        gmove = mv(move_type=PLAY, position=0)
        sad_block = encoder.greedy_action_channel(CFG, state, gmove, jnp.asarray(1), IDENT)
        applied = apply_move(CFG, state, gmove)
        real_block = encoder.encode_last_action(CFG, applied.last, jnp.asarray(1), IDENT)
        np.testing.assert_array_equal(np.asarray(sad_block), np.asarray(real_block))


class TestShuffleObs:
    """shuffle_obs: a per-encode permutation of the partner's hand slots
    (cpp/hanabi_env.cc:134-143) applied consistently to every
    partner-slot-indexed section."""

    SHUF = jnp.asarray([2, 0, 4, 1, 3], dtype=jnp.int32)

    def test_hands_section_permuted(self):
        state = make_game(sorted_deck())
        plain = sections(CFG, encoder.encode_observation(CFG, state, jnp.asarray(0), IDENT))
        shuf = sections(
            CFG, encoder.encode_observation(CFG, state, jnp.asarray(0), IDENT, self.SHUF)
        )
        own_plain = plain["hands"][:125].reshape(5, 25)
        own_shuf = shuf["hands"][:125].reshape(5, 25)
        np.testing.assert_array_equal(own_shuf, 0)  # own hand still hidden
        np.testing.assert_array_equal(own_plain, own_shuf)
        partner_plain = plain["hands"][125:250].reshape(5, 25)
        partner_shuf = shuf["hands"][125:250].reshape(5, 25)
        np.testing.assert_array_equal(partner_shuf, partner_plain[np.asarray(self.SHUF)])
        # trailing short-hand bits untouched
        np.testing.assert_array_equal(plain["hands"][250:], shuf["hands"][250:])

    def test_other_sections_unchanged(self):
        state = make_game(sorted_deck())
        plain = sections(CFG, encoder.encode_observation(CFG, state, jnp.asarray(0), IDENT))
        shuf = sections(
            CFG, encoder.encode_observation(CFG, state, jnp.asarray(0), IDENT, self.SHUF)
        )
        np.testing.assert_array_equal(plain["board"], shuf["board"])
        np.testing.assert_array_equal(plain["discard"], shuf["discard"])

    def test_knowledge_follows_hand_order(self):
        # Hint red to player 1, then observe as player 0 with a shuffle: the
        # partner knowledge slots must be permuted by the same order.
        state = make_game(sorted_deck())
        state = apply_move(CFG, state, mv(move_type=REVEAL_COLOR, color=0))
        plain = sections(CFG, encoder.encode_observation(CFG, state, jnp.asarray(0), IDENT))
        shuf = sections(
            CFG, encoder.encode_observation(CFG, state, jnp.asarray(0), IDENT, self.SHUF)
        )
        own_k_plain = plain["knowledge"][: 5 * 35].reshape(5, 35)
        own_k_shuf = shuf["knowledge"][: 5 * 35].reshape(5, 35)
        np.testing.assert_array_equal(own_k_plain, own_k_shuf)
        partner_plain = plain["knowledge"][5 * 35 :].reshape(5, 35)
        partner_shuf = shuf["knowledge"][5 * 35 :].reshape(5, 35)
        np.testing.assert_array_equal(partner_shuf, partner_plain[np.asarray(self.SHUF)])

    def test_last_action_position_remapped_for_partner_move(self):
        # Player 0 plays slot 3; player 1 observes with a shuffle: the
        # position one-hot must point at the displayed slot d with
        # shuf[d] == 3. Here SHUF[4] == 3 -> displayed slot 4.
        state = make_game(sorted_deck())
        state = apply_move(CFG, state, mv(move_type=PLAY, position=3))
        la = sections(
            CFG, encoder.encode_observation(CFG, state, jnp.asarray(1), IDENT, self.SHUF)
        )["last_action"]
        pos_bits = la[23:28]  # 2P actor + 4 type + 2P target + 5 color + 5 rank + 5 reveal -> 23
        np.testing.assert_array_equal(pos_bits, [0, 0, 0, 0, 1])

    def test_last_action_position_unchanged_for_own_move(self):
        # Player 0 plays slot 3 and then observes (own move): no remap.
        state = make_game(sorted_deck())
        state = apply_move(CFG, state, mv(move_type=PLAY, position=3))
        la_plain = sections(
            CFG, encoder.encode_observation(CFG, state, jnp.asarray(0), IDENT)
        )["last_action"]
        la_shuf = sections(
            CFG, encoder.encode_observation(CFG, state, jnp.asarray(0), IDENT, self.SHUF)
        )["last_action"]
        np.testing.assert_array_equal(la_plain, la_shuf)

    def test_reveal_mask_remapped_when_partner_is_target(self):
        # Player 1 hints rank to player 0's hand; player 1 (the hinter)
        # observes: the target is its partner, so the reveal mask follows the
        # shuffled order.
        state = make_game(sorted_deck())
        state = state._replace(cur_player=jnp.asarray(1, jnp.int32))
        state = apply_move(CFG, state, mv(move_type=REVEAL_RANK, rank=0))
        la_plain = sections(
            CFG, encoder.encode_observation(CFG, state, jnp.asarray(1), IDENT)
        )["last_action"]
        la_shuf = sections(
            CFG, encoder.encode_observation(CFG, state, jnp.asarray(1), IDENT, self.SHUF)
        )["last_action"]
        mask_plain = la_plain[18:23]
        mask_shuf = la_shuf[18:23]
        np.testing.assert_array_equal(mask_shuf, mask_plain[np.asarray(self.SHUF)])
