"""Differential validation of the JAX engine + canonical encoder against
tests/hle_upstream_ref.py — a scalar transcription of the *upstream public*
HLE semantics (canonical_encoders.cc / hanabi_state.cc), independent of both
the JAX implementation and the repo's clean-room C++ oracle.

Covers, per step of full playouts: the complete per-player observation bit
vector (hands / board / discards / last-action / knowledge sections), the
legal-move mask, and the core scalars (fireworks, info, life, terminal).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hanabi_sad_tpu.game import GameConfig, encoder
from hanabi_sad_tpu.game.engine import apply_move
from hanabi_sad_tpu.game.moves import decode_uid, legal_moves_all
from hanabi_sad_tpu.game.state import full_deck, new_game

from hle_upstream_ref import UpstreamHanabiState


def make_pair(cfg: GameConfig, deck_codes):
    """Construct the same fixed-deck game in both implementations."""
    up = UpstreamHanabiState(
        deck_codes,
        players=cfg.players,
        hand_size=cfg.hand_size,
        num_colors=cfg.num_colors,
        num_ranks=cfg.num_ranks,
        max_info=cfg.max_info_tokens,
        max_life=cfg.max_life_tokens,
    )
    state = new_game(cfg, jax.random.PRNGKey(0))
    deck = jnp.asarray(deck_codes, dtype=jnp.int32)
    hands = deck[: cfg.players * cfg.hand_size].reshape(cfg.players, cfg.hand_size)
    state = state._replace(deck=deck, hands=hands)
    return up, state


def jitted_fns(cfg: GameConfig, hide_action: bool = False):
    ident = jnp.arange(cfg.num_colors, dtype=jnp.int32)

    @jax.jit
    def obs_all(state):
        enc = lambda p: encoder.encode_observation(
            cfg, state, jnp.asarray(p), ident, hide_action=hide_action
        )
        return jnp.stack([enc(p) for p in range(cfg.players)])

    @jax.jit
    def legal(state):
        return legal_moves_all(cfg, state)

    @jax.jit
    def step(state, uid):
        return apply_move(cfg, state, decode_uid(cfg, jnp.asarray(uid, jnp.int32)))

    return obs_all, legal, step


def compare_step(cfg, up, state, obs_all, legal, hide_action=False):
    obs = np.asarray(obs_all(state))
    for p in range(cfg.players):
        expected = up.encode(p, hide_action=hide_action)
        diff = np.flatnonzero(obs[p] != expected)
        assert diff.size == 0, (
            f"observer {p}: {diff.size} differing bits at {diff[:20]} "
            f"(jax={obs[p][diff[:20]]}, upstream={expected[diff[:20]]})"
        )
    legal_jax = np.asarray(legal(state))
    up_legal = set(up.legal_uids())
    cur = up.cur_player
    noop_only = {up.max_moves}
    for p in range(cfg.players):
        got = set(np.flatnonzero(legal_jax[p]).tolist())
        want = up_legal if p == cur else noop_only
        assert got == want, f"player {p} legal mask: got {sorted(got)} want {sorted(want)}"
    assert int(state.info) == up.info
    assert int(state.life) == up.life
    assert np.asarray(state.fireworks).tolist() == up.fireworks


def run_differential(cfg, deck_codes, pick_uid, max_steps=200, hide_action=False):
    """Drive both implementations with the same moves; compare every step."""
    up, state = make_pair(cfg, deck_codes)
    obs_all, legal, step = jitted_fns(cfg, hide_action)
    compare_step(cfg, up, state, obs_all, legal, hide_action)
    steps = 0
    while not up.is_terminal() and steps < max_steps:
        uid = pick_uid(up)
        up.apply_uid(uid)
        state = step(state, uid)
        steps += 1
        assert bool(state.terminal) == up.is_terminal(), f"terminal @ step {steps}"
        if not up.is_terminal():
            compare_step(cfg, up, state, obs_all, legal, hide_action)
        else:
            # Post-terminal scalars still agree (the obs is never consumed).
            assert np.asarray(state.fireworks).tolist() == up.fireworks
            assert int(state.life) == up.life
    assert up.is_terminal(), "playout did not terminate"
    return steps


class TestRandomPlayouts:
    """Random legal playouts to terminal, exact per-step obs/legal parity."""

    @pytest.mark.parametrize(
        "players,hand_size,seed",
        [(2, 5, 0), (2, 5, 1), (2, 5, 2), (3, 5, 3), (4, 4, 4), (5, 4, 5),
         # Non-standard hand sizes (the reference exposes hand_size as a free
         # game param, create.py:38-43): shrinks the transcription-oracle
         # blind spots around H-dependent layout sections.
         (2, 4, 6), (3, 4, 7)],
    )
    def test_full_game_parity(self, players, hand_size, seed):
        cfg = GameConfig(players=players, hand_size=hand_size)
        rng = np.random.RandomState(seed)
        deck = rng.permutation(np.asarray(full_deck(cfg)))

        def pick(up):
            # Random play bombs out in ~3 moves; bias 70% toward non-play
            # moves so playouts run long enough to exercise hints, discards,
            # draws, and the deck thermometer.
            legal = sorted(up.legal_uids())
            H = cfg.hand_size
            non_play = [u for u in legal if not (H <= u < 2 * H)]
            if non_play and rng.rand() < 0.7:
                return int(rng.choice(non_play))
            return int(rng.choice(legal))

        steps = run_differential(cfg, deck, pick)
        assert steps > 5  # a real game happened


class TestScriptedStackCompletion:
    """Force the rare path random play misses: completing a color stack, which
    must set BOTH trailing last-action bits (scored + regained info token —
    canonical_encoders.cc writes them only for play moves)."""

    def test_play_out_color_zero(self):
        cfg = GameConfig(players=2, hand_size=5)
        # p0 holds R1..R5 (codes 0..4); p1 holds junk of color 1; p0's draws
        # after each play are color-0 duplicates so p1's color-0 hint stays
        # legal throughout.
        deck = [0, 1, 2, 3, 4] + [5, 5, 5, 6, 6] + [0, 0, 1, 2, 3]
        rest = np.asarray(full_deck(cfg)).tolist()
        for c in deck:
            rest.remove(c)
        deck = deck + rest
        up, state = make_pair(cfg, deck)
        obs_all, legal, step = jitted_fns(cfg)

        rc_color0 = 2 * cfg.hand_size  # reveal-color, offset 1, color 0
        play0 = cfg.hand_size  # play slot 0
        for round_idx in range(5):
            for uid in (play0, rc_color0):
                compare_step(cfg, up, state, obs_all, legal)
                up.apply_uid(uid)
                state = step(state, uid)
        compare_step(cfg, up, state, obs_all, legal)

        assert up.fireworks[0] == 5
        # After the 5th play (before p1's 5th hint), the last-action block of
        # the post-play state had scored=1 and info_token=1; re-derive by
        # replaying: check the history item directly.
        assert up.last_move.move_type == "reveal_color"  # latest move
        # Regained token: 4 hints spent before the completing play -> info was
        # 4 < 8, so the completion must have added one back.
        assert up.info == 8 - 5 + 1

    def test_scored_and_token_bits_in_obs(self):
        """Observe the state right after the completing play: the two trailing
        last-action bits must both be set, and for a plain successful play
        only the scored bit."""
        cfg = GameConfig(players=2, hand_size=5)
        deck = [0, 1, 2, 3, 4] + [5, 5, 5, 6, 6] + [0, 0, 1, 2, 3]
        rest = np.asarray(full_deck(cfg)).tolist()
        for c in deck:
            rest.remove(c)
        deck = deck + rest
        up, state = make_pair(cfg, deck)
        obs_all, legal, step = jitted_fns(cfg)

        la_off = (
            cfg.players * cfg.hand_size * 25
            + cfg.players
            + (50 - cfg.players * cfg.hand_size)
            + 25
            + cfg.max_info_tokens
            + cfg.max_life_tokens
            + 50
        )
        la_len = 2 * cfg.players + 4 + 5 + 5 + 2 * cfg.hand_size + 25 + 2
        scored_bit = la_off + la_len - 2
        token_bit = la_off + la_len - 1

        rc_color0 = 2 * cfg.hand_size
        play0 = cfg.hand_size
        for round_idx in range(5):
            up.apply_uid(play0)
            state = step(state, play0)
            compare_step(cfg, up, state, obs_all, legal)
            obs = np.asarray(obs_all(state))
            assert obs[0][scored_bit] == 1 and obs[1][scored_bit] == 1
            expect_token = 1.0 if round_idx == 4 else 0.0  # only the 5 completes
            assert obs[0][token_bit] == expect_token
            assert obs[1][token_bit] == expect_token
            if round_idx < 4:
                up.apply_uid(rc_color0)
                state = step(state, rc_color0)


class TestScriptedEdgeCases:
    def test_failed_play_no_bits_life_drop(self):
        cfg = GameConfig(players=2, hand_size=5)
        # p0 slot 0 is a rank-2 card (code 1): playing it on an empty stack fails.
        deck = [1, 1, 2, 3, 4] + [5, 5, 5, 6, 6]
        rest = np.asarray(full_deck(cfg)).tolist()
        for c in deck:
            rest.remove(c)
        deck = deck + rest
        up, state = make_pair(cfg, deck)
        obs_all, legal, step = jitted_fns(cfg)

        play0 = cfg.hand_size
        up.apply_uid(play0)
        state = step(state, play0)
        compare_step(cfg, up, state, obs_all, legal)
        assert up.life == 2
        assert up.discard_pile == [1]  # failed play lands in the discard pile

    def test_deck_exhaustion_countdown(self):
        """Exactly P moves happen after the deck empties."""
        cfg = GameConfig(players=2, hand_size=5)
        rng = np.random.RandomState(7)
        deck = rng.permutation(np.asarray(full_deck(cfg)))
        up, state = make_pair(cfg, deck)
        obs_all, legal, step = jitted_fns(cfg)

        # Alternate discard/hint so no lives are ever lost and the game can
        # only end by exhaustion (hint when discard illegal at max info).
        moves_after_empty = 0
        steps = 0
        while not up.is_terminal() and steps < 300:
            deck_empty = up.cursor >= len(up.deck)
            legal_set = up.legal_uids()
            uid = 0 if 0 in legal_set else sorted(legal_set)[-1]
            if 0 not in legal_set:  # max info: hint instead
                uid = next(u for u in sorted(legal_set) if u >= 2 * cfg.hand_size)
            up.apply_uid(uid)
            state = step(state, uid)
            steps += 1
            if deck_empty:
                moves_after_empty += 1
            if not up.is_terminal():
                compare_step(cfg, up, state, obs_all, legal)
        assert up.is_terminal() and up.life > 0
        assert moves_after_empty == cfg.players
        assert bool(state.terminal)


class TestHideAction:
    """hideAction (fork encoder flag, OBL lineage): the last-action section
    stays zeroed while every other section — and the layout length — is
    unchanged. Differential vs the upstream transcription's own hide_action
    branch over a full playout."""

    def test_full_game_parity_hidden(self):
        cfg = GameConfig(players=2, hand_size=5)
        rng = np.random.RandomState(11)
        deck = rng.permutation(np.asarray(full_deck(cfg)))

        def pick(up):
            legal = sorted(up.legal_uids())
            H = cfg.hand_size
            non_play = [u for u in legal if not (H <= u < 2 * H)]
            if non_play and rng.rand() < 0.7:
                return int(rng.choice(non_play))
            return int(rng.choice(legal))

        steps = run_differential(cfg, deck, pick, hide_action=True)
        assert steps > 5

    def test_only_last_action_section_differs(self):
        cfg = GameConfig(players=2, hand_size=5)
        rng = np.random.RandomState(12)
        deck = rng.permutation(np.asarray(full_deck(cfg)))
        up, state = make_pair(cfg, deck)
        obs_plain, legal, step = jitted_fns(cfg, hide_action=False)
        obs_hidden, _, _ = jitted_fns(cfg, hide_action=True)

        # Make one non-play move so the last-action section is non-trivial.
        uid = sorted(u for u in up.legal_uids() if u >= 2 * cfg.hand_size)[0]
        up.apply_uid(uid)
        state = step(state, uid)

        lo = cfg.hands_section + cfg.board_section + cfg.discard_section
        hi = lo + cfg.last_action_section
        plain = np.asarray(obs_plain(state))
        hidden = np.asarray(obs_hidden(state))
        assert np.all(hidden[:, lo:hi] == 0)
        assert np.any(plain[:, lo:hi] != 0)  # a hint was made; bits exist
        np.testing.assert_array_equal(hidden[:, :lo], plain[:, :lo])
        np.testing.assert_array_equal(hidden[:, hi:], plain[:, hi:])


class TestColorPermEquivariance:
    """End-to-end oracle for the Other-Play color permutation WITHOUT needing
    the fork's shuffleColor source: encoding a state through permutation
    sigma must equal the upstream transcription's *identity* encoding of the
    sigma-relabeled playout (same decks/moves with every card color c and
    every color hint relabeled to sigma[c]). Also checks the permuted
    legal-move mask (moves.permute_hint_colors) against the relabeled
    playout's legal uids."""

    @pytest.mark.parametrize("seed", [21, 22])
    def test_perm_equals_relabeled_playout(self, seed):
        from hanabi_sad_tpu.game.moves import permute_hint_colors

        cfg = GameConfig(players=2, hand_size=5)
        C, R, H = cfg.num_colors, cfg.num_ranks, cfg.hand_size
        rng = np.random.RandomState(seed)
        deck = rng.permutation(np.asarray(full_deck(cfg)))
        sigma = rng.permutation(C)
        deck_rel = sigma[deck // R] * R + deck % R

        def mk_upstream(d):
            return UpstreamHanabiState(
                d, players=cfg.players, hand_size=cfg.hand_size,
                num_colors=C, num_ranks=R,
                max_info=cfg.max_info_tokens, max_life=cfg.max_life_tokens,
            )

        up_o, state = make_pair(cfg, deck)
        up_r = mk_upstream(deck_rel)

        sig = jnp.asarray(sigma, dtype=jnp.int32)

        @jax.jit
        def obs_perm(state):
            enc = lambda p: encoder.encode_observation(cfg, state, jnp.asarray(p), sig)
            return jnp.stack([enc(p) for p in range(cfg.players)])

        _, legal_fn, step = jitted_fns(cfg)

        def relabel_uid(uid):
            rc_base = 2 * H
            if rc_base <= uid < rc_base + (cfg.players - 1) * C:
                off, c = divmod(uid - rc_base, C)
                return rc_base + off * C + int(sigma[c])
            return uid

        steps = 0
        while not up_o.is_terminal() and steps < 200:
            # Perm-encoded JAX obs == identity-encoded relabeled upstream obs.
            obs = np.asarray(obs_perm(state))
            for p in range(cfg.players):
                expected = up_r.encode(p)
                diff = np.flatnonzero(obs[p] != expected)
                assert diff.size == 0, (
                    f"step {steps} observer {p}: {diff.size} differing bits "
                    f"at {diff[:10]}"
                )
            # Permuted legal mask == relabeled playout's legal uids.
            legal = np.asarray(
                permute_hint_colors(
                    cfg, jnp.asarray(legal_fn(state)), jnp.tile(sig, (cfg.players, 1))
                )
            )
            cur = up_o.cur_player
            got = set(np.flatnonzero(legal[cur]).tolist())
            assert got == set(up_r.legal_uids()), f"step {steps} legal mask"
            assert set(up_r.legal_uids()) == {
                relabel_uid(u) for u in up_o.legal_uids()
            }

            legal_o = sorted(up_o.legal_uids())
            non_play = [u for u in legal_o if not (H <= u < 2 * H)]
            uid = int(rng.choice(non_play)) if (non_play and rng.rand() < 0.7) else int(rng.choice(legal_o))
            up_o.apply_uid(uid)
            up_r.apply_uid(relabel_uid(uid))
            state = step(state, uid)
            steps += 1
        assert up_r.is_terminal() == up_o.is_terminal()
        assert steps > 5
