"""Differential test: the JAX engine vs the independent C++ oracle.

Both engines are dealt the same deck and fed the same action sequence; every
observation bit, legal mask, reward, and state scalar must match at every
step — the fixed-seed trajectory-parity requirement of BASELINE.json, checked
between two independent implementations of the spec."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hanabi_sad_tpu.game import GameConfig, encoder, moves
from hanabi_sad_tpu.game.engine import apply_move, move_outcome
from hanabi_sad_tpu.game.state import new_game, score
from hanabi_sad_tpu.native import NativeGame, available

pytestmark = pytest.mark.skipif(not available(), reason="native engine unavailable")

CFG = GameConfig(players=2, hand_size=5)
IDENT = jnp.arange(5, dtype=jnp.int32)


def jax_game_from_deck(deck, cfg=CFG):
    state = new_game(cfg, jax.random.PRNGKey(0))
    deck = jnp.asarray(deck, dtype=jnp.int32)
    hands = deck[: cfg.players * cfg.hand_size].reshape(cfg.players, cfg.hand_size)
    return state._replace(deck=deck, hands=hands)


def random_deck(seed):
    rng = np.random.RandomState(seed)
    deck = np.repeat(np.arange(25), np.tile([3, 2, 2, 2, 1], 5))
    rng.shuffle(deck)
    return deck.astype(np.int32)


def compare_full(cfg, jstate, native, step_idx):
    for p in range(cfg.players):
        jobs = np.asarray(encoder.encode_observation(cfg, jstate, jnp.asarray(p), IDENT))
        nobs = native.encode(p)
        mismatch = np.where(jobs != nobs)[0]
        assert mismatch.size == 0, f"step {step_idx} obs[{p}] differs at bits {mismatch[:10]}"
        jlegal = np.asarray(moves.legal_moves_all(cfg, jstate))[p]
        nlegal = native.legal_moves(p).astype(bool)
        np.testing.assert_array_equal(jlegal, nlegal, err_msg=f"step {step_idx} legal[{p}]")
        np.testing.assert_array_equal(
            np.asarray(encoder.encode_own_hand_trinary(cfg, jstate, jnp.asarray(p))),
            native.own_hand(p),
            err_msg=f"step {step_idx} own_hand[{p}]",
        )
    assert int(score(jstate)) == native.score, f"step {step_idx} score"
    assert int(jstate.life) == native.life
    assert int(jstate.info) == native.info
    assert bool(jstate.terminal) == native.terminal
    assert int(jstate.cur_player) == native.cur_player
    assert 50 - int(jstate.deck_ptr) == native.deck_left


@pytest.mark.parametrize("seed", range(8))
def test_random_playout_parity(seed):
    cfg = CFG
    deck = random_deck(seed)
    jstate = jax_game_from_deck(deck)
    native = NativeGame(deck, players=2, hand_size=5)
    rng = np.random.RandomState(1000 + seed)

    compare_full(cfg, jstate, native, -1)
    for step_idx in range(120):
        if native.terminal:
            break
        legal = native.legal_moves(native.cur_player)
        choices = np.where(legal)[0]
        uid = int(rng.choice(choices))

        # SAD channel parity on the pre-move state: the greedy channel of the
        # chosen uid must match between engines for both observers
        for obs_p in range(2):
            jchan = np.asarray(
                encoder.greedy_action_channel(
                    cfg, jstate, moves.decode_uid(cfg, jnp.asarray(uid)), jnp.asarray(obs_p), IDENT
                )
            )
            nchan = native.greedy_channel(uid, obs_p)
            np.testing.assert_array_equal(jchan, nchan, err_msg=f"step {step_idx} sad[{obs_p}]")

        prev = int(score(jstate))
        jstate = apply_move(cfg, jstate, moves.decode_uid(cfg, jnp.asarray(uid)))
        jreward = int(score(jstate)) - prev
        nreward = native.step(uid)
        assert jreward == nreward, f"step {step_idx} reward {jreward} vs {nreward}"
        compare_full(cfg, jstate, native, step_idx)
    else:
        pytest.fail("game did not terminate within 120 steps")


@pytest.mark.parametrize("players,hand", [(3, 5), (4, 4), (5, 4)])
def test_multiplayer_parity(players, hand):
    cfg = GameConfig(players=players, hand_size=hand)
    deck = random_deck(99 + players)
    jstate = jax_game_from_deck(deck, cfg)
    native = NativeGame(deck, players=players, hand_size=hand)
    rng = np.random.RandomState(7)
    for step_idx in range(140):
        if native.terminal:
            break
        legal = native.legal_moves(native.cur_player)
        uid = int(rng.choice(np.where(legal)[0]))
        jstate = apply_move(cfg, jstate, moves.decode_uid(cfg, jnp.asarray(uid)))
        native.step(uid)
        for p in range(players):
            jobs = np.asarray(
                encoder.encode_observation(cfg, jstate, jnp.asarray(p), IDENT)
            )
            np.testing.assert_array_equal(jobs, native.encode(p), err_msg=f"{step_idx}/{p}")
    assert native.terminal
