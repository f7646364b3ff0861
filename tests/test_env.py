"""Env-layer tests: reset/step semantics, SAD channel, eps sampling, OP
permutation plumbing, forced termination (cpp/hanabi_env.cc)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from hanabi_sad_tpu.game import GameConfig
from hanabi_sad_tpu.game.env import EnvConfig, HanabiEnv, observe, reset, step


def random_legal(key, legal):
    p = legal / legal.sum(-1, keepdims=True)
    return jax.vmap(lambda k, pp: jax.random.choice(k, pp.shape[-1], p=pp))(
        jax.random.split(key, legal.shape[0]), p
    ).astype(jnp.int32)


def rollout(cfg, key, num_steps=100):
    """Scan a single env with a random legal policy."""
    k_reset, k_act = jax.random.split(key)
    state, obs = reset(cfg, k_reset)

    def body(carry, k):
        state, obs = carry
        a = random_legal(k, obs["legal_move"])
        state, obs, r, d = step(cfg, state, {"a": a, "greedy_a": a})
        return (state, obs), (r, d, state.game.info, state.game.life)

    (state, obs), (rs, ds, infos, lives) = jax.lax.scan(
        body, (state, obs), jax.random.split(k_act, num_steps)
    )
    return state, obs, rs, ds, infos, lives


class TestReset:
    def test_shapes(self):
        cfg = EnvConfig(game=GameConfig(players=2), sad=True, eps_list=(0.1, 0.05))
        state, obs = reset(cfg, jax.random.PRNGKey(0))
        assert obs["priv_s"].shape == (2, 838)
        assert obs["legal_move"].shape == (2, 21)
        assert obs["eps"].shape == (2,)
        assert obs["own_hand"].shape == (2, 15)
        assert not bool(state.done)

    def test_eps_from_menu(self):
        cfg = EnvConfig(game=GameConfig(players=2), eps_list=(0.25, 0.5, 0.75))
        seen = set()
        for i in range(20):
            state, _ = reset(cfg, jax.random.PRNGKey(i))
            seen.update(np.asarray(state.player_eps).round(4).tolist())
        assert seen.issubset({0.25, 0.5, 0.75})
        assert len(seen) > 1

    def test_sad_block_zero_at_reset(self):
        cfg = EnvConfig(game=GameConfig(players=2), sad=True)
        _, obs = reset(cfg, jax.random.PRNGKey(3))
        sad_block = np.asarray(obs["priv_s"][:, 783:])
        assert sad_block.sum() == 0

    def test_op_one_identity_player(self):
        cfg = EnvConfig(game=GameConfig(players=2), shuffle_color=True)
        n_ident = 0
        for i in range(30):
            state, _ = reset(cfg, jax.random.PRNGKey(i))
            perms = np.asarray(state.color_perm)
            ident = (perms == np.arange(5)).all(axis=1)
            assert ident.any()  # at least the fix player
            n_ident += ident.sum()
        assert n_ident < 60  # and non-identity perms do occur


class TestStep:
    def test_full_random_episodes(self):
        cfg = EnvConfig(game=GameConfig(players=2), max_len=80)
        run = jax.jit(functools.partial(rollout, cfg))
        for seed in range(5):
            state, obs, rs, ds, infos, lives = run(jax.random.PRNGKey(seed))
            assert bool(state.done)
            assert (np.asarray(infos) >= 0).all() and (np.asarray(infos) <= 8).all()
            assert (np.asarray(lives) >= 0).all()
            # rewards sum to last_score (bomb-out -> both 0; each play delta)
            total = float(np.asarray(rs).sum())
            assert total == float(state.last_score) - 0.0 or total <= 0

    def test_reward_is_score_delta(self):
        cfg = EnvConfig(game=GameConfig(players=2), max_len=80)
        state, obs, rs, ds, infos, lives = jax.jit(functools.partial(rollout, cfg))(
            jax.random.PRNGKey(11)
        )
        done_idx = int(np.argmax(np.asarray(ds)))
        # after done, rewards are zero
        assert np.asarray(rs)[done_idx + 1 :].sum() == 0

    def test_forced_termination_forfeits(self):
        cfg = EnvConfig(game=GameConfig(players=2), max_len=3)
        state, obs = reset(cfg, jax.random.PRNGKey(0))
        k = jax.random.PRNGKey(1)
        total_before = 0.0
        for i in range(3):
            k, ka = jax.random.split(k)
            # always hint to avoid bombs: find a legal hint, else any legal
            legal = obs["legal_move"]
            a = random_legal(ka, legal)
            state, obs, r, d = step(cfg, state, {"a": a, "greedy_a": a})
        assert bool(state.done)
        assert int(state.num_step) == 3

    def test_sad_channel_reflects_partner_greedy(self):
        cfg = EnvConfig(game=GameConfig(players=2), sad=True, max_len=80)
        state, obs = reset(cfg, jax.random.PRNGKey(5))
        a = random_legal(jax.random.PRNGKey(6), obs["legal_move"])
        state, obs, r, d = step(cfg, state, {"a": a, "greedy_a": a})
        sad_block = np.asarray(obs["priv_s"][:, 783:])
        assert sad_block.sum() > 0  # greedy move encoded

    def test_determinism(self):
        cfg = EnvConfig(game=GameConfig(players=2), max_len=80)
        run = jax.jit(functools.partial(rollout, cfg))
        s1, o1, r1, *_ = run(jax.random.PRNGKey(9))
        s2, o2, r2, *_ = run(jax.random.PRNGKey(9))
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
        np.testing.assert_array_equal(np.asarray(o1["priv_s"]), np.asarray(o2["priv_s"]))


class TestVectorized:
    def test_batched_env(self):
        env = HanabiEnv(EnvConfig(game=GameConfig(players=2), max_len=80))
        N = 16
        keys = jax.random.split(jax.random.PRNGKey(0), N)
        state, obs = jax.jit(env.reset)(keys)
        assert obs["priv_s"].shape == (N, 2, 783)

        @jax.jit
        def multi_step(state, obs, k):
            a = jax.vmap(random_legal)(jax.random.split(k, N), obs["legal_move"])
            return env.step(state, {"a": a, "greedy_a": a})

        k = jax.random.PRNGKey(1)
        for i in range(90):
            k, ka = jax.random.split(k)
            state, obs, r, d = multi_step(state, obs, ka)
        assert bool(np.asarray(state.done).all())  # max_len forces all done
        scores = np.asarray(state.last_score)
        assert (scores >= 0).all() and (scores <= 25).all()


class TestShuffleObs:
    """shuffle_obs mode: per-step partner-hand order shuffle
    (cpp/hanabi_env.cc:134-143)."""

    def _paired_obs(self, seed, steps=12):
        cfg_on = EnvConfig(game=GameConfig(players=2), shuffle_obs=True, max_len=80)
        cfg_off = EnvConfig(game=GameConfig(players=2), max_len=80)
        state, obs = reset(cfg_on, jax.random.PRNGKey(seed))
        pairs = []
        key = jax.random.PRNGKey(seed + 1)
        for _ in range(steps):
            pairs.append((observe(cfg_on, state), observe(cfg_off, state)))
            key, k = jax.random.split(key)
            a = random_legal(k, obs["legal_move"])
            state, obs, _, d = step(cfg_on, state, {"a": a, "greedy_a": a})
            if bool(d):
                break
        return pairs

    def test_partner_block_is_permutation(self):
        H = 5
        saw_shuffled = False
        for on, off in self._paired_obs(0):
            for p in range(2):
                on_hand = np.asarray(on["priv_s"][p][125:250]).reshape(H, 25)
                off_hand = np.asarray(off["priv_s"][p][125:250]).reshape(H, 25)
                on_rows = sorted(map(tuple, on_hand))
                off_rows = sorted(map(tuple, off_hand))
                assert on_rows == off_rows  # same multiset of cards
                if not np.array_equal(on_hand, off_hand):
                    saw_shuffled = True
                # non-partner-indexed outputs identical
                np.testing.assert_array_equal(
                    np.asarray(on["priv_s"][p][250:252]),
                    np.asarray(off["priv_s"][p][250:252]),
                )  # short-hand bits
                np.testing.assert_array_equal(
                    np.asarray(on["priv_s"][p][252:378]),
                    np.asarray(off["priv_s"][p][252:378]),
                )  # board + discard
            np.testing.assert_array_equal(
                np.asarray(on["legal_move"]), np.asarray(off["legal_move"])
            )
            np.testing.assert_array_equal(
                np.asarray(on["own_hand"]), np.asarray(off["own_hand"])
            )
        assert saw_shuffled  # at least one step actually permuted

    def test_deterministic_per_state(self):
        cfg = EnvConfig(game=GameConfig(players=2), shuffle_obs=True, max_len=80)
        state, _ = reset(cfg, jax.random.PRNGKey(3))
        a = observe(cfg, state)
        b = observe(cfg, state)
        np.testing.assert_array_equal(np.asarray(a["priv_s"]), np.asarray(b["priv_s"]))

    def test_full_episode_runs(self):
        cfg = EnvConfig(game=GameConfig(players=2), shuffle_obs=True, sad=True, max_len=80)
        state, obs, rs, ds, _, _ = rollout(cfg, jax.random.PRNGKey(7), num_steps=80)
        assert bool(ds[-1])
        priv = np.asarray(obs["priv_s"])
        assert priv.shape[-1] == 838
        assert np.isin(priv, [0.0, 1.0]).all()

    def test_requires_two_players(self):
        import pytest

        with pytest.raises(ValueError):
            EnvConfig(game=GameConfig(players=3), shuffle_obs=True)


class TestHideAction:
    def test_last_action_section_zeroed(self):
        """EnvConfig(hide_action=True): after a hint, the canonical obs's
        last-action section is zero for every observer while all other
        sections match the plain env bit-for-bit; the SAD greedy block (when
        enabled) is unaffected (fork hideAction gates only the main Encode)."""
        g = GameConfig(players=2)
        plain = EnvConfig(game=g, sad=True, max_len=80)
        hidden = EnvConfig(game=g, sad=True, max_len=80, hide_action=True)
        key = jax.random.PRNGKey(42)
        s_p, o_p = reset(plain, key)
        s_h, o_h = reset(hidden, key)
        # Same key -> same deck; submit a hint (first legal reveal uid).
        legal = np.asarray(o_p["legal_move"])
        cur = int(np.asarray(s_p.game.cur_player))
        hint_uids = np.flatnonzero(legal[cur][2 * g.hand_size:-1]) + 2 * g.hand_size
        action = np.full((g.players,), int(hint_uids[0]), dtype=np.int32)
        a = jnp.asarray(action)
        s_p, o_p, _, _ = step(plain, s_p, {"a": a, "greedy_a": a})
        s_h, o_h, _, _ = step(hidden, s_h, {"a": a, "greedy_a": a})

        lo = g.hands_section + g.board_section + g.discard_section
        hi = lo + g.last_action_section
        pp, hh = np.asarray(o_p["priv_s"]), np.asarray(o_h["priv_s"])
        assert np.all(hh[:, lo:hi] == 0)
        assert np.any(pp[:, lo:hi] != 0)
        np.testing.assert_array_equal(hh[:, :lo], pp[:, :lo])
        np.testing.assert_array_equal(hh[:, hi:], pp[:, hi:])  # incl. SAD block
