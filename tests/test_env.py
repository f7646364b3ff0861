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
