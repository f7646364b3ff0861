"""Prioritized replay tests: bitpack round-trip, ring semantics, stratified
proportional sampling statistics, IS weights, priority updates
(rela/prioritized_replay.h semantics)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from hanabi_sad_tpu.replay import (
    ReplayConfig,
    add,
    init_replay,
    pack_bits,
    sample,
    unpack_bits,
    update_priority,
)
from hanabi_sad_tpu.replay.prioritized import EpisodeBatch

CFG = ReplayConfig(
    capacity=64, seq_len=8, num_player=1, obs_dim=30, num_actions=7, hand_size=5,
    alpha=0.9, beta=0.6,
)


def make_episodes(m, seed=0, cfg=CFG):
    rng = np.random.RandomState(seed)
    T, Pi = cfg.seq_len, cfg.num_player
    return EpisodeBatch(
        priv_s=jnp.asarray(rng.rand(m, T, Pi, cfg.obs_dim) > 0.5, jnp.float32),
        legal_move=jnp.asarray(rng.rand(m, T, Pi, cfg.num_actions) > 0.5, jnp.float32),
        own_hand=jnp.asarray(rng.rand(m, T, Pi, 15) > 0.5, jnp.float32),
        action=jnp.asarray(rng.randint(0, cfg.num_actions, (m, T, Pi)), jnp.int32),
        reward=jnp.asarray(rng.randn(m, T), jnp.float32),
        bootstrap=jnp.asarray(rng.rand(m, T) > 0.3, jnp.float32),
        seq_len=jnp.asarray(rng.randint(1, T + 1, (m,)), jnp.float32),
    )


class TestBitpack:
    def test_roundtrip(self):
        rng = np.random.RandomState(3)
        for n_bits in [1, 7, 8, 9, 874, 838]:
            bits = (rng.rand(4, n_bits) > 0.5).astype(np.float32)
            packed = pack_bits(jnp.asarray(bits))
            assert packed.shape == (4, (n_bits + 7) // 8)
            out = unpack_bits(packed, n_bits)
            np.testing.assert_array_equal(np.asarray(out), bits)


class TestAddSample:
    def test_roundtrip_content(self):
        state = init_replay(CFG)
        ep = make_episodes(10)
        state = add(state, CFG, ep, jnp.ones(10))
        assert int(state.size) == 10 and int(state.num_add) == 10
        batch, w, idx = sample(state, CFG, jax.random.PRNGKey(0), 5)
        assert batch.priv_s.shape == (8, 5, 1, 30)
        # every sampled item matches its source episode exactly
        for b, i in enumerate(np.asarray(idx)):
            np.testing.assert_array_equal(
                np.asarray(batch.priv_s[:, b]), np.asarray(ep.priv_s[i])
            )
            np.testing.assert_array_equal(
                np.asarray(batch.action[:, b]), np.asarray(ep.action[i])
            )
            np.testing.assert_allclose(
                np.asarray(batch.reward[:, b]), np.asarray(ep.reward[i]), atol=1e-6
            )
            assert float(batch.seq_len[b]) == float(ep.seq_len[i])

    def test_terminal_derived_from_seq_len(self):
        state = init_replay(CFG)
        ep = make_episodes(4)
        state = add(state, CFG, ep, jnp.ones(4))
        batch, _, idx = sample(state, CFG, jax.random.PRNGKey(1), 4)
        term = np.asarray(batch.terminal)
        for b in range(4):
            L = int(batch.seq_len[b])
            assert (term[: L - 1, b] == 0).all()
            assert (term[L - 1 :, b] == 1).all()

    def test_ring_overwrite(self):
        state = init_replay(CFG)
        for i in range(5):  # 5 * 20 = 100 > 64 capacity
            state = add(state, CFG, make_episodes(20, seed=i), jnp.ones(20))
        assert int(state.size) == 64
        assert int(state.num_add) == 100
        assert int(state.write_ptr) == 100 % 64

    def test_zero_priority_never_sampled(self):
        state = init_replay(CFG)
        ep = make_episodes(10)
        prio = jnp.asarray([0, 0, 0, 0, 0, 1, 1, 1, 1, 1], jnp.float32)
        state = add(state, CFG, ep, prio)
        for s in range(10):
            _, _, idx = sample(state, CFG, jax.random.PRNGKey(s), 8)
            assert (np.asarray(idx) >= 5).all()


class TestProportionality:
    def test_sampling_frequencies(self):
        cfg = ReplayConfig(
            capacity=8, seq_len=4, num_player=1, obs_dim=8, num_actions=4,
            hand_size=5, alpha=1.0, beta=0.6,
        )
        state = init_replay(cfg)
        ep = make_episodes(8, cfg=cfg)
        prio = jnp.asarray([1, 1, 1, 1, 2, 2, 4, 4], jnp.float32)
        state = add(state, cfg, ep, prio)
        counts = np.zeros(8)
        js = jax.jit(functools.partial(sample, state, cfg, batchsize=16))
        for s in range(200):
            _, _, idx = js(jax.random.PRNGKey(s))
            for i in np.asarray(idx):
                counts[i] += 1
        freq = counts / counts.sum()
        expect = np.asarray([1, 1, 1, 1, 2, 2, 4, 4], np.float64) / 16
        np.testing.assert_allclose(freq, expect, atol=0.02)

    def test_is_weights(self):
        cfg = ReplayConfig(
            capacity=4, seq_len=4, num_player=1, obs_dim=8, num_actions=4,
            hand_size=5, alpha=1.0, beta=0.5,
        )
        state = init_replay(cfg)
        prio = jnp.asarray([1.0, 2.0, 3.0, 4.0])
        state = add(state, cfg, make_episodes(4, cfg=cfg), prio)
        batch, w, idx = sample(state, cfg, jax.random.PRNGKey(0), 4)
        # (size * p_i)^-beta / max
        p = np.asarray(prio)[np.asarray(idx)] / 10.0
        expected = (4 * p) ** -0.5
        expected /= expected.max()
        np.testing.assert_allclose(np.asarray(w), expected, rtol=1e-5)


class TestUpdatePriority:
    def test_update_changes_sampling(self):
        state = init_replay(CFG)
        ep = make_episodes(10)
        state = add(state, CFG, ep, jnp.ones(10))
        # crush everything except item 3
        idx = jnp.arange(10, dtype=jnp.int32)
        prio = jnp.full((10,), 1e-6).at[3].set(100.0)
        state = update_priority(state, CFG, idx, prio)
        _, _, sampled = sample(state, CFG, jax.random.PRNGKey(5), 16)
        assert (np.asarray(sampled) == 3).mean() > 0.9

    def test_alpha_applied(self):
        state = init_replay(CFG)
        state = add(state, CFG, make_episodes(2), jnp.asarray([4.0, 9.0]))
        w = np.asarray(state.weight[:2])
        np.testing.assert_allclose(w, [4.0 ** 0.9, 9.0 ** 0.9], rtol=1e-5)


class TestSnapshotSampling:
    def test_multi_batch_equals_sequential_draws_from_frozen_state(self):
        """sample_indices with U stacked keys == U single-key calls against
        the same (frozen) priority state — the prefetch snapshot property."""
        from hanabi_sad_tpu.replay.prioritized import sample_indices

        state = init_replay(CFG)
        state = add(state, CFG, make_episodes(20), jnp.linspace(0.5, 3.0, 20))
        keys = jax.random.split(jax.random.PRNGKey(7), 4)
        idx_multi, w_multi = sample_indices(state, CFG, keys, 8)
        assert idx_multi.shape == (4, 8) and w_multi.shape == (4, 8)
        for u in range(4):
            idx_one, w_one = sample_indices(state, CFG, keys[u], 8)
            np.testing.assert_array_equal(np.asarray(idx_multi[u]), np.asarray(idx_one))
            np.testing.assert_allclose(np.asarray(w_multi[u]), np.asarray(w_one), rtol=1e-6)

    def test_gather_rows_matches_sample(self):
        from hanabi_sad_tpu.replay.prioritized import (
            gather_rows,
            rows_to_batch,
            sample_indices,
        )

        state = init_replay(CFG)
        state = add(state, CFG, make_episodes(12), jnp.ones(12))
        key = jax.random.PRNGKey(3)
        batch, w, idx = sample(state, CFG, key, 6)
        idx2, w2 = sample_indices(state, CFG, key, 6)
        batch2 = rows_to_batch(CFG, gather_rows(state, idx2))
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx2))
        np.testing.assert_allclose(np.asarray(w), np.asarray(w2), rtol=1e-6)
        for a, b in zip(
            jax.tree_util.tree_leaves(batch), jax.tree_util.tree_leaves(batch2)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
