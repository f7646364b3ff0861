"""Utils tests: counters, saver, belief fixed-point, helpers."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from hanabi_sad_tpu.utils import MultiCounter, Stopwatch, TopkSaver, belief
from hanabi_sad_tpu.utils.counters import num2str, sec2str


class TestCounters:
    def test_value_stats(self):
        c = MultiCounter()
        for v in [1.0, 2.0, 3.0]:
            c["loss"].feed(v)
        assert c["loss"].mean() == 2.0
        s = c.summary(0)
        assert "loss" in s

    def test_num2str(self):
        assert num2str(500) == "500"
        assert num2str(1500) == "1.50K"
        assert num2str(2_500_000) == "2.50M"

    def test_sec2str(self):
        assert sec2str(3661) == "1:01:01"


class TestSaver:
    def test_topk_keeps_best(self, tmp_path):
        saver = TopkSaver(str(tmp_path), topk=2)
        assert saver.save({"w": 1}, 10.0)
        assert saver.save({"w": 2}, 20.0)
        assert not saver.save({"w": 3}, 5.0)  # worse than both
        assert saver.save({"w": 4}, 15.0)  # replaces the 10.0 slot
        files = sorted(os.listdir(tmp_path))
        assert files == ["model0.pkl", "model1.pkl"]
        assert sorted(saver.perfs) == [15.0, 20.0]

    def test_force_save(self, tmp_path):
        saver = TopkSaver(str(tmp_path), topk=1)
        saver.save({"w": 1}, -1.0, force_save_name="model_epoch50")
        assert os.path.exists(tmp_path / "model_epoch50.pkl")


class TestStopwatch:
    def test_phases(self):
        sw = Stopwatch()
        sw.time("a")
        sw.time("b")
        s = sw.summary()
        assert "a" in s and "b" in s


class TestBelief:
    def test_v1_fixed_point_properties(self):
        rng = np.random.RandomState(0)
        B, S = 2, 10
        counts = jnp.asarray(
            np.tile(np.tile([3, 2, 2, 2, 1], 5)[None], (B, 1)), jnp.float32
        )
        mask = (rng.rand(B, S, 25) > 0.5).astype(np.float32)
        mask[..., 0] = 1.0
        v0 = jnp.asarray(mask * counts[:, None, :] / 10.0)
        v1 = belief.get_v1(v0, counts, max_count=50)
        v1n = np.asarray(v1)
        # normalized distributions supported only where v0 allows
        np.testing.assert_allclose(v1n.sum(-1), np.ones((B, S)), atol=1e-4)
        assert (v1n[np.asarray(v0) == 0] < 1e-6).all()
        assert belief.check_v1(v0, v1, counts, atol=1e-3)

    def test_check_trajectory(self):
        term = jnp.asarray([0, 0, 0, 1, 1, 1], jnp.float32)
        assert belief.check_trajectory(jnp.zeros((6, 4)), term) == 3
        with pytest.raises(AssertionError):
            belief.check_trajectory(jnp.zeros((3, 2)), jnp.asarray([1.0, 0.0, 1.0]))


class TestV0FromState:
    def test_counts_and_masks(self):
        import jax
        from hanabi_sad_tpu.game import GameConfig
        from hanabi_sad_tpu.game.state import new_game

        cfg = GameConfig(players=2)
        state = new_game(cfg, jax.random.PRNGKey(0))
        v0 = np.asarray(belief.v0_from_state(cfg, state, jnp.asarray(0)))
        assert v0.shape == (5, 25)
        # fresh game, no hints: plausibility = remaining counts; partner's 5
        # cards are deducted from the 50-card multiset
        assert v0.sum() == 5 * (50 - 5)
        # no card type exceeds its deck count
        assert (v0 <= 3).all() and (v0 >= 0).all()

    def test_hint_collapses(self):
        import jax
        from hanabi_sad_tpu.game import GameConfig
        from hanabi_sad_tpu.game.engine import apply_move
        from hanabi_sad_tpu.game.moves import Move
        from hanabi_sad_tpu.game.state import REVEAL_COLOR, new_game

        cfg = GameConfig(players=2)
        state = new_game(cfg, jax.random.PRNGKey(3))
        color = int(state.hands[1, 0]) // 5
        mv = Move(
            move_type=jnp.asarray(REVEAL_COLOR), position=jnp.asarray(0),
            target_offset=jnp.asarray(1), color=jnp.asarray(color), rank=jnp.asarray(0),
        )
        nxt = apply_move(cfg, state, mv)
        v0 = np.asarray(belief.v0_from_state(cfg, nxt, jnp.asarray(1)))
        v0_slot0 = v0[0].reshape(5, 5)
        # slot 0 was touched by the color hint: only that color plausible
        assert v0_slot0[color].sum() > 0
        mask = np.ones(5, bool); mask[color] = False
        assert v0_slot0[mask].sum() == 0


class TestAsserts:
    """Assertion helpers (reference common_utils/assert_utils.py)."""

    def test_scalar_asserts(self):
        from hanabi_sad_tpu.utils import asserts

        asserts.assert_eq(3, 3)
        asserts.assert_neq(3, 4)
        asserts.assert_lt(1, 2)
        asserts.assert_lteq(2, 2)
        import pytest

        with pytest.raises(AssertionError):
            asserts.assert_eq(3, 4)

    def test_tensor_and_tree(self):
        import jax.numpy as jnp
        import pytest

        from hanabi_sad_tpu.utils import asserts

        a = {"x": jnp.ones((3,)), "y": jnp.zeros((2, 2))}
        b = {"x": jnp.ones((3,)), "y": jnp.zeros((2, 2))}
        asserts.assert_tree_close(a, b)
        b2 = {"x": jnp.ones((3,)) + 1e-3, "y": jnp.zeros((2, 2))}
        with pytest.raises(AssertionError):
            asserts.assert_tree_close(a, b2)

    def test_zero_grad(self):
        import jax
        import jax.numpy as jnp
        import pytest

        from hanabi_sad_tpu.utils import asserts

        # gradient of a function that ignores its parameter is exactly zero
        g = jax.grad(lambda p: jnp.sum(jnp.zeros(()) * 0.0 + 1.0))(jnp.ones((4,)))
        asserts.assert_zero_grad({"w": g})
        with pytest.raises(AssertionError):
            asserts.assert_zero_grad({"w": jnp.ones((2,))})


class TestCompilationCache:
    """enable_compilation_cache env-var behavior (utils/helper.py:44-80)."""

    def test_opt_out_env_var(self, monkeypatch):
        from hanabi_sad_tpu.utils.helper import enable_compilation_cache

        monkeypatch.setenv("HANABI_SAD_TPU_NO_COMPILE_CACHE", "1")
        assert enable_compilation_cache() is None

    def test_env_var_override(self, monkeypatch, tmp_path):
        import jax

        from hanabi_sad_tpu.utils.helper import enable_compilation_cache

        monkeypatch.delenv("HANABI_SAD_TPU_NO_COMPILE_CACHE", raising=False)
        target = tmp_path / "override_cache"
        monkeypatch.setenv("HANABI_SAD_TPU_COMPILE_CACHE", str(target))
        try:
            got = enable_compilation_cache()
            assert got == str(target)
            assert target.is_dir()
            assert jax.config.jax_compilation_cache_dir == str(target)
        finally:
            jax.config.update("jax_compilation_cache_dir", None)

    def test_default_dir_and_explicit_arg(self, monkeypatch, tmp_path):
        import jax

        from hanabi_sad_tpu.utils.helper import enable_compilation_cache

        monkeypatch.delenv("HANABI_SAD_TPU_NO_COMPILE_CACHE", raising=False)
        monkeypatch.delenv("HANABI_SAD_TPU_COMPILE_CACHE", raising=False)
        explicit = tmp_path / "explicit"
        try:
            assert enable_compilation_cache(str(explicit)) == str(explicit)
            assert explicit.is_dir()
        finally:
            jax.config.update("jax_compilation_cache_dir", None)
