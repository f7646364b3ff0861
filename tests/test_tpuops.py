"""tpuops one-hot gather/scatter replacements must equal the indexing ops
they replace (game/tpuops.py; motivated by the round-2 rollout profile)."""

import jax
import jax.numpy as jnp
import numpy as np

from hanabi_sad_tpu.game import tpuops

RNG = np.random.RandomState(0)


class TestTakePut:
    def test_take_vec_matches_gather(self):
        for shape, n in [((7,), 5), ((4, 7), 5), ((3, 2, 7), 11)]:
            table = jnp.asarray(RNG.randint(-9, 9, size=shape[:-1] + (n,)), jnp.int32)
            idx = jnp.asarray(RNG.randint(0, n, size=shape[:-1]), jnp.int32)
            got = tpuops.take_vec(table, idx)
            want = jnp.take_along_axis(table, idx[..., None], axis=-1)[..., 0]
            np.testing.assert_array_equal(got, want)

    def test_take_vec_negative_idx_is_zero(self):
        table = jnp.asarray([3, 4, 5], jnp.int32)
        assert int(tpuops.take_vec(table, jnp.asarray(-1))) == 0

    def test_take_row_and_rows(self):
        for dtype in (jnp.int32, jnp.bool_):
            arr = jnp.asarray(RNG.randint(0, 2, size=(5, 4, 3)), dtype)
            for i in range(5):
                np.testing.assert_array_equal(
                    tpuops.take_row(arr, jnp.asarray(i)), arr[i]
                )
            idx = jnp.asarray([4, 0, 2], jnp.int32)
            np.testing.assert_array_equal(tpuops.take_rows(arr, idx), arr[idx])

    def test_put_row(self):
        arr = jnp.asarray(RNG.randint(0, 9, size=(4, 3)), jnp.int32)
        val = jnp.asarray([7, 7, 7], jnp.int32)
        np.testing.assert_array_equal(
            tpuops.put_row(arr, jnp.asarray(2), val), arr.at[2].set(val)
        )

    def test_add_at(self):
        arr = jnp.asarray(RNG.randint(0, 9, size=(5,)), jnp.int32)
        np.testing.assert_array_equal(
            tpuops.add_at_vec(arr, jnp.asarray(3), jnp.asarray(2)),
            arr.at[3].add(2),
        )
        m = jnp.asarray(RNG.randint(0, 9, size=(5, 4)), jnp.int32)
        np.testing.assert_array_equal(
            tpuops.add_at_2d(m, jnp.asarray(1), jnp.asarray(2), jnp.asarray(3)),
            m.at[1, 2].add(3),
        )

    def test_permute_last_matches_inv_gather(self):
        for dtype in (jnp.int32, jnp.bool_):
            x = jnp.asarray(RNG.randint(0, 5, size=(3, 4, 5)), dtype)
            perm = jnp.asarray(RNG.permutation(5), jnp.int32)
            inv = jnp.argsort(perm)
            np.testing.assert_array_equal(
                tpuops.permute_last(x, perm), x[..., inv]
            )

    def test_vmapped(self):
        """Batched (per-env) usage: the whole point of the module."""
        tables = jnp.asarray(RNG.randint(0, 9, size=(64, 5)), jnp.int32)
        idx = jnp.asarray(RNG.randint(0, 5, size=(64,)), jnp.int32)
        got = jax.vmap(tpuops.take_vec)(tables, idx)
        want = tables[jnp.arange(64), idx]
        np.testing.assert_array_equal(got, want)
