"""Pallas kernel tests (interpret mode on CPU): fused multi-timestep LSTM and
fused replay gather+unpack must match their XLA reference implementations,
including gradients through the custom VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hanabi_sad_tpu.models import lstm as lstm_mod
from hanabi_sad_tpu.ops.experimental import pallas_lstm, pallas_replay
from hanabi_sad_tpu.replay.bitpack import pack_bits, unpack_bits

pytestmark = pytest.mark.skipif(
    not pallas_lstm.pallas_lstm_available(), reason="pallas unavailable"
)


class TestPallasLSTM:
    def make(self, T=7, B=8, H=128, L=2):
        params = lstm_mod.init_lstm(jax.random.PRNGKey(0), H, H, L)
        xs = jax.random.normal(jax.random.PRNGKey(1), (T, B, H), jnp.float32)
        hid = lstm_mod.zero_hidden(L, B, H)
        return params, xs, hid

    def test_matches_scan(self):
        params, xs, hid = self.make()
        ref_out, (rh, rc) = lstm_mod.lstm_seq(params, xs, hid)
        out, (h, c) = pallas_lstm.lstm_seq_pallas(params, xs, hid, block_b=8, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=1e-6)
        np.testing.assert_allclose(np.asarray(h), np.asarray(rh), atol=1e-6)
        np.testing.assert_allclose(np.asarray(c), np.asarray(rc), atol=1e-6)

    def test_batch_tiling(self):
        params, xs, hid = self.make(B=16)
        ref_out, _ = lstm_mod.lstm_seq(params, xs, hid)
        out, _ = pallas_lstm.lstm_seq_pallas(params, xs, hid, block_b=8, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=1e-6)

    def test_nonzero_hidden(self):
        params, xs, _ = self.make()
        h0 = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 128)) * 0.1
        c0 = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 128)) * 0.1
        ref_out, _ = lstm_mod.lstm_seq(params, xs, (h0, c0))
        out, _ = pallas_lstm.lstm_seq_pallas(params, xs, (h0, c0), block_b=8, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=1e-6)

    def test_gradients_via_custom_vjp(self, monkeypatch):
        """Grads through the pallas path (custom VJP -> scan backward) must
        equal grads of the pure scan path."""
        params, xs, hid = self.make(T=4, B=8, H=16)
        # route the custom-vjp forward through interpret mode for CPU testing
        orig = pallas_lstm.lstm_seq_pallas
        monkeypatch.setattr(
            pallas_lstm,
            "lstm_seq_pallas",
            lambda p, x, h, block_b=256: orig(p, x, h, block_b=8, interpret=True),
        )

        def loss_ref(p, x):
            out, _ = lstm_mod.lstm_seq(p, x, hid)
            return (out ** 2).sum()

        def loss_pallas(p, x):
            out, _ = pallas_lstm.lstm_seq_pallas_diff(p, x, hid)
            return (out ** 2).sum()

        np.testing.assert_allclose(
            float(loss_pallas(params, xs)), float(loss_ref(params, xs)), rtol=1e-6
        )
        g_ref = jax.grad(loss_ref)(params, xs)
        g_pal = jax.grad(loss_pallas)(params, xs)
        for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_pal)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_pick_block_b(self):
        assert pallas_lstm.pick_block_b(128) == 128
        assert pallas_lstm.pick_block_b(512) == 256
        assert pallas_lstm.pick_block_b(4096) == 256
        assert pallas_lstm.pick_block_b(2048 + 256) == 256  # 2304 = 256*9
        assert pallas_lstm.pick_block_b(40) == 40


class TestPallasReplayGather:
    def test_matches_reference(self):
        rng = np.random.RandomState(0)
        cap, T, Pi, nbits = 32, 10, 2, 880
        bits = (rng.rand(cap, T, Pi, nbits) > 0.5).astype(np.float32)
        packed = pack_bits(jnp.asarray(bits))
        idx = jnp.asarray([3, 17, 3, 31], jnp.int32)
        out = pallas_replay.gather_unpack_pallas(packed, idx, interpret=True)
        ref = unpack_bits(packed, nbits)[np.asarray(idx)]
        np.testing.assert_array_equal(np.asarray(out[..., :nbits]), np.asarray(ref))
