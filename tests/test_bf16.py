"""bfloat16 compute-path tests: bf16 matmul path stays numerically close to
f32 and produces mostly identical greedy actions."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hanabi_sad_tpu.models import r2d2_net
from hanabi_sad_tpu.models.r2d2_net import NetConfig, init_r2d2_net


class TestBF16:
    def test_forward_close_to_f32(self):
        cfg32 = NetConfig(in_dim=64, hid_dim=32, out_dim=11, num_lstm_layer=2)
        cfg16 = dataclasses.replace(cfg32, compute_dtype="bfloat16")
        params = init_r2d2_net(jax.random.PRNGKey(0), cfg32)
        T, B = 8, 16
        key = jax.random.PRNGKey(1)
        priv = jax.random.normal(key, (T, B, 64))
        legal = jnp.ones((T, B, 11))
        action = jnp.zeros((T, B), jnp.int32)
        qa32, g32, q32, _ = r2d2_net.forward(params, cfg32, priv, legal, action)
        qa16, g16, q16, _ = r2d2_net.forward(params, cfg16, priv, legal, action)
        assert q16.dtype == jnp.float32  # heads stay f32
        # bf16 rounding ~1e-2 relative on a 2-layer LSTM path
        np.testing.assert_allclose(np.asarray(q16), np.asarray(q32), atol=0.1)
        agree = (np.asarray(g16) == np.asarray(g32)).mean()
        assert agree > 0.9

    def test_act_hidden_stays_f32(self):
        cfg16 = NetConfig(in_dim=32, hid_dim=16, out_dim=7, compute_dtype="bfloat16")
        params = init_r2d2_net(jax.random.PRNGKey(2), cfg16)
        B = 4
        hid = r2d2_net.get_h0(cfg16, B)
        a, new_hid = r2d2_net.act(params, cfg16, jax.random.normal(jax.random.PRNGKey(3), (B, 32)), hid)
        assert new_hid["h0"].dtype == jnp.float32
        assert a.dtype == jnp.float32

    def test_bf16_training_step_runs(self, tmp_path):
        from hanabi_sad_tpu.train import learner
        from hanabi_sad_tpu.train.config import make_config

        cfg = make_config(
            "dev",
            save_dir=str(tmp_path),
            num_envs=8,
            num_update_per_chunk=2,
            batchsize=4,
            burn_in_frames=4,
            replay_buffer_size=64,
            max_len=12,
            rnn_hid_dim=32,
            compute_dtype="bfloat16",
            num_eps=4,
        )
        setup = learner.make_setup(cfg)
        state = learner.init_train_state(setup, jax.random.PRNGKey(0))
        state, _ = learner.make_collect_only(setup)(state)
        state, metrics = learner.make_train_chunk(setup)(state)
        assert np.isfinite(float(metrics["loss"]))
        # params stay f32
        assert state.params.online.net[0]["w"].dtype == jnp.float32
