"""Model-layer tests: fused LSTM vs torch.nn.LSTM, dueling head math, torch
checkpoint import round-trip, greedy-act semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from hanabi_sad_tpu.models import lstm as lstm_mod
from hanabi_sad_tpu.models import r2d2_net
from hanabi_sad_tpu.models.r2d2_net import NetConfig, init_r2d2_net
from hanabi_sad_tpu.models.torch_import import (
    from_torch_state_dict,
    infer_net_config,
    to_torch_state_dict,
)

torch.manual_seed(0)


def torch_lstm_to_params(tl: torch.nn.LSTM):
    params = []
    for k in range(tl.num_layers):
        params.append(
            {
                "w_ih": jnp.asarray(getattr(tl, f"weight_ih_l{k}").detach().numpy().T),
                "w_hh": jnp.asarray(getattr(tl, f"weight_hh_l{k}").detach().numpy().T),
                "b": jnp.asarray(
                    (getattr(tl, f"bias_ih_l{k}") + getattr(tl, f"bias_hh_l{k}"))
                    .detach()
                    .numpy()
                ),
            }
        )
    return params


class TestLSTM:
    @pytest.mark.parametrize("layers", [1, 2])
    def test_matches_torch(self, layers):
        T, B, D_in, D = 7, 3, 11, 13
        tl = torch.nn.LSTM(D_in, D, num_layers=layers)
        params = torch_lstm_to_params(tl)
        x = np.random.RandomState(1).randn(T, B, D_in).astype(np.float32)

        with torch.no_grad():
            t_out, (t_h, t_c) = tl(torch.from_numpy(x))

        outs, (h, c) = lstm_mod.lstm_seq(
            params, jnp.asarray(x), lstm_mod.zero_hidden(layers, B, D)
        )
        np.testing.assert_allclose(np.asarray(outs), t_out.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(h), t_h.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(c), t_c.numpy(), atol=1e-5)

    def test_step_matches_seq(self):
        layers, B, D_in, D = 2, 4, 8, 8
        params = lstm_mod.init_lstm(jax.random.PRNGKey(0), D_in, D, layers)
        xs = jax.random.normal(jax.random.PRNGKey(1), (5, B, D_in))
        outs, _ = lstm_mod.lstm_seq(params, xs, lstm_mod.zero_hidden(layers, B, D))
        hid = lstm_mod.zero_hidden(layers, B, D)
        for t in range(5):
            out, hid = lstm_mod.lstm_step(params, xs[t], hid)
            np.testing.assert_allclose(np.asarray(out), np.asarray(outs[t]), atol=1e-6)


class TestDuel:
    def test_masked_advantage_mean(self):
        v = jnp.asarray([[1.0]])
        a = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
        legal = jnp.asarray([[1.0, 1.0, 0.0, 0.0]])
        # legal_a = [1,2,0,0], mean over ALL actions = 0.75 (r2d2.py:124-131)
        q = r2d2_net.duel(v, a, legal)
        np.testing.assert_allclose(np.asarray(q), [[1.25, 2.25, 0.25, 0.25]])


class TestForward:
    def make(self):
        cfg = NetConfig(in_dim=20, hid_dim=16, out_dim=6, num_lstm_layer=2, hand_size=5)
        params = init_r2d2_net(jax.random.PRNGKey(0), cfg)
        return cfg, params

    def test_shapes_and_greedy_legal(self):
        cfg, params = self.make()
        T, B = 4, 3
        key = jax.random.PRNGKey(1)
        priv = jax.random.normal(key, (T, B, cfg.in_dim))
        legal = (jax.random.uniform(key, (T, B, cfg.out_dim)) > 0.5).astype(jnp.float32)
        legal = legal.at[..., 0].set(1.0)  # at least one legal
        action = jnp.zeros((T, B), jnp.int32)
        qa, greedy, q, o = r2d2_net.forward(params, cfg, priv, legal, action)
        assert qa.shape == (T, B) and greedy.shape == (T, B)
        assert q.shape == (T, B, cfg.out_dim) and o.shape == (T, B, cfg.hid_dim)
        # greedy actions are always legal
        taken = np.take_along_axis(np.asarray(legal), np.asarray(greedy)[..., None], -1)
        assert (taken == 1).all()

    def test_act_matches_forward_one_step(self):
        """The acting path (act + duel-free advantage argmax) must agree with
        the forward greedy at t=0 from zero hidden: argmax over legal of the
        advantage equals argmax over legal of the dueling Q (v is constant
        per row and the masked mean shifts all actions equally... it does not
        — but argmax over *legal* entries is preserved; see r2d2.py act which
        uses fc_a only)."""
        cfg, params = self.make()
        B = 5
        key = jax.random.PRNGKey(2)
        priv = jax.random.normal(key, (B, cfg.in_dim))
        legal = jnp.ones((B, cfg.out_dim))
        hid = {
            "h0": jnp.zeros((B, cfg.num_lstm_layer, cfg.hid_dim)),
            "c0": jnp.zeros((B, cfg.num_lstm_layer, cfg.hid_dim)),
        }
        greedy, _ = r2d2_net.greedy_act(params, cfg, priv, legal, hid)
        qa, greedy_fwd, _, _ = r2d2_net.forward(
            params, cfg, priv[None], legal[None], jnp.zeros((1, B), jnp.int32)
        )
        np.testing.assert_array_equal(np.asarray(greedy), np.asarray(greedy_fwd[0]))

    def test_hidden_carry(self):
        """act() carries hidden state: two steps via act == 2-step forward."""
        cfg, params = self.make()
        B = 2
        xs = jax.random.normal(jax.random.PRNGKey(3), (2, B, cfg.in_dim))
        legal = jnp.ones((2, B, cfg.out_dim))
        hid = r2d2_net.get_h0(cfg, B)
        a0, hid = r2d2_net.act(params, cfg, xs[0], hid)
        a1, hid = r2d2_net.act(params, cfg, xs[1], hid)
        # forward path computes q = duel(v, a, legal); compare fc_a output via
        # greedy equivalence on uniform legal
        _, greedy, _, _ = r2d2_net.forward(
            params, cfg, xs, legal, jnp.zeros((2, B), jnp.int32)
        )
        np.testing.assert_array_equal(np.asarray(jnp.argmax(a1, -1)), np.asarray(greedy[1]))


class TestTorchImport:
    def test_roundtrip(self):
        cfg = NetConfig(in_dim=30, hid_dim=24, out_dim=9, num_lstm_layer=2, num_fc_layer=2)
        params = init_r2d2_net(jax.random.PRNGKey(7), cfg)
        sd = to_torch_state_dict(params)
        params2, cfg2 = from_torch_state_dict(sd)
        assert cfg2.in_dim == cfg.in_dim and cfg2.out_dim == cfg.out_dim
        assert cfg2.num_fc_layer == cfg.num_fc_layer
        for a, b in zip(
            jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params2)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_infer_config(self):
        sd = {
            "net.0.weight": torch.zeros(512, 838),
            "net.0.bias": torch.zeros(512),
            "lstm.weight_ih_l0": torch.zeros(2048, 512),
            "lstm.weight_hh_l0": torch.zeros(2048, 512),
            "lstm.bias_ih_l0": torch.zeros(2048),
            "lstm.bias_hh_l0": torch.zeros(2048),
            "lstm.weight_ih_l1": torch.zeros(2048, 512),
            "lstm.weight_hh_l1": torch.zeros(2048, 512),
            "lstm.bias_ih_l1": torch.zeros(2048),
            "lstm.bias_hh_l1": torch.zeros(2048),
            "fc_a.weight": torch.zeros(21, 512),
            "fc_a.bias": torch.zeros(21),
            "fc_v.weight": torch.zeros(1, 512),
            "fc_v.bias": torch.zeros(1),
            "pred.weight": torch.zeros(15, 512),
            "pred.bias": torch.zeros(15),
        }
        cfg = infer_net_config(sd)
        assert cfg.in_dim == 838 and cfg.out_dim == 21
        assert cfg.hid_dim == 512 and cfg.num_lstm_layer == 2 and cfg.num_fc_layer == 1

    def test_full_net_matches_torch_reference_arch(self):
        """End-to-end: a torch net with the reference architecture (trunk ->
        LSTM -> dueling heads) produces the same Q values as our net loaded
        from its state dict."""
        in_dim, hid, out = 26, 18, 7
        T, B = 6, 4

        class TorchNet(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.net = torch.nn.Sequential(torch.nn.Linear(in_dim, hid), torch.nn.ReLU())
                self.lstm = torch.nn.LSTM(hid, hid, num_layers=2)
                self.fc_v = torch.nn.Linear(hid, 1)
                self.fc_a = torch.nn.Linear(hid, out)
                self.pred = torch.nn.Linear(hid, 15)

            def forward(self, s, legal):
                x = self.net(s)
                o, _ = self.lstm(x)
                a = self.fc_a(o)
                v = self.fc_v(o)
                legal_a = a * legal
                return v + legal_a - legal_a.mean(2, keepdim=True)

        tnet = TorchNet()
        params, cfg = from_torch_state_dict(tnet.state_dict())
        rng = np.random.RandomState(5)
        s = rng.randn(T, B, in_dim).astype(np.float32)
        legal = (rng.rand(T, B, out) > 0.3).astype(np.float32)
        with torch.no_grad():
            tq = tnet(torch.from_numpy(s), torch.from_numpy(legal)).numpy()
        _, _, q, _ = r2d2_net.forward(
            params, cfg, jnp.asarray(s), jnp.asarray(legal), jnp.zeros((T, B), jnp.int32)
        )
        np.testing.assert_allclose(np.asarray(q), tq, atol=1e-5)
