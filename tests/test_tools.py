"""Tools-layer tests: loaders (.pkl / .pthw / OP grid / OBL), eval CLI,
action-matrix analysis, model export round-trips."""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from hanabi_sad_tpu.agent import r2d2_agent
from hanabi_sad_tpu.agent.r2d2_agent import AgentConfig
from hanabi_sad_tpu.models import public_lstm, r2d2_net
from hanabi_sad_tpu.models.r2d2_net import NetConfig
from hanabi_sad_tpu.models.torch_import import to_torch_state_dict
from hanabi_sad_tpu.tools import action_matrix, convert_model, eval_model, loaders
from hanabi_sad_tpu.train import checkpoint as ckpt
from hanabi_sad_tpu.train.evaluate import evaluate


def save_tiny_checkpoint(path, in_dim=838, hid=32, sad=True):
    cfg = NetConfig(in_dim=in_dim, hid_dim=hid, out_dim=21, num_lstm_layer=2)
    agent_cfg = AgentConfig(net=cfg, vdn=False)
    params = r2d2_agent.init_agent(jax.random.PRNGKey(0), agent_cfg)
    ckpt.save(path, ckpt.params_payload(params.online))
    return params, cfg


class TestLoaders:
    def test_load_native_checkpoint(self, tmp_path):
        path = str(tmp_path / "m.pkl")
        params, cfg = save_tiny_checkpoint(path)
        pol = loaders.load_any(path)
        assert pol.sad
        assert pol.agent_cfg.net.in_dim == 838
        assert pol.agent_cfg.net.hid_dim == 32
        for a, b in zip(
            jax.tree_util.tree_leaves(pol.params.online),
            jax.tree_util.tree_leaves(params.online),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_load_pthw(self, tmp_path):
        cfg = NetConfig(in_dim=783, hid_dim=24, out_dim=21, num_lstm_layer=2)
        params = r2d2_net.init_r2d2_net(jax.random.PRNGKey(1), cfg)
        sd = to_torch_state_dict(params)
        path = str(tmp_path / "ref.pthw")
        torch.save(sd, path)
        pol = loaders.load_sad_model(path)
        assert not pol.sad  # 783 = non-SAD input
        assert pol.agent_cfg.net.in_dim == 783
        np.testing.assert_allclose(
            np.asarray(pol.params.online.fc_a["w"]), np.asarray(params.fc_a["w"]), atol=1e-6
        )

    def test_op_grid_arch(self, tmp_path):
        folder = tmp_path / "op" / "sad-op"
        os.makedirs(folder)
        cfg = NetConfig(
            in_dim=838, hid_dim=16, out_dim=21, num_lstm_layer=2, num_fc_layer=2,
            skip_connect=True,
        )
        params = r2d2_net.init_r2d2_net(jax.random.PRNGKey(2), cfg)
        torch.save(to_torch_state_dict(params), str(folder / "M9.pthw"))
        pol = loaders.load_op_model(str(tmp_path / "op"), "sad-op", 9)
        assert pol.agent_cfg.net.num_fc_layer == 2
        assert pol.agent_cfg.net.skip_connect  # idx 9-11 -> (2, True)

    def test_op_missing_file(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            loaders.load_op_model(str(tmp_path), "sad-op", 0)


class TestPublicLSTM:
    def test_matches_torch_arch(self):
        """Differential test of the public-LSTM forward against a torch net of
        the reference architecture."""
        hid, out = 24, 9
        priv_dim, publ_dim = 30, 20
        T, B = 5, 3

        class TorchPub(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.priv_net = torch.nn.Sequential(
                    torch.nn.Linear(priv_dim, hid), torch.nn.ReLU(),
                    torch.nn.Linear(hid, hid), torch.nn.ReLU(),
                    torch.nn.Linear(hid, hid), torch.nn.ReLU(),
                )
                self.publ_net = torch.nn.Sequential(
                    torch.nn.Linear(publ_dim, hid), torch.nn.ReLU()
                )
                self.lstm = torch.nn.LSTM(hid, hid, num_layers=2)
                self.fc_v = torch.nn.Linear(hid, 1)
                self.fc_a = torch.nn.Linear(hid, out)
                self.pred_1st = torch.nn.Linear(hid, 15)

            def forward(self, priv, publ, legal):
                x = self.publ_net(publ)
                publ_o, _ = self.lstm(x)
                o = self.priv_net(priv) * publ_o
                a = self.fc_a(o)
                v = self.fc_v(o)
                legal_a = a * legal
                return v + legal_a - legal_a.mean(2, keepdim=True)

        tnet = TorchPub()
        params, cfg = public_lstm.from_torch_state_dict(tnet.state_dict())
        rng = np.random.RandomState(0)
        priv = rng.randn(T, B, priv_dim).astype(np.float32)
        publ = rng.randn(T, B, publ_dim).astype(np.float32)
        legal = (rng.rand(T, B, out) > 0.3).astype(np.float32)
        with torch.no_grad():
            tq = tnet(torch.from_numpy(priv), torch.from_numpy(publ), torch.from_numpy(legal)).numpy()
        _, _, q, _ = public_lstm.forward(
            params, cfg, jnp.asarray(priv), jnp.asarray(publ), jnp.asarray(legal),
            jnp.zeros((T, B), jnp.int32),
        )
        np.testing.assert_allclose(np.asarray(q), tq, atol=1e-5)

    def test_sad_slice(self):
        s = jnp.arange(838, dtype=jnp.float32)[None]
        priv, publ = public_lstm.sad_slice(s)
        assert priv.shape[-1] == 658 and publ.shape[-1] == 533
        assert float(priv[0, 0]) == 125.0 and float(publ[0, 0]) == 250.0

    def test_obl_plays_in_pipeline(self, tmp_path):
        """A random-weight PublicLSTM policy plays greedy eval games through
        the SAD pipeline end to end."""
        cfg = public_lstm.PublicNetConfig(hid_dim=32)
        params = public_lstm.init_public_lstm(jax.random.PRNGKey(0), cfg)
        import torch as _t

        # route through the loader path: save a torch state dict
        sd = {}
        for i, l in enumerate(params.priv_net):
            sd[f"priv_net.{2*i}.weight"] = _t.from_numpy(np.asarray(l["w"]).T.copy())
            sd[f"priv_net.{2*i}.bias"] = _t.from_numpy(np.asarray(l["b"]).copy())
        for i, l in enumerate(params.publ_net):
            sd[f"publ_net.{2*i}.weight"] = _t.from_numpy(np.asarray(l["w"]).T.copy())
            sd[f"publ_net.{2*i}.bias"] = _t.from_numpy(np.asarray(l["b"]).copy())
        for k, l in enumerate(params.lstm):
            sd[f"lstm.weight_ih_l{k}"] = _t.from_numpy(np.asarray(l["w_ih"]).T.copy())
            sd[f"lstm.weight_hh_l{k}"] = _t.from_numpy(np.asarray(l["w_hh"]).T.copy())
            b = np.asarray(l["b"])
            sd[f"lstm.bias_ih_l{k}"] = _t.from_numpy((b / 2).copy())
            sd[f"lstm.bias_hh_l{k}"] = _t.from_numpy((b / 2).copy())
        for name in ["fc_v", "fc_a", "pred_1st"]:
            l = getattr(params, name)
            sd[f"{name}.weight"] = _t.from_numpy(np.asarray(l["w"]).T.copy())
            sd[f"{name}.bias"] = _t.from_numpy(np.asarray(l["b"]).copy())
        path = str(tmp_path / "obl.pthw")
        _t.save(sd, path)

        pol = loaders.load_obl_model(path)
        mean, perfect, scores, n_perfect = evaluate([pol, pol], 8, seed=3, num_steps=110)
        assert 0 <= mean <= 25


class TestEvalCLI:
    def test_self_play_cli(self, tmp_path, capsys):
        path = str(tmp_path / "m.pkl")
        save_tiny_checkpoint(path)
        mean, sem, perfect = eval_model.main(
            ["--weight", path, "--num_game", "8", "--num_player", "2"]
        )
        assert 0 <= mean <= 25
        out = capsys.readouterr().out
        assert "score:" in out

    def test_cross_play_cli(self, tmp_path):
        p1 = str(tmp_path / "a.pkl")
        p2 = str(tmp_path / "b.pkl")
        save_tiny_checkpoint(p1)
        save_tiny_checkpoint(p2)
        mean, sem, perfect = eval_model.main(
            ["--weight", p1, "--weight2", p2, "--num_game", "8"]
        )
        assert 0 <= mean <= 25


class TestActionMatrix:
    def test_matrix_properties(self, tmp_path):
        path = str(tmp_path / "m.pkl")
        save_tiny_checkpoint(path)
        normed, counts = action_matrix.main(
            ["--weight", path, "--num_game", "8", "--out", str(tmp_path / "mat.txt")]
        )
        assert counts.sum() > 0
        rows = normed.sum(1)
        assert ((np.abs(rows - 1) < 1e-6) | (rows == 0)).all()
        assert os.path.exists(tmp_path / "mat.txt")


class TestConvert:
    def test_sparta_export_matches(self, tmp_path):
        path = str(tmp_path / "m.pkl")
        params, net_cfg = save_tiny_checkpoint(path, in_dim=100, hid=16)
        out_path = convert_model.main(["--model", path, "--pthw"])
        assert os.path.exists(out_path)
        assert os.path.exists(str(tmp_path / "m.pthw"))

        # The exported TorchScript module reproduces our net's fc_a output.
        net = torch.jit.load(out_path)
        B = 4
        rng = np.random.RandomState(0)
        s = rng.randn(B, 100).astype(np.float32)
        obs = {
            "s": torch.from_numpy(s),
            "h0": torch.zeros(B, 2, 16),
            "c0": torch.zeros(B, 2, 16),
        }
        with torch.no_grad():
            out = net(obs)
        hid = {"h0": jnp.zeros((B, 2, 16)), "c0": jnp.zeros((B, 2, 16))}
        a_jax, _ = r2d2_net.act(params.online, net_cfg, jnp.asarray(s), hid)
        np.testing.assert_allclose(out["a"].numpy(), np.asarray(a_jax), atol=1e-5)


class TestCrossplayMatrix:
    def test_matrix_tool(self, tmp_path):
        from hanabi_sad_tpu.tools import crossplay_matrix

        p1 = str(tmp_path / "a.pkl")
        p2 = str(tmp_path / "b.pkl")
        save_tiny_checkpoint(p1)
        save_tiny_checkpoint(p2)
        scores, perfect = crossplay_matrix.main(
            ["--weights", p1, p2, "--num_game", "6", "--out", str(tmp_path / "xp.txt")]
        )
        assert scores.shape == (2, 2)
        assert (scores >= 0).all() and (scores <= 25).all()
        assert os.path.exists(tmp_path / "xp.txt")

    def test_relabel_mode(self, tmp_path):
        """--relabel appends the OP cross-play-under-relabeling table."""
        from hanabi_sad_tpu.tools import crossplay_matrix

        p1 = str(tmp_path / "a.pkl")
        save_tiny_checkpoint(p1)
        crossplay_matrix.main(
            ["--weights", p1, "--num_game", "6", "--relabel",
             "--out", str(tmp_path / "xp.txt")]
        )
        text = open(tmp_path / "xp.txt").read()
        assert "relabeling" in text

    def test_relabel_eval_permutes_colors(self):
        """shuffle_color eval must change play relative to plain self-play:
        same seeds, same policy, different observation relabeling per seat
        => (generically) different scores; both stay legal games."""
        net_cfg = NetConfig(in_dim=838, hid_dim=32, out_dim=21)
        params = r2d2_net.init_r2d2_net(jax.random.PRNGKey(5), net_cfg)
        agent_cfg = AgentConfig(net=net_cfg, vdn=False, multi_step=3,
                                gamma=0.999, eta=0.9)
        pol = loaders.EvalPolicy(
            params=r2d2_agent.AgentParams(online=params, target=params),
            agent_cfg=agent_cfg, sad=True, act_fn=r2d2_agent.act,
        )
        plain = evaluate([pol, pol], 16, seed=11, num_steps=110,
                         return_actions=True)
        relab = evaluate([pol, pol], 16, seed=11, num_steps=110,
                         shuffle_color=True, return_actions=True)
        assert all(0 <= s <= 25 for s in plain[2] + relab[2])
        # Same seeds + same policy, but each seat observes through its own
        # random color permutation => the played action sequences differ.
        assert not np.array_equal(plain[4], relab[4])
