"""Public-LSTM network (OBL model family).

Re-design of the reference PublicLSTMNet (pyhanabi/tools/obl_model.py:17-165):
a private MLP branch (3x Linear+ReLU on the 658-dim private features) fused by
elementwise product with a public branch (Linear+ReLU on the 533-dim public
features -> LSTM), then dueling heads. Used to load and evaluate released OBL
checkpoints inside the SAD pipeline: the 838-dim SAD observation is sliced
priv = s[:783][125:], publ = priv[125:] (obl_model.py:261-267).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from hanabi_sad_tpu.models import lstm as lstm_mod
from hanabi_sad_tpu.models.r2d2_net import _init_linear, duel


@dataclasses.dataclass(frozen=True)
class PublicNetConfig:
    priv_in_dim: int = 658
    publ_in_dim: int = 533
    hid_dim: int = 512
    out_dim: int = 21
    num_lstm_layer: int = 2
    hand_size: int = 5
    num_priv_layer: int = 3
    num_publ_layer: int = 1


class PublicLSTMParams(NamedTuple):
    priv_net: List[Dict[str, jnp.ndarray]]
    publ_net: List[Dict[str, jnp.ndarray]]
    lstm: lstm_mod.LSTMParams
    fc_v: Dict[str, jnp.ndarray]
    fc_a: Dict[str, jnp.ndarray]
    pred_1st: Dict[str, jnp.ndarray]


def init_public_lstm(key: jax.Array, cfg: PublicNetConfig) -> PublicLSTMParams:
    n = cfg.num_priv_layer + cfg.num_publ_layer + 4
    keys = jax.random.split(key, n)
    ki = iter(range(n))
    priv_net, d = [], cfg.priv_in_dim
    for _ in range(cfg.num_priv_layer):
        priv_net.append(_init_linear(keys[next(ki)], d, cfg.hid_dim))
        d = cfg.hid_dim
    publ_net, d = [], cfg.publ_in_dim
    for _ in range(cfg.num_publ_layer):
        publ_net.append(_init_linear(keys[next(ki)], d, cfg.hid_dim))
        d = cfg.hid_dim
    return PublicLSTMParams(
        priv_net=priv_net,
        publ_net=publ_net,
        lstm=lstm_mod.init_lstm(keys[next(ki)], cfg.hid_dim, cfg.hid_dim, cfg.num_lstm_layer),
        fc_v=_init_linear(keys[next(ki)], cfg.hid_dim, 1),
        fc_a=_init_linear(keys[next(ki)], cfg.hid_dim, cfg.out_dim),
        pred_1st=_init_linear(keys[next(ki)], cfg.hid_dim, cfg.hand_size * 3),
    )


def _mlp(layers, x):
    for l in layers:
        x = jax.nn.relu(x @ l["w"] + l["b"])
    return x


def sad_slice(priv_s: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Slice an 838-dim (or 783-dim) SAD observation into (priv 658, publ 533):
    drop the greedy-action block, then own-hand block, then partner-hand block
    (obl_model.py:261-267)."""
    base = priv_s[..., :783]
    priv = base[..., 125:]
    publ = priv[..., 125:]
    return priv, publ


def act(
    params: PublicLSTMParams,
    cfg: PublicNetConfig,
    priv_s: jnp.ndarray,
    publ_s: jnp.ndarray,
    hid: Dict[str, jnp.ndarray],
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One-step advantage (obl_model.py:74-114). priv_s/publ_s: [B, *];
    hid batch-first {"h0","c0": [B, L, D]}."""
    x = _mlp(params.publ_net, publ_s)
    hidden = (hid["h0"].transpose(1, 0, 2), hid["c0"].transpose(1, 0, 2))
    publ_o, (h, c) = lstm_mod.lstm_step(params.lstm, x, hidden)
    priv_o = _mlp(params.priv_net, priv_s)
    o = priv_o * publ_o
    a = o @ params.fc_a["w"] + params.fc_a["b"]
    return a, {"h0": h.transpose(1, 0, 2), "c0": c.transpose(1, 0, 2)}


def forward(
    params: PublicLSTMParams,
    cfg: PublicNetConfig,
    priv_s: jnp.ndarray,
    publ_s: jnp.ndarray,
    legal_move: jnp.ndarray,
    action: jnp.ndarray,
    hid: Optional[Dict[str, jnp.ndarray]] = None,
):
    """Sequence forward (obl_model.py:116-162). Shapes as r2d2_net.forward."""
    B = priv_s.shape[1]
    x = _mlp(params.publ_net, publ_s)
    if hid is None:
        hidden = lstm_mod.zero_hidden(cfg.num_lstm_layer, B, cfg.hid_dim, x.dtype)
    else:
        hidden = (hid["h0"], hid["c0"])
    publ_o, _ = lstm_mod.lstm_seq(params.lstm, x, hidden)
    priv_o = _mlp(params.priv_net, priv_s)
    o = priv_o * publ_o
    a = o @ params.fc_a["w"] + params.fc_a["b"]
    v = o @ params.fc_v["w"] + params.fc_v["b"]
    q = duel(v, a, legal_move)
    qa = jnp.take_along_axis(q, action[..., None], axis=-1).squeeze(-1)
    legal_q = (1 + q - q.min()) * legal_move
    greedy_action = jnp.argmax(legal_q, axis=-1)
    return qa, jax.lax.stop_gradient(greedy_action), q, o


def make_act_fn(cfg: PublicNetConfig):
    """Adapter matching r2d2_agent.act's signature so a PublicLSTM policy can
    play inside the SAD eval pipeline (per-seat policies in eval_rollout)."""

    def obl_act(params, _agent_cfg, obs, hidden, key):
        N, P = obs["priv_s"].shape[:2]
        flat = lambda x: x.reshape((N * P,) + x.shape[2:])
        priv_s, publ_s = sad_slice(flat(obs["priv_s"]))
        legal = flat(obs["legal_move"])
        eps = flat(obs["eps"])
        hid = {
            "h0": hidden.h.reshape(N * P, cfg.num_lstm_layer, cfg.hid_dim),
            "c0": hidden.c.reshape(N * P, cfg.num_lstm_layer, cfg.hid_dim),
        }
        adv, new_hid = act(params, cfg, priv_s, publ_s, hid)
        legal_adv = (1 + adv - adv.min()) * legal
        greedy = jnp.argmax(legal_adv, axis=-1)

        k_rand, k_eps = jax.random.split(key)
        logits = jnp.where(legal > 0, 0.0, -jnp.inf)
        random_action = jax.random.categorical(k_rand, logits, axis=-1)
        explore = jax.random.uniform(k_eps, eps.shape) < eps
        action_ids = jnp.where(explore, random_action, greedy).astype(jnp.int32)

        from hanabi_sad_tpu.agent.r2d2_agent import Hidden

        reply = {
            "a": action_ids.reshape(N, P),
            "greedy_a": greedy.reshape(N, P).astype(jnp.int32),
        }
        new_hidden = Hidden(
            h=new_hid["h0"].reshape(N, P, cfg.num_lstm_layer, cfg.hid_dim),
            c=new_hid["c0"].reshape(N, P, cfg.num_lstm_layer, cfg.hid_dim),
        )
        return reply, new_hidden

    return obl_act


def from_torch_state_dict(state_dict) -> Tuple[PublicLSTMParams, PublicNetConfig]:
    """Load a released OBL .pthw (obl_model.py:312-330 strips the extra heads
    before loading; pass the stripped dict here)."""
    import numpy as np

    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)) for k, v in state_dict.items()}
    num_lstm = len([k for k in sd if k.startswith("lstm.weight_ih_l")])
    n_priv = len([k for k in sd if k.startswith("priv_net.") and k.endswith(".weight")])
    n_publ = len([k for k in sd if k.startswith("publ_net.") and k.endswith(".weight")])
    cfg = PublicNetConfig(
        priv_in_dim=sd["priv_net.0.weight"].shape[1],
        publ_in_dim=sd["publ_net.0.weight"].shape[1],
        hid_dim=sd["priv_net.0.weight"].shape[0],
        out_dim=sd["fc_a.weight"].shape[0],
        num_lstm_layer=num_lstm,
        num_priv_layer=n_priv,
        num_publ_layer=n_publ,
    )

    def lin(name):
        return {"w": jnp.asarray(sd[f"{name}.weight"].T), "b": jnp.asarray(sd[f"{name}.bias"])}

    priv_net = [lin(f"priv_net.{2*i}") for i in range(n_priv)]
    publ_net = [lin(f"publ_net.{2*i}") for i in range(n_publ)]
    lstm = [
        {
            "w_ih": jnp.asarray(sd[f"lstm.weight_ih_l{k}"].T),
            "w_hh": jnp.asarray(sd[f"lstm.weight_hh_l{k}"].T),
            "b": jnp.asarray(sd[f"lstm.bias_ih_l{k}"] + sd[f"lstm.bias_hh_l{k}"]),
        }
        for k in range(num_lstm)
    ]
    params = PublicLSTMParams(
        priv_net=priv_net,
        publ_net=publ_net,
        lstm=lstm,
        fc_v=lin("fc_v"),
        fc_a=lin("fc_a"),
        pred_1st=lin("pred_1st"),
    )
    return params, cfg


OBL_STRIP_KEYS = (
    "core_ffn.1.weight", "core_ffn.1.bias", "core_ffn.3.weight", "core_ffn.3.bias",
    "pred_2nd.weight", "pred_2nd.bias", "pred_t.weight", "pred_t.bias",
)


def load_obl_pthw(path: str) -> Tuple[PublicLSTMParams, PublicNetConfig]:
    import torch

    sd = torch.load(path, map_location="cpu")
    for k in OBL_STRIP_KEYS:
        sd.pop(k, None)
    return from_torch_state_dict(sd)
