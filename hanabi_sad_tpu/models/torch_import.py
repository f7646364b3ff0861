"""Load reference .pthw checkpoints (torch state dicts of pyhanabi/r2d2.py
R2D2Net) into R2D2NetParams.

Mapping (torch -> here):
  net.{2i}.weight [H, in]      -> net[i]["w"] = weight.T
  lstm.weight_ih_l{k} [4H, in] -> lstm[k]["w_ih"] = weight.T  (gate order
  lstm.bias_ih_l{k} + bias_hh_l{k} -> lstm[k]["b"]             i,f,g,o matches)
  fc_v/fc_a/pred.weight        -> {"w": weight.T, "b": bias}

Also infers NetConfig dims from tensor shapes, the way the reference loaders
do (utils.py:19-32: in_dim from net.0.weight, out_dim from fc_a.weight).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from hanabi_sad_tpu.models.r2d2_net import NetConfig, R2D2NetParams


def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def infer_net_config(state_dict: Dict, hand_size: int = 5) -> NetConfig:
    sd = {k: _to_np(v) for k, v in state_dict.items()}
    in_dim = sd["net.0.weight"].shape[1]
    hid_dim = sd["net.0.weight"].shape[0]
    out_dim = sd["fc_a.weight"].shape[0]
    num_lstm_layer = len([k for k in sd if k.startswith("lstm.weight_ih_l")])
    num_fc_layer = len([k for k in sd if k.startswith("net.") and k.endswith(".weight")])
    return NetConfig(
        in_dim=in_dim,
        hid_dim=hid_dim,
        out_dim=out_dim,
        num_lstm_layer=num_lstm_layer,
        hand_size=hand_size,
        num_fc_layer=num_fc_layer,
    )


def from_torch_state_dict(state_dict: Dict, cfg: NetConfig = None) -> Tuple[R2D2NetParams, NetConfig]:
    import jax.numpy as jnp

    sd = {k: _to_np(v) for k, v in state_dict.items()}
    if cfg is None:
        cfg = infer_net_config(sd)

    net = []
    for i in range(cfg.num_fc_layer):
        # torch Sequential interleaves ReLU: Linear layers sit at 0, 2, 4, ...
        idx = 2 * i
        net.append(
            {
                "w": jnp.asarray(sd[f"net.{idx}.weight"].T),
                "b": jnp.asarray(sd[f"net.{idx}.bias"]),
            }
        )
    lstm = []
    for k in range(cfg.num_lstm_layer):
        lstm.append(
            {
                "w_ih": jnp.asarray(sd[f"lstm.weight_ih_l{k}"].T),
                "w_hh": jnp.asarray(sd[f"lstm.weight_hh_l{k}"].T),
                "b": jnp.asarray(sd[f"lstm.bias_ih_l{k}"] + sd[f"lstm.bias_hh_l{k}"]),
            }
        )

    def lin(name):
        return {"w": jnp.asarray(sd[f"{name}.weight"].T), "b": jnp.asarray(sd[f"{name}.bias"])}

    params = R2D2NetParams(net=net, lstm=lstm, fc_v=lin("fc_v"), fc_a=lin("fc_a"), pred=lin("pred"))
    return params, cfg


def load_pthw(path: str, hand_size: int = 5) -> Tuple[R2D2NetParams, NetConfig]:
    """Load a reference .pthw weight file (torch CPU is available in-image)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    cfg = infer_net_config(sd, hand_size=hand_size)
    return from_torch_state_dict(sd, cfg)


def to_torch_state_dict(params: R2D2NetParams) -> Dict:
    """Export back to a reference-compatible state dict (for
    tools/convert_model.py parity)."""
    import torch

    sd = {}
    for i, layer in enumerate(params.net):
        sd[f"net.{2*i}.weight"] = torch.from_numpy(np.asarray(layer["w"]).T.copy())
        sd[f"net.{2*i}.bias"] = torch.from_numpy(np.asarray(layer["b"]).copy())
    for k, layer in enumerate(params.lstm):
        sd[f"lstm.weight_ih_l{k}"] = torch.from_numpy(np.asarray(layer["w_ih"]).T.copy())
        sd[f"lstm.weight_hh_l{k}"] = torch.from_numpy(np.asarray(layer["w_hh"]).T.copy())
        b = np.asarray(layer["b"])
        sd[f"lstm.bias_ih_l{k}"] = torch.from_numpy((b / 2).copy())
        sd[f"lstm.bias_hh_l{k}"] = torch.from_numpy((b / 2).copy())
    for name in ["fc_v", "fc_a", "pred"]:
        layer = getattr(params, name)
        sd[f"{name}.weight"] = torch.from_numpy(np.asarray(layer["w"]).T.copy())
        sd[f"{name}.bias"] = torch.from_numpy(np.asarray(layer["b"]).copy())
    return sd
