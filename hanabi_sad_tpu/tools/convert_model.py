"""Model export (reference pyhanabi/tools/convert_model.py).

Converts a checkpoint of this framework into:
  * a reference-compatible torch state dict (.pthw) loadable by the original
    pyhanabi code and by this framework's .pthw loader;
  * a TorchScript single-forward module (.sparta) for the SPARTA search
    codebase (convert_model.py:21-84's LSTMNet re-wrap).

  python -m hanabi_sad_tpu.tools.convert_model --model exps/dev/model0.pkl
"""

from __future__ import annotations

import argparse

from hanabi_sad_tpu.models.torch_import import to_torch_state_dict
from hanabi_sad_tpu.tools import loaders


def build_sparta_module(state_dict):
    """Single-forward TorchScript net: trunk -> LSTM -> fc_a, dict-in/dict-out
    with batch-first hidden (the SPARTA search interface)."""
    import torch
    import torch.nn as nn
    from typing import Dict

    in_dim = state_dict["net.0.weight"].shape[1]
    hid_dim = state_dict["net.0.weight"].shape[0]
    out_dim = state_dict["fc_a.weight"].shape[0]
    num_lstm = len([k for k in state_dict if k.startswith("lstm.weight_ih_l")])

    class SearchNet(torch.jit.ScriptModule):
        def __init__(self):
            super().__init__()
            self.in_dim = in_dim
            self.net = nn.Sequential(nn.Linear(in_dim, hid_dim), nn.ReLU())
            self.lstm = nn.LSTM(hid_dim, hid_dim, num_layers=num_lstm)
            self.fc_v = nn.Linear(hid_dim, 1)
            self.fc_a = nn.Linear(hid_dim, out_dim)

        @torch.jit.script_method
        def forward(self, obs: Dict[str, torch.Tensor]) -> Dict[str, torch.Tensor]:
            h0 = obs["h0"].transpose(0, 1).contiguous()
            c0 = obs["c0"].transpose(0, 1).contiguous()
            s = obs["s"].unsqueeze(0)
            x = self.net(s)
            o, (h, c) = self.lstm(x, (h0, c0))
            a = self.fc_a(o).squeeze(0)
            return {
                "a": a,
                "h0": h.transpose(0, 1).contiguous(),
                "c0": c.transpose(0, 1).contiguous(),
            }

    net = SearchNet()
    own = net.state_dict()
    for k in own:
        if k in state_dict:
            own[k] = state_dict[k]
    net.load_state_dict(own)
    return net


def main(argv=None):
    import torch

    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True, type=str, help=".pkl checkpoint")
    parser.add_argument("--pthw", action="store_true", help="also write .pthw")
    args = parser.parse_args(argv)

    policy = loaders.load_any(args.model)
    sd = to_torch_state_dict(policy.params.online)

    base = args.model.rsplit(".", 1)[0]
    if args.pthw:
        torch.save(sd, base + ".pthw")
        print("saved torch weights to:", base + ".pthw")

    search_model = build_sparta_module(sd)
    save_path = base + ".sparta"
    print("saving model to:", save_path)
    torch.jit.save(search_model, save_path)
    return save_path


if __name__ == "__main__":
    main()
