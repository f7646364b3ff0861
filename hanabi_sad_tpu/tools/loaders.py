"""Model loaders for evaluation (reference utils.py:19-84, 127-171).

A loaded model is an EvalPolicy: params + an AgentConfig describing the net +
the act function used by the eval pipeline. Supports:
  * this framework's .pkl checkpoints (train/checkpoint.py payloads);
  * reference .pthw torch state dicts (SAD / OP release files), including the
    OP 12-model architecture grid (utils.py:46-57);
  * released OBL PublicLSTM checkpoints.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, List, Optional

from hanabi_sad_tpu.agent import r2d2_agent
from hanabi_sad_tpu.agent.r2d2_agent import AgentConfig, AgentParams
from hanabi_sad_tpu.models import public_lstm, torch_import
from hanabi_sad_tpu.models.r2d2_net import NetConfig
from hanabi_sad_tpu.train import checkpoint as ckpt


@dataclasses.dataclass
class EvalPolicy:
    params: Any
    agent_cfg: AgentConfig
    act_fn: Callable
    sad: bool = True  # whether this model consumes the SAD channel


def _agent_cfg_for(net: NetConfig) -> AgentConfig:
    return AgentConfig(net=net, vdn=False, multi_step=3, gamma=0.999, eta=0.9)


def load_sad_model(weight_file: str, hand_size: int = 5) -> EvalPolicy:
    """Reference .pthw -> policy; dims inferred from tensors (utils.py:19-32)."""
    net_params, net_cfg = torch_import.load_pthw(weight_file, hand_size=hand_size)
    params = AgentParams(online=net_params, target=net_params)
    return EvalPolicy(
        params=params,
        agent_cfg=_agent_cfg_for(net_cfg),
        act_fn=r2d2_agent.act,
        sad=net_cfg.in_dim >= 838,
    )


OP_ARCH_GRID = {
    # model idx -> (num_fc_layer, skip_connect); utils.py:46-57
    **{i: (1, False) for i in range(0, 3)},
    **{i: (1, True) for i in range(3, 6)},
    **{i: (2, False) for i in range(6, 9)},
    **{i: (2, True) for i in range(9, 12)},
}


def load_op_model(
    folder: str, method: str, idx: int, hand_size: int = 5
) -> EvalPolicy:
    """Released OP-paper model M{idx}.pthw from {folder}/{method}/
    (utils.py:35-84)."""
    import os

    num_fc, skip = OP_ARCH_GRID[idx]
    weight_file = os.path.join(folder, method, f"M{idx}.pthw")
    if not os.path.exists(weight_file):
        raise FileNotFoundError(f"Cannot find weight at: {weight_file}")
    import torch

    sd = torch.load(weight_file, map_location="cpu")
    net_cfg = torch_import.infer_net_config(sd, hand_size=hand_size)
    net_cfg = dataclasses.replace(net_cfg, num_fc_layer=num_fc, skip_connect=skip)
    net_params, _ = torch_import.from_torch_state_dict(sd, net_cfg)
    params = AgentParams(online=net_params, target=net_params)
    return EvalPolicy(
        params=params,
        agent_cfg=_agent_cfg_for(net_cfg),
        act_fn=r2d2_agent.act,
        sad=net_cfg.in_dim >= 838,
    )


def load_obl_model(path: str) -> EvalPolicy:
    """Released OBL PublicLSTM .pthw (tools/obl_model.py:312-330)."""
    net_params, net_cfg = public_lstm.load_obl_pthw(path)
    # Hidden-state bookkeeping reuses the R2D2 AgentConfig shape fields.
    shim = NetConfig(
        in_dim=838,
        hid_dim=net_cfg.hid_dim,
        out_dim=net_cfg.out_dim,
        num_lstm_layer=net_cfg.num_lstm_layer,
        hand_size=net_cfg.hand_size,
    )
    params = AgentParams(online=net_params, target=net_params)

    base_act = public_lstm.make_act_fn(net_cfg)

    def act_fn(p, agent_cfg, obs, hidden, key):
        return base_act(p.online, agent_cfg, obs, hidden, key)

    return EvalPolicy(
        params=params, agent_cfg=_agent_cfg_for(shim), act_fn=act_fn, sad=True
    )


def load_native_checkpoint(path: str, hand_size: int = 5) -> EvalPolicy:
    """This framework's .pkl payload (params-only or full train state).

    Payloads written by the trainer carry their TrainConfig (the reference
    instead re-parses flags out of train.log, utils.py:87-116); when present
    it overrides the shape-inferred sad/hand_size guesses."""
    payload = ckpt.load(path)
    saved = payload["params"]
    saved_cfg = payload.get("config")
    if saved_cfg:
        hand_size = saved_cfg.get("hand_size", hand_size)
    # params may be a bare R2D2NetParams (TopkSaver payloads save the online
    # net) or an AgentParams pair.
    if hasattr(saved, "online"):
        net_np = saved.online
    else:
        net_np = saved
    import jax

    net = jax.tree_util.tree_map(lambda x: x, net_np)
    # reconstruct NetConfig from shapes
    in_dim = net.net[0]["w"].shape[0]
    hid_dim = net.net[0]["w"].shape[1]
    out_dim = net.fc_a["w"].shape[1]
    net_cfg = NetConfig(
        in_dim=in_dim,
        hid_dim=hid_dim,
        out_dim=out_dim,
        num_lstm_layer=len(net.lstm),
        hand_size=hand_size,
        num_fc_layer=len(net.net),
        skip_connect=bool(saved_cfg.get("skip_connect", False)) if saved_cfg else False,
    )
    import jax.numpy as jnp

    net_jax = jax.tree_util.tree_map(jnp.asarray, net)
    params = AgentParams(online=net_jax, target=net_jax)
    sad = saved_cfg["sad"] if saved_cfg and "sad" in saved_cfg else in_dim >= 838
    return EvalPolicy(
        params=params,
        agent_cfg=_agent_cfg_for(net_cfg),
        act_fn=r2d2_agent.act,
        sad=sad,
    )


def load_any(path: str, hand_size: int = 5) -> EvalPolicy:
    if path.endswith(".pthw") or path.endswith(".pth"):
        return load_sad_model(path, hand_size)
    return load_native_checkpoint(path, hand_size)
