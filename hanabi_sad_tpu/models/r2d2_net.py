"""Dueling recurrent Q-network (R2D2Net).

Functional re-design of the reference's TorchScript R2D2Net
(pyhanabi/r2d2.py:13-156): an MLP trunk, a multi-layer LSTM, dueling value /
advantage heads with a legal-move-masked advantage mean, and the auxiliary
own-hand prediction head. Params are a plain pytree; every method is a pure
function usable under jit/vmap/grad and shardable with pjit.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from hanabi_sad_tpu.models import lstm as lstm_mod


@dataclasses.dataclass(frozen=True)
class NetConfig:
    in_dim: int
    hid_dim: int = 512
    out_dim: int = 21
    num_lstm_layer: int = 2
    hand_size: int = 5
    num_fc_layer: int = 1
    skip_connect: bool = False
    # Compute dtype for the matmul-heavy path (trunk + LSTM). Params stay
    # float32; bfloat16 compute feeds the MXU at 2x and halves HBM traffic.
    # Heads and losses stay float32 for Q-value fidelity.
    compute_dtype: str = "float32"
    # Time-step unroll factor of the sequence-forward LSTM scan (learner
    # fwd/bwd passes). 1 = plain scan; larger values trade compile time and
    # code size for cross-step software pipelining of the underfed matmuls.
    seq_unroll: int = 1
    def __post_init__(self):
        if self.compute_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"compute_dtype must be 'float32' or 'bfloat16', got {self.compute_dtype!r}"
            )

    @property
    def cdtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32


class R2D2NetParams(NamedTuple):
    net: List[Dict[str, jnp.ndarray]]  # trunk Linear layers {"w","b"}
    lstm: lstm_mod.LSTMParams
    fc_v: Dict[str, jnp.ndarray]
    fc_a: Dict[str, jnp.ndarray]
    pred: Dict[str, jnp.ndarray]  # aux own-hand head: hid -> hand_size*3


def _init_linear(key: jax.Array, d_in: int, d_out: int) -> Dict[str, jnp.ndarray]:
    """torch.nn.Linear default init: U(-k, k), k = 1/sqrt(fan_in)."""
    k = 1.0 / jnp.sqrt(d_in)
    k1, k2 = jax.random.split(key)
    return {
        "w": jax.random.uniform(k1, (d_in, d_out), jnp.float32, -k, k),
        "b": jax.random.uniform(k2, (d_out,), jnp.float32, -k, k),
    }


def init_r2d2_net(key: jax.Array, cfg: NetConfig) -> R2D2NetParams:
    keys = jax.random.split(key, cfg.num_fc_layer + 4)
    net = []
    d = cfg.in_dim
    for i in range(cfg.num_fc_layer):
        net.append(_init_linear(keys[i], d, cfg.hid_dim))
        d = cfg.hid_dim
    return R2D2NetParams(
        net=net,
        lstm=lstm_mod.init_lstm(
            keys[cfg.num_fc_layer], cfg.hid_dim, cfg.hid_dim, cfg.num_lstm_layer
        ),
        fc_v=_init_linear(keys[cfg.num_fc_layer + 1], cfg.hid_dim, 1),
        fc_a=_init_linear(keys[cfg.num_fc_layer + 2], cfg.hid_dim, cfg.out_dim),
        pred=_init_linear(keys[cfg.num_fc_layer + 3], cfg.hid_dim, cfg.hand_size * 3),
    )


def trunk(params: R2D2NetParams, x: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    x = x.astype(dtype)
    for layer in params.net:
        x = jax.nn.relu(x @ layer["w"].astype(dtype) + layer["b"].astype(dtype))
    return x


def get_h0(cfg: NetConfig, batch: int) -> Dict[str, jnp.ndarray]:
    """Zero initial hidden, batch-first shape [B, L, D] matching the actor's
    TensorDict convention (r2d2.py:59-63 + the transposes at r2d2.py:266-269)."""
    shape = (batch, cfg.num_lstm_layer, cfg.hid_dim)
    return {"h0": jnp.zeros(shape), "c0": jnp.zeros(shape)}


def act(
    params: R2D2NetParams,
    cfg: NetConfig,
    priv_s: jnp.ndarray,
    hid: Dict[str, jnp.ndarray],
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One-step advantage for acting (r2d2.py:65-78).

    priv_s: [B, in_dim]; hid: {"h0","c0": [B, L, D]} batch-first.
    Returns (advantage [B, out_dim], new hid batch-first)."""
    x = trunk(params, priv_s, cfg.cdtype)
    hidden = (hid["h0"].transpose(1, 0, 2), hid["c0"].transpose(1, 0, 2))
    o, (h, c) = lstm_mod.lstm_step(params.lstm, x, hidden)
    if cfg.skip_connect:
        o = o + x
    o = o.astype(jnp.float32)
    a = o @ params.fc_a["w"] + params.fc_a["b"]
    return a, {"h0": h.transpose(1, 0, 2), "c0": c.transpose(1, 0, 2)}


def act_with_v(
    params: R2D2NetParams,
    cfg: NetConfig,
    priv_s: jnp.ndarray,
    hid: Dict[str, jnp.ndarray],
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """act() that also returns the state value (one extra [B,D]@[D,1]) so the
    caller can form the dueling Q without a second LSTM pass."""
    x = trunk(params, priv_s, cfg.cdtype)
    hidden = (hid["h0"].transpose(1, 0, 2), hid["c0"].transpose(1, 0, 2))
    o, (h, c) = lstm_mod.lstm_step(params.lstm, x, hidden)
    if cfg.skip_connect:
        o = o + x
    o = o.astype(jnp.float32)
    a = o @ params.fc_a["w"] + params.fc_a["b"]
    v = o @ params.fc_v["w"] + params.fc_v["b"]
    return a, v, {"h0": h.transpose(1, 0, 2), "c0": c.transpose(1, 0, 2)}


def duel(v: jnp.ndarray, a: jnp.ndarray, legal_move: jnp.ndarray) -> jnp.ndarray:
    """Dueling combine with legal-masked advantage mean over *all* actions
    (r2d2.py:124-131 — the mean divides by num_actions, not num legal)."""
    legal_a = a * legal_move
    return v + legal_a - legal_a.mean(axis=-1, keepdims=True)


def forward(
    params: R2D2NetParams,
    cfg: NetConfig,
    priv_s: jnp.ndarray,
    legal_move: jnp.ndarray,
    action: jnp.ndarray,
    hid: Optional[Dict[str, jnp.ndarray]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sequence forward (r2d2.py:80-122).

    priv_s: [T, B, in_dim]; legal_move: [T, B, A]; action: [T, B] int.
    hid None -> zeros (the learner's zero-h0 simplification, r2d2.py:395).
    Returns (qa [T,B], greedy_action [T,B], q [T,B,A], lstm_o [T,B,D])."""
    T, B = priv_s.shape[0], priv_s.shape[1]
    x = trunk(params, priv_s, cfg.cdtype)
    if hid is None:
        hidden = lstm_mod.zero_hidden(cfg.num_lstm_layer, B, cfg.hid_dim, x.dtype)
    else:
        hidden = (hid["h0"], hid["c0"])  # already [L, B, D]
    o, _ = lstm_mod.lstm_seq(params.lstm, x, hidden, unroll=cfg.seq_unroll)
    if cfg.skip_connect:
        o = o + x
    o = o.astype(jnp.float32)
    a = o @ params.fc_a["w"] + params.fc_a["b"]
    v = o @ params.fc_v["w"] + params.fc_v["b"]
    q = duel(v, a, legal_move)

    qa = jnp.take_along_axis(q, action[..., None], axis=-1).squeeze(-1)

    # Legal-masked greedy: shift q positive then mask (r2d2.py:113-115).
    legal_q = (1 + q - q.min()) * legal_move
    greedy_action = jnp.argmax(legal_q, axis=-1)
    return qa, jax.lax.stop_gradient(greedy_action), q, o


def greedy_act(
    params: R2D2NetParams,
    cfg: NetConfig,
    priv_s: jnp.ndarray,
    legal_move: jnp.ndarray,
    hid: Dict[str, jnp.ndarray],
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Greedy action ids for acting (r2d2.py:234-244)."""
    adv, new_hid = act(params, cfg, priv_s, hid)
    legal_adv = (1 + adv - adv.min()) * legal_move
    return jnp.argmax(legal_adv, axis=-1), new_hid


def pred_loss_1st(
    params: R2D2NetParams,
    lstm_o: jnp.ndarray,
    target_p: jnp.ndarray,
    hand_slot_mask: jnp.ndarray,
    seq_len: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Aux own-hand cross-entropy (r2d2.py:133-156).

    lstm_o: [T, B, D]; target_p: [T, B, (P,) hand, 3];
    hand_slot_mask: [T, B, (P,) hand] (sum of the trinary — 0 for empty slots).
    Returns (xent summed over time [B], avg_xent scalar)."""
    logit = (lstm_o @ params.pred["w"] + params.pred["b"]).reshape(target_p.shape)
    logq = jax.nn.log_softmax(logit, axis=-1)
    plogq = (target_p * logq).sum(-1)
    xent = -(plogq * hand_slot_mask).sum(-1) / jnp.maximum(
        hand_slot_mask.sum(-1), 1e-6
    )
    if xent.ndim == 3:  # [T, B, P] (VDN) -> mean over players
        xent = xent.mean(-1)
    xent_t = xent.sum(0)  # [B]
    avg_xent = (xent_t / seq_len).mean()
    return xent_t, avg_xent
