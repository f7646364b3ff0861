"""R2D2 agent: epsilon-greedy acting, n-step double-Q TD error, Huber loss,
auxiliary own-hand loss, and priority aggregation.

Pure-function re-design of the reference R2D2Agent (pyhanabi/r2d2.py:159-499)
and rela::aggregatePriority (rela/r2d2_actor.h:10-21). The online/target pair
is a pytree of two R2D2NetParams; "sync target" is a tree copy; acting and
learning are both jittable and differentiable where needed.

Shape conventions:
  acting    — obs fields [N, P, ...] (N envs, P players), hidden [N, P, L, D]
  learning  — sequence batches [T, B, Pi, ...] where Pi = num_player for VDN
              and 1 for IQL (the reference's flat_4d collapse, r2d2.py:364-381)
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from hanabi_sad_tpu.models import r2d2_net
from hanabi_sad_tpu.models.r2d2_net import NetConfig, R2D2NetParams


@dataclasses.dataclass(frozen=True)
class AgentConfig:
    net: NetConfig
    vdn: bool = True
    multi_step: int = 3
    gamma: float = 0.999
    eta: float = 0.9
    uniform_priority: bool = False
    # Run the online and target sequence forwards of td_error as ONE scan
    # over params stacked [2, ...] (batched matmuls) instead of two
    # sequential 80-step scans. Same numbers (equality-tested); at learner
    # batch sizes the scans are latency-bound, so merging them removes one
    # full sequence-scan latency per gradient update. The backward pass
    # computes a dead target-slice gradient inside the same (latency-bound)
    # stacked matmuls; stop_gradient keeps it out of the update.
    stacked_td: bool = False


class AgentParams(NamedTuple):
    online: R2D2NetParams
    target: R2D2NetParams


def init_agent(key: jax.Array, cfg: AgentConfig) -> AgentParams:
    online = r2d2_net.init_r2d2_net(key, cfg.net)
    # Materialize a distinct copy for the target net: aliased buffers break
    # donation in the jitted train step (same buffer donated twice).
    target = jax.tree_util.tree_map(lambda x: x + 0, online)
    return AgentParams(online=online, target=target)


def sync_target(params: AgentParams) -> AgentParams:
    """target <- online (r2d2.py:231-232)."""
    return AgentParams(online=params.online, target=params.online)


# --------------------------------------------------------------------------
# Acting (replaces the TorchScript `act` served by BatchRunner, r2d2.py:246-303)
# --------------------------------------------------------------------------


class Hidden(NamedTuple):
    h: jnp.ndarray  # [N, P, L, D]
    c: jnp.ndarray


def init_hidden(cfg: AgentConfig, num_envs: int, players: int) -> Hidden:
    shape = (num_envs, players, cfg.net.num_lstm_layer, cfg.net.hid_dim)
    return Hidden(jnp.zeros(shape), jnp.zeros(shape))


def act(
    params: AgentParams,
    cfg: AgentConfig,
    obs: Dict[str, jnp.ndarray],
    hidden: Hidden,
    key: jax.Array,
    *,
    return_q: bool = False,
) -> Tuple[Dict[str, jnp.ndarray], Hidden]:
    """Batched epsilon-greedy act for all envs and players at once.

    obs: priv_s [N, P, F], legal_move [N, P, A], eps [N, P].
    Returns ({"a","greedy_a"} [N, P] i32, new hidden). The random arm samples
    uniformly over legal moves (legal_move.multinomial, r2d2.py:273-277).

    return_q additionally computes the dueling Q of the chosen action
    (reply["qa"]) so the rollout can hand the learner its online Q values for
    free — the priority pass then only needs a target-net forward (the
    reference recomputes both nets in compute_priority, r2d2.py:344-348).
    """
    N, P = obs["priv_s"].shape[:2]
    flat = lambda x: x.reshape((N * P,) + x.shape[2:])
    priv_s = flat(obs["priv_s"])
    legal = flat(obs["legal_move"])
    eps = flat(obs["eps"])

    hid = {
        "h0": hidden.h.reshape(N * P, cfg.net.num_lstm_layer, cfg.net.hid_dim),
        "c0": hidden.c.reshape(N * P, cfg.net.num_lstm_layer, cfg.net.hid_dim),
    }
    if return_q:
        adv, v, new_hid = r2d2_net.act_with_v(params.online, cfg.net, priv_s, hid)
    else:
        adv, new_hid = r2d2_net.act(params.online, cfg.net, priv_s, hid)
    # Greedy over legal entries of the advantage == greedy over the dueling Q
    # (v and the masked advantage mean are per-row constants), r2d2.py:241-244.
    legal_adv = (1 + adv - adv.min()) * legal
    greedy = jnp.argmax(legal_adv, axis=-1)

    k_rand, k_eps = jax.random.split(key)
    logits = jnp.where(legal > 0, 0.0, -jnp.inf)
    random_action = jax.random.categorical(k_rand, logits, axis=-1)
    explore = jax.random.uniform(k_eps, eps.shape) < eps
    action = jnp.where(explore, random_action, greedy).astype(jnp.int32)

    unflat = lambda x: x.reshape(N, P)
    reply = {"a": unflat(action), "greedy_a": unflat(greedy.astype(jnp.int32))}
    if return_q:
        q = r2d2_net.duel(v, adv, legal)
        qa = jnp.take_along_axis(q, action[:, None], axis=-1)[:, 0]
        reply["qa"] = unflat(qa)
    new_hidden = Hidden(
        h=new_hid["h0"].reshape(N, P, cfg.net.num_lstm_layer, cfg.net.hid_dim),
        c=new_hid["c0"].reshape(N, P, cfg.net.num_lstm_layer, cfg.net.hid_dim),
    )
    return reply, new_hidden


def act_with_target(
    params: AgentParams,
    cfg: AgentConfig,
    obs: Dict[str, jnp.ndarray],
    hidden: Hidden,
    target_hidden: Hidden,
    key: jax.Array,
) -> Tuple[Dict[str, jnp.ndarray], Hidden, Hidden]:
    """act(return_q=True) that additionally advances the TARGET net alongside
    the online net and returns the target dueling Q of the online-greedy
    action (reply["tqa"]).

    Carrying the target hidden through the rollout (reset on done like the
    online hidden) reproduces exactly the zero-h0 full-sequence target
    forward that compute_priority_from_rollout would run over the assembled
    episodes — the reference's online-target initial priority
    (r2d2.py:344-348) — without the separate re-forward, which is ~28% of
    the production train chunk (BENCHMARKS.md round-4 chunk-phase
    breakdown). The one divergence: an episode that spans a target-sync
    boundary keeps its pre-sync target Q values for the steps already
    rolled, where the re-forward would recompute all steps with the new
    target — affects <2% of episodes once per 156 chunks (sync every 2500
    updates / 16 per chunk); both are valid "the priorities the actor saw"
    semantics.

    The two networks have no data dependency on each other, so XLA
    interleaves their kernels inside the scan body; the serial depth per
    step stays the online chain's.
    """
    N, P = obs["priv_s"].shape[:2]
    flat = lambda x: x.reshape((N * P,) + x.shape[2:])
    priv_s = flat(obs["priv_s"])
    legal = flat(obs["legal_move"])
    eps = flat(obs["eps"])

    def hid_dict(h: Hidden) -> Dict[str, jnp.ndarray]:
        return {
            "h0": h.h.reshape(N * P, cfg.net.num_lstm_layer, cfg.net.hid_dim),
            "c0": h.c.reshape(N * P, cfg.net.num_lstm_layer, cfg.net.hid_dim),
        }

    def hid_tuple(d: Dict[str, jnp.ndarray]) -> Hidden:
        return Hidden(
            h=d["h0"].reshape(N, P, cfg.net.num_lstm_layer, cfg.net.hid_dim),
            c=d["c0"].reshape(N, P, cfg.net.num_lstm_layer, cfg.net.hid_dim),
        )

    # One stacked per-step forward for both nets (batched matmuls [2, ...])
    # instead of two interleaved kernel chains — the serial depth per step
    # is one chain either way, but half the kernel launches.
    stacked = jax.tree_util.tree_map(
        lambda o, t: jnp.stack([o, t]), params.online, params.target
    )
    hid2 = jax.tree_util.tree_map(
        lambda a, b: jnp.stack([a, b]), hid_dict(hidden), hid_dict(target_hidden)
    )
    adv2, v2, new_hid2 = jax.vmap(
        lambda p, h: r2d2_net.act_with_v(p, cfg.net, priv_s, h)
    )(stacked, hid2)
    adv, v = adv2[0], v2[0]
    t_adv, t_v = adv2[1], v2[1]
    new_hid = jax.tree_util.tree_map(lambda x: x[0], new_hid2)
    new_t_hid = jax.tree_util.tree_map(lambda x: x[1], new_hid2)

    legal_adv = (1 + adv - adv.min()) * legal
    greedy = jnp.argmax(legal_adv, axis=-1)

    k_rand, k_eps = jax.random.split(key)
    logits = jnp.where(legal > 0, 0.0, -jnp.inf)
    random_action = jax.random.categorical(k_rand, logits, axis=-1)
    explore = jax.random.uniform(k_eps, eps.shape) < eps
    action = jnp.where(explore, random_action, greedy).astype(jnp.int32)

    unflat = lambda x: x.reshape(N, P)
    q = r2d2_net.duel(v, adv, legal)
    qa = jnp.take_along_axis(q, action[:, None], axis=-1)[:, 0]
    t_q = jax.lax.stop_gradient(r2d2_net.duel(t_v, t_adv, legal))
    tqa = jnp.take_along_axis(t_q, greedy[:, None], axis=-1)[:, 0]
    reply = {
        "a": unflat(action),
        "greedy_a": unflat(greedy.astype(jnp.int32)),
        "qa": unflat(qa),
        "tqa": unflat(tqa),
    }
    return reply, hid_tuple(new_hid), hid_tuple(new_t_hid)


def reset_hidden_where(done: jnp.ndarray, hidden: Hidden) -> Hidden:
    """Zero the hidden rows of envs that just reset (r2d2_actor.h:113-126)."""
    mask = done[:, None, None, None]
    return Hidden(
        h=jnp.where(mask, 0.0, hidden.h),
        c=jnp.where(mask, 0.0, hidden.c),
    )


# --------------------------------------------------------------------------
# Learning (td_error / loss, r2d2.py:383-499)
# --------------------------------------------------------------------------


class Batch(NamedTuple):
    """A replay sample: padded episode sequences.

    priv_s [T, B, Pi, F]; legal_move [T, B, Pi, A]; action [T, B, Pi] i32;
    own_hand [T, B, Pi, hand*3]; reward/terminal/bootstrap [T, B]; seq_len [B].
    Pi = num_player (VDN) or 1 (IQL)."""

    priv_s: jnp.ndarray
    legal_move: jnp.ndarray
    action: jnp.ndarray
    own_hand: jnp.ndarray
    reward: jnp.ndarray
    terminal: jnp.ndarray
    bootstrap: jnp.ndarray
    seq_len: jnp.ndarray


def td_error(
    params: AgentParams, cfg: AgentConfig, batch: Batch
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked per-step n-step double-Q TD error over padded episodes
    (r2d2.py:383-428). Returns (err [T, B], lstm_o [T, B, Pi, D])."""
    T, B, Pi = batch.priv_s.shape[:3]
    flat = lambda x: x.reshape((T, B * Pi) + x.shape[3:])
    priv_s = flat(batch.priv_s)
    legal = flat(batch.legal_move)
    action = flat(batch.action)

    # Online forward over the full padded sequence with zero initial hidden —
    # valid because episodes are aligned to t=0 and padded (r2d2.py:395-401).
    if cfg.stacked_td:
        # One stacked scan for both nets: the target's input actions (the
        # online greedy) are only used to SELECT from its q output, so both
        # full-q forwards are independent and can share the scan.
        stacked = jax.tree_util.tree_map(
            lambda o, t: jnp.stack([o, t]), params.online, params.target
        )
        _, _, q2, o2 = jax.vmap(
            lambda p: r2d2_net.forward(
                p, cfg.net, priv_s, legal, jnp.zeros_like(action), hid=None
            )
        )(stacked)
        online_qa = jnp.take_along_axis(q2[0], action[..., None], -1).squeeze(-1)
        # Legal-masked greedy of the online q (forward's own rule,
        # r2d2.py:113-115); any positive shift is argmax-invariant.
        legal_q = (1 + q2[0] - q2[0].min()) * legal
        greedy_a = jax.lax.stop_gradient(jnp.argmax(legal_q, axis=-1))
        target_qa = jnp.take_along_axis(q2[1], greedy_a[..., None], -1).squeeze(-1)
        lstm_o = o2[0]
    else:
        online_qa, greedy_a, _, lstm_o = r2d2_net.forward(
            params.online, cfg.net, priv_s, legal, action, hid=None
        )
        target_qa, _, _, _ = r2d2_net.forward(
            params.target, cfg.net, priv_s, legal, greedy_a, hid=None
        )
    target_qa = jax.lax.stop_gradient(target_qa)

    if cfg.vdn:
        online_qa = online_qa.reshape(T, B, Pi).sum(-1)
        target_qa = target_qa.reshape(T, B, Pi).sum(-1)
    else:
        online_qa = online_qa.reshape(T, B)
        target_qa = target_qa.reshape(T, B)
    lstm_o = lstm_o.reshape(T, B, Pi, -1)

    # n-step target via the time-roll trick (r2d2.py:418-421): the target for
    # step t bootstraps from the target-net Q at t + multi_step; the stored
    # reward is already the discounted n-step sum and `bootstrap` kills the
    # tail where the episode ended inside the window.
    n = cfg.multi_step
    target_qa = jnp.concatenate([target_qa[n:], target_qa[:n]], axis=0)
    target_qa = target_qa.at[-n:].set(0.0)

    target = batch.reward + batch.bootstrap * (cfg.gamma ** n) * target_qa
    mask = (jnp.arange(T)[:, None] < batch.seq_len[None, :]).astype(target.dtype)
    err = (jax.lax.stop_gradient(target) - online_qa) * mask
    return err, lstm_o


def _huber(x: jnp.ndarray) -> jnp.ndarray:
    """smooth_l1_loss(err, 0) with beta = 1 (r2d2.py:472-474)."""
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def loss(
    params: AgentParams,
    cfg: AgentConfig,
    batch: Batch,
    pred_weight: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Per-episode loss and per-step priorities (r2d2.py:461-499).

    Returns (loss [B], priority [T, B], stats dict)."""
    err, lstm_o = td_error(params, cfg, batch)
    rl_loss = _huber(err).sum(0)  # [B]
    priority = jnp.abs(err)

    stats = {"rl_loss": (rl_loss / batch.seq_len).mean()}

    total = rl_loss
    if pred_weight > 0:
        T, B, Pi = batch.own_hand.shape[:3]
        hand_size = cfg.net.hand_size
        if cfg.vdn:
            own_hand = batch.own_hand.reshape(T, B, Pi, hand_size, 3)
            lstm_in = lstm_o  # [T, B, Pi, D]
        else:
            own_hand = batch.own_hand.reshape(T, B, hand_size, 3)
            lstm_in = lstm_o.reshape(T, B, -1)
        slot_mask = own_hand.sum(-1)
        pred_loss, avg_xent = r2d2_net.pred_loss_1st(
            params.online, lstm_in, own_hand, slot_mask, batch.seq_len
        )
        stats["aux1"] = avg_xent
        total = rl_loss + pred_weight * pred_loss
    return total, priority, stats


def aggregate_priority(
    priority: jnp.ndarray, seq_len: jnp.ndarray, eta: float
) -> jnp.ndarray:
    """eta * max + (1 - eta) * mean over the valid steps of each episode
    (rela/r2d2_actor.h:10-21; mean divides by seq_len)."""
    T = priority.shape[0]
    mask = (jnp.arange(T)[:, None] < seq_len[None, :]).astype(priority.dtype)
    p = priority * mask
    p_mean = p.sum(0) / seq_len
    p_max = p.max(0)
    return eta * p_max + (1.0 - eta) * p_mean


def compute_priority_from_rollout(
    params: AgentParams,
    cfg: AgentConfig,
    batch: Batch,
    online_qa: jnp.ndarray,
    greedy_a: jnp.ndarray,
) -> jnp.ndarray:
    """Initial priorities using the rollout's own online Q values — only the
    target net runs a full-sequence forward here (half the cost of
    compute_priority). online_qa: [T, B] already VDN-summed; greedy_a:
    [T, B, Pi] the rollout's greedy actions (= the online full-seq greedy,
    since rollout hiddens equal the zero-h0 sequence hiddens for aligned
    episodes)."""
    if cfg.uniform_priority:
        return jnp.ones_like(batch.seq_len, dtype=jnp.float32)
    T, B, Pi = batch.priv_s.shape[:3]
    flat = lambda x: x.reshape((T, B * Pi) + x.shape[3:])
    target_qa, _, _, _ = r2d2_net.forward(
        params.target, cfg.net, flat(batch.priv_s), flat(batch.legal_move), flat(greedy_a)
    )
    if cfg.vdn:
        target_qa = target_qa.reshape(T, B, Pi).sum(-1)
    else:
        target_qa = target_qa.reshape(T, B)
    n = cfg.multi_step
    target_qa = jnp.concatenate([target_qa[n:], target_qa[:n]], axis=0)
    target_qa = target_qa.at[-n:].set(0.0)
    target = batch.reward + batch.bootstrap * (cfg.gamma ** n) * target_qa
    mask = (jnp.arange(T)[:, None] < batch.seq_len[None, :]).astype(target.dtype)
    err = (target - online_qa) * mask
    return aggregate_priority(jnp.abs(err), batch.seq_len, cfg.eta)


def compute_priority(
    params: AgentParams, cfg: AgentConfig, batch: Batch
) -> jnp.ndarray:
    """Initial priority of freshly collected episodes: |n-step TD error| per
    step, aggregated. Mathematically the reference's actor-side
    compute_priority (r2d2.py:305-361) + aggregatePriority: our episodes are
    aligned to t=0, so a full-sequence forward from zero hidden reproduces
    the rollout's hidden states exactly and the per-step one-step-of-n-step
    errors coincide with the roll-trick errors."""
    if cfg.uniform_priority:
        return jnp.ones_like(batch.seq_len, dtype=jnp.float32)
    err, _ = td_error(params, cfg, batch)
    return aggregate_priority(jnp.abs(err), batch.seq_len, cfg.eta)
