"""Scan-based actor: batched self-play rollouts producing padded episodes.

This module dissolves the reference's entire actor runtime — HanabiThreadLoop
(cpp/thread_loop.h), Batcher/BatchRunner (rela/batcher.h, rela/batch_runner.h),
R2D2Actor, MultiStepBuffer and R2D2Buffer (rela/r2d2_actor.h,
rela/transition_buffer.h) — into one jitted lax.scan:

  * All N envs reset together and run exactly `max_len` steps in lockstep.
    Because training forces termination at max_len (cpp/hanabi_env.cc:97-101),
    every env finishes exactly one episode per chunk; envs that end early
    freeze and their tail becomes the zero padding that R2D2Buffer::push
    produces with padLike() (rela/transition_buffer.h:163-175).
  * n-step returns and bootstrap flags are computed for the whole chunk as
    windowed array ops (replacing MultiStepBuffer::popTransition's per-env
    scalar loops, rela/transition_buffer.h:51-99).
  * IQL splits each env's trajectory into one item per player; VDN keeps the
    joint [P] item (create.py:107-135 actor topology).

Evaluation uses the same scan with a done-latch and no forced termination
(eval.py:19-66 semantics: greedy eps=0, max_len=-1).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from hanabi_sad_tpu.agent import r2d2_agent
from hanabi_sad_tpu.agent.r2d2_agent import AgentConfig, AgentParams, Batch
from hanabi_sad_tpu.game import env as env_mod
from hanabi_sad_tpu.game.env import EnvConfig
from hanabi_sad_tpu.replay.prioritized import EpisodeBatch


class RolloutOutput(NamedTuple):
    """Per-step records of one chunk, time-major [T, N, ...]."""

    priv_s: jnp.ndarray  # [T, N, P, F]
    legal_move: jnp.ndarray  # [T, N, P, A]
    own_hand: jnp.ndarray  # [T, N, P, 3*hand]
    action: jnp.ndarray  # [T, N, P]
    greedy_a: jnp.ndarray  # [T, N, P]
    qa: jnp.ndarray  # [T, N, P] online dueling Q of the taken action
    reward: jnp.ndarray  # [T, N] raw per-step reward
    done: jnp.ndarray  # [T, N] done *after* this step
    last_score: jnp.ndarray  # [N] final episode scores


def run_episode_chunk(
    params: AgentParams,
    agent_cfg: AgentConfig,
    env_cfg: EnvConfig,
    keys: jnp.ndarray,
    act_key: jax.Array,
    num_steps: int,
    unroll: int = 1,
) -> RolloutOutput:
    """Reset N envs and roll `num_steps` steps of epsilon-greedy self-play.

    keys: [N] env PRNG keys. For training num_steps == env_cfg.max_len so the
    chunk covers exactly one full (padded) episode per env."""
    N = keys.shape[0]
    P = env_cfg.game.players

    env_state, obs = jax.vmap(lambda k: env_mod.reset(env_cfg, k))(keys)
    hidden = r2d2_agent.init_hidden(agent_cfg, N, P)

    def body(carry, step_key):
        env_state, obs, hidden = carry
        reply, new_hidden = r2d2_agent.act(
            params, agent_cfg, obs, hidden, step_key, return_q=True
        )
        new_env_state, new_obs, reward, done = jax.vmap(
            lambda s, a: env_mod.step(env_cfg, s, a)
        )(env_state, reply)
        rec = (
            obs["priv_s"], obs["legal_move"], obs["own_hand"],
            reply["a"], reply["greedy_a"], reply["qa"], reward, done,
        )
        return (new_env_state, new_obs, new_hidden), rec

    (env_state, _, _), (priv_s, legal, own_hand, action, greedy_a, qa, reward, done) = jax.lax.scan(
        body, (env_state, obs, hidden), jax.random.split(act_key, num_steps),
        unroll=unroll,
    )
    return RolloutOutput(
        priv_s=priv_s,
        legal_move=legal,
        own_hand=own_hand,
        action=action,
        greedy_a=greedy_a,
        qa=qa,
        reward=reward,
        done=done,
        last_score=env_state.last_score,
    )


def _n_step_process(
    reward: jnp.ndarray, done: jnp.ndarray, multi_step: int, gamma: float
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """From per-step rewards and done-after flags [T, N], compute
    (n-step reward [T, N], bootstrap [T, N], seq_len [N]).

    Matches MultiStepBuffer::popTransition (rela/transition_buffer.h:51-99):
    reward_t = sum_{k<n} gamma^k r_{t+k} truncated at the terminal (post-
    terminal rewards are zero by construction); bootstrap_t = 1 iff no
    terminal inside [t, t+n)."""
    T, N = reward.shape
    n = multi_step
    was_done = jnp.concatenate([jnp.zeros((1, N), done.dtype), done[:-1]], axis=0)
    valid = ~was_done  # step t belongs to the episode
    seq_len = valid.sum(0).astype(jnp.float32)

    r = reward * valid  # safety: padding rewards are zero anyway
    padded = jnp.concatenate([r, jnp.zeros((n, N), r.dtype)], axis=0)
    n_step_r = jnp.zeros_like(r)
    for k in range(n):
        n_step_r = n_step_r + (gamma ** k) * padded[k : k + T]

    t_idx = jnp.arange(T, dtype=jnp.float32)[:, None]
    bootstrap = (t_idx < seq_len[None, :] - n).astype(jnp.float32)
    return n_step_r, bootstrap, seq_len


def chunk_to_episodes(
    out: RolloutOutput, agent_cfg: AgentConfig, zero_padding: bool = True
) -> EpisodeBatch:
    """Convert a chunk into replay items: [M, T, Pi, ...] with M = N (VDN,
    Pi = P) or N*P (IQL, Pi = 1; per-player items as in create.py:120-135).
    Padding steps are zeroed like FFTransition::padLike (transition.cc:29-40)."""
    T, N, P = out.action.shape
    n_step_r, bootstrap, seq_len = _n_step_process(
        out.reward, out.done, agent_cfg.multi_step, agent_cfg.gamma
    )

    valid = (jnp.arange(T, dtype=jnp.float32)[:, None] < seq_len[None, :]).astype(
        out.priv_s.dtype
    )  # [T, N]

    def pad_mask(x):  # zero out padding steps
        if not zero_padding:
            return x
        shape = (T, N) + (1,) * (x.ndim - 2)
        return x * valid.reshape(shape).astype(x.dtype)

    priv_s = pad_mask(out.priv_s)
    legal = pad_mask(out.legal_move)
    own_hand = pad_mask(out.own_hand)
    action = (out.action * valid.astype(out.action.dtype)[..., None]).astype(jnp.int32)

    to_item_major = lambda x: jnp.swapaxes(x, 0, 1)  # [T, N, ...] -> [N, T, ...]

    if agent_cfg.vdn:
        return EpisodeBatch(
            priv_s=to_item_major(priv_s),
            legal_move=to_item_major(legal),
            own_hand=to_item_major(own_hand),
            action=to_item_major(action),
            reward=to_item_major(n_step_r),
            bootstrap=to_item_major(bootstrap),
            seq_len=seq_len,
        )
    # IQL: split players into independent items -> [N*P, T, 1, ...]
    def split_players(x):  # [T, N, P, ...] -> [N*P, T, 1, ...]
        x = jnp.swapaxes(x, 0, 1)  # [N, T, P, ...]
        x = jnp.swapaxes(x, 1, 2)  # [N, P, T, ...]
        return x.reshape((N * P, T, 1) + x.shape[3:])

    # shared per-env fields are replicated per player, matching item order
    # (env-major, then player) of split_players
    rep = lambda x: jnp.repeat(to_item_major(x), P, axis=0)
    return EpisodeBatch(
        priv_s=split_players(priv_s),
        legal_move=split_players(legal),
        own_hand=split_players(own_hand),
        action=split_players(action),
        reward=rep(n_step_r),
        bootstrap=rep(bootstrap),
        seq_len=jnp.repeat(seq_len, P),
    )


def rollout_priority_inputs(out: RolloutOutput, agent_cfg: AgentConfig):
    """(online_qa [T, M], greedy_a [T, M, Pi]) aligned with chunk_to_episodes'
    item order, for compute_priority_from_rollout. Padding steps zero."""
    T, N, P = out.action.shape
    _, _, seq_len = _n_step_process(out.reward, out.done, agent_cfg.multi_step, agent_cfg.gamma)
    valid = (jnp.arange(T, dtype=jnp.float32)[:, None] < seq_len[None, :])  # [T, N]
    qa = out.qa * valid[..., None]
    greedy = out.greedy_a
    if agent_cfg.vdn:
        return qa.sum(-1), greedy  # [T, N], [T, N, P]
    # IQL: items are (env, player) pairs, env-major (matches split_players)
    return qa.reshape(T, N * P), greedy.reshape(T, N * P, 1)


def episodes_to_batch(ep: EpisodeBatch) -> Batch:
    """View an EpisodeBatch as a learner Batch (time-major) — used to compute
    initial priorities for fresh episodes."""
    T = ep.priv_s.shape[1]
    tm = lambda x: jnp.swapaxes(x, 0, 1)
    t_idx = jnp.arange(T, dtype=jnp.float32)[:, None]
    terminal = (t_idx >= (ep.seq_len[None, :] - 1)).astype(jnp.float32)
    return Batch(
        priv_s=tm(ep.priv_s),
        legal_move=tm(ep.legal_move),
        action=tm(ep.action),
        own_hand=tm(ep.own_hand),
        reward=tm(ep.reward),
        terminal=terminal,
        bootstrap=tm(ep.bootstrap),
        seq_len=ep.seq_len,
    )


def eval_rollout(
    params_per_player: Sequence[AgentParams],
    agent_cfgs: Sequence[AgentConfig],
    env_cfg: EnvConfig,
    keys: jnp.ndarray,
    num_steps: int = 128,
    act_fns: Optional[Sequence] = None,
    return_actions: bool = False,
):
    """Greedy evaluation of N games (eval.py:19-66): eps = 0, no forced
    termination (pass env_cfg with max_len <= 0), done-latch until all games
    finish. Different params per seat make this the cross-play harness
    (cpp/thread_loop.h:61-70 per-player actor split).

    `act_fns` optionally overrides the per-seat act function (signature of
    r2d2_agent.act) — how non-R2D2 policies like the OBL PublicLSTM play in
    this pipeline.

    Returns (scores [N], done [N])."""
    N = keys.shape[0]
    P = env_cfg.game.players
    assert len(params_per_player) == P
    if act_fns is None:
        act_fns = [r2d2_agent.act] * P

    env_state, obs = jax.vmap(lambda k: env_mod.reset(env_cfg, k))(keys)
    hiddens = [r2d2_agent.init_hidden(cfg, N, 1) for cfg in agent_cfgs]

    def body(carry, _):
        env_state, obs, hiddens = carry
        actions, greedy, new_hiddens = [], [], []
        for p in range(P):
            p_obs = {
                "priv_s": obs["priv_s"][:, p : p + 1],
                "legal_move": obs["legal_move"][:, p : p + 1],
                "eps": jnp.zeros((N, 1)),  # greedy
            }
            reply, hid = act_fns[p](
                params_per_player[p], agent_cfgs[p], p_obs, hiddens[p],
                jax.random.PRNGKey(0),  # eps == 0: key unused
            )
            actions.append(reply["a"][:, 0])
            greedy.append(reply["greedy_a"][:, 0])
            new_hiddens.append(hid)
        action = {"a": jnp.stack(actions, 1), "greedy_a": jnp.stack(greedy, 1)}
        was_done = env_state.done
        cur = env_state.game.cur_player
        applied = jnp.take_along_axis(action["a"], cur[:, None], axis=1)[:, 0]
        env_state, obs, reward, done = jax.vmap(
            lambda s, a: env_mod.step(env_cfg, s, a)
        )(env_state, action)
        return (env_state, obs, new_hiddens), (applied, was_done)

    (env_state, _, _), (applied, was_done) = jax.lax.scan(
        body, (env_state, obs, hiddens), None, length=num_steps
    )
    if return_actions:
        return env_state.last_score, env_state.done, applied, was_done
    return env_state.last_score, env_state.done
