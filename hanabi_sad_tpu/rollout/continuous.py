"""Continuous rollout: auto-resetting envs, no idle frames.

The aligned-chunk runner (runner.py) resets every env at the chunk start and
lets finished envs idle until the chunk ends — simple, but early in training
(short episodes) most of the chunk is padding. This module matches the
reference's true actor semantics instead (HanabiVecEnv auto-reset,
rela/env.h:48-60): envs reset the moment an episode ends, every step is a
live frame, and episodes are re-assembled from the step stream afterwards.

Pipeline per chunk of T steps (T = max_len):
  1. scan: act -> step_autoreset; the per-step record is stored *bitpacked*
     (obs bits -> uint8) so the stream stays small; episode boundaries are the
     done flags.
  2. assemble: each env's stream is cut at its done positions; segment 0 is
     glued onto the env's carried partial episode from the previous chunk;
     the unfinished tail becomes the next carry. Completed episodes land in
     up to `slots_per_env` fixed slots per env (overflow episodes are
     dropped and counted — only possible when episodes are shorter than
     T / slots_per_env).
  3. commit: n-step returns + bootstrap per slot, initial priorities from the
     rollout's own online TD errors (|r_n + g^n b qa_{t+n} - qa_t|, an
     online-online approximation of the reference's online-target priority —
     exact again after every target sync, and refreshed by the learner on
     first sample), then replay.add_packed with slot validity compaction.

Because an episode takes at most max_len steps, every chunk of T = max_len
steps completes >= 1 episode per env, so the carry never exceeds T-1 steps.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from hanabi_sad_tpu.agent import r2d2_agent
from hanabi_sad_tpu.agent.r2d2_agent import AgentConfig, AgentParams
from hanabi_sad_tpu.game import env as env_mod
from hanabi_sad_tpu.game.env import EnvConfig, EnvState
from hanabi_sad_tpu.replay.bitpack import pack_bits
from hanabi_sad_tpu.replay.prioritized import ReplayConfig


class ActorState(NamedTuple):
    """Persistent actor-side state carried across chunks."""

    env_state: EnvState  # batched [N]
    obs: Dict[str, jnp.ndarray]
    hidden: r2d2_agent.Hidden
    # carried partial episode per env (bitpacked steps)
    carry_packed: jnp.ndarray  # [N, T, P, bytes] uint8
    carry_action: jnp.ndarray  # [N, T, P] i32
    carry_greedy: jnp.ndarray  # [N, T, P] i32
    carry_qa: jnp.ndarray  # [N, T, P] f32
    carry_reward: jnp.ndarray  # [N, T] f32
    carry_len: jnp.ndarray  # [N] i32
    # Set when the rollout also advances the target net for fused exact
    # priorities (TrainConfig.exact_priority_in_rollout): the target-net
    # hidden carry and the carried partial episode's target-greedy Q stream.
    # None leaves are static pytree structure — the two variants simply
    # compile different programs.
    target_hidden: object = None  # Hidden or None
    carry_tqa: object = None  # [N, T, P] f32 or None


class StreamChunk(NamedTuple):
    """Per-step records of one continuous chunk, time-major [T, N, ...]."""

    packed: jnp.ndarray  # [T, N, P, bytes] uint8
    action: jnp.ndarray  # [T, N, P] i32
    greedy: jnp.ndarray  # [T, N, P] i32
    qa: jnp.ndarray  # [T, N, P] f32
    reward: jnp.ndarray  # [T, N] f32
    done: jnp.ndarray  # [T, N] bool
    score: jnp.ndarray  # [T, N] i32 (episode score where done)
    tqa: object = None  # [T, N, P] f32 target-greedy Q (fused priority) or None


def init_actor_state(
    agent_cfg: AgentConfig,
    env_cfg: EnvConfig,
    rep_cfg: ReplayConfig,
    keys: jnp.ndarray,
    *,
    with_target_qa: bool = False,
) -> ActorState:
    N = keys.shape[0]
    P = env_cfg.game.players
    T = rep_cfg.seq_len
    env_state, obs = jax.vmap(lambda k: env_mod.reset(env_cfg, k))(keys)
    state = ActorState(
        env_state=env_state,
        obs=obs,
        hidden=r2d2_agent.init_hidden(agent_cfg, N, P),
        carry_packed=jnp.zeros((N, T, P, rep_cfg.bytes_per_step), jnp.uint8),
        carry_action=jnp.zeros((N, T, P), jnp.int32),
        carry_greedy=jnp.zeros((N, T, P), jnp.int32),
        carry_qa=jnp.zeros((N, T, P), jnp.float32),
        carry_reward=jnp.zeros((N, T), jnp.float32),
        carry_len=jnp.zeros((N,), jnp.int32),
        target_hidden=r2d2_agent.init_hidden(agent_cfg, N, P) if with_target_qa else None,
        carry_tqa=jnp.zeros((N, T, P), jnp.float32) if with_target_qa else None,
    )
    # Identical zero constants can alias the same device buffer, which breaks
    # donation in the jitted train chunk — materialize distinct buffers.
    return jax.tree_util.tree_map(lambda x: x + jnp.zeros((), x.dtype), state)


def run_continuous_chunk(
    params: AgentParams,
    agent_cfg: AgentConfig,
    env_cfg: EnvConfig,
    actor: ActorState,
    act_key: jax.Array,
    num_steps: int,
    unroll: int = 1,
) -> Tuple[ActorState, StreamChunk]:
    """Roll num_steps live steps from the persistent actor state. unroll > 1
    widens the compiled rollout loop body by that many env/act steps so XLA
    can software-pipeline the underfed per-step matmuls (see
    TrainConfig.rollout_unroll)."""

    with_target = actor.target_hidden is not None

    def body(carry, step_key):
        env_state, obs, hidden, t_hidden = carry
        if with_target:
            reply, hidden, t_hidden = r2d2_agent.act_with_target(
                params, agent_cfg, obs, hidden, t_hidden, step_key
            )
        else:
            reply, hidden = r2d2_agent.act(
                params, agent_cfg, obs, hidden, step_key, return_q=True
            )
        new_env_state, new_obs, reward, done, score = jax.vmap(
            lambda s, a: env_mod.step_autoreset(env_cfg, s, a)
        )(env_state, {"a": reply["a"], "greedy_a": reply["greedy_a"]})
        hidden = r2d2_agent.reset_hidden_where(done, hidden)
        if with_target:
            t_hidden = r2d2_agent.reset_hidden_where(done, t_hidden)
        bits = jnp.concatenate(
            [obs["priv_s"], obs["legal_move"], obs["own_hand"]], axis=-1
        )
        rec = (
            pack_bits(bits), reply["a"], reply["greedy_a"], reply["qa"], reward, done,
            score,
        )
        if with_target:
            rec = rec + (reply["tqa"],)
        return (new_env_state, new_obs, hidden, t_hidden), rec

    (env_state, obs, hidden, t_hidden), recs = jax.lax.scan(
        body,
        (actor.env_state, actor.obs, actor.hidden, actor.target_hidden),
        jax.random.split(act_key, num_steps),
        unroll=unroll,
    )
    stream = StreamChunk(*recs)
    actor = actor._replace(
        env_state=env_state, obs=obs, hidden=hidden, target_hidden=t_hidden
    )
    return actor, stream


class AssembledEpisodes(NamedTuple):
    """Fixed [M] episode slots (M = N * slots_per_env), compaction-ready."""

    packed: jnp.ndarray  # [M, T, P, bytes]
    action: jnp.ndarray  # [M, T, P]
    greedy: jnp.ndarray  # [M, T, P]
    qa: jnp.ndarray  # [M, T, P]
    reward: jnp.ndarray  # [M, T] raw per-step rewards
    seq_len: jnp.ndarray  # [M] f32
    valid: jnp.ndarray  # [M] bool
    dropped: jnp.ndarray  # scalar i32: completed episodes beyond the slot cap
    score_sum: jnp.ndarray  # scalar f32, sum of completed-episode scores
    num_completed: jnp.ndarray  # scalar i32
    tqa: object = None  # [M, T, P] target-greedy Q (fused priority) or None


def assemble_episodes(
    actor: ActorState, stream: StreamChunk, slots_per_env: int
) -> Tuple[ActorState, AssembledEpisodes]:
    """Cut the stream at episode boundaries, glue segment 0 onto the carry,
    fill fixed episode slots, and roll the unfinished tail into the new carry."""
    T, N = stream.done.shape
    K = slots_per_env
    Tcap = actor.carry_packed.shape[1]  # == max episode length

    done = stream.done  # [T, N]
    n_done = done.sum(0).astype(jnp.int32)  # [N]

    # position of the i-th done per env: sort (t if done else T)
    t_idx = jnp.arange(T, dtype=jnp.int32)[:, None]
    done_pos = jnp.sort(jnp.where(done, t_idx, T), axis=0)  # [T, N]
    # start of segment e (e in [0, K)): 0 for e=0 else done_pos[e-1]+1
    starts = jnp.concatenate(
        [jnp.zeros((1, N), jnp.int32), done_pos[: K - 1] + 1], axis=0
    )  # [K, N]
    ends = done_pos[:K]  # [K, N] inclusive; == T when segment incomplete
    seg_complete = jnp.arange(K, dtype=jnp.int32)[:, None] < n_done[None, :]  # [K, N]
    seg_len = jnp.where(seg_complete, ends - starts + 1, 0)  # [K, N]
    pre_len = jnp.where(jnp.arange(K)[:, None] == 0, actor.carry_len[None, :], 0)
    full_len = seg_len + jnp.where(seg_complete, pre_len, 0)  # [K, N]

    # gather indices: for slot (e, n), target j -> carry[j] if j < pre,
    # else stream[starts + j - pre]
    j_idx = jnp.arange(Tcap, dtype=jnp.int32)[None, None, :]  # [1, 1, Tc]
    pre = pre_len[:, :, None]  # [K, N, 1]
    from_carry = j_idx < pre
    src_t = jnp.clip(starts[:, :, None] + j_idx - pre, 0, T - 1)  # [K, N, Tc]
    in_ep = (j_idx < full_len[:, :, None]) & seg_complete[:, :, None]

    env_ids = jnp.arange(N, dtype=jnp.int32)[None, :, None]  # [1, N, 1]

    def gather(stream_arr, carry_arr):
        # stream_arr: [T, N, ...]; carry_arr: [N, Tc, ...] -> [K, N, Tc, ...]
        if stream_arr.dtype == jnp.uint8:
            # The packed-obs stream is the bulk of the data; a dynamic gather
            # over the time axis lowers to the scalar core, while the same
            # selection as a one-hot contraction rides the MXU (exact:
            # uint8 <= 255 is exact in bf16 and the matmul accumulates in
            # f32 over 0/1 weights). See game/tpuops.py for the pattern.
            oh = (src_t[..., None] == jnp.arange(T, dtype=jnp.int32)).astype(
                jnp.bfloat16
            )  # [K, N, Tc, T]
            sm = stream_arr.reshape(T, N, -1).astype(jnp.bfloat16)
            s = jnp.einsum(
                "knjt,tnf->knjf", oh, sm, preferred_element_type=jnp.float32
            ).astype(jnp.uint8)
            s = s.reshape((K, N, Tcap) + stream_arr.shape[2:])
        else:
            s = stream_arr[src_t, env_ids]  # [K, N, Tc, ...]
        c = jnp.broadcast_to(carry_arr[None], (K,) + carry_arr.shape)  # [K,N,Tc,...]
        sel = from_carry.reshape(from_carry.shape + (1,) * (s.ndim - 3))
        mask = in_ep.reshape(in_ep.shape + (1,) * (s.ndim - 3))
        out = jnp.where(sel, c, s)
        return (out * mask.astype(out.dtype)) if out.dtype != jnp.uint8 else jnp.where(mask, out, 0)

    packed = gather(stream.packed, actor.carry_packed)  # [K, N, Tc, P, bytes]
    action = gather(stream.action, actor.carry_action)
    greedy = gather(stream.greedy, actor.carry_greedy)
    qa = gather(stream.qa, actor.carry_qa)
    reward = gather(stream.reward, actor.carry_reward)  # [K, N, Tc]
    tqa = (
        gather(stream.tqa, actor.carry_tqa) if stream.tqa is not None else None
    )

    # flatten slots env-major: slot id = n * K + e
    def flat(x):  # [K, N, ...] -> [N*K, ...]
        return jnp.swapaxes(x, 0, 1).reshape((N * K,) + x.shape[2:])

    valid = flat(seg_complete)
    episodes = AssembledEpisodes(
        packed=flat(packed),
        action=flat(action),
        greedy=flat(greedy),
        qa=flat(qa),
        reward=flat(reward),
        seq_len=flat(full_len).astype(jnp.float32),
        valid=valid,
        dropped=jnp.maximum(n_done - K, 0).sum(),
        score_sum=jnp.where(done, stream.score, 0).sum().astype(jnp.float32),
        num_completed=n_done.sum(),
        tqa=flat(tqa) if tqa is not None else None,
    )

    # ---- new carry: the unfinished tail (segment n_done) ----
    tail_start = jnp.where(
        n_done > 0,
        jnp.take_along_axis(done_pos, jnp.maximum(n_done - 1, 0)[None, :], axis=0)[0] + 1,
        jnp.zeros((N,), jnp.int32),
    )  # [N]; if n_done==0 the whole chunk continues the old carry
    tail_len = T - tail_start  # [N]

    jc = jnp.arange(Tcap, dtype=jnp.int32)[None, :]  # [1, Tc]
    # if n_done == 0: new carry = old carry extended by the whole stream
    old_pre = jnp.where(n_done > 0, 0, actor.carry_len)[:, None]  # [N, 1]
    new_len = jnp.minimum(old_pre[:, 0] + tail_len, Tcap)
    from_old = jc < old_pre
    src_tail = jnp.clip(tail_start[:, None] + jc - old_pre, 0, T - 1)  # [N, Tc]
    in_carry = jc < new_len[:, None]

    def carry_gather(stream_arr, carry_arr):
        if stream_arr.dtype == jnp.uint8:
            # Same one-hot time contraction as gather() above.
            oh = (src_tail[..., None] == jnp.arange(T, dtype=jnp.int32)).astype(
                jnp.bfloat16
            )  # [N, Tc, T]
            sm = stream_arr.reshape(T, N, -1).astype(jnp.bfloat16)
            s = jnp.einsum(
                "njt,tnf->njf", oh, sm, preferred_element_type=jnp.float32
            ).astype(jnp.uint8)
            s = s.reshape((N, Tcap) + stream_arr.shape[2:])
        else:
            s = stream_arr[src_tail, jnp.arange(N)[:, None]]  # [N, Tc, ...]
        c = carry_arr[:, : Tcap]
        sel = from_old.reshape(from_old.shape + (1,) * (s.ndim - 2))
        mask = in_carry.reshape(in_carry.shape + (1,) * (s.ndim - 2))
        out = jnp.where(sel, c, s)
        return jnp.where(mask, out, 0) if out.dtype == jnp.uint8 else out * mask.astype(out.dtype)

    actor = actor._replace(
        carry_packed=carry_gather(stream.packed, actor.carry_packed),
        carry_action=carry_gather(stream.action, actor.carry_action),
        carry_greedy=carry_gather(stream.greedy, actor.carry_greedy),
        carry_qa=carry_gather(stream.qa, actor.carry_qa),
        carry_reward=carry_gather(stream.reward, actor.carry_reward),
        carry_len=new_len.astype(jnp.int32),
        carry_tqa=(
            carry_gather(stream.tqa, actor.carry_tqa)
            if stream.tqa is not None
            else None
        ),
    )
    return actor, episodes


def split_players(ep: AssembledEpisodes) -> AssembledEpisodes:
    """IQL item topology: each slot becomes P independent per-player items
    (env-major, then player — matching runner.chunk_to_episodes)."""
    M, T, P = ep.action.shape

    def per_player(x):  # [M, T, P, ...] -> [M*P, T, 1, ...]
        x = jnp.swapaxes(x, 1, 2)  # [M, P, T, ...]
        return x.reshape((M * P, T, 1) + x.shape[3:])

    rep = lambda x: jnp.repeat(x, P, axis=0)
    return AssembledEpisodes(
        packed=per_player(ep.packed),
        action=per_player(ep.action),
        greedy=per_player(ep.greedy),
        qa=per_player(ep.qa),
        reward=rep(ep.reward),
        seq_len=rep(ep.seq_len),
        valid=rep(ep.valid),
        dropped=ep.dropped,
        score_sum=ep.score_sum,
        num_completed=ep.num_completed,
        tqa=per_player(ep.tqa) if ep.tqa is not None else None,
    )


def exact_episode_priorities(
    params: AgentParams,
    agent_cfg: AgentConfig,
    replay_cfg: ReplayConfig,
    episodes: AssembledEpisodes,
    n_step_r: jnp.ndarray,
    bootstrap: jnp.ndarray,
) -> jnp.ndarray:
    """Reference-exact initial priorities for continuous-mode episodes
    (--continuous_exact_priority): the online-target TD error of
    compute_priority (reference r2d2.py:344-348), via
    compute_priority_from_rollout — a target-net zero-h0 full-sequence
    forward over the assembled slots; the online side reuses the rollout's
    own Q values. Costs one extra target forward over [T, M] rows per chunk
    (invalid slots included — their priorities are discarded by add_packed's
    valid mask)."""
    from hanabi_sad_tpu.replay.bitpack import unpack_bits

    M, T, Pi = episodes.action.shape
    bits = unpack_bits(episodes.packed, replay_cfg.bits_per_step)  # [M,T,Pi,bits]
    F, A = replay_cfg.obs_dim, replay_cfg.num_actions
    tm = lambda x: jnp.swapaxes(x, 0, 1)  # [M, T, ...] -> [T, M, ...]
    seq_len = jnp.maximum(episodes.seq_len, 1.0)
    t_idx = jnp.arange(T, dtype=jnp.float32)[:, None]
    batch = r2d2_agent.Batch(
        priv_s=tm(bits[..., :F]),
        legal_move=tm(bits[..., F : F + A]),
        action=tm(episodes.action),
        own_hand=tm(bits[..., F + A :]),
        reward=tm(n_step_r),
        terminal=(t_idx >= (seq_len[None, :] - 1)).astype(jnp.float32),
        bootstrap=tm(bootstrap),
        seq_len=seq_len,
    )
    qa = episodes.qa.sum(-1) if agent_cfg.vdn else episodes.qa[..., 0]  # [M, T]
    return r2d2_agent.compute_priority_from_rollout(
        params, agent_cfg, batch, tm(qa), tm(episodes.greedy)
    )


def fused_exact_priorities(
    episodes: AssembledEpisodes,
    agent_cfg: AgentConfig,
    n_step_r: jnp.ndarray,
    bootstrap: jnp.ndarray,
) -> jnp.ndarray:
    """Exact online-target initial priorities from the rollout's own target-Q
    stream (episodes.tqa, recorded by act_with_target) — the same quantity
    exact_episode_priorities computes with a separate full-sequence target
    forward, at zero extra forward cost. See
    r2d2_agent.act_with_target for the equivalence argument (and the one
    target-sync-boundary divergence)."""
    M, T = episodes.reward.shape
    n = agent_cfg.multi_step
    gamma = agent_cfg.gamma
    seq_len = episodes.seq_len

    tqa = episodes.tqa.sum(-1) if agent_cfg.vdn else episodes.tqa[..., 0]  # [M, T]
    tqa_next = jnp.concatenate([tqa[:, n:], jnp.zeros((M, n), tqa.dtype)], axis=1)
    target = n_step_r + bootstrap * (gamma ** n) * tqa_next
    qa = episodes.qa.sum(-1) if agent_cfg.vdn else episodes.qa[..., 0]
    t_idx = jnp.arange(T, dtype=jnp.float32)[None, :]
    mask = (t_idx < seq_len[:, None]).astype(jnp.float32)
    err = jnp.abs(target - qa) * mask
    if agent_cfg.uniform_priority:
        return jnp.ones((M,), jnp.float32)
    p_mean = err.sum(1) / jnp.maximum(seq_len, 1.0)
    p_max = err.max(1)
    return agent_cfg.eta * p_max + (1 - agent_cfg.eta) * p_mean


def episode_priorities(
    episodes: AssembledEpisodes, agent_cfg: AgentConfig
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(n_step_reward [M, T], bootstrap [M, T], priority [M]) from the
    assembled slots using the rollout's online Q values (see module
    docstring)."""
    M, T = episodes.reward.shape
    n = agent_cfg.multi_step
    gamma = agent_cfg.gamma
    seq_len = episodes.seq_len

    r = episodes.reward
    padded = jnp.concatenate([r, jnp.zeros((M, n), r.dtype)], axis=1)
    n_step_r = jnp.zeros_like(r)
    for k in range(n):
        n_step_r = n_step_r + (gamma ** k) * padded[:, k : k + T]
    t_idx = jnp.arange(T, dtype=jnp.float32)[None, :]
    bootstrap = (t_idx < seq_len[:, None] - n).astype(jnp.float32)

    qa = episodes.qa.sum(-1) if agent_cfg.vdn else episodes.qa[..., 0]  # [M, T]
    qa_next = jnp.concatenate([qa[:, n:], jnp.zeros((M, n), qa.dtype)], axis=1)
    target = n_step_r + bootstrap * (gamma ** n) * qa_next
    mask = (t_idx < seq_len[:, None]).astype(jnp.float32)
    err = jnp.abs(target - qa) * mask
    if agent_cfg.uniform_priority:
        prio = jnp.ones((M,), jnp.float32)
    else:
        p_mean = err.sum(1) / jnp.maximum(seq_len, 1.0)
        p_max = err.max(1)
        prio = agent_cfg.eta * p_max + (1 - agent_cfg.eta) * p_mean
    return n_step_r, bootstrap, prio
