"""The learner: one jitted SPMD program per training chunk.

Replaces the reference's learner hot loop (selfplay.py:208-241) plus the
entire asynchronous actor machinery around it. One `train_chunk` call:

  1. rolls out `num_envs` complete (padded) episodes of epsilon-greedy
     self-play with the current online params — the actor side;
  2. computes their initial priorities (the actor's compute_priority calls,
     r2d2_actor.h:154-156) and ring-writes them into the device replay;
  3. runs `num_update_per_chunk` gradient updates, each sampling the replay,
     applying the IS-weighted Huber TD + aux loss, clipping the global grad
     norm, stepping Adam, and scattering updated priorities back;
  4. syncs the target net whenever the global update counter crosses
     `num_update_between_sync` (selfplay.py:210-211).

Weight sync to actors (BatchRunner::updateModel, selfplay.py:212-213) is
implicit: the next chunk's rollout reads the freshly updated params — actor
staleness is bounded by num_update_per_chunk instead of actor_sync_freq.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from hanabi_sad_tpu.agent import r2d2_agent
from hanabi_sad_tpu.agent.r2d2_agent import AgentConfig, AgentParams
from hanabi_sad_tpu.game.config import GameConfig
from hanabi_sad_tpu.game.env import EnvConfig
from hanabi_sad_tpu.models.r2d2_net import NetConfig
from hanabi_sad_tpu.replay import prioritized as replay_mod
from hanabi_sad_tpu.replay.prioritized import ReplayConfig, ReplayState
from hanabi_sad_tpu.rollout import continuous, runner
from hanabi_sad_tpu.train.config import TrainConfig, generate_explore_eps


class TrainState(NamedTuple):
    params: AgentParams
    opt_state: optax.OptState
    replay: ReplayState
    num_update: jnp.ndarray  # i32 global gradient-step counter
    env_key: jax.Array
    sample_key: jax.Array
    # Persistent actor state for rollout_mode="continuous"; None in aligned
    # mode (a None leaf is static pytree structure, so the two modes simply
    # compile different programs).
    actor: object = None


@dataclasses.dataclass(frozen=True)
class Setup:
    """All static configs derived from a TrainConfig."""

    train: TrainConfig
    env: EnvConfig
    eval_env: EnvConfig
    agent: AgentConfig
    eval_agent: AgentConfig  # vdn=False clone for evaluation (selfplay.py:195)
    replay: ReplayConfig

    @property
    def players_per_item(self) -> int:
        return self.train.num_player if self.train.vdn else 1

    @property
    def items_per_chunk(self) -> int:
        mult = 1 if self.train.vdn else self.train.num_player
        return self.train.num_envs * mult


def make_setup(cfg: TrainConfig) -> Setup:
    cfg = cfg.derived()
    game = GameConfig(players=cfg.num_player, hand_size=cfg.hand_size, bomb=cfg.train_bomb)
    eps_list = generate_explore_eps(cfg.act_base_eps, cfg.act_eps_alpha, cfg.num_eps)
    env = EnvConfig(
        game=game,
        eps_list=eps_list,
        max_len=cfg.max_len,
        sad=cfg.sad,
        shuffle_color=cfg.shuffle_color,
        shuffle_obs=cfg.shuffle_obs,
    )
    eval_env = EnvConfig(
        game=GameConfig(players=cfg.num_player, hand_size=cfg.hand_size, bomb=cfg.eval_bomb),
        eps_list=(0.0,),
        max_len=-1,
        sad=cfg.sad,
        shuffle_color=False,
        # Unlike shuffle_color (eval-off is the reference's explicit choice,
        # eval.py:29-40), shuffle_obs defines the observation distribution the
        # policy is trained for — eval must match it.
        shuffle_obs=cfg.shuffle_obs,
    )
    net = NetConfig(
        in_dim=env.feature_size,
        hid_dim=cfg.rnn_hid_dim,
        out_dim=game.num_actions,
        num_lstm_layer=cfg.num_lstm_layer,
        hand_size=cfg.hand_size,
        num_fc_layer=cfg.num_fc_layer,
        skip_connect=cfg.skip_connect,
        compute_dtype=cfg.compute_dtype,
        seq_unroll=cfg.net_seq_unroll,
    )
    agent = AgentConfig(
        net=net,
        vdn=cfg.vdn,
        multi_step=cfg.multi_step,
        gamma=cfg.gamma,
        eta=cfg.eta,
        stacked_td=cfg.stacked_td,
    )
    eval_agent = dataclasses.replace(agent, vdn=False)
    replay = ReplayConfig(
        capacity=cfg.replay_buffer_size,
        seq_len=cfg.max_len,
        num_player=cfg.num_player if cfg.vdn else 1,
        obs_dim=env.feature_size,
        num_actions=game.num_actions,
        hand_size=cfg.hand_size,
        alpha=cfg.priority_exponent,
        beta=cfg.priority_weight,
    )
    return Setup(
        train=cfg, env=env, eval_env=eval_env, agent=agent, eval_agent=eval_agent,
        replay=replay,
    )


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """clip-then-Adam, matching clip_grad_norm_ + torch.optim.Adam
    (selfplay.py:149, 231-234). With lr_final > 0 the lr decays linearly
    from cfg.lr to cfg.lr_final over cfg.lr_decay_updates gradient steps
    (default: the full run), then holds — the opt_state carries the step
    count, so full-resume checkpoints continue the schedule."""
    # Always build the lr as a schedule (constant when lr_final == 0) so the
    # optimizer state structure is invariant to the decay flags: a full-resume
    # checkpoint saved with a decay schedule restores cleanly into a
    # constant-lr run and vice versa (optax float lr is stateless while a
    # schedule carries ScaleByScheduleState — mixing them broke resume,
    # found round 4 when giving the finished flagship a constant-lr leg).
    lr = optax.constant_schedule(cfg.lr)
    if cfg.lr_final > 0:
        # Default horizon = the actual number of gradient updates the run
        # performs: each epoch runs (epoch_len // num_update_per_chunk) full
        # chunks of num_update_per_chunk updates (selfplay._train_loop), so
        # epoch_len itself overcounts when it isn't a chunk multiple (e.g.
        # 992 vs 1000 with defaults) and the run would end above lr_final.
        updates_per_epoch = (
            cfg.epoch_len // cfg.num_update_per_chunk
        ) * cfg.num_update_per_chunk
        steps = cfg.lr_decay_updates or cfg.num_epoch * max(
            updates_per_epoch, cfg.num_update_per_chunk
        )
        lr = optax.linear_schedule(cfg.lr, cfg.lr_final, steps)
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adam(lr, eps=cfg.adam_eps),
    )


def init_train_state(setup: Setup, key: jax.Array) -> TrainState:
    k_net, k_env, k_sample, k_actor = jax.random.split(key, 4)
    params = r2d2_agent.init_agent(k_net, setup.agent)
    opt_state = make_optimizer(setup.train).init(params.online)
    actor = None
    if setup.train.rollout_mode == "continuous":
        keys = jax.random.split(k_actor, setup.train.num_envs)
        actor = continuous.init_actor_state(
            setup.agent, setup.env, setup.replay, keys,
            with_target_qa=(
                setup.train.continuous_exact_priority
                and setup.train.exact_priority_in_rollout
            ),
        )
    return TrainState(
        params=params,
        opt_state=opt_state,
        replay=replay_mod.init_replay(setup.replay),
        num_update=jnp.asarray(0, jnp.int32),
        env_key=k_env,
        sample_key=k_sample,
        actor=actor,
    )


# --------------------------------------------------------------------------


def collect_chunk(
    setup: Setup, params: AgentParams, env_key: jax.Array
) -> Tuple[replay_mod.EpisodeBatch, jnp.ndarray, Dict[str, jnp.ndarray], jax.Array]:
    """Roll one chunk of full episodes, build replay items + priorities."""
    cfg = setup.train
    env_key, k_envs, k_act = jax.random.split(env_key, 3)
    keys = jax.random.split(k_envs, cfg.num_envs)
    out = runner.run_episode_chunk(
        params, setup.agent, setup.env, keys, k_act, cfg.max_len,
        unroll=cfg.rollout_unroll,
    )
    episodes = runner.chunk_to_episodes(out, setup.agent)
    batch = runner.episodes_to_batch(episodes)
    online_qa, greedy_a = runner.rollout_priority_inputs(out, setup.agent)
    priority = r2d2_agent.compute_priority_from_rollout(
        params, setup.agent, batch, online_qa, greedy_a
    )
    # Fraction of submitted actions that deviated from greedy on live frames —
    # a working version of the reference's dead exploration-ratio diagnostics
    # (utils.py:174-215; its env counters aren't exposed in the snapshot).
    prev_done = jnp.cumsum(out.done, axis=0) - out.done.astype(jnp.int32) > 0  # [T, N]
    live = (~prev_done)[..., None]  # [T, N, 1] broadcast over players
    deviated = (out.action != out.greedy_a) & live
    stats = {
        "chunk_score": out.last_score.astype(jnp.float32).mean(),
        "chunk_len": episodes.seq_len.mean(),
        "chunk_frames": episodes.seq_len.sum(),
        "explore_ratio": deviated.sum() / jnp.maximum(live.sum() * out.action.shape[-1], 1),
    }
    return episodes, priority, stats, env_key


def sgd_update(
    setup: Setup,
    optimizer: optax.GradientTransformation,
    state: TrainState,
    presampled=None,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One prioritized-replay gradient step (selfplay.py:208-241).

    `presampled` is None (sample here, from the live priority state) or a
    (ReplayRows, is_weight, idx) triple drawn upfront from the chunk-start
    priority snapshot (snapshot_sampling; see _train_chunk_impl)."""
    cfg = setup.train

    # Target sync on the global counter (selfplay.py:210-211).
    do_sync = state.num_update % cfg.num_update_between_sync == 0
    params = AgentParams(
        online=state.params.online,
        target=jax.tree_util.tree_map(
            lambda o, t: jnp.where(do_sync, o, t), state.params.online, state.params.target
        ),
    )

    if presampled is None:
        sample_key, k = jax.random.split(state.sample_key)
        batch, is_weight, idx = replay_mod.sample(
            state.replay, setup.replay, k, cfg.batchsize
        )
    else:
        # sample_key was advanced for the whole chunk by the caller.
        sample_key = state.sample_key
        rows, is_weight, idx = presampled
        batch = replay_mod.rows_to_batch(setup.replay, rows)

    def loss_fn(online):
        p = AgentParams(online=online, target=params.target)
        per_ep_loss, priority, stats = r2d2_agent.loss(
            p, setup.agent, batch, cfg.pred_weight
        )
        return (per_ep_loss * is_weight).mean(), (priority, stats)

    (loss_val, (priority, stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params.online
    )
    grad_norm = optax.global_norm(grads)
    updates, opt_state = optimizer.update(grads, state.opt_state, params.online)
    online = optax.apply_updates(params.online, updates)

    agg = r2d2_agent.aggregate_priority(priority, batch.seq_len, cfg.eta)
    replay = replay_mod.update_priority(state.replay, setup.replay, idx, agg)

    new_state = state._replace(
        params=AgentParams(online=online, target=params.target),
        opt_state=opt_state,
        replay=replay,
        num_update=state.num_update + 1,
        sample_key=sample_key,
    )
    metrics = {"loss": loss_val, "grad_norm": grad_norm}
    metrics.update(stats)
    return new_state, metrics


def collect_into_replay(setup: Setup, state: TrainState):
    """One collection pass in the configured rollout mode; returns the state
    with fresh episodes in the replay, plus chunk stats."""
    cfg = setup.train
    if cfg.rollout_mode == "continuous":
        env_key, k_act = jax.random.split(state.env_key)
        actor, stream = continuous.run_continuous_chunk(
            state.params, setup.agent, setup.env, state.actor, k_act, cfg.max_len,
            unroll=cfg.rollout_unroll,
        )
        actor, episodes = continuous.assemble_episodes(
            actor, stream, cfg.slots_per_env
        )
        if not cfg.vdn:
            episodes = continuous.split_players(episodes)
        n_step_r, bootstrap, priority = continuous.episode_priorities(
            episodes, setup.agent
        )
        if cfg.continuous_exact_priority:
            if episodes.tqa is not None:
                priority = continuous.fused_exact_priorities(
                    episodes, setup.agent, n_step_r, bootstrap
                )
            else:
                priority = continuous.exact_episode_priorities(
                    state.params, setup.agent, setup.replay, episodes, n_step_r,
                    bootstrap,
                )
        replay = replay_mod.add_packed(
            state.replay, setup.replay, episodes.packed, episodes.action,
            n_step_r, bootstrap, episodes.seq_len, priority, valid=episodes.valid,
        )
        frames = jnp.where(episodes.valid, episodes.seq_len, 0.0).sum()
        n_completed = jnp.maximum(episodes.num_completed.astype(jnp.float32), 1.0)
        chunk_stats = {
            "chunk_score": episodes.score_sum / n_completed,
            "chunk_len": frames / jnp.maximum(episodes.valid.sum(), 1),
            "chunk_frames": frames,
            "dropped_episodes": episodes.dropped.astype(jnp.float32),
            # every continuous-mode frame is live (see aligned-mode comment)
            "explore_ratio": (stream.action != stream.greedy).mean(),
        }
        return state._replace(replay=replay, env_key=env_key, actor=actor), chunk_stats

    episodes, priority, chunk_stats, env_key = collect_chunk(
        setup, state.params, state.env_key
    )
    replay = replay_mod.add(state.replay, setup.replay, episodes, priority)
    return state._replace(replay=replay, env_key=env_key), chunk_stats


def _train_chunk_impl(
    setup: Setup, optimizer: optax.GradientTransformation, state: TrainState
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    cfg = setup.train
    state, chunk_stats = collect_into_replay(setup, state)

    if cfg.snapshot_sampling:
        # Draw ALL of the chunk's batches from the post-collect priority
        # snapshot in one parallel pass (indices, IS weights, and the raw
        # bitpacked row gather), then scan only the gradient updates. This
        # hoists the O(capacity) weight prefix-sum and the HBM episode
        # gather out of the Adam-serial scan; the learner's priority
        # feedback still scatters into the replay every update, it is just
        # not visible to the chunk's own later batches — the reference
        # prefetcher's exact semantics (prioritized_replay.h:216-239, with
        # prefetch >= num_update_per_chunk). The per-batch PRNG key chain is
        # the same one the sequential path would have consumed, so the two
        # modes are bit-identical at num_update_per_chunk=1.
        sk = state.sample_key
        per_batch = []
        for _ in range(cfg.num_update_per_chunk):
            sk, k = jax.random.split(sk)
            per_batch.append(k)
        keys = jnp.stack(per_batch)
        idx, is_w = replay_mod.sample_indices(
            state.replay, setup.replay, keys, cfg.batchsize
        )  # [U, B]
        rows = replay_mod.gather_rows(state.replay, idx)  # [U, B, ...]
        state = state._replace(sample_key=sk)

        def body(s, x):
            rows_x, w_x, i_x = x
            return sgd_update(setup, optimizer, s, presampled=(rows_x, w_x, i_x))

        state, metrics = jax.lax.scan(body, state, (rows, is_w, idx))
        out = {k: v.mean() for k, v in metrics.items()}
        out.update(chunk_stats)
        return state, out

    def body(s, _):
        return sgd_update(setup, optimizer, s)

    state, metrics = jax.lax.scan(body, state, None, length=cfg.num_update_per_chunk)
    out = {k: v.mean() for k, v in metrics.items()}
    out.update(chunk_stats)
    return state, out


def make_train_chunk(setup: Setup):
    """Build the jitted chunk step. Donates the TrainState so the replay
    buffer updates in place (no 2x HBM)."""
    optimizer = make_optimizer(setup.train)
    fn = functools.partial(_train_chunk_impl, setup, optimizer)
    return jax.jit(fn, donate_argnums=(0,))


def make_collect_only(setup: Setup):
    """Jitted warm-up step: collect + add, no gradient updates
    (the burn-in loop, selfplay.py:180-182)."""

    def impl(state: TrainState) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        return collect_into_replay(setup, state)

    return jax.jit(impl, donate_argnums=(0,))


def make_evaluator(setup: Setup, num_games: int):
    """Jitted greedy self-play evaluation (eval.py:19-66). Returns
    (mean_score, perfect_rate, scores)."""
    P = setup.train.num_player

    def impl(params: AgentParams, seed: jnp.ndarray):
        # per-game keys derived from the epoch's eval seed (selfplay.py:255)
        keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(seed), i))(
            jnp.arange(num_games)
        )
        scores, done = runner.eval_rollout(
            [params] * P,
            [setup.eval_agent] * P,
            setup.eval_env,
            keys,
            num_steps=setup.train.eval_max_steps,
        )
        scores = scores.astype(jnp.float32)
        return scores.mean(), (scores == setup.env.game.max_score).mean(), scores, done

    jitted = jax.jit(impl)

    def run(params: AgentParams, seed: jnp.ndarray):
        mean, perfect, scores, done = jitted(params, seed)
        # Eval games have no forced-termination forfeit (maxLen=-1,
        # eval.py:29-40): eval_max_steps must cover the longest possible game
        # or the epoch eval would silently score truncated games. A hard
        # raise (not assert) so `python -O` can't strip the guard.
        if not bool(done.all()):
            raise RuntimeError(
                f"eval_max_steps={setup.train.eval_max_steps} truncated an "
                "eval game; raise it to cover the longest possible game"
            )
        return mean, perfect, scores

    return run
