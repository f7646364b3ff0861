"""Phase breakdown of the production train chunk (learner side).

bench_rollout_parts.py showed the continuous rollout scan itself is ~48 ms
at flagship shapes (act serial floor 37 ms, reset machinery 0.3 ms), yet the
full chunk runs ~150-240 ms — so the remaining time is in assembly, initial
priorities (the exact-priority target forward), replay add/sample, and the
16-gradient-update scan. This times jitted sub-programs that accumulate the
phases so the round-4 perf work attacks the dominant term:

  rollout    run_continuous_chunk only
  +assemble  rollout + assemble_episodes
  +prio      ... + episode_priorities (+ exact target forward when on)
  +add       ... + replay add_packed       (== collect_into_replay)
  chunk      the full production train chunk (collect + 16 updates)
  updates    chunk - collect (derived)

Run on the real chip:
  PYTHONPATH=.:$PYTHONPATH python -u scripts/bench_chunk_parts.py [--exact 0|1]
(append — don't overwrite — PYTHONPATH: some deployments deliver the JAX
PJRT plugin through it)
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from hanabi_sad_tpu.replay import prioritized as replay_mod
from hanabi_sad_tpu.rollout import continuous
from hanabi_sad_tpu.train import learner
from hanabi_sad_tpu.train.config import make_config


import numpy as np


def _materialize(out):
    # Over the axon tunnel block_until_ready alone can return before the
    # device work completes (see .claude/skills/verify); force a host read.
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(out)]


def timed(fn, *args, reps=5):
    # salt defeats any same-input result caching in the remote backend
    _materialize(fn(jnp.asarray(0, jnp.uint32), *args))
    best = float("inf")
    for i in range(reps):
        salt = jnp.asarray(i + 1, jnp.uint32)
        t0 = time.perf_counter()
        _materialize(fn(salt, *args))
        best = min(best, time.perf_counter() - t0)
    return best


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--exact", type=int, default=1)
    p.add_argument("--fused", type=int, default=0)  # exact_priority_in_rollout
    p.add_argument("--stacked", type=int, default=0)  # stacked_td
    p.add_argument("--snapshot", type=int, default=0)  # snapshot_sampling
    p.add_argument("--num_envs", type=int, default=1024)
    p.add_argument("--updates", type=int, default=16)
    args = p.parse_args(argv)

    cfg = make_config(
        "sad_2p",
        pred_weight=0.25,
        save_dir="/tmp/bench_chunk",
        compute_dtype="bfloat16",
        num_envs=args.num_envs,
        num_update_per_chunk=args.updates,
        replay_buffer_size=2 ** 15,
        burn_in_frames=1,
        continuous_exact_priority=bool(args.exact),
        exact_priority_in_rollout=bool(args.fused),
        stacked_td=bool(args.stacked),
        snapshot_sampling=bool(args.snapshot),
    )
    setup = learner.make_setup(cfg)
    cfg = setup.train
    state = learner.init_train_state(setup, jax.random.PRNGKey(0))
    # warm the replay so sampling inside the chunk is realistic
    collect = learner.make_collect_only(setup)
    for _ in range(4):
        state, _ = collect(state)
    state = jax.block_until_ready(state)

    def rollout_only(salt, state):
        state = state._replace(env_key=jax.random.fold_in(state.env_key, salt))
        env_key, k_act = jax.random.split(state.env_key)
        actor, stream = continuous.run_continuous_chunk(
            state.params, setup.agent, setup.env, state.actor, k_act, cfg.max_len
        )
        return stream.reward.sum(), stream.action.sum()

    def upto_assemble(salt, state):
        state = state._replace(env_key=jax.random.fold_in(state.env_key, salt))
        env_key, k_act = jax.random.split(state.env_key)
        actor, stream = continuous.run_continuous_chunk(
            state.params, setup.agent, setup.env, state.actor, k_act, cfg.max_len
        )
        actor, eps = continuous.assemble_episodes(actor, stream, cfg.slots_per_env)
        return eps.packed.sum(), eps.seq_len.sum(), actor.carry_len.sum()

    def upto_prio(salt, state):
        state = state._replace(env_key=jax.random.fold_in(state.env_key, salt))
        env_key, k_act = jax.random.split(state.env_key)
        actor, stream = continuous.run_continuous_chunk(
            state.params, setup.agent, setup.env, state.actor, k_act, cfg.max_len
        )
        actor, eps = continuous.assemble_episodes(actor, stream, cfg.slots_per_env)
        n_step_r, bootstrap, prio = continuous.episode_priorities(eps, setup.agent)
        if cfg.continuous_exact_priority:
            prio = continuous.exact_episode_priorities(
                state.params, setup.agent, setup.replay, eps, n_step_r, bootstrap
            )
        return prio.sum(), eps.packed.sum()

    def upto_add(salt, state):
        state = state._replace(env_key=jax.random.fold_in(state.env_key, salt))
        new_state, stats = learner.collect_into_replay(setup, state)
        return stats["chunk_score"], new_state.replay.num_add

    chunk = learner.make_train_chunk(setup)

    r = {}
    r["rollout"] = timed(jax.jit(rollout_only), state)
    r["+assemble"] = timed(jax.jit(upto_assemble), state)
    r["+prio"] = timed(jax.jit(upto_prio), state)
    r["+add"] = timed(jax.jit(upto_add), state)

    # full chunk donates its input; measure on fresh copies, timing only the
    # chunk dispatch + a scalar metric read (not the state copy).
    s = jax.tree_util.tree_map(jnp.copy, state)
    s2, m = chunk(s)
    _materialize(m["loss"])
    best = float("inf")
    for _ in range(5):
        s = jax.tree_util.tree_map(jnp.copy, state)
        _materialize(s.num_update)  # fence the copies
        t0 = time.perf_counter()
        s2, m = chunk(s)
        _materialize(m["loss"])
        best = min(best, time.perf_counter() - t0)
    r["chunk"] = best

    for k, v in r.items():
        print(f"{k:10s} {v * 1e3:8.1f} ms")
    print(f"{'updates':10s} {(r['chunk'] - r['+add']) * 1e3:8.1f} ms (derived)")
    print(
        f"exact={cfg.continuous_exact_priority} "
        f"snapshot={cfg.snapshot_sampling} "
        f"fused={cfg.exact_priority_in_rollout} stacked={cfg.stacked_td} "
        f"envs={cfg.num_envs} updates={cfg.num_update_per_chunk} "
        f"batch={cfg.batchsize}"
    )


if __name__ == "__main__":
    main()
