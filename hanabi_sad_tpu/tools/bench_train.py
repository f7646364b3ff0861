"""Training-throughput microbenchmark.

Measures the steady-state jitted train chunk (rollout with the model in the
loop + replay + learner updates) and reports actor/learner frame rates — the
numbers the reference's Tachometer prints (utils.py:218-251), measured here
for the whole SPMD program.

  python -m hanabi_sad_tpu.tools.bench_train --num_envs 1024 --updates 16 \
      --compute_dtype bfloat16
"""

from __future__ import annotations

import argparse
import time

import jax
import numpy as np

from hanabi_sad_tpu.train import learner
from hanabi_sad_tpu.train.config import make_config


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", default="sad_2p")
    parser.add_argument("--num_envs", type=int, default=1024)
    parser.add_argument("--updates", type=int, default=16)
    parser.add_argument("--batchsize", type=int, default=128)
    parser.add_argument("--replay_buffer_size", type=int, default=2 ** 15)
    parser.add_argument("--compute_dtype", default="float32")
    parser.add_argument("--rollout_unroll", type=int, default=1)
    parser.add_argument("--net_seq_unroll", type=int, default=1)
    parser.add_argument("--reps", type=int, default=3)
    args = parser.parse_args(argv)
    # After parse_args so `--help` neither imports jax nor creates cache dirs.
    from hanabi_sad_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    cfg = make_config(
        args.preset,
        save_dir="/tmp/bench_train",
        num_envs=args.num_envs,
        num_update_per_chunk=args.updates,
        batchsize=args.batchsize,
        replay_buffer_size=args.replay_buffer_size,
        burn_in_frames=1,
        compute_dtype=args.compute_dtype,
        rollout_unroll=args.rollout_unroll,
        net_seq_unroll=args.net_seq_unroll,
    )
    setup = learner.make_setup(cfg)
    cfg = setup.train
    print(
        f"devices={jax.devices()} envs={cfg.num_envs} updates/chunk="
        f"{cfg.num_update_per_chunk} batch={cfg.batchsize} dtype={cfg.compute_dtype}"
    )

    state = learner.init_train_state(setup, jax.random.PRNGKey(0))
    collect = learner.make_collect_only(setup)
    chunk = learner.make_train_chunk(setup)

    t0 = time.perf_counter()
    state, _ = collect(state)
    state, metrics = chunk(state)
    # full host materialization to defeat async dispatch
    first = {k: float(v) for k, v in metrics.items()}
    print(f"compile+first: {time.perf_counter() - t0:.1f}s loss={first['loss']:.3f}")

    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        state, metrics = chunk(state)
        frames = float(metrics["chunk_frames"])  # host sync
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    env_steps = frames  # real env steps generated per chunk (per-env seq lens)
    padded_steps = cfg.num_envs * cfg.max_len
    train_frames = cfg.num_update_per_chunk * cfg.batchsize * cfg.max_len

    print(
        f"steady chunk: {dt * 1000:.0f} ms | "
        f"{env_steps / dt:,.0f} env-steps/s ({padded_steps / dt:,.0f} padded) | "
        f"{train_frames / dt:,.0f} train frames/s | "
        f"{cfg.num_update_per_chunk / dt:.1f} grad updates/s"
    )
    return dt, env_steps / dt


if __name__ == "__main__":
    main()
