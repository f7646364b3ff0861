"""Self-play training driver.

The `selfplay.py` of this framework (reference pyhanabi/selfplay.py:89-281):
flags -> config, burn-in, epoch loop of jitted train chunks, per-epoch greedy
evaluation, top-k checkpointing, throughput/loss telemetry. All compute runs
on-device; the host loop only sequences chunks and logs.

Run:  python -m hanabi_sad_tpu.train.selfplay --preset dev --save_dir exps/dev
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import pprint
import sys
import time

# Multi-host (DCN) scale-out: jax.distributed.initialize() must run before
# anything initializes the XLA backend, so handle the flag before the jax
# imports below (parallel/mesh.py docstring; the reference is strictly
# single-machine, SURVEY.md §2.16). On pod slices with a standard launcher
# the no-arg form autodetects coordinator/process topology.
def _multihost_requested(argv) -> bool:
    for i, a in enumerate(argv):
        if a == "--multihost":
            nxt = argv[i + 1] if i + 1 < len(argv) else "1"
            return nxt not in ("0", "false", "False")
        if a.startswith("--multihost="):
            return a.split("=", 1)[1] not in ("0", "false", "False")
    return False


if __name__ == "__main__" and _multihost_requested(sys.argv):
    # Importing the package is backend-free (see replay/bitpack.py _powers),
    # so the shared helper can run here, before the jax-touching imports below.
    from hanabi_sad_tpu.parallel import initialize_multihost

    initialize_multihost()

import jax
import numpy as np

from hanabi_sad_tpu.train import checkpoint as ckpt
from hanabi_sad_tpu.train import learner
from hanabi_sad_tpu.train.config import PRESETS, TrainConfig, make_config
from hanabi_sad_tpu.utils import (
    Logger,
    MultiCounter,
    Stopwatch,
    Tachometer,
    TopkSaver,
    enable_compilation_cache,
)


def parse_args(argv=None) -> TrainConfig:
    parser = argparse.ArgumentParser(description="train dqn on hanabi (TPU)")
    parser.add_argument("--preset", type=str, default=None, choices=sorted(PRESETS))
    defaults = TrainConfig()
    for f in dataclasses.fields(TrainConfig):
        if f.type == "bool" or isinstance(getattr(defaults, f.name), bool):
            parser.add_argument(f"--{f.name}", type=int, default=None)
        else:
            parser.add_argument(
                f"--{f.name}", type=type(getattr(defaults, f.name)), default=None
            )
    args = parser.parse_args(argv)
    overrides = {
        f.name: getattr(args, f.name)
        for f in dataclasses.fields(TrainConfig)
        if getattr(args, f.name) is not None
    }
    for k, v in overrides.items():
        if isinstance(getattr(defaults, k), bool):
            overrides[k] = bool(v)
    return make_config(args.preset, **overrides)


def train(cfg: TrainConfig, *, max_chunks: int = 0) -> dict:
    """Run training. max_chunks > 0 truncates (for smoke tests). Returns a
    summary dict of the final state."""
    cache = enable_compilation_cache()
    if cache:
        print(f"compilation cache: {cache}")
    os.makedirs(cfg.save_dir, exist_ok=True)
    logger = Logger(os.path.join(cfg.save_dir, "train.log"))
    stdout = sys.stdout
    sys.stdout = logger
    try:
        return _train_impl(cfg, max_chunks=max_chunks)
    finally:
        sys.stdout = stdout
        logger.close()


def _train_impl(cfg: TrainConfig, max_chunks: int) -> dict:
    if cfg.multihost:
        # jax.distributed.initialize() already ran in the pre-import guard at
        # the top of this file (it must precede XLA backend init); when train()
        # is called as a library the caller owns initialization.
        print(
            f"multihost: process {jax.process_index()}/{jax.process_count()}, "
            f"{jax.local_device_count()} local of {jax.device_count()} devices"
        )
    pprint.pprint(dataclasses.asdict(cfg))
    saver = TopkSaver(cfg.save_dir, 5)

    setup = learner.make_setup(cfg)
    cfg = setup.train  # post-derived (VDN divisors)
    print(
        f"devices: {jax.devices()}; feature_size={setup.env.feature_size}, "
        f"actions={setup.env.game.num_actions}, replay items/chunk={setup.items_per_chunk}, "
        f"replay ratio={cfg.num_update_per_chunk * cfg.batchsize / setup.items_per_chunk:.2f}"
    )

    state = learner.init_train_state(setup, jax.random.PRNGKey(cfg.seed))

    # Multi-chip: shard envs/replay over a data mesh, replicate params; XLA
    # inserts the gradient all-reduce over ICI. Single-device runs skip this.
    mesh = None
    if jax.device_count() > 1 and cfg.num_envs % jax.device_count() == 0:
        from hanabi_sad_tpu.parallel import make_mesh, shard_train_state

        mesh = make_mesh()
        state = shard_train_state(state, mesh)
        print(f"sharding over {jax.device_count()} devices (data axis)")

    if cfg.load_model:
        print("*****loading pretrained model*****")
        payload = ckpt.load(cfg.load_model)
        if payload.get("kind") == "train_state":
            # Full resume: params + optimizer + counters + PRNG keys — the
            # capability the reference lacks (weights-only .pthw resume,
            # SURVEY.md §5). Replay refills through normal collection.
            state = ckpt.restore_train_state(payload, state)
            print(f"resumed at update {int(state.num_update)}")
        else:
            params = ckpt.load_params_into(payload, state.params)
            state = state._replace(params=params)
        print("*****done*****")

    import contextlib

    mesh_scope = mesh if mesh is not None else contextlib.nullcontext()
    with mesh_scope:
        return _train_loop(cfg, setup, state, saver, max_chunks)


def _train_loop(cfg, setup, state, saver, max_chunks) -> dict:
    train_chunk = learner.make_train_chunk(setup)
    collect_only = learner.make_collect_only(setup)
    evaluator = learner.make_evaluator(setup, cfg.num_eval_game)

    # ---- burn-in (selfplay.py:180-182) ----
    while int(state.replay.size) < cfg.burn_in_frames:
        state, stats = collect_only(state)
        print(
            f"warming up replay buffer: {int(state.replay.size)} "
            f"(chunk score {float(stats['chunk_score']):.2f})"
        )
    print("Success, Done")
    print("=======================")

    stat = MultiCounter()
    tachometer = Tachometer()
    stopwatch = Stopwatch()
    num_act_total = 0
    chunks_per_epoch = max(1, cfg.epoch_len // cfg.num_update_per_chunk)
    count_factor = cfg.num_player if cfg.vdn else 1

    summary = {}
    total_chunks = 0
    trace_active = False
    from hanabi_sad_tpu.utils.helper import get_mem_usage

    for epoch in range(cfg.num_epoch):
        print(f"beginning of epoch: {epoch}")
        print(get_mem_usage())  # selfplay.py:203
        tachometer.start()
        stat.reset()
        stopwatch.reset()

        # Chunks are dispatched async and their metrics fetched in ONE
        # device_get at the end of the epoch: a per-chunk float() would cost
        # one host<->device round-trip per metric per chunk (~8 x 63 RTTs per
        # epoch — measured as seconds of idle chip over a tunneled link) and
        # stall the dispatch pipeline. The reference has the same structure:
        # its learner loop only syncs for logging per epoch (selfplay.py:248).
        epoch_metrics = []
        for _ in range(chunks_per_epoch):
            # Trace steady-state chunks (skip chunk 1 = compile) on request.
            profiling = (
                cfg.profile_chunks > 0
                and total_chunks + 1 > 1
                and total_chunks + 1 <= 1 + cfg.profile_chunks
            )
            if profiling and total_chunks + 1 == 2:
                jax.profiler.start_trace(os.path.join(cfg.save_dir, "profile"))
                trace_active = True
            state, metrics = train_chunk(state)
            epoch_metrics.append(metrics)
            total_chunks += 1
            if total_chunks == 1:
                jax.block_until_ready(metrics["loss"])  # count compile separately
                stopwatch.time("compile")
            if trace_active and total_chunks >= 1 + cfg.profile_chunks:
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
                trace_active = False
                print(f"profiler trace written to {cfg.save_dir}/profile")
            if max_chunks and total_chunks >= max_chunks:
                break

        for metrics in jax.device_get(epoch_metrics):
            metrics = {k: float(v) for k, v in metrics.items()}
            stat.feed_dict(
                {k: v for k, v in metrics.items() if k in ("loss", "grad_norm", "rl_loss", "aux1", "chunk_score", "chunk_len", "explore_ratio")}
            )
            num_act_total += int(metrics["chunk_frames"]) * cfg.num_player
        stopwatch.time("train chunk")

        print(f"EPOCH: {epoch}")
        print(
            tachometer.lap(
                num_act_total,
                int(state.replay.num_add),
                chunks_per_epoch * cfg.num_update_per_chunk * cfg.batchsize,
                count_factor,
            )
        )
        print(stopwatch.summary())
        print(stat.summary(epoch))

        # ---- eval + checkpoint (selfplay.py:254-277) ----
        # Gated on eval_freq_epochs (the final epoch always evaluates so the
        # run summary reflects the finished model); latest.pkl is written on
        # the same cadence — it exists for resume, and skipped-eval epochs
        # are cheap to replay from the last snapshot.
        # Forced model_epoch{N} snapshots (every 50 epochs, saver.py:6-61)
        # must fire even when eval_freq_epochs does not divide 50, so the
        # 50-epoch cadence joins the gate rather than living inside it.
        do_eval = (
            (epoch % cfg.eval_freq_epochs == 0)
            or (epoch > 0 and epoch % 50 == 0)
            or (epoch == cfg.num_epoch - 1)
        )
        if do_eval:
            eval_seed = (9917 + epoch * 999999) % 7777777
            score, perfect, _ = evaluator(state.params, np.uint32(eval_seed))
            score, perfect = float(score), float(perfect)
            stopwatch.time("eval")
            force = f"model_epoch{epoch}" if (epoch > 0 and epoch % 50 == 0) else None
            # Multihost: eval participates on every process (it is a global
            # SPMD computation), but only process 0 writes checkpoints —
            # concurrent writers on a shared save_dir would corrupt the
            # pickles.
            model_saved = False
            if jax.process_index() == 0:
                model_saved = saver.save(
                    ckpt.params_payload(state.params.online, dataclasses.asdict(cfg)),
                    score,
                    force_save_name=force,
                )
                ckpt.save(
                    os.path.join(cfg.save_dir, "latest.pkl"),
                    ckpt.train_state_payload(state, dataclasses.asdict(cfg)),
                )
            print(
                "epoch %d, eval score: %.4f, perfect: %.2f, model saved: %s"
                % (epoch, score, perfect * 100, model_saved)
            )
            summary = {
                "epoch": epoch,
                "eval_score": score,
                "perfect": perfect,
                "num_update": int(state.num_update),
            }
        print("==========")
        if max_chunks and total_chunks >= max_chunks:
            break
    if trace_active:
        # Run ended before reaching 1+profile_chunks chunks — flush anyway.
        jax.profiler.stop_trace()
        print(f"profiler trace written to {cfg.save_dir}/profile (truncated run)")
    return summary


if __name__ == "__main__":
    train(parse_args())
