"""Production-shape multi-device validation on the virtual CPU mesh.

Round-3 VERDICT item 5: `dryrun_multichip` and tests/test_sharding.py prove
the sharded program is correct at tiny shapes (hid 32, max_len 12); nothing
validated that the *flagship* shape class — hid 512, T=80, 1024 envs,
replay 2^15, batch 128, bfloat16 — compiles and shards sanely on an 8-device
mesh. Shape-dependent sharding bugs (uneven divisibility, replicated-buffer
blowups) are exactly what tiny shapes miss.

Runs the production continuous-rollout train chunk (same path as the
flagship launch, scripts/round4_chip_queue.sh stage 1) for a few chunks on
8 virtual CPU devices, asserts finite loss, and records compile/steady
walltime plus per-device on-device buffer residency.

Launch (axon registration skipped, 8 virtual CPU devices):

  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  PYTHONPATH=/root/repo python -u scripts/prodshape_mesh_cpu.py
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np


def main():
    from hanabi_sad_tpu.parallel import make_mesh, shard_train_state
    from hanabi_sad_tpu.train import learner
    from hanabi_sad_tpu.train.config import make_config

    devices = jax.devices()
    assert len(devices) == 8, f"expected 8 virtual devices, got {devices}"
    mesh = make_mesh(devices)

    # The flagship config (sad_2p + aux, scripts/round4_chip_queue.sh) at
    # full production shapes except replay capacity (2^15 vs 2^16: the ring
    # buffer's shape has no divisibility interaction beyond items/devices,
    # and 2^15 keeps host RAM for 8 replicas of the program manageable).
    cfg = make_config(
        "sad_2p",
        pred_weight=0.25,
        save_dir="/tmp/prodshape",
        compute_dtype="bfloat16",
        num_envs=1024,
        num_update_per_chunk=4,  # shape-identical; fewer updates keeps the 2-core CPU run feasible
        replay_buffer_size=2 ** 15,
        burn_in_frames=2,  # skip extra burn-in collects; chunk 1 fills it
    )
    setup = learner.make_setup(cfg)
    cfg = setup.train
    print(
        f"devices={len(devices)} feature={setup.env.feature_size} "
        f"batch={cfg.batchsize} replay={cfg.replay_buffer_size} "
        f"envs={cfg.num_envs} T={cfg.max_len} hid={cfg.rnn_hid_dim}"
    )

    state = learner.init_train_state(setup, jax.random.PRNGKey(0))
    state = shard_train_state(state, mesh)

    result = {"devices": len(devices), "shapes": {
        "num_envs": cfg.num_envs, "max_len": cfg.max_len,
        "rnn_hid_dim": cfg.rnn_hid_dim, "batchsize": cfg.batchsize,
        "replay": cfg.replay_buffer_size, "dtype": cfg.compute_dtype,
    }}

    with mesh:
        chunk = learner.make_train_chunk(setup)
        t0 = time.perf_counter()
        state, metrics = chunk(state)
        loss = float(metrics["loss"])
        result["compile_plus_first_chunk_s"] = round(time.perf_counter() - t0, 1)
        assert np.isfinite(loss), f"non-finite loss {loss}"

        times = []
        for i in range(2):
            t0 = time.perf_counter()
            state, metrics = chunk(state)
            loss = float(metrics["loss"])
            times.append(time.perf_counter() - t0)
            assert np.isfinite(loss), f"non-finite loss {loss} at chunk {i+2}"
            print(f"chunk {i+2}: loss={loss:.4f} {times[-1]:.1f}s")
        result["steady_chunk_s"] = round(min(times), 1)
        result["final_loss"] = round(loss, 4)
        result["replay_size"] = int(state.replay.size)

    # Per-device residency: sum of live sharded buffer bytes per device.
    per_dev = {}
    for arr in jax.live_arrays():
        for shard in getattr(arr, "addressable_shards", []):
            d = str(shard.device)
            per_dev[d] = per_dev.get(d, 0) + shard.data.nbytes
    result["per_device_live_mb"] = {
        d: round(b / 2**20, 1) for d, b in sorted(per_dev.items())
    }
    try:
        import resource

        result["host_rss_mb"] = round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1
        )
    except Exception:
        pass

    print(json.dumps(result))
    with open("docs/runs/prodshape_mesh_cpu.json", "w") as f:
        json.dump(result, f, indent=1)
    print("ok: production shapes compile, shard, and train on the 8-device mesh")


if __name__ == "__main__":
    main()
