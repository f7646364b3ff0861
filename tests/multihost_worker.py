"""Worker for the two-process jax.distributed test (not collected by pytest).

Runs the identical tiny global program as __graft_entry__.dryrun_multichip —
one collect chunk + one train chunk over a 2-device "data" mesh — either as
one process owning both CPU devices, or as one of two processes owning one
CPU device each with a local coordinator (the DCN code path,
parallel/mesh.py:initialize_multihost). Prints `LOSS <value>` on success.

Usage:
  python tests/multihost_worker.py --local_devices 2                 # 1-proc
  python tests/multihost_worker.py --local_devices 1 \
      --num_processes 2 --process_id {0,1} --port 9876               # 2-proc
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--local_devices", type=int, default=1)
    parser.add_argument("--num_processes", type=int, default=1)
    parser.add_argument("--process_id", type=int, default=0)
    parser.add_argument("--port", type=int, default=0)
    args = parser.parse_args()

    # Must precede XLA backend *initialization* (the host image's
    # sitecustomize imports jax before main() runs, so the platform switch
    # goes through jax.config like tests/conftest.py, not env vars).
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.local_devices}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    if args.num_processes > 1:
        os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{args.port}"
        os.environ["JAX_NUM_PROCESSES"] = str(args.num_processes)
        os.environ["JAX_PROCESS_ID"] = str(args.process_id)
        from hanabi_sad_tpu.parallel import initialize_multihost

        initialize_multihost()

    assert jax.process_count() == args.num_processes, jax.process_count()
    n_global = args.num_processes * args.local_devices

    import numpy as np

    from hanabi_sad_tpu.parallel import make_mesh, shard_train_state
    from hanabi_sad_tpu.train import learner
    from hanabi_sad_tpu.train.config import make_config

    assert jax.device_count() == n_global, jax.devices()
    mesh = make_mesh(jax.devices())

    cfg = make_config(
        "dev",
        save_dir="/tmp/multihost_worker",
        num_envs=2 * n_global,
        num_update_per_chunk=2,
        batchsize=n_global,
        burn_in_frames=8,
        replay_buffer_size=16 * n_global,
        max_len=12,
        rnn_hid_dim=32,
        num_eps=4,
        rollout_mode="continuous",
        slots_per_env=2,
    )
    setup = learner.make_setup(cfg)
    state = learner.init_train_state(setup, jax.random.PRNGKey(0))
    state = shard_train_state(state, mesh)

    with mesh:
        collect = learner.make_collect_only(setup)
        chunk = learner.make_train_chunk(setup)
        state, _ = collect(state)
        state, metrics = chunk(state)
        # The loss is replicated; any process can read its local shard.
        loss = float(np.asarray(jax.device_get(metrics["loss"])))
    assert np.isfinite(loss), loss
    print(f"LOSS {loss:.10f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
