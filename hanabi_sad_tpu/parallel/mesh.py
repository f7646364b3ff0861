"""Device mesh and sharding layout.

The reference has no distributed backend at all (SURVEY.md §2.16): its
parallelism is OS threads + round-robin GPU inference servers. Here the whole
trainer is one SPMD program, so scaling out is a sharding annotation:

  * mesh axis "data": environments, replay items, and the training batch are
    sharded along their leading env/item dimension; params and optimizer state
    are replicated. XLA inserts the gradient all-reduce (psum over ICI) where
    the replicated-param / sharded-batch contraction requires it.
  * multi-host: jax.distributed.initialize() then the same code — the mesh
    spans all hosts' devices, DCN carries the inter-host legs of the
    collectives.

The sampler's cumsum over the replay weight vector is the one intentionally
global op (it all-gathers a [capacity] f32 vector — a few hundred KB — per
sample, negligible next to the batch gather it replaces).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence[jax.Device]] = None, axis: str = "data") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading dimension across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_train_state(state, mesh: Mesh, axis: str = "data"):
    """Place a learner TrainState on the mesh: replay storage sharded over
    items, params/opt replicated, scalars/keys replicated."""
    data = data_sharding(mesh, axis)
    repl = replicated_sharding(mesh)

    def place_replay(x):
        if x.ndim >= 1 and x.shape[0] % mesh.devices.size == 0 and x.shape[0] > 1:
            return jax.device_put(x, data)
        return jax.device_put(x, repl)

    replay = jax.tree_util.tree_map(place_replay, state.replay)
    params = jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), state.params)
    opt_state = jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), state.opt_state)
    # Continuous-mode persistent actor state: every leaf leads with the env
    # axis (num_envs), sharded like the replay items.
    actor = (
        jax.tree_util.tree_map(place_replay, state.actor)
        if state.actor is not None
        else None
    )
    return state._replace(
        params=params,
        opt_state=opt_state,
        replay=replay,
        actor=actor,
        num_update=jax.device_put(state.num_update, repl),
        env_key=jax.device_put(state.env_key, repl),
        sample_key=jax.device_put(state.sample_key, repl),
    )


def initialize_multihost(coordinator: Optional[str] = None, num_processes: Optional[int] = None, process_id: Optional[int] = None):
    """Multi-host entry (DCN scale-out). Must run before anything initializes
    the XLA backend. Resolution order: explicit args; else
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars
    (any launcher); else jax.distributed.initialize() autodetection
    (TPU pod / SLURM / GKE)."""
    import os

    if coordinator is None:
        coordinator = os.environ.get("JAX_COORDINATOR_ADDRESS")
        if coordinator is not None:
            num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
            process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    if coordinator is None:
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(coordinator, num_processes, process_id)
