"""Multi-device sharding tests on the 8-device virtual CPU mesh: the full
train chunk compiles and runs with envs/replay sharded over the data axis and
params replicated (the reference has no distributed path at all — this is the
TPU-native scale-out layer, SURVEY.md §2.16)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hanabi_sad_tpu.parallel import data_sharding, make_mesh, shard_train_state
from hanabi_sad_tpu.train import learner
from hanabi_sad_tpu.train.config import make_config


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(jax.devices()[:8])


def tiny_setup(n_dev, **overrides):
    overrides.setdefault("rollout_mode", "aligned")  # continuous tested explicitly
    cfg = make_config(
        "dev",
        save_dir="/tmp/shard_test",
        num_envs=2 * n_dev,
        num_update_per_chunk=2,
        batchsize=n_dev,
        burn_in_frames=8,
        replay_buffer_size=16 * n_dev,
        max_len=12,
        rnn_hid_dim=32,
        num_eps=4,
        **overrides,
    )
    return learner.make_setup(cfg)


class TestShardedTraining:
    def test_chunk_runs_sharded(self, mesh):
        setup = tiny_setup(8)
        state = learner.init_train_state(setup, jax.random.PRNGKey(0))
        state = shard_train_state(state, mesh)
        # replay storage actually sharded across devices
        shardings = state.replay.packed.sharding
        assert len(shardings.device_set) == 8
        with mesh:
            collect = learner.make_collect_only(setup)
            chunk = learner.make_train_chunk(setup)
            state, _ = collect(state)
            state, metrics = chunk(state)
        assert np.isfinite(float(metrics["loss"]))
        assert int(state.num_update) == 2

    def test_continuous_chunk_runs_sharded(self, mesh):
        """Continuous rollout mode: the persistent actor state (env + carried
        partial episodes, leading dim num_envs) must shard over the data axis
        and the chunk must run."""
        setup = tiny_setup(8, rollout_mode="continuous", slots_per_env=2)
        state = learner.init_train_state(setup, jax.random.PRNGKey(0))
        state = shard_train_state(state, mesh)
        assert len(state.actor.carry_packed.sharding.device_set) == 8
        assert len(state.actor.env_state.game.deck.sharding.device_set) == 8
        with mesh:
            collect = learner.make_collect_only(setup)
            chunk = learner.make_train_chunk(setup)
            state, _ = collect(state)
            state, metrics = chunk(state)
        assert np.isfinite(float(metrics["loss"]))
        assert int(state.num_update) == 2

    def test_snapshot_sampling_sharded(self, mesh):
        """snapshot_sampling's whole-chunk index draw + row gather must run
        over the sharded replay (the gather crosses capacity shards exactly
        like the per-update sampler's)."""
        setup = tiny_setup(
            8, rollout_mode="continuous", slots_per_env=2, snapshot_sampling=True,
        )
        state = learner.init_train_state(setup, jax.random.PRNGKey(0))
        state = shard_train_state(state, mesh)
        with mesh:
            collect = learner.make_collect_only(setup)
            chunk = learner.make_train_chunk(setup)
            state, _ = collect(state)
            state, metrics = chunk(state)
        assert np.isfinite(float(metrics["loss"]))
        assert int(state.num_update) == 2

    def test_sharded_matches_single_device(self, mesh):
        """Numerical equivalence: the same chunk on a 1-device mesh and an
        8-device mesh produces the same loss (SPMD correctness)."""
        setup = tiny_setup(8)

        def run(devices):
            m = make_mesh(devices)
            state = learner.init_train_state(setup, jax.random.PRNGKey(0))
            state = shard_train_state(state, m)
            with m:
                collect = learner.make_collect_only(setup)
                chunk = learner.make_train_chunk(setup)
                state, _ = collect(state)
                state, metrics = chunk(state)
            return float(metrics["loss"]), float(metrics["chunk_score"])

    # (separate jits per mesh; same seeds -> identical trajectories)
        loss8, score8 = run(jax.devices()[:8])
        loss1, score1 = run(jax.devices()[:1])
        assert score8 == score1
        np.testing.assert_allclose(loss8, loss1, rtol=2e-4)

    def test_entry_points(self, mesh):
        import importlib.util, sys, os

        spec = importlib.util.spec_from_file_location(
            "_graft", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        fn, args = mod.entry()
        out = jax.jit(fn)(*args)
        assert out[0].shape == (64, 2)
        mod.dryrun_multichip(8)
