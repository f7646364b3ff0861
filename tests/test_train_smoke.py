"""End-to-end training smoke tests: the full driver on a tiny config — burn-in,
train chunks, eval, checkpoint save/restore — plus learning-signal sanity."""

import os

import jax
import numpy as np
import pytest

from hanabi_sad_tpu.train import checkpoint as ckpt
from hanabi_sad_tpu.train import learner
from hanabi_sad_tpu.train.config import make_config
from hanabi_sad_tpu.train.selfplay import train


def tiny_cfg(tmp_path, **kw):
    base = dict(
        save_dir=str(tmp_path / "exp"),
        num_envs=16,
        num_update_per_chunk=2,
        batchsize=8,
        burn_in_frames=32,
        replay_buffer_size=256,
        epoch_len=4,
        num_epoch=1,
        num_eval_game=8,
        max_len=24,
        rnn_hid_dim=32,
        num_update_between_sync=10,
        eval_max_steps=100,
        num_eps=4,
    )
    base.update(kw)
    return make_config("dev", **base)


class TestDriver:
    def test_dev_preset_runs(self, tmp_path):
        cfg = tiny_cfg(tmp_path)
        out = train(cfg, max_chunks=3)
        assert out["num_update"] > 0
        assert os.path.exists(cfg.save_dir + "/train.log")
        assert os.path.exists(cfg.save_dir + "/latest.pkl")
        assert os.path.exists(cfg.save_dir + "/model0.pkl")
        log = open(cfg.save_dir + "/train.log").read()
        assert "eval score" in log and "Speed:" in log

    def test_vdn_method(self, tmp_path):
        cfg = tiny_cfg(tmp_path, method="vdn", sad=False, shuffle_color=False)
        out = train(cfg, max_chunks=2)
        assert out["num_update"] > 0

    def test_aux_loss_path(self, tmp_path):
        cfg = tiny_cfg(tmp_path, pred_weight=0.25)
        out = train(cfg, max_chunks=2)
        assert out["num_update"] > 0
        log = open(cfg.save_dir + "/train.log").read()
        assert "aux1" in log


class TestLearnerUnits:
    def test_params_change_and_target_frozen_between_syncs(self, tmp_path):
        cfg = tiny_cfg(tmp_path, num_update_between_sync=1000)
        setup = learner.make_setup(cfg)
        state = learner.init_train_state(setup, jax.random.PRNGKey(0))
        collect = learner.make_collect_only(setup)
        chunk = learner.make_train_chunk(setup)
        for _ in range(3):
            state, _ = collect(state)
        online_before = jax.tree_util.tree_map(np.asarray, state.params.online)
        # first chunk syncs target at update 0; capture after
        state, _ = chunk(state)
        target_after_first = jax.tree_util.tree_map(np.asarray, state.params.target)
        state, _ = chunk(state)
        online_after = state.params.online
        # online moved
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
            online_before,
            online_after,
        )
        assert max(jax.tree_util.tree_leaves(diffs)) > 0
        # target unchanged after the initial sync (counter far from sync point)
        tdiffs = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
            target_after_first,
            state.params.target,
        )
        assert max(jax.tree_util.tree_leaves(tdiffs)) == 0

    def test_checkpoint_roundtrip(self, tmp_path):
        cfg = tiny_cfg(tmp_path)
        setup = learner.make_setup(cfg)
        state = learner.init_train_state(setup, jax.random.PRNGKey(0))
        collect = learner.make_collect_only(setup)
        chunk = learner.make_train_chunk(setup)
        state, _ = collect(state)
        state, _ = chunk(state)

        path = str(tmp_path / "ck.pkl")
        import dataclasses

        ckpt.save(path, ckpt.train_state_payload(state, dataclasses.asdict(cfg)))
        payload = ckpt.load(path)
        fresh = learner.init_train_state(setup, jax.random.PRNGKey(42))
        restored = ckpt.restore_train_state(payload, fresh)
        assert int(restored.num_update) == int(state.num_update)
        for a, b in zip(
            jax.tree_util.tree_leaves(restored.params),
            jax.tree_util.tree_leaves(state.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_checkpoint_legacy_constant_lr_payload(self, tmp_path):
        """Pre-round-4 constant-lr payloads carry no ScaleByScheduleState
        (Adam lr was a stateless float); they must still full-resume into
        the always-schedule-backed optimizer, with the schedule count seeded
        from the global update counter (ADVICE round 4)."""
        import optax

        cfg = tiny_cfg(tmp_path)
        setup = learner.make_setup(cfg)
        state = learner.init_train_state(setup, jax.random.PRNGKey(0))
        collect = learner.make_collect_only(setup)
        chunk = learner.make_train_chunk(setup)
        state, _ = collect(state)
        state, _ = chunk(state)

        import dataclasses

        payload = ckpt.train_state_payload(state, dataclasses.asdict(cfg))

        def strip_schedule(x):
            if isinstance(x, optax.ScaleByScheduleState):
                return optax.EmptyState()
            if isinstance(x, tuple) and hasattr(x, "_fields"):
                return type(x)(*(strip_schedule(c) for c in x))
            if isinstance(x, tuple):
                return tuple(strip_schedule(c) for c in x)
            if isinstance(x, list):
                return [strip_schedule(c) for c in x]
            if isinstance(x, dict):
                return {k: strip_schedule(v) for k, v in x.items()}
            return x

        payload["opt_state"] = strip_schedule(payload["opt_state"])

        fresh = learner.init_train_state(setup, jax.random.PRNGKey(42))
        restored = ckpt.restore_train_state(payload, fresh)
        assert int(restored.num_update) == int(state.num_update)
        # Adam moments came from the payload, not the fresh template.
        for a, b in zip(
            jax.tree_util.tree_leaves(restored.params),
            jax.tree_util.tree_leaves(state.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        sched = [
            x
            for x in jax.tree_util.tree_leaves(
                restored.opt_state,
                is_leaf=lambda x: isinstance(x, optax.ScaleByScheduleState),
            )
            if isinstance(x, optax.ScaleByScheduleState)
        ]
        assert sched, "optimizer template lost its schedule state"
        for s in sched:
            assert int(s.count) == int(state.num_update)

    def test_replay_ratio_accounting(self, tmp_path):
        cfg = tiny_cfg(tmp_path)
        setup = learner.make_setup(cfg)
        # IQL: 16 envs * 2 players = 32 items per chunk
        assert setup.items_per_chunk == 32
        assert setup.players_per_item == 1


class TestMultiplayer:
    def test_3p_vdn(self, tmp_path):
        cfg = tiny_cfg(
            tmp_path, method="vdn", num_player=3, sad=True, shuffle_color=False,
            batchsize=9, num_envs=12,
        )
        out = train(cfg, max_chunks=2)
        assert out["num_update"] > 0

    def test_5p_iql_hand4(self, tmp_path):
        cfg = tiny_cfg(
            tmp_path, method="iql", num_player=5, hand_size=4, sad=False,
            shuffle_color=False, num_envs=8,
        )
        out = train(cfg, max_chunks=2)
        assert out["num_update"] > 0

    def test_continuous_multiplayer(self, tmp_path):
        cfg = tiny_cfg(
            tmp_path, method="vdn", num_player=3, rollout_mode="continuous",
            num_envs=8, batchsize=6,
        )
        out = train(cfg, max_chunks=2)
        assert out["num_update"] > 0


class TestLrSchedule:
    def test_linear_decay_shrinks_updates(self):
        """make_optimizer with lr_final > 0: the same gradient produces a
        smaller parameter update late in the schedule, ending at lr_final;
        with lr_final = 0 the update is step-invariant (reference behavior,
        fixed-lr Adam, selfplay.py:149)."""
        import jax.numpy as jnp
        import optax

        cfg = make_config(
            "dev", save_dir="/tmp/x", lr=1e-3, lr_final=1e-4, lr_decay_updates=100
        )
        opt = learner.make_optimizer(cfg)
        params = {"w": jnp.ones(4)}
        grads = {"w": jnp.full(4, 0.5)}
        state = opt.init(params)

        # Drive Adam to its steady state first so only the schedule varies.
        sizes = []
        for _ in range(200):
            updates, state = opt.update(grads, state, params)
            sizes.append(float(jnp.abs(updates["w"]).max()))
        # Early (post-warmup) step ~lr at its schedule point; final ~lr_final.
        assert sizes[-1] < sizes[10] / 3
        assert sizes[-1] == pytest.approx(1e-4, rel=0.05)

        cfg0 = make_config("dev", save_dir="/tmp/x", lr=1e-3)
        opt0 = learner.make_optimizer(cfg0)
        state0 = opt0.init(params)
        s = []
        for _ in range(50):
            updates, state0 = opt0.update(grads, state0, params)
            s.append(float(jnp.abs(updates["w"]).max()))
        assert s[-1] == pytest.approx(1e-3, rel=0.05)


class TestSnapshotSampling:
    def test_single_update_chunk_bit_identical(self, tmp_path):
        """With num_update_per_chunk=1 there is no within-chunk priority
        feedback to hide, so snapshot_sampling must be a bit-exact no-op
        (same PRNG key chain, same sampler, same gather)."""
        outs = []
        for snap in (False, True):
            cfg = tiny_cfg(
                tmp_path, num_update_per_chunk=1, snapshot_sampling=snap,
                rollout_mode="continuous", slots_per_env=2,
            )
            setup = learner.make_setup(cfg)
            state = learner.init_train_state(setup, jax.random.PRNGKey(0))
            collect = learner.make_collect_only(setup)
            chunk = learner.make_train_chunk(setup)
            state, _ = collect(state)
            for _ in range(3):
                state, metrics = chunk(state)
            outs.append(
                (
                    jax.tree_util.tree_map(np.asarray, state.params.online),
                    np.asarray(state.replay.weight),
                    float(metrics["loss"]),
                )
            )
        for a, b in zip(
            jax.tree_util.tree_leaves(outs[0][0]), jax.tree_util.tree_leaves(outs[1][0])
        ):
            np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(outs[0][1], outs[1][1])
        assert outs[0][2] == outs[1][2]

    def test_multi_update_chunk_trains(self, tmp_path):
        """U=4 snapshot chunk: finite loss, params move, and the learner's
        priority feedback still lands in the replay weights."""
        cfg = tiny_cfg(
            tmp_path, num_update_per_chunk=4, snapshot_sampling=True,
            rollout_mode="continuous", slots_per_env=2,
        )
        setup = learner.make_setup(cfg)
        state = learner.init_train_state(setup, jax.random.PRNGKey(0))
        collect = learner.make_collect_only(setup)
        chunk = learner.make_train_chunk(setup)
        state, _ = collect(state)
        w_before = np.asarray(state.weight if hasattr(state, "weight") else state.replay.weight).copy()
        online_before = jax.tree_util.tree_map(np.asarray, state.params.online)
        state, metrics = chunk(state)
        assert np.isfinite(float(metrics["loss"]))
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
            online_before, state.params.online,
        )
        assert max(jax.tree_util.tree_leaves(diffs)) > 0
        assert not np.array_equal(w_before, np.asarray(state.replay.weight))
