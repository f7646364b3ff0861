"""Continuous-rollout tests: episode assembly from an auto-resetting stream
must reproduce a scalar per-env reference, committed episodes must be valid
Hanabi episodes, and training in continuous mode must learn-step cleanly."""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from hanabi_sad_tpu.agent import r2d2_agent
from hanabi_sad_tpu.agent.r2d2_agent import AgentConfig
from hanabi_sad_tpu.game import GameConfig
from hanabi_sad_tpu.game.env import EnvConfig
from hanabi_sad_tpu.models.r2d2_net import NetConfig
from hanabi_sad_tpu.replay.bitpack import unpack_bits
from hanabi_sad_tpu.replay.prioritized import ReplayConfig
from hanabi_sad_tpu.rollout import continuous
from hanabi_sad_tpu.train import learner
from hanabi_sad_tpu.train.config import make_config


def small_cfgs(vdn=True, max_len=16):
    game = GameConfig(players=2)
    env_cfg = EnvConfig(game=game, eps_list=(0.5,), max_len=max_len, sad=False)
    net = NetConfig(in_dim=env_cfg.feature_size, hid_dim=32, out_dim=game.num_actions)
    agent_cfg = AgentConfig(net=net, vdn=vdn, multi_step=3, gamma=0.99, eta=0.9)
    rep_cfg = ReplayConfig(
        capacity=256,
        seq_len=max_len,
        num_player=2 if vdn else 1,
        obs_dim=env_cfg.feature_size,
        num_actions=game.num_actions,
    )
    params = r2d2_agent.init_agent(jax.random.PRNGKey(0), agent_cfg)
    return env_cfg, agent_cfg, rep_cfg, params


class TestAssembly:
    def scalar_assemble(self, done, carry_len, K, T):
        """Per-env reference: returns per-slot (source list, complete) where a
        source is ('carry', j) or ('stream', t), plus the new carry sources."""
        N = done.shape[1]
        out = []
        new_carries = []
        for n in range(N):
            segments = []
            cur = [("carry", j) for j in range(carry_len[n])]
            for t in range(T):
                cur.append(("stream", t))
                if done[t, n]:
                    segments.append(cur)
                    cur = []
            slots = []
            for e in range(K):
                if e < len(segments):
                    slots.append(segments[e])
                else:
                    slots.append(None)
            out.append(slots)
            new_carries.append(cur)
        return out, new_carries

    def test_matches_scalar_reference(self):
        rng = np.random.RandomState(0)
        T, N, P, K, NB = 12, 5, 2, 3, 4
        done = rng.rand(T, N) < 0.25
        done[-1, :] = True  # every env completes by chunk end (max_len rule)
        carry_len = rng.randint(0, 5, N)

        # distinguishable payloads: stream value = 100 + t, carry value = n*10 + j
        stream_reward = np.tile((100 + np.arange(T))[:, None], (1, N)).astype(np.float32)
        carry_reward = np.zeros((N, T), np.float32)
        for n in range(N):
            for j in range(carry_len[n]):
                carry_reward[n, j] = n * 10 + j

        actor = continuous.ActorState(
            env_state=None, obs=None, hidden=None,
            carry_packed=jnp.asarray(
                np.tile(carry_reward[..., None, None], (1, 1, P, NB)).astype(np.uint8)
            ),
            carry_action=jnp.asarray(np.tile(carry_reward[..., None], (1, 1, P)), jnp.int32),
            carry_greedy=jnp.zeros((N, T, P), jnp.int32),
            carry_qa=jnp.zeros((N, T, P), jnp.float32),
            carry_reward=jnp.asarray(carry_reward),
            carry_len=jnp.asarray(carry_len, jnp.int32),
        )
        stream = continuous.StreamChunk(
            packed=jnp.asarray(
                np.tile(stream_reward[..., None, None], (1, 1, P, NB)).astype(np.uint8)
            ),
            action=jnp.asarray(np.tile(stream_reward[..., None], (1, 1, P)), jnp.int32),
            greedy=jnp.zeros((T, N, P), jnp.int32),
            qa=jnp.zeros((T, N, P), jnp.float32),
            reward=jnp.asarray(stream_reward),
            done=jnp.asarray(done),
            score=jnp.zeros((T, N), jnp.int32),
        )
        new_actor, ep = continuous.assemble_episodes(actor, stream, K)

        ref_slots, ref_carries = self.scalar_assemble(done, carry_len, K, T)
        rewards = np.asarray(ep.reward).reshape(N, K, T)
        seq_len = np.asarray(ep.seq_len).reshape(N, K)
        valid = np.asarray(ep.valid).reshape(N, K)
        for n in range(N):
            for e in range(K):
                slot = ref_slots[n][e]
                if slot is None:
                    assert not valid[n, e]
                    continue
                assert valid[n, e]
                assert seq_len[n, e] == len(slot)
                for j, src in enumerate(slot):
                    expect = (
                        carry_reward[n, src[1]] if src[0] == "carry" else 100 + src[1]
                    )
                    assert rewards[n, e, j] == expect, (n, e, j, src)
                assert (rewards[n, e, len(slot):] == 0).all()
        # new carries
        ncl = np.asarray(new_actor.carry_len)
        ncr = np.asarray(new_actor.carry_reward)
        for n in range(N):
            assert ncl[n] == len(ref_carries[n])
            for j, src in enumerate(ref_carries[n]):
                expect = carry_reward[n, src[1]] if src[0] == "carry" else 100 + src[1]
                assert ncr[n, j] == expect

    def test_dropped_counted(self):
        T, N, P, K, NB = 8, 1, 2, 2, 2
        done = np.zeros((T, N), bool)
        done[1] = done[3] = done[5] = done[7] = True  # 4 episodes, K=2
        actor = continuous.ActorState(
            env_state=None, obs=None, hidden=None,
            carry_packed=jnp.zeros((N, T, P, NB), jnp.uint8),
            carry_action=jnp.zeros((N, T, P), jnp.int32),
            carry_greedy=jnp.zeros((N, T, P), jnp.int32),
            carry_qa=jnp.zeros((N, T, P), jnp.float32),
            carry_reward=jnp.zeros((N, T), jnp.float32),
            carry_len=jnp.zeros((N,), jnp.int32),
        )
        stream = continuous.StreamChunk(
            packed=jnp.zeros((T, N, P, NB), jnp.uint8),
            action=jnp.zeros((T, N, P), jnp.int32),
            greedy=jnp.zeros((T, N, P), jnp.int32),
            qa=jnp.zeros((T, N, P), jnp.float32),
            reward=jnp.zeros((T, N), jnp.float32),
            done=jnp.asarray(done),
            score=jnp.zeros((T, N), jnp.int32),
        )
        _, ep = continuous.assemble_episodes(actor, stream, K)
        assert int(ep.dropped) == 2
        assert int(ep.num_completed) == 4


class TestRealEnvs:
    def test_committed_episodes_are_fresh(self):
        """Every committed episode's step 0 must be a reset observation: the
        last-action block of the canonical encoding is all zeros."""
        env_cfg, agent_cfg, rep_cfg, params = small_cfgs(vdn=True)
        N = 8
        keys = jax.random.split(jax.random.PRNGKey(1), N)
        actor = continuous.init_actor_state(agent_cfg, env_cfg, rep_cfg, keys)

        run = jax.jit(
            functools.partial(
                continuous.run_continuous_chunk,
                agent_cfg=agent_cfg,
                env_cfg=env_cfg,
                num_steps=16,
            )
        )
        total_valid = 0
        for i in range(3):  # cross chunk boundaries
            actor, stream = run(params, actor=actor, act_key=jax.random.PRNGKey(10 + i))
            actor, ep = continuous.assemble_episodes(actor, stream, slots_per_env=4)
            valid = np.asarray(ep.valid)
            bits = unpack_bits(ep.packed, rep_cfg.bits_per_step)
            g = env_cfg.game
            la_start = g.hands_section + g.board_section + g.discard_section
            for m in np.where(valid)[0]:
                first = np.asarray(bits[m, 0, 0])  # player 0, step 0
                la = first[la_start : la_start + g.last_action_section]
                assert la.sum() == 0, f"slot {m} step0 has a last action"
                L = int(ep.seq_len[m])
                assert 1 <= L <= 16
                # padding zeroed
                assert np.asarray(bits[m, L:]).sum() == 0
            total_valid += valid.sum()
        assert total_valid >= 3 * N  # at least one episode per env per chunk

    def test_frame_accounting(self):
        """Across chunks, committed + carried frames == generated frames."""
        env_cfg, agent_cfg, rep_cfg, params = small_cfgs(vdn=True)
        N, T = 6, 16
        keys = jax.random.split(jax.random.PRNGKey(2), N)
        actor = continuous.init_actor_state(agent_cfg, env_cfg, rep_cfg, keys)
        run = jax.jit(
            functools.partial(
                continuous.run_continuous_chunk,
                agent_cfg=agent_cfg,
                env_cfg=env_cfg,
                num_steps=T,
            )
        )
        committed = 0
        dropped_frames_possible = 0
        for i in range(4):
            actor, stream = run(params, actor=actor, act_key=jax.random.PRNGKey(20 + i))
            actor, ep = continuous.assemble_episodes(actor, stream, slots_per_env=8)
            committed += float(jnp.where(ep.valid, ep.seq_len, 0.0).sum())
            assert int(ep.dropped) == 0  # K=8 ample for 16-step chunks
        generated = 4 * N * T
        carried = float(actor.carry_len.sum())
        assert committed + carried == generated


class TestContinuousTraining:
    def test_end_to_end(self, tmp_path):
        cfg = make_config(
            "dev",
            save_dir=str(tmp_path),
            rollout_mode="continuous",
            num_envs=16,
            num_update_per_chunk=2,
            batchsize=8,
            burn_in_frames=24,
            replay_buffer_size=256,
            max_len=16,
            rnn_hid_dim=32,
            num_eps=4,
            slots_per_env=4,
        )
        setup = learner.make_setup(cfg)
        state = learner.init_train_state(setup, jax.random.PRNGKey(0))
        collect = learner.make_collect_only(setup)
        chunk = learner.make_train_chunk(setup)
        for _ in range(2):
            state, stats = collect(state)
        assert int(state.replay.size) > 0
        before = np.asarray(state.params.online.fc_a["w"]).copy()
        state, metrics = chunk(state)
        assert np.isfinite(float(metrics["loss"]))
        assert float(metrics["chunk_frames"]) > 0
        after = np.asarray(state.params.online.fc_a["w"])
        assert np.abs(after - before).max() > 0

    def test_iql_mode(self, tmp_path):
        cfg = make_config(
            "dev",
            save_dir=str(tmp_path),
            method="iql",
            rollout_mode="continuous",
            num_envs=8,
            num_update_per_chunk=2,
            batchsize=4,
            burn_in_frames=8,
            replay_buffer_size=128,
            max_len=16,
            rnn_hid_dim=32,
            num_eps=4,
        )
        setup = learner.make_setup(cfg)
        state = learner.init_train_state(setup, jax.random.PRNGKey(0))
        state, _ = learner.make_collect_only(setup)(state)
        state, metrics = learner.make_train_chunk(setup)(state)
        assert np.isfinite(float(metrics["loss"]))


class TestExactPriority:
    def test_matches_online_online_when_greedy_and_synced(self, tmp_path):
        """With eps=0 (taken action == greedy) and target == online (fresh
        init), the exact online-target priority must equal the online-online
        approximation: the rollout's carried hiddens coincide with the
        zero-h0 full-sequence hiddens for assembled episodes."""
        cfg = make_config(
            "dev",
            save_dir=str(tmp_path),
            rollout_mode="continuous",
            num_envs=8,
            burn_in_frames=8,
            replay_buffer_size=128,
            max_len=16,
            rnn_hid_dim=32,
            num_eps=2,
            act_base_eps=0.0,
            compute_dtype="float32",
        )
        setup = learner.make_setup(cfg)
        state = learner.init_train_state(setup, jax.random.PRNGKey(0))
        for _ in range(2):  # second chunk exercises carry-glued episodes
            env_key, k_act = jax.random.split(state.env_key)
            actor, stream = continuous.run_continuous_chunk(
                state.params, setup.agent, setup.env, state.actor, k_act, cfg.max_len
            )
            actor, episodes = continuous.assemble_episodes(
                actor, stream, cfg.slots_per_env
            )
            state = state._replace(actor=actor, env_key=env_key)
            if not setup.train.vdn:
                episodes = continuous.split_players(episodes)
            n_step_r, bootstrap, approx = continuous.episode_priorities(
                episodes, setup.agent
            )
            exact = continuous.exact_episode_priorities(
                state.params, setup.agent, setup.replay, episodes, n_step_r, bootstrap
            )
            valid = np.asarray(episodes.valid)
            assert valid.any()
            np.testing.assert_allclose(
                np.asarray(exact)[valid], np.asarray(approx)[valid],
                rtol=1e-4, atol=1e-5,
            )

    def test_train_chunk_with_exact_priority(self, tmp_path):
        cfg = make_config(
            "dev",
            save_dir=str(tmp_path),
            rollout_mode="continuous",
            continuous_exact_priority=True,
            num_envs=8,
            num_update_per_chunk=2,
            batchsize=4,
            burn_in_frames=8,
            replay_buffer_size=128,
            max_len=16,
            rnn_hid_dim=32,
            num_eps=4,
        )
        setup = learner.make_setup(cfg)
        state = learner.init_train_state(setup, jax.random.PRNGKey(0))
        state, _ = learner.make_collect_only(setup)(state)
        state, metrics = learner.make_train_chunk(setup)(state)
        assert np.isfinite(float(metrics["loss"]))


class TestFusedExactPriority:
    def test_fused_equals_reforward(self, tmp_path):
        """The target-Q stream recorded by act_with_target must reproduce the
        separate zero-h0 full-sequence target re-forward: same priorities.
        Target params are perturbed away from online so the test is not
        vacuous; eps > 0 so taken != greedy on some steps."""
        cfg = make_config(
            "dev",
            save_dir=str(tmp_path),
            rollout_mode="continuous",
            continuous_exact_priority=True,
            exact_priority_in_rollout=True,
            num_envs=8,
            burn_in_frames=8,
            replay_buffer_size=128,
            max_len=16,
            rnn_hid_dim=32,
            num_eps=4,
            act_base_eps=0.3,
            compute_dtype="float32",
        )
        setup = learner.make_setup(cfg)
        state = learner.init_train_state(setup, jax.random.PRNGKey(0))
        # desync target from online
        noisy_target = jax.tree_util.tree_map(
            lambda x: x + 0.01 * jnp.cos(jnp.arange(x.size, dtype=jnp.float32)).reshape(x.shape),
            state.params.target,
        )
        state = state._replace(
            params=state.params._replace(target=noisy_target)
        )
        assert state.actor.target_hidden is not None
        for i in range(3):  # later chunks exercise carry-glued tqa segments
            env_key, k_act = jax.random.split(state.env_key)
            actor, stream = continuous.run_continuous_chunk(
                state.params, setup.agent, setup.env, state.actor, k_act, cfg.max_len
            )
            actor, episodes = continuous.assemble_episodes(
                actor, stream, cfg.slots_per_env
            )
            state = state._replace(actor=actor, env_key=env_key)
            if not setup.train.vdn:
                episodes = continuous.split_players(episodes)
            n_step_r, bootstrap, _ = continuous.episode_priorities(
                episodes, setup.agent
            )
            fused = continuous.fused_exact_priorities(
                episodes, setup.agent, n_step_r, bootstrap
            )
            reforward = continuous.exact_episode_priorities(
                state.params, setup.agent, setup.replay, episodes, n_step_r, bootstrap
            )
            valid = np.asarray(episodes.valid)
            assert valid.any()
            np.testing.assert_allclose(
                np.asarray(fused)[valid], np.asarray(reforward)[valid],
                rtol=1e-4, atol=1e-5,
            )

    def test_train_chunk_with_fused_priority(self, tmp_path):
        cfg = make_config(
            "dev",
            save_dir=str(tmp_path),
            rollout_mode="continuous",
            continuous_exact_priority=True,
            exact_priority_in_rollout=True,
            num_envs=8,
            num_update_per_chunk=2,
            batchsize=4,
            burn_in_frames=8,
            replay_buffer_size=128,
            max_len=16,
            rnn_hid_dim=32,
            num_eps=4,
        )
        setup = learner.make_setup(cfg)
        state = learner.init_train_state(setup, jax.random.PRNGKey(0))
        state, _ = learner.make_collect_only(setup)(state)
        state, metrics = learner.make_train_chunk(setup)(state)
        assert np.isfinite(float(metrics["loss"]))

    def test_train_chunk_fused_iql(self, tmp_path):
        cfg = make_config(
            "dev",
            save_dir=str(tmp_path),
            method="iql",
            rollout_mode="continuous",
            continuous_exact_priority=True,
            exact_priority_in_rollout=True,
            num_envs=8,
            num_update_per_chunk=2,
            batchsize=4,
            burn_in_frames=8,
            replay_buffer_size=128,
            max_len=16,
            rnn_hid_dim=32,
            num_eps=4,
        )
        setup = learner.make_setup(cfg)
        state = learner.init_train_state(setup, jax.random.PRNGKey(0))
        state, _ = learner.make_collect_only(setup)(state)
        state, metrics = learner.make_train_chunk(setup)(state)
        assert np.isfinite(float(metrics["loss"]))
