"""Rollout tests: n-step return math vs a scalar reference implementation of
MultiStepBuffer::popTransition (rela/transition_buffer.h:51-99), episode
chunking/padding (R2D2Buffer semantics), and eval rollouts."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from hanabi_sad_tpu.agent import r2d2_agent
from hanabi_sad_tpu.agent.r2d2_agent import AgentConfig
from hanabi_sad_tpu.game import GameConfig
from hanabi_sad_tpu.game.env import EnvConfig
from hanabi_sad_tpu.models.r2d2_net import NetConfig
from hanabi_sad_tpu.rollout import runner
from hanabi_sad_tpu.rollout.runner import _n_step_process


def scalar_n_step(rewards, length, n, gamma):
    """Reference semantics, one env: returns (n_step_reward, bootstrap) lists.
    rewards beyond `length` are padding zeros."""
    T = len(rewards)
    out_r, out_b = [], []
    for t in range(T):
        boot = 1.0 if t + n <= length - 1 else 0.0  # no terminal in [t, t+n)
        acc = 0.0
        for k in reversed(range(n)):
            r = rewards[t + k] if (t + k) < min(T, length) else 0.0
            acc = r + gamma * acc
        out_r.append(acc)
        out_b.append(boot)
    return out_r, out_b


class TestNStep:
    def test_matches_scalar_reference(self):
        T, N, n, gamma = 12, 5, 3, 0.9
        rng = np.random.RandomState(0)
        lengths = rng.randint(1, T + 1, N)
        reward = np.zeros((T, N), np.float32)
        done = np.zeros((T, N), bool)
        for i, L in enumerate(lengths):
            reward[:L, i] = rng.randn(L)
            done[L - 1 :, i] = True
        nr, boot, seq_len = _n_step_process(
            jnp.asarray(reward), jnp.asarray(done), n, gamma
        )
        np.testing.assert_array_equal(np.asarray(seq_len), lengths.astype(np.float32))
        for i, L in enumerate(lengths):
            er, eb = scalar_n_step(reward[:, i], L, n, gamma)
            np.testing.assert_allclose(np.asarray(nr[:, i]), er, atol=1e-5)
            # bootstrap only meaningful for steps inside the episode
            np.testing.assert_array_equal(np.asarray(boot[:L, i]), eb[:L])
            assert (np.asarray(boot[L:, i]) == 0).all()

    def test_one_step(self):
        nr, boot, _ = _n_step_process(
            jnp.asarray([[1.0], [2.0], [3.0]]),
            jnp.asarray([[False], [False], [True]]),
            1,
            0.5,
        )
        np.testing.assert_allclose(np.asarray(nr[:, 0]), [1, 2, 3])
        np.testing.assert_allclose(np.asarray(boot[:, 0]), [1, 1, 0])


def small_setup(vdn):
    game = GameConfig(players=2)
    env_cfg = EnvConfig(game=game, eps_list=(0.5,), max_len=20, sad=False)
    net = NetConfig(in_dim=env_cfg.feature_size, hid_dim=32, out_dim=game.num_actions)
    agent_cfg = AgentConfig(net=net, vdn=vdn, multi_step=3, gamma=0.99, eta=0.9)
    params = r2d2_agent.init_agent(jax.random.PRNGKey(0), agent_cfg)
    return env_cfg, agent_cfg, params


class TestChunk:
    def run_chunk(self, vdn, n_envs=8):
        env_cfg, agent_cfg, params = small_setup(vdn)
        keys = jax.random.split(jax.random.PRNGKey(1), n_envs)
        out = jax.jit(
            functools.partial(
                runner.run_episode_chunk,
                agent_cfg=agent_cfg,
                env_cfg=env_cfg,
                num_steps=20,
            )
        )(params, keys=keys, act_key=jax.random.PRNGKey(2))
        return env_cfg, agent_cfg, params, out

    def test_chunk_shapes_and_done(self):
        env_cfg, agent_cfg, params, out = self.run_chunk(vdn=True)
        assert out.priv_s.shape == (20, 8, 2, env_cfg.feature_size)
        assert bool(np.asarray(out.done)[-1].all())  # max_len forces all done

    def test_vdn_episodes(self):
        env_cfg, agent_cfg, params, out = self.run_chunk(vdn=True)
        ep = runner.chunk_to_episodes(out, agent_cfg)
        assert ep.priv_s.shape == (8, 20, 2, env_cfg.feature_size)
        assert ep.seq_len.shape == (8,)
        # padding is zeroed beyond seq_len
        for i in range(8):
            L = int(ep.seq_len[i])
            assert np.asarray(ep.priv_s[i, L:]).sum() == 0
            assert np.asarray(ep.action[i, L:]).sum() == 0

    def test_iql_episodes_split_players(self):
        env_cfg, agent_cfg, params, out = self.run_chunk(vdn=False)
        ep = runner.chunk_to_episodes(out, agent_cfg)
        assert ep.priv_s.shape == (16, 20, 1, env_cfg.feature_size)
        # item 2i and 2i+1 share the env: same seq_len and reward stream
        sl = np.asarray(ep.seq_len)
        np.testing.assert_array_equal(sl[0::2], sl[1::2])
        np.testing.assert_allclose(
            np.asarray(ep.reward[0::2]), np.asarray(ep.reward[1::2])
        )
        # and their obs match the per-player slices of the chunk
        np.testing.assert_array_equal(
            np.asarray(ep.priv_s[0, :, 0]), np.asarray(out.priv_s[:, 0, 0] * (np.arange(20) < sl[0])[:, None])
        )
        np.testing.assert_array_equal(
            np.asarray(ep.priv_s[1, :, 0]), np.asarray(out.priv_s[:, 0, 1] * (np.arange(20) < sl[0])[:, None])
        )

    def test_priorities_finite(self):
        env_cfg, agent_cfg, params, out = self.run_chunk(vdn=True)
        ep = runner.chunk_to_episodes(out, agent_cfg)
        batch = runner.episodes_to_batch(ep)
        prio = r2d2_agent.compute_priority(params, agent_cfg, batch)
        assert prio.shape == (8,)
        assert np.isfinite(np.asarray(prio)).all() and (np.asarray(prio) >= 0).all()


class TestEval:
    def test_eval_rollout_completes(self):
        env_cfg, agent_cfg, params = small_setup(vdn=False)
        eval_env = EnvConfig(game=env_cfg.game, eps_list=(0.0,), max_len=-1, sad=False)
        keys = jax.random.split(jax.random.PRNGKey(7), 12)
        scores, done = jax.jit(
            functools.partial(
                runner.eval_rollout,
                agent_cfgs=[agent_cfg, agent_cfg],
                env_cfg=eval_env,
                num_steps=110,
            )
        )(params_per_player=[params, params], keys=keys)
        assert bool(np.asarray(done).all())
        s = np.asarray(scores)
        assert (s >= 0).all() and (s <= 25).all()

    def test_eval_deterministic(self):
        env_cfg, agent_cfg, params = small_setup(vdn=False)
        eval_env = EnvConfig(game=env_cfg.game, eps_list=(0.0,), max_len=-1, sad=False)
        keys = jax.random.split(jax.random.PRNGKey(3), 6)
        f = jax.jit(
            functools.partial(
                runner.eval_rollout,
                agent_cfgs=[agent_cfg, agent_cfg],
                env_cfg=eval_env,
                num_steps=110,
            )
        )
        s1, _ = f(params_per_player=[params, params], keys=keys)
        s2, _ = f(params_per_player=[params, params], keys=keys)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


class TestFastPriority:
    def test_matches_full_recompute(self):
        """compute_priority_from_rollout (rollout qa + one target forward)
        must equal compute_priority (two full-sequence forwards) exactly in
        f32 — they are the same math on identical hidden states."""
        for vdn in [True, False]:
            env_cfg, agent_cfg, params = small_setup(vdn)
            keys = jax.random.split(jax.random.PRNGKey(4), 6)
            out = jax.jit(
                functools.partial(
                    runner.run_episode_chunk,
                    agent_cfg=agent_cfg,
                    env_cfg=env_cfg,
                    num_steps=20,
                )
            )(params, keys=keys, act_key=jax.random.PRNGKey(5))
            ep = runner.chunk_to_episodes(out, agent_cfg)
            batch = runner.episodes_to_batch(ep)
            slow = r2d2_agent.compute_priority(params, agent_cfg, batch)
            online_qa, greedy_a = runner.rollout_priority_inputs(out, agent_cfg)
            fast = r2d2_agent.compute_priority_from_rollout(
                params, agent_cfg, batch, online_qa, greedy_a
            )
            np.testing.assert_allclose(
                np.asarray(fast), np.asarray(slow), rtol=1e-5, atol=1e-5,
                err_msg=f"vdn={vdn}",
            )


class TestScanUnroll:
    def test_unrolled_rollout_identical(self):
        """unroll is a pure scheduling knob: the continuous rollout stream for
        unroll 1 vs 4 matches up to refusion rounding (measured 1-2 ulp on
        qa), with bit-identical actions/rewards/dones at this seed."""
        import jax

        from hanabi_sad_tpu.rollout import continuous
        from hanabi_sad_tpu.train import learner
        from hanabi_sad_tpu.train.config import make_config

        cfg = make_config(
            "dev", save_dir="/tmp/x", num_envs=8, num_update_per_chunk=2,
            replay_buffer_size=512, burn_in_frames=1,
        )
        setup = learner.make_setup(cfg)
        keys = jax.random.split(jax.random.PRNGKey(0), cfg.num_envs)
        actor = continuous.init_actor_state(setup.agent, setup.env, setup.replay, keys)
        params = learner.init_train_state(setup, jax.random.PRNGKey(1)).params
        k = jax.random.PRNGKey(2)
        _, s1 = continuous.run_continuous_chunk(
            params, setup.agent, setup.env, actor, k, 20, unroll=1
        )
        _, s4 = continuous.run_continuous_chunk(
            params, setup.agent, setup.env, actor, k, 20, unroll=4
        )
        for a, b, name in zip(s1, s4, s1._fields):
            if a is None:  # optional fields (tqa) absent in this config
                assert b is None, name
                continue
            atol = 1e-6 if np.asarray(a).dtype == np.float32 else 0
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=atol, err_msg=name
            )

    def test_unrolled_lstm_seq_identical(self):
        import jax
        import jax.numpy as jnp

        from hanabi_sad_tpu.models import lstm as lstm_mod

        key = jax.random.PRNGKey(0)
        params = lstm_mod.init_lstm(key, 16, 32, 2)
        xs = jax.random.normal(jax.random.PRNGKey(1), (11, 4, 16))
        hid = lstm_mod.zero_hidden(2, 4, 32)
        o1, h1 = lstm_mod.lstm_seq(params, xs, hid, unroll=1)
        o3, h3 = lstm_mod.lstm_seq(params, xs, hid, unroll=3)
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o3))
        np.testing.assert_array_equal(np.asarray(h1[0]), np.asarray(h3[0]))
