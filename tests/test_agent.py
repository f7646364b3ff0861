"""Agent tests: eps-greedy acting, n-step TD target math (roll trick vs brute
force), Huber loss, priority aggregation (r2d2.py:383-499, r2d2_actor.h:10-21)."""

import jax
import jax.numpy as jnp
import numpy as np

from hanabi_sad_tpu.agent import r2d2_agent
from hanabi_sad_tpu.agent.r2d2_agent import AgentConfig, Batch, init_agent
from hanabi_sad_tpu.models.r2d2_net import NetConfig


def make_agent(vdn=False, out_dim=6, in_dim=12):
    cfg = AgentConfig(
        net=NetConfig(in_dim=in_dim, hid_dim=16, out_dim=out_dim, num_lstm_layer=2),
        vdn=vdn,
        multi_step=3,
        gamma=0.9,
        eta=0.9,
    )
    return cfg, init_agent(jax.random.PRNGKey(0), cfg)


def make_batch(cfg, T=10, B=4, Pi=1, seed=0):
    rng = np.random.RandomState(seed)
    A = cfg.net.out_dim
    seq_len = rng.randint(2, T + 1, size=B).astype(np.float32)
    valid = np.arange(T)[:, None] < seq_len[None, :]
    legal = (rng.rand(T, B, Pi, A) > 0.4).astype(np.float32)
    legal[..., 0] = 1.0
    priv = rng.randn(T, B, Pi, cfg.net.in_dim).astype(np.float32) * valid[..., None, None]
    reward = (rng.randn(T, B) * valid).astype(np.float32)
    terminal = (~valid).copy()
    for b in range(B):
        terminal[int(seq_len[b]) - 1, b] = True
    bootstrap = (
        np.arange(T)[:, None] < (seq_len[None, :] - cfg.multi_step)
    ).astype(np.float32)
    return Batch(
        priv_s=jnp.asarray(priv),
        legal_move=jnp.asarray(legal),
        action=jnp.asarray(rng.randint(0, A, size=(T, B, Pi)), dtype=jnp.int32),
        own_hand=jnp.asarray(rng.rand(T, B, Pi, 15) > 0.5, dtype=jnp.float32),
        reward=jnp.asarray(reward),
        terminal=jnp.asarray(terminal),
        bootstrap=jnp.asarray(bootstrap),
        seq_len=jnp.asarray(seq_len),
    )


class TestAct:
    def test_eps_zero_is_greedy_and_legal(self):
        cfg, params = make_agent()
        N, P = 8, 2
        key = jax.random.PRNGKey(1)
        legal = (jax.random.uniform(key, (N, P, cfg.net.out_dim)) > 0.5).astype(jnp.float32)
        legal = legal.at[..., 0].set(1.0)
        obs = {
            "priv_s": jax.random.normal(key, (N, P, cfg.net.in_dim)),
            "legal_move": legal,
            "eps": jnp.zeros((N, P)),
        }
        hidden = r2d2_agent.init_hidden(cfg, N, P)
        reply, new_hidden = r2d2_agent.act(params, cfg, obs, hidden, jax.random.PRNGKey(2))
        np.testing.assert_array_equal(np.asarray(reply["a"]), np.asarray(reply["greedy_a"]))
        taken = np.take_along_axis(np.asarray(legal), np.asarray(reply["a"])[..., None], -1)
        assert (taken == 1).all()
        assert not np.allclose(np.asarray(new_hidden.h), 0)

    def test_eps_one_is_uniform_legal(self):
        cfg, params = make_agent()
        N, P = 64, 2
        legal = jnp.zeros((N, P, cfg.net.out_dim)).at[..., :2].set(1.0)
        obs = {
            "priv_s": jnp.zeros((N, P, cfg.net.in_dim)),
            "legal_move": legal,
            "eps": jnp.ones((N, P)),
        }
        hidden = r2d2_agent.init_hidden(cfg, N, P)
        reply, _ = r2d2_agent.act(params, cfg, obs, hidden, jax.random.PRNGKey(3))
        a = np.asarray(reply["a"])
        assert set(np.unique(a)).issubset({0, 1})
        assert 0.2 < (a == 0).mean() < 0.8  # both arms sampled

    def test_hidden_reset(self):
        cfg, params = make_agent()
        hidden = r2d2_agent.Hidden(
            h=jnp.ones((4, 2, 2, 16)), c=jnp.ones((4, 2, 2, 16))
        )
        done = jnp.asarray([True, False, True, False])
        out = r2d2_agent.reset_hidden_where(done, hidden)
        h = np.asarray(out.h)
        assert (h[0] == 0).all() and (h[2] == 0).all()
        assert (h[1] == 1).all() and (h[3] == 1).all()


class TestTDError:
    def brute_force_target(self, cfg, batch, target_qa_full):
        """Direct n-step target: bootstrap from target Q at t+n."""
        T, B = batch.reward.shape
        n = cfg.multi_step
        tq = np.asarray(target_qa_full)
        target = np.zeros((T, B), np.float32)
        for t in range(T):
            boot = np.asarray(batch.bootstrap)[t]
            nxt = tq[t + n] if t + n < T else np.zeros(B, np.float32)
            target[t] = np.asarray(batch.reward)[t] + boot * (cfg.gamma ** n) * nxt
        return target

    def test_roll_trick_equals_brute_force(self):
        cfg, params = make_agent(vdn=False)
        batch = make_batch(cfg)
        err, _ = r2d2_agent.td_error(params, cfg, batch)

        # recompute pieces manually
        from hanabi_sad_tpu.models import r2d2_net

        T, B, Pi = batch.priv_s.shape[:3]
        priv = batch.priv_s.reshape(T, B, -1)
        legal = batch.legal_move.reshape(T, B, -1)
        action = batch.action.reshape(T, B)
        online_qa, greedy, _, _ = r2d2_net.forward(params.online, cfg.net, priv, legal, action)
        target_qa, _, _, _ = r2d2_net.forward(params.target, cfg.net, priv, legal, greedy)
        target = self.brute_force_target(cfg, batch, target_qa)
        mask = np.arange(T)[:, None] < np.asarray(batch.seq_len)[None, :]
        expected = (target - np.asarray(online_qa)) * mask
        np.testing.assert_allclose(np.asarray(err), expected, atol=1e-5)

    def test_vdn_sums_players(self):
        cfg, params = make_agent(vdn=True)
        batch = make_batch(cfg, Pi=2)
        err, lstm_o = r2d2_agent.td_error(params, cfg, batch)
        assert err.shape == batch.reward.shape
        assert lstm_o.shape[:3] == (10, 4, 2)

    def test_err_masked_beyond_seq_len(self):
        cfg, params = make_agent()
        batch = make_batch(cfg)
        err, _ = r2d2_agent.td_error(params, cfg, batch)
        mask = np.arange(10)[:, None] >= np.asarray(batch.seq_len)[None, :]
        assert (np.asarray(err)[mask] == 0).all()


class TestLoss:
    def test_huber(self):
        x = jnp.asarray([-2.0, -0.5, 0.0, 0.5, 2.0])
        np.testing.assert_allclose(
            np.asarray(r2d2_agent._huber(x)), [1.5, 0.125, 0.0, 0.125, 1.5]
        )

    def test_loss_and_grads(self):
        cfg, params = make_agent()
        batch = make_batch(cfg)

        def total(p):
            l, _, _ = r2d2_agent.loss(p, cfg, batch, pred_weight=0.25)
            return l.mean()

        val, grads = jax.value_and_grad(total)(params)
        assert np.isfinite(float(val))
        # online net gets gradients; target net must get none
        online_norm = sum(
            float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads.online)
        )
        target_norm = sum(
            float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads.target)
        )
        assert online_norm > 0 and target_norm == 0

    def test_aux_loss_changes_total(self):
        cfg, params = make_agent()
        batch = make_batch(cfg)
        l0, _, s0 = r2d2_agent.loss(params, cfg, batch, pred_weight=0.0)
        l1, _, s1 = r2d2_agent.loss(params, cfg, batch, pred_weight=0.5)
        assert not np.allclose(np.asarray(l0), np.asarray(l1))
        assert "aux1" in s1 and "aux1" not in s0


class TestAggregatePriority:
    def test_matches_reference_formula(self):
        T, B = 6, 3
        rng = np.random.RandomState(0)
        p = np.abs(rng.randn(T, B)).astype(np.float32)
        seq_len = np.asarray([6, 3, 1], np.float32)
        out = np.asarray(
            r2d2_agent.aggregate_priority(jnp.asarray(p), jnp.asarray(seq_len), 0.9)
        )
        for b in range(B):
            valid = p[: int(seq_len[b]), b]
            expected = 0.9 * valid.max() + 0.1 * valid.sum() / seq_len[b]
            np.testing.assert_allclose(out[b], expected, rtol=1e-6)

    def test_uniform_priority(self):
        cfg, params = make_agent()
        cfg = AgentConfig(
            net=cfg.net, vdn=False, multi_step=3, gamma=0.9, eta=0.9, uniform_priority=True
        )
        batch = make_batch(cfg)
        p = r2d2_agent.compute_priority(params, cfg, batch)
        np.testing.assert_array_equal(np.asarray(p), np.ones(4, np.float32))

    def test_sync_target(self):
        cfg, params = make_agent()
        batch = make_batch(cfg)

        def total(p):
            l, _, _ = r2d2_agent.loss(p, cfg, batch, 0.0)
            return l.mean()

        g = jax.grad(total)(params)
        new_online = jax.tree_util.tree_map(lambda p, gg: p - 0.1 * gg, params.online, g.online)
        params = r2d2_agent.AgentParams(online=new_online, target=params.target)
        synced = r2d2_agent.sync_target(params)
        for a, b in zip(
            jax.tree_util.tree_leaves(synced.online), jax.tree_util.tree_leaves(synced.target)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestStackedTD:
    def test_stacked_matches_unstacked(self):
        """stacked_td merges the online+target sequence forwards into one
        scan over stacked params; err, lstm_o, loss, priorities, and the
        online gradients must all match the two-scan reference."""
        import dataclasses as _dc

        cfg, params = make_agent(vdn=True)
        # desync target so the target slice actually matters
        params = params._replace(
            target=jax.tree_util.tree_map(
                lambda x: x + 0.05 * jnp.sin(jnp.arange(x.size, dtype=jnp.float32)).reshape(x.shape),
                params.target,
            )
        )
        batch = make_batch(cfg, Pi=2)
        scfg = _dc.replace(cfg, stacked_td=True)

        err0, o0 = r2d2_agent.td_error(params, cfg, batch)
        err1, o1 = r2d2_agent.td_error(params, scfg, batch)
        np.testing.assert_allclose(np.asarray(err1), np.asarray(err0), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o0), rtol=1e-5, atol=1e-5)

        def total(p, c):
            ap = r2d2_agent.AgentParams(online=p, target=params.target)
            l, prio, _ = r2d2_agent.loss(ap, c, batch, pred_weight=0.25)
            return l.mean(), prio

        (l0, p0), g0 = jax.value_and_grad(lambda p: total(p, cfg), has_aux=True)(params.online)
        (l1, p1), g1 = jax.value_and_grad(lambda p: total(p, scfg), has_aux=True)(params.online)
        np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p0), rtol=1e-5, atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5)
