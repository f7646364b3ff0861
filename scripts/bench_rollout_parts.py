"""Micro-benchmark: decompose the continuous-rollout chunk's serial floor.

The round-3 on-chip profile attributed ~182 ms/chunk to the 80-step env scan
and ~99 ms to the act scan at 1024 envs (BENCHMARKS.md). This script times
the scan variants that isolate each component so the round-4 perf work
(VERDICT round-3 "what's weak" #1) attacks the right term:

  full      act + step_autoreset + observe      (the production body)
  act       act only, frozen obs                (network serial floor)
  env       step_autoreset + observe, fixed a   (env serial floor)
  noreset   step_state + observe, fixed a       (env floor minus the
                                                 per-step reset machinery:
                                                 deck shuffle sort, threefry
                                                 splits, eps/perm sampling)
  encode    observe only on a frozen state      (encoder floor)

env - noreset ~= the per-step cost of computing a fresh reset for every env
every step (selected only where done) — the candidate to hoist into a
per-chunk precomputed reset pool.

Run on the real chip:  python -u scripts/bench_rollout_parts.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from hanabi_sad_tpu.game import env as env_mod
from hanabi_sad_tpu.game.config import GameConfig
from hanabi_sad_tpu.game.env import EnvConfig
from hanabi_sad_tpu.agent import r2d2_agent
from hanabi_sad_tpu.agent.r2d2_agent import AgentConfig
from hanabi_sad_tpu.models.r2d2_net import NetConfig
from hanabi_sad_tpu.train.config import generate_explore_eps

N = 1024
T = 80
REPS = 5


def timed(fn, *args):
    out = jax.block_until_ready(fn(*args))  # compile
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    game = GameConfig(players=2)
    env_cfg = EnvConfig(
        game=game,
        eps_list=generate_explore_eps(0.1, 7.0, 80),
        max_len=T,
        sad=True,
    )
    net = NetConfig(
        in_dim=env_cfg.feature_size, hid_dim=512, out_dim=game.num_actions,
        num_lstm_layer=2, hand_size=5, compute_dtype="bfloat16",
    )
    agent_cfg = AgentConfig(net=net, vdn=True, multi_step=3, gamma=0.999, eta=0.9)

    key = jax.random.PRNGKey(0)
    params = r2d2_agent.init_agent(key, agent_cfg).online
    aparams = r2d2_agent.AgentParams(online=params, target=params)
    keys = jax.random.split(jax.random.PRNGKey(1), N)
    env_state, obs = jax.jit(jax.vmap(lambda k: env_mod.reset(env_cfg, k)))(keys)
    hidden = r2d2_agent.init_hidden(agent_cfg, N, 2)
    step_keys = jax.random.split(jax.random.PRNGKey(2), T)

    # fixed "always legal" action: argmax of legal mask + its greedy twin
    fixed_a = jnp.argmax(obs["legal_move"], axis=-1).astype(jnp.int32)
    fixed_action = {"a": fixed_a, "greedy_a": fixed_a}

    @jax.jit
    def full(env_state, obs, hidden):
        def body(carry, k):
            s, o, h = carry
            reply, h = r2d2_agent.act(aparams, agent_cfg, o, h, k, return_q=True)
            s, o, r, d, sc = jax.vmap(
                lambda ss, aa: env_mod.step_autoreset(env_cfg, ss, aa)
            )(s, reply)
            h = r2d2_agent.reset_hidden_where(d, h)
            return (s, o, h), r
        (s, o, h), rs = jax.lax.scan(body, (env_state, obs, hidden), step_keys)
        return rs.sum()

    @jax.jit
    def act_only(obs, hidden):
        def body(h, k):
            reply, h = r2d2_agent.act(aparams, agent_cfg, obs, h, k, return_q=True)
            return h, reply["qa"]
        h, qa = jax.lax.scan(body, hidden, step_keys)
        return qa.sum()

    @jax.jit
    def env_only(env_state):
        def body(s, _):
            s, o, r, d, sc = jax.vmap(
                lambda ss, aa: env_mod.step_autoreset(env_cfg, ss, aa)
            )(s, fixed_action)
            # consume obs so the encode isn't dead code
            return s, (r, o["priv_s"].sum())
        s, (rs, osum) = jax.lax.scan(body, env_state, None, length=T)
        return rs.sum() + osum.sum()

    @jax.jit
    def env_noreset(env_state):
        def body(s, _):
            s, r, d = jax.vmap(
                lambda ss, aa: env_mod.step_state(env_cfg, ss, aa)
            )(s, fixed_action)
            o = jax.vmap(lambda ss: env_mod.observe(env_cfg, ss))(s)
            return s, (r, o["priv_s"].sum())
        s, (rs, osum) = jax.lax.scan(body, env_state, None, length=T)
        return rs.sum() + osum.sum()

    @jax.jit
    def encode_only(env_state):
        def body(c, _):
            o = jax.vmap(lambda ss: env_mod.observe(env_cfg, ss))(env_state)
            return c + 1, o["priv_s"].sum()
        c, osum = jax.lax.scan(body, jnp.zeros(()), None, length=T)
        return osum.sum()

    results = {}
    for name, fn, args in [
        ("full", full, (env_state, obs, hidden)),
        ("act", act_only, (obs, hidden)),
        ("env", env_only, (env_state,)),
        ("noreset", env_noreset, (env_state,)),
        ("encode", encode_only, (env_state,)),
    ]:
        v = results[name] = timed(fn, *args)
        print(f"{name:8s} {v * 1e3:8.1f} ms/chunk  ({N * T / v / 1e6:6.2f}M env-steps/s)")
    print(
        f"reset machinery (env - noreset): "
        f"{(results['env'] - results['noreset']) * 1e3:.1f} ms"
    )
    print(
        f"step_state (noreset - encode): "
        f"{(results['noreset'] - results['encode']) * 1e3:.1f} ms"
    )


if __name__ == "__main__":
    main()
