"""Headline benchmark: LIVE Hanabi env-steps/s on one chip.

Measures the jitted vectorized 2-player env rollout with a random legal
policy (BASELINE.json config: "vectorized 2p env rollout, random legal
policy"), the direct counterpart of the reference's C++ actor throughput
(80 threads x 80 games, SURVEY.md §6). Baseline target: 1M env-steps/s/chip.

Every counted frame is a real game frame: the rollout uses step_autoreset
(the production continuous path), so an env that finishes an episode is
immediately re-dealt instead of spinning frozen no-op frames until the chunk
ends. The older fixed-horizon variant (step without reset; counts padded
frames after bomb-out) is reported alongside as "padded_steps_per_s" for
continuity with round-1 numbers.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def main():
    from hanabi_sad_tpu.game import GameConfig
    from hanabi_sad_tpu.game.env import EnvConfig, reset, step, step_autoreset

    cfg = EnvConfig(
        game=GameConfig(players=2), eps_list=(0.1,), max_len=80, sad=True
    )
    # 32768 envs is the measured throughput sweet spot on one v5e chip
    # (BENCHMARKS.md: 4k 4.45M / 8k 5.60M / 32k 6.73M / 64k 6.50M steps/s).
    N = 32768
    T = 80

    def pick(key, legal):
        logits = jnp.where(legal > 0, 0.0, -jnp.inf)
        return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)

    @jax.jit
    def rollout_live(keys, act_key):
        env_state, obs = jax.vmap(lambda k: reset(cfg, k))(keys)

        def body(carry, k):
            env_state, obs, n_done, score_sum = carry
            a = pick(k, obs["legal_move"])
            env_state, obs, r, d, sc = jax.vmap(
                lambda s, aa: step_autoreset(cfg, s, aa)
            )(env_state, {"a": a, "greedy_a": a})
            n_done = n_done + d.sum(dtype=jnp.int32)
            score_sum = score_sum + jnp.where(d, sc, 0).sum(dtype=jnp.int32)
            return (env_state, obs, n_done, score_sum), None

        init = (env_state, obs, jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
        (env_state, _, n_done, score_sum), _ = jax.lax.scan(
            init=init, xs=jax.random.split(act_key, T), f=body
        )
        return n_done, score_sum

    @jax.jit
    def rollout_padded(keys, act_key):
        env_state, obs = jax.vmap(lambda k: reset(cfg, k))(keys)

        def body(carry, k):
            env_state, obs = carry
            a = pick(k, obs["legal_move"])
            env_state, obs, r, d = jax.vmap(lambda s, aa: step(cfg, s, aa))(
                env_state, {"a": a, "greedy_a": a}
            )
            return (env_state, obs), None

        (env_state, _), _ = jax.lax.scan(
            body, (env_state, obs), jax.random.split(act_key, T)
        )
        return env_state.last_score

    import numpy as np

    keys = jax.random.split(jax.random.PRNGKey(0), N)
    reps = 5

    # --- live (auto-reset) rollout: the headline ---
    np.asarray(rollout_live(keys, jax.random.PRNGKey(1)))  # compile + warmup
    t0 = time.perf_counter()
    for i in range(reps):
        out = rollout_live(keys, jax.random.PRNGKey(2 + i))
    n_done, score_sum = (np.asarray(x) for x in out)
    dt = time.perf_counter() - t0
    live_steps_per_s = reps * N * T / dt
    if n_done > 0:
        print(
            f"live rollout: {int(n_done)} episodes/chunk, "
            f"mean random-play score {score_sum / n_done:.2f}",
            file=sys.stderr,
        )

    # --- fixed-horizon (padded) rollout: round-1 continuity ---
    np.asarray(rollout_padded(keys, jax.random.PRNGKey(1)))
    t0 = time.perf_counter()
    for i in range(reps):
        out = rollout_padded(keys, jax.random.PRNGKey(2 + i))
    np.asarray(out)
    padded_steps_per_s = reps * N * T / (time.perf_counter() - t0)

    print(
        json.dumps(
            {
                "metric": "hanabi_live_env_steps_per_s_per_chip",
                "value": round(live_steps_per_s),
                "unit": "env-steps/s",
                "vs_baseline": round(live_steps_per_s / 1_000_000, 3),
                "padded_steps_per_s": round(padded_steps_per_s),
            }
        )
    )


if __name__ == "__main__":
    main()
