"""Headline benchmark: Hanabi env-steps/s on one chip.

Measures the jitted vectorized 2-player env rollout with a random legal
policy (BASELINE.json config: "vectorized 2p env rollout, random legal
policy"), the direct counterpart of the reference's C++ actor throughput
(80 threads x 80 games, SURVEY.md §6). Baseline target: 1M env-steps/s/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    from hanabi_sad_tpu.game import GameConfig
    from hanabi_sad_tpu.game.env import EnvConfig, reset, step

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
    def rollout_chunk(keys, act_key):
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
    # compile + warmup; materialize on host so async dispatch can't fake speed
    np.asarray(rollout_chunk(keys, jax.random.PRNGKey(1)))

    reps = 5
    t0 = time.perf_counter()
    for i in range(reps):
        out = rollout_chunk(keys, jax.random.PRNGKey(2 + i))
    np.asarray(out)
    dt = time.perf_counter() - t0

    steps_per_s = reps * N * T / dt
    print(
        json.dumps(
            {
                "metric": "hanabi_env_steps_per_s_per_chip",
                "value": round(steps_per_s),
                "unit": "env-steps/s",
                "vs_baseline": round(steps_per_s / 1_000_000, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
