from hanabi_sad_tpu.rollout.runner import (
    RolloutOutput,
    run_episode_chunk,
    chunk_to_episodes,
    eval_rollout,
)

__all__ = ["RolloutOutput", "run_episode_chunk", "chunk_to_episodes", "eval_rollout"]
