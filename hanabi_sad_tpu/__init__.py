"""hanabi_sad_tpu — a TPU-native framework for Simplified Action Decoder (SAD)
and Other-Play (OP) on Hanabi.

A ground-up re-design of the capabilities of facebookresearch/hanabi_SAD for
TPU hardware: the Hanabi game engine, canonical observation encoder, R2D2
actor/learner, prioritized replay, and self-play training all live on-device
as one SPMD JAX program (jit / vmap / lax.scan / jax.sharding), replacing the
reference's C++ thread pools, dynamic batchers and CPU ring buffers.

Layer map (mirrors SURVEY.md §1 of the reference, re-expressed TPU-first):
  game/      vectorized pure-functional Hanabi rules + canonical encoder
             (replaces hanabi-learning-environment + cpp/hanabi_env.cc)
  models/    dueling LSTM Q-networks as param pytrees (replaces pyhanabi/r2d2.py nets)
  agent/     R2D2 agent: act / priorities / TD loss / aux loss (r2d2.py logic)
  replay/    HBM-resident prioritized sequence replay (rela/prioritized_replay.h)
  rollout/   scan-based actor: episode chunks, n-step returns (rela/r2d2_actor.h,
             rela/transition_buffer.h, cpp/thread_loop.h)
  parallel/  device mesh / sharding helpers (new: the reference is single-host)
  train/     self-play driver, eval harness, checkpointing (pyhanabi/selfplay.py, eval.py)
  utils/     logging, top-k saver, counters, stopwatch (pyhanabi/common_utils)
  tools/     eval CLI, action matrix, model conversion (pyhanabi/tools)
  native/    independent C++ Hanabi engine used as a parity oracle for tests
"""

__version__ = "0.1.0"

from hanabi_sad_tpu.game.config import GameConfig  # noqa: F401
