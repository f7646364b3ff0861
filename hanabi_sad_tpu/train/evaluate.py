"""Batched evaluation harness (reference pyhanabi/eval.py).

evaluate(policies, ...) plays num_game greedy games with one policy per seat
(cross-play when the policies differ — the reference achieves this with
per-player BatchRunners, eval.py:42-49 + thread_loop.h:61-70) and returns
(mean score, perfect rate, scores, num_perfect)."""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hanabi_sad_tpu.game.config import GameConfig
from hanabi_sad_tpu.game.env import EnvConfig
from hanabi_sad_tpu.rollout import runner


def evaluate(
    policies: Sequence,  # List[EvalPolicy], one per seat
    num_game: int,
    seed: int,
    bomb: int = 0,
    *,
    hand_size: int = 5,
    num_steps: int = 128,
    return_actions: bool = False,
    shuffle_color: bool = False,
):
    num_player = len(policies)
    sad = policies[0].sad
    assert all(p.sad == sad for p in policies), "mixed sad/non-sad seats"
    env_cfg = EnvConfig(
        game=GameConfig(players=num_player, hand_size=hand_size, bomb=bomb),
        eps_list=(0.0,),
        max_len=-1,
        sad=sad,
        # Other-Play's cross-play-under-relabeling metric (OP paper §4; the
        # reference evaluates OP zoo models pairwise instead, op_raw_data.txt):
        # each seat observes the game through an independent random color
        # permutation, i.e. self-play with a relabeled clone of the partner.
        shuffle_color=shuffle_color,
    )

    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(seed), i))(
        jnp.arange(num_game)
    )
    fn = jax.jit(
        functools.partial(
            runner.eval_rollout,
            agent_cfgs=[p.agent_cfg for p in policies],
            env_cfg=env_cfg,
            num_steps=num_steps,
            act_fns=[p.act_fn for p in policies],
            return_actions=return_actions,
        )
    )
    out = fn(params_per_player=[p.params for p in policies], keys=keys)
    if return_actions:
        scores, done, actions, was_done = out
    else:
        scores, done = out
    if not bool(np.asarray(done).all()):
        raise RuntimeError("eval games did not finish; raise num_steps")
    scores = np.asarray(scores)
    num_perfect = int((scores == 25).sum())
    base = (float(scores.mean()), num_perfect / len(scores), scores.tolist(), num_perfect)
    if return_actions:
        return base + (np.asarray(actions), np.asarray(was_done))
    return base
