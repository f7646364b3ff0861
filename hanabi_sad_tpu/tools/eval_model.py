"""Pretrained-model evaluation CLI (reference pyhanabi/tools/eval_model.py).

Examples:
  # self-play of a checkpoint (ours or a reference .pthw)
  python -m hanabi_sad_tpu.tools.eval_model --weight exps/dev/model0.pkl --num_player 2

  # cross-play of two OP-paper release models
  python -m hanabi_sad_tpu.tools.eval_model --paper op --root models/op \
      --method sad-aux-op --idx1 1 --idx2 3

  # released OBL model
  python -m hanabi_sad_tpu.tools.eval_model --paper obl --obl_path models/obl/obl.pthw
"""

from __future__ import annotations

import argparse

import numpy as np

from hanabi_sad_tpu.tools import loaders
from hanabi_sad_tpu.train.evaluate import evaluate


def evaluate_agents(policies, num_game, seed, bomb, num_run=1, verbose=True):
    scores = []
    perfect = 0
    for i in range(num_run):
        _, _, score, p = evaluate(policies, num_game, num_game * i + seed, bomb)
        scores.extend(score)
        perfect += p
    mean = float(np.mean(scores))
    sem = float(np.std(scores) / np.sqrt(len(scores)))
    perfect_rate = perfect / (num_game * num_run)
    if verbose:
        print("score: %f +/- %f" % (mean, sem), "; perfect: ", perfect_rate)
    return mean, sem, perfect_rate


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--paper", default="sad", type=str, help="sad/op/obl")
    parser.add_argument("--num_game", default=5000, type=int)
    parser.add_argument("--num_run", default=1, type=int)
    parser.add_argument("--seed", default=1, type=int)
    parser.add_argument("--bomb", default=0, type=int)
    # sad-paper / native checkpoints
    parser.add_argument("--weight", default=None, type=str)
    parser.add_argument("--weight2", default=None, type=str, help="cross-play seat 2")
    parser.add_argument("--num_player", default=2, type=int)
    parser.add_argument("--hand_size", default=5, type=int)
    # op-paper release grid
    parser.add_argument("--root", default="models/op", type=str)
    parser.add_argument("--method", default="sad-aux-op", type=str)
    parser.add_argument("--idx1", default=1, type=int)
    parser.add_argument("--idx2", default=1, type=int)
    # obl
    parser.add_argument("--obl_path", default=None, type=str)
    args = parser.parse_args(argv)
    # After parse_args so `--help` neither imports jax nor creates cache dirs.
    from hanabi_sad_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    if args.paper == "sad":
        assert args.weight, "--weight required"
        p1 = loaders.load_any(args.weight, args.hand_size)
        p2 = loaders.load_any(args.weight2 or args.weight, args.hand_size)
        policies = [p1] + [p2] * (args.num_player - 1)
    elif args.paper == "op":
        p1 = loaders.load_op_model(args.root, args.method, args.idx1, args.hand_size)
        p2 = loaders.load_op_model(args.root, args.method, args.idx2, args.hand_size)
        policies = [p1, p2]
    elif args.paper == "obl":
        p = loaders.load_obl_model(args.obl_path)
        policies = [p, p]
    else:
        raise ValueError(f"unknown --paper {args.paper}")

    return evaluate_agents(
        policies, args.num_game, args.seed, args.bomb, num_run=args.num_run
    )


if __name__ == "__main__":
    main()
