"""Cross-play score matrix over a set of models.

Regenerates the evaluation artifact the reference ships as
models/op_raw_data.txt (SURVEY.md §6): an N x N matrix of 2-player scores
where entry (i, j) pairs model i in seat 0 with model j in seat 1 — the
diagonal is self-play, off-diagonal is cross-play (the Other-Play metric).

  python -m hanabi_sad_tpu.tools.crossplay_matrix \
      --weights a.pkl b.pkl c.pthw --num_game 1000 --out xp.txt
"""

from __future__ import annotations

import argparse

import numpy as np

from hanabi_sad_tpu.tools import loaders
from hanabi_sad_tpu.train.evaluate import evaluate


def crossplay_matrix(policies, num_game: int, seed: int, bomb: int = 0):
    n = len(policies)
    scores = np.zeros((n, n))
    perfect = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            mean, prate, _, _ = evaluate(
                [policies[i], policies[j]], num_game, seed + i * n + j, bomb
            )
            scores[i, j] = mean
            perfect[i, j] = prate
    return scores, perfect


def render(scores: np.ndarray, names) -> str:
    lines = []
    n = scores.shape[0]
    header = "        " + " ".join(f"{name[:8]:>8}" for name in names)
    lines.append(header)
    for i in range(n):
        row = " ".join(f"{scores[i, j]:8.2f}" for j in range(n))
        lines.append(f"{names[i][:7]:>7} {row}")
    lines.append("")
    lines.append("row means (incl. diagonal, the OP paper metric):")
    for i in range(n):
        lines.append(f"  {names[i][:12]}: self {scores[i, i]:.2f}, row mean {scores[i].mean():.2f}")
    return "\n".join(lines)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--weights", nargs="+", required=True)
    parser.add_argument("--num_game", default=1000, type=int)
    parser.add_argument("--seed", default=1, type=int)
    parser.add_argument("--bomb", default=0, type=int)
    parser.add_argument("--out", default=None, type=str)
    args = parser.parse_args(argv)
    # After parse_args so `--help` neither imports jax nor creates cache dirs.
    from hanabi_sad_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    policies = [loaders.load_any(w) for w in args.weights]
    names = [w.rsplit("/", 1)[-1] for w in args.weights]
    scores, perfect = crossplay_matrix(policies, args.num_game, args.seed, args.bomb)
    text = render(scores, names)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
        np.savez(args.out + ".npz", scores=scores, perfect=perfect)
    return scores, perfect


if __name__ == "__main__":
    main()
