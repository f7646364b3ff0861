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
            print(f"  cell ({i},{j}): {mean:.2f}", flush=True)
    return scores, perfect


def relabel_table(policies, num_game: int, seed: int, bomb: int = 0):
    """Self-play vs self-play-under-relabeling, per model.

    The Other-Play paper's cross-play metric: pair a policy with a clone of
    itself that observes the game through an independent random color
    permutation per seat (evaluate(..., shuffle_color=True)). A policy whose
    conventions are color-symmetric (OP-trained) keeps its score; a policy
    with arbitrary color conventions (plain SAD) collapses. This gives the
    intra-family cross-play signal of models/op_raw_data.txt with a single
    trained seed per family.
    """
    plain = np.zeros(len(policies))
    relabeled = np.zeros(len(policies))
    for i, p in enumerate(policies):
        # Same seed for both calls: identical decks, only color_perm differs
        # (tests/test_tools.py shows the perm is the sole divergence), so the
        # drop column is a paired comparison, not deck-draw noise.
        plain[i] = evaluate([p, p], num_game, seed + i, bomb)[0]
        relabeled[i] = evaluate(
            [p, p], num_game, seed + i, bomb, shuffle_color=True
        )[0]
    return plain, relabeled


def render_relabel(plain: np.ndarray, relabeled: np.ndarray, names) -> str:
    lines = [
        "cross-play under color relabeling (OP metric):",
        f"{'model':>14} {'self-play':>10} {'relabeled':>10} {'drop':>8}",
    ]
    for i, name in enumerate(names):
        lines.append(
            f"{name[:14]:>14} {plain[i]:10.2f} {relabeled[i]:10.2f}"
            f" {plain[i] - relabeled[i]:8.2f}"
        )
    return "\n".join(lines)


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
    parser.add_argument(
        "--relabel",
        action="store_true",
        help="also report self-play under per-seat color relabeling (OP metric)",
    )
    args = parser.parse_args(argv)
    # After parse_args so `--help` neither imports jax nor creates cache dirs.
    from hanabi_sad_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    policies = [loaders.load_any(w) for w in args.weights]
    names = [w.rsplit("/", 1)[-1] for w in args.weights]
    scores, perfect = crossplay_matrix(policies, args.num_game, args.seed, args.bomb)
    text = render(scores, names)
    sidecar = {"scores": scores, "perfect": perfect}
    if args.relabel:
        plain, relabeled = relabel_table(policies, args.num_game, args.seed + 7777, args.bomb)
        text += "\n\n" + render_relabel(plain, relabeled, names)
        sidecar.update(relabel_plain=plain, relabel_relabeled=relabeled)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
        np.savez(args.out + ".npz", **sidecar)
    return scores, perfect


if __name__ == "__main__":
    main()
