"""Pick the best-evaluating checkpoint among candidates and copy it to a
target path.

Usage:  python scripts/pick_best.py OUT.pkl CAND1.pkl CAND2.pkl ... \
            [--num_game 1000] [--seed 11]

Greedy self-play eval (train/evaluate.py) of each existing candidate; the
highest mean score wins. Used by the chip queues to choose the per-lineage
artifact (best single vs soup variants) that feeds the cross-play matrix and
docs/runs, replacing eyeballed selection.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("out")
    p.add_argument("candidates", nargs="+")
    p.add_argument("--num_game", type=int, default=1000)
    p.add_argument("--seed", type=int, default=11)
    p.add_argument("--num_player", type=int, default=2)
    args = p.parse_args(argv)

    from hanabi_sad_tpu.tools import loaders
    from hanabi_sad_tpu.train.evaluate import evaluate
    from hanabi_sad_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    results = []
    for path in args.candidates:
        if not os.path.exists(path):
            print(f"skip (missing): {path}")
            continue
        pol = loaders.load_any(path)
        _, _, scores, perfect = evaluate(
            [pol] * args.num_player, args.num_game, args.seed, 0
        )
        mean = float(np.mean(scores))
        sem = float(np.std(scores) / np.sqrt(len(scores)))
        print(f"{path}: {mean:.4f} +/- {sem:.4f}, perfect {perfect / args.num_game:.3f}")
        results.append((mean, path))
    if not results:
        raise SystemExit("no candidates found")
    best = max(results)
    if os.path.abspath(best[1]) == os.path.abspath(args.out):
        print(f"best: {best[1]} ({best[0]:.4f}) — incumbent kept")
    else:
        shutil.copyfile(best[1], args.out)
        print(f"best: {best[1]} ({best[0]:.4f}) -> {args.out}")


if __name__ == "__main__":
    main()
