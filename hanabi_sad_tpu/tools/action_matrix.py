"""Policy-convention analysis (reference pyhanabi/tools/action_matrix.py):
tabulate P(next action | previous action) over greedy self-play games — the
20x20 matrix that visualizes the conventions a trained policy adopts.

  python -m hanabi_sad_tpu.tools.action_matrix --weight exps/dev/model0.pkl \
      --num_game 1000 --out matrix.txt
"""

from __future__ import annotations

import argparse

import numpy as np

from hanabi_sad_tpu.tools import loaders
from hanabi_sad_tpu.train.evaluate import evaluate

IDX2ACTION = [  # uid labels (action_matrix.py:110-131)
    "D1", "D2", "D3", "D4", "D5",
    "P1", "P2", "P3", "P4", "P5",
    "C1", "C2", "C3", "C4", "C5",
    "R1", "R2", "R3", "R4", "R5",
]


def compute_action_matrix(actions: np.ndarray, valid: np.ndarray, num_actions: int):
    """actions: [T, N] applied uid per step; valid: [T, N] step belongs to a
    live game. Counts transitions (a_t -> a_{t+1}) over consecutive turns."""
    counts = np.zeros((num_actions, num_actions), np.int64)
    T, N = actions.shape
    for n in range(N):
        live = np.where(valid[:, n])[0]
        a = actions[live, n]
        for t in range(len(a) - 1):
            counts[a[t], a[t + 1]] += 1
    denom = counts.sum(1, keepdims=True)
    normed = counts / np.maximum(denom, 1)
    return normed, counts


def render(normed: np.ndarray, labels=IDX2ACTION) -> str:
    k = len(labels)
    lines = ["     " + " ".join(f"{l:>5}" for l in labels)]
    for i in range(k):
        row = " ".join(f"{normed[i, j]:5.2f}" for j in range(k))
        lines.append(f"{labels[i]:>4} {row}")
    return "\n".join(lines)


def plot_heatmap(normed: np.ndarray, path: str, labels=IDX2ACTION):
    """Matplotlib heatmap of P(next action | prev action) — parity with the
    reference's figure output (pyhanabi/tools/action_matrix.py:95-107).
    Headless-safe (Agg); silently skips if matplotlib is unavailable."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib unavailable; skipping heatmap")
        return
    k = len(labels)
    fig, ax = plt.subplots(figsize=(10, 8))
    im = ax.imshow(normed[:k, :k], cmap="viridis", vmin=0.0)
    ax.set_xticks(range(k))
    ax.set_yticks(range(k))
    ax.set_xticklabels(labels, rotation=90, fontsize=8)
    ax.set_yticklabels(labels, fontsize=8)
    ax.set_xlabel("next action")
    ax.set_ylabel("previous action")
    fig.colorbar(im, ax=ax, fraction=0.046, pad=0.04)
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)
    print("heatmap saved to", path)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--weight", required=True, type=str)
    parser.add_argument("--num_game", default=1000, type=int)
    parser.add_argument("--seed", default=1, type=int)
    parser.add_argument("--num_player", default=2, type=int)
    parser.add_argument("--out", default=None, type=str, help="write matrix text/npy")
    args = parser.parse_args(argv)
    # After parse_args so `--help` neither imports jax nor creates cache dirs.
    from hanabi_sad_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    policy = loaders.load_any(args.weight)
    policies = [policy] * args.num_player
    mean, perfect, scores, n_perfect, actions, was_done = evaluate(
        policies, args.num_game, args.seed, return_actions=True
    )
    print(f"score: {mean:.4f}, perfect: {100 * perfect:.2f}%")
    valid = ~was_done
    num_real = len(IDX2ACTION)
    normed, counts = compute_action_matrix(actions, valid, num_real + 1)
    text = render(normed[:num_real, :num_real])
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
        np.save(args.out + ".npy", counts)
        plot_heatmap(normed, args.out + ".png")
        print("saved to", args.out)
    return normed, counts


if __name__ == "__main__":
    main()
