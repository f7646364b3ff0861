"""Average the parameters of several checkpoints of one run (SWA / model
soup). Nearby SGD iterates of the same run average into a flatter point that
often evals a bit higher — a free candidate for the top-k zoo.

Usage: python scripts/make_soup.py out.pkl in1.pkl in2.pkl [...]
"""

import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    out, paths = sys.argv[1], sys.argv[2:]
    assert len(paths) >= 2
    payloads = []
    for p in paths:
        with open(p, "rb") as f:
            payloads.append(pickle.load(f))
    base = payloads[0]
    params = [pl["params"] for pl in payloads]

    import jax

    soup = jax.tree_util.tree_map(
        lambda *xs: np.mean(np.stack([np.asarray(x) for x in xs], 0), 0), *params
    )
    with open(out, "wb") as f:
        pickle.dump({"kind": base.get("kind", "params"), "params": soup,
                     "config": base.get("config")}, f)
    print(f"soup of {len(paths)} checkpoints -> {out}")


if __name__ == "__main__":
    main()
