"""Assertion helpers (reference common_utils/assert_utils.py:1-39), JAX-flavored.

The reference's tensor assert drops into pdb on mismatch; here mismatches
raise with a max-abs-diff diagnostic, and the tree variants cover whole
pytrees (params, TensorDict-style obs dicts).
"""

from __future__ import annotations

import jax
import numpy as np


def assert_eq(real, expected):
    assert real == expected, f"{real} (true) vs {expected} (expected)"


def assert_neq(real, expected):
    assert real != expected, f"{real} (true) vs {expected} (expected)"


def assert_lt(real, expected):
    assert real < expected, f"{real} (true) vs {expected} (expected)"


def assert_lteq(real, expected):
    assert real <= expected, f"{real} (true) vs {expected} (expected)"


def assert_tensor_eq(t1, t2, eps: float = 1e-6):
    a, b = np.asarray(t1), np.asarray(t2)
    assert a.shape == b.shape, f"size mismatch {a.shape} vs {b.shape}"
    diff = np.abs(a.astype(np.float64) - b.astype(np.float64))
    assert (diff < eps).all(), f"max diff {diff.max()} >= {eps}"


def assert_tree_close(tree1, tree2, eps: float = 1e-6):
    """assert_tensor_eq over every leaf of two pytrees of the same structure."""
    leaves1, tdef1 = jax.tree_util.tree_flatten(tree1)
    leaves2, tdef2 = jax.tree_util.tree_flatten(tree2)
    assert tdef1 == tdef2, f"tree structure mismatch: {tdef1} vs {tdef2}"
    for l1, l2 in zip(leaves1, leaves2):
        assert_tensor_eq(l1, l2, eps)


def assert_zero_grad(grads):
    """Every leaf of a gradient pytree is exactly zero
    (assert_utils.py:36-39)."""
    for leaf in jax.tree_util.tree_leaves(grads):
        s = float(np.abs(np.asarray(leaf)).sum())
        assert s == 0.0, f"nonzero grad (abs-sum {s})"
