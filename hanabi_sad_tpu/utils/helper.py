"""Misc helpers (reference common_utils/helper.py, utils.py:382-387)."""

from __future__ import annotations

import os
import random

import numpy as np


def set_all_seeds(seed: int):
    """Seed every host-side RNG (helper.py:134-138). Device-side randomness in
    this framework is stateless PRNG keys derived from the config seed, so
    this only covers python/numpy (and torch if present)."""
    random.seed(seed)
    np.random.seed(seed + 1)
    try:
        import torch

        torch.manual_seed(seed + 2)
    except ImportError:
        pass


def generate_log_uniform(min_val: float, max_val: float, n: int):
    """(utils.py:382-387)"""
    uni = np.linspace(np.log(min_val), np.log(max_val), n)
    return np.exp(uni).tolist()


def get_mem_usage() -> str:
    """Process memory telemetry (helper.py:76-84); psutil-free fallback."""
    try:
        with open(f"/proc/{os.getpid()}/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    kb = int(line.split()[1])
                    return f"rss: {kb / 1024:.1f} MB"
    except OSError:
        pass
    return "rss: unknown"
