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


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Enable JAX's persistent (on-disk) compilation cache.

    First compiles of the train chunk / eval graph on the remote chip cost
    minutes per process; the reference has no analogous cost (TorchScript
    loads instantly) so parity on startup latency needs this. Opt out with
    HANABI_SAD_TPU_NO_COMPILE_CACHE=1; override the location with
    HANABI_SAD_TPU_COMPILE_CACHE. Returns the cache dir, or None if disabled
    or unsupported by the installed jax. Imports jax lazily so that merely
    importing the package stays backend-free.
    """
    if os.environ.get("HANABI_SAD_TPU_NO_COMPILE_CACHE"):
        return None
    import jax

    cache_dir = cache_dir or os.environ.get(
        "HANABI_SAD_TPU_COMPILE_CACHE",
        os.path.join(
            os.path.expanduser("~"), ".cache", "hanabi_sad_tpu", "jax_cache"
        ),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        # Set the threshold first: if either update raises (older jax), the
        # cache dir is still unset and the None return matches actual state.
        # Cache everything that took >1s to compile (default threshold skips
        # more); small graphs recompile fast anyway.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except (AttributeError, ValueError, OSError):
        try:
            jax.config.update("jax_compilation_cache_dir", None)
        except (AttributeError, ValueError):
            pass
        return None
    return cache_dir
