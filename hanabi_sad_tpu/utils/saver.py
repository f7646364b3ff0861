"""Top-k checkpoint saver (reference common_utils/saver.py:6-61).

Keeps the k best checkpoints by eval score in fixed slots model0.pkl ..
model{k-1}.pkl, plus forced saves (model_epochN). Checkpoint payload here is a
pickled dict of numpy arrays (see train/checkpoint.py) rather than a torch
state dict."""

from __future__ import annotations

import os
import pickle
from typing import Any, Optional


class TopkSaver:
    def __init__(self, save_dir: str, topk: int = 5, suffix: str = "pkl"):
        self.save_dir = save_dir
        self.topk = topk
        self.suffix = suffix
        self.worst_perf_idx = 0
        self.perfs = [-float("inf")] * topk
        os.makedirs(save_dir, exist_ok=True)

    def save(
        self, payload: Any, perf: float, *, force_save_name: Optional[str] = None
    ) -> bool:
        if force_save_name is not None:
            path = os.path.join(self.save_dir, f"{force_save_name}.{self.suffix}")
            with open(path, "wb") as f:
                pickle.dump(payload, f)

        if perf <= self.perfs[self.worst_perf_idx]:
            return False

        path = os.path.join(self.save_dir, f"model{self.worst_perf_idx}.{self.suffix}")
        with open(path, "wb") as f:
            pickle.dump(payload, f)
        self.perfs[self.worst_perf_idx] = perf
        self.worst_perf_idx = self.perfs.index(min(self.perfs))
        return True
