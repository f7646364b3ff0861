"""Phase wall-clock profiler (reference common_utils/stopwatch.py:17-54).

The reference brackets each learner phase with torch.cuda.synchronize(); the
JAX analogue is block_until_ready on the phase's outputs — the driver does
that before calling time()."""

from __future__ import annotations

import time
from collections import defaultdict


class Stopwatch:
    def __init__(self):
        self.times = defaultdict(list)
        self.reset()

    def reset(self):
        self.last_time = time.time()
        self.times.clear()

    def time(self, key: str):
        now = time.time()
        self.times[key].append(1000 * (now - self.last_time))
        self.last_time = now

    def summary(self) -> str:
        total = sum(sum(v) for v in self.times.values())
        if total == 0:
            return "Stopwatch: no samples"
        lines = [f"Time spent = {total / 1000:.2f} s"]
        for k, v in self.times.items():
            t = sum(v)
            lines.append(
                f"\t{k}: {t / len(v):.1f} ms/call, {100 * t / total:.1f}%"
            )
        return "\n".join(lines)
