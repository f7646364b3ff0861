"""Rank XLA ops in a jax.profiler Perfetto trace (VERDICT: profile the train
chunk, then attack the top offenders).

Usage: python scripts/analyze_trace.py exps/<run>/profile [top_n]

Finds the newest trace.json.gz under the given directory, aggregates event
durations by (sanitized) op name on device tracks, and prints a ranked table
plus totals per op family — enough to see where the ~500 ms train chunk goes
without TensorBoard.
"""

import gzip
import json
import os
import re
import sys
from collections import defaultdict


def find_trace(root):
    hits = []
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith("trace.json.gz"):
                p = os.path.join(dirpath, f)
                hits.append((os.path.getmtime(p), p))
    if not hits:
        raise SystemExit(f"no trace.json.gz under {root}")
    return max(hits)[1]


def family(name: str) -> str:
    """Collapse 'fusion.123' / 'dynamic-update-slice.7' etc. to the op kind."""
    base = name.split("/")[-1]
    base = re.sub(r"[.\d]+$", "", base)
    return base or name


def main():
    root = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    path = find_trace(root)
    print(f"trace: {path}")
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]

    # Identify device (TPU) process ids: process_name metadata containing
    # 'TPU' / 'device' — host python threads are excluded from op ranking.
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {
        pid for pid, n in pid_names.items()
        if "TPU" in n or "device" in n.lower() or "/device" in n
    }
    print("processes:", {pid: n for pid, n in sorted(pid_names.items())})

    by_name = defaultdict(float)
    by_family = defaultdict(float)
    count = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        dur = e["dur"]  # microseconds
        by_name[name] += dur
        by_family[family(name)] += dur
        count[name] += 1
        total += dur

    print(f"\ntotal device op time: {total / 1e3:.1f} ms (all traced chunks)")
    print(f"\n== top {top_n} ops by total time ==")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{dur / 1e3:9.2f} ms {count[name]:6d}x  {dur / total * 100:5.1f}%  {name[:110]}")

    print("\n== by op family ==")
    for name, dur in sorted(by_family.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{dur / 1e3:9.2f} ms  {dur / total * 100:5.1f}%  {name[:90]}")


if __name__ == "__main__":
    main()
