#!/bin/bash
# Round-4 perf A/B on the real chip (run AFTER round4_chip_queue.sh — the
# chip is single-tenant). Measures the production chunk with the two new
# equality-tested optimizations in all four combinations, plus the phase
# breakdown of the winning config.
set -u
cd "$(dirname "$0")/.."
mkdir -p exps
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

{
  for combo in "0 0" "1 0" "0 1" "1 1"; do
    set -- $combo
    echo "=== fused=$1 stacked=$2 ==="
    timeout 1500 python -u scripts/bench_chunk_parts.py \
      --fused "$1" --stacked "$2" 2>&1 | grep -v WARNING
  done
} | tee exps/perf_ab_r4.log
