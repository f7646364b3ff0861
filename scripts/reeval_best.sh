#!/bin/bash
# 5000-game greedy self-play re-eval of a run's top-k checkpoints
# (the reference's eval protocol: tools/eval_model.py:52, 5000 games).
set -e
cd "$(dirname "$0")/.."
dir=${1:?usage: reeval_best.sh <run_dir> [num_game]}
n=${2:-5000}
for m in "$dir"/model[0-4].pkl; do
  [ -f "$m" ] || continue
  echo "=== $m ==="
  python -u -m hanabi_sad_tpu.tools.eval_model --paper sad --weight "$m" --num_game "$n" --seed 77
done
