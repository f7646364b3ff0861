#!/bin/bash
# Round-3b: short chip A/Bs that run AFTER round3_chip_queue.sh, sized to
# fit the remaining block. Stages ordered by VERDICT priority; each is
# time-boxed so a stall cannot eat the driver's end-of-round bench.
set -u
cd "$(dirname "$0")/.."
mkdir -p exps
if pgrep -f hanabi_sad_tpu.train.selfplay > /dev/null; then
  echo "another selfplay process is running; aborting" >&2
  exit 1
fi

# --- 1. rollout/net scan-unroll A/B (VERDICT weak #1: per-step overhead) ---
for u in "1 1" "4 1" "4 4" "8 1"; do
  set -- $u
  echo "=== unroll rollout=$1 net=$2 ==="
  timeout 600 python -m hanabi_sad_tpu.tools.bench_train \
    --num_envs 1024 --updates 16 --compute_dtype bfloat16 --reps 4 \
    --rollout_unroll "$1" --net_seq_unroll "$2" 2>&1 | grep -v WARNING | tail -2
done > exps/unroll_ab.log 2>&1
cat exps/unroll_ab.log

# --- 2. continuous exact-priority A/B (VERDICT weak #3): equal budget ---
for v in 0 1; do
  timeout 900 python -u -m hanabi_sad_tpu.train.selfplay --preset iql_2p \
    --seed 909 --compute_dtype bfloat16 --continuous_exact_priority "$v" \
    --num_epoch 60 --num_eval_game 400 --eval_freq_epochs 2 \
    --save_dir "exps/prio_ab_$v"
done
for v in 0 1; do
  echo "=== prio_ab_$v curve ==="
  grep -o "eval score: [0-9.]*" "exps/prio_ab_$v/train.log" | tail -8
done > exps/prio_ab.log 2>&1
cat exps/prio_ab.log

# --- 3. 3-player on-chip training smoke (VERDICT item 7) ---
timeout 900 python -u -m hanabi_sad_tpu.train.selfplay --preset iql_2p \
  --num_player 3 --seed 333 --compute_dtype bfloat16 \
  --num_epoch 40 --num_eval_game 400 --eval_freq_epochs 4 \
  --save_dir exps/iql_3p_smoke
grep -o "eval score: [0-9.]*" exps/iql_3p_smoke/train.log | tail -5
echo "=== round-3b complete ==="
