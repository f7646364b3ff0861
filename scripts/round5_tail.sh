#!/bin/bash
# Round-5 tail: the stages the main queue's budget squeezes out, in the
# VERDICT's priority order (3p artifact is an explicit item-7 deliverable;
# the flagship polish is a guarded bonus). Run when the chip is free.
#   BUDGET_SECS sets the window; stages shrink to fit.
set -u
cd "$(dirname "$0")/.."
mkdir -p exps

STATUS=exps/round5_tail_status.log
START_TS=$(date +%s)
BUDGET_SECS=${BUDGET_SECS:-5400}
DEADLINE=$(( START_TS + BUDGET_SECS ))
remaining() { echo $(( DEADLINE - $(date +%s) )); }
mark() { echo "$(date -u +%FT%TZ) $*" | tee -a "$STATUS"; }
stage() {
  local name=$1 min=$2 cap=$3 reserve=$4; shift 4; shift
  local rem; rem=$(remaining)
  local t=$(( rem - reserve )); (( t > cap )) && t=$cap
  if (( t < min )); then
    mark "SKIPPED $name (remaining=${rem}s reserve=${reserve}s min=${min}s)"
    return 1
  fi
  mark "START $name (timeout=${t}s remaining=${rem}s)"
  timeout "$t" "$@"
  local rc=$?
  mark "DONE $name (rc=$rc)"
  return 0
}

mark "TAIL round5 begin (budget=${BUDGET_SECS}s)"

# --- 1. 3p from scratch (target >= 15 self-play, VERDICT item 7) ---
stage iql_3p_leg 1200 2700 1700 -- \
  python -u -m hanabi_sad_tpu.train.selfplay \
    --preset iql_2p --num_player 3 --seed 334 \
    --compute_dtype bfloat16 --num_envs 1024 --num_update_per_chunk 16 \
    --eval_freq_epochs 4 --num_epoch 400 \
    --save_dir exps/iql_3p_r5

if [ -f exps/iql_3p_r5/model4.pkl ]; then
  cp exps/iql_3p_r5/model4.pkl docs/runs/iql_3p_r5_model4.pkl
  cp exps/iql_3p_r5/train.log docs/runs/iql_3p_r5_train.log
fi

# --- 2. Snapshot-sampling latency A/B (fixed PYTHONPATH) ---
stage snapshot_ab 420 1500 0 -- bash -c '
  for snap in 0 1; do
    echo "=== fused=1 snapshot=$snap ==="
    PYTHONPATH=.:${PYTHONPATH:-} timeout 700 python -u scripts/bench_chunk_parts.py \
      --fused 1 --snapshot "$snap" 2>&1 | grep -v WARNING
  done | tee exps/perf_ab_r5.log'

# --- 3. IQL-2p growth (VERDICT weak item 2), only if room remains ---
stage iql_2p_leg 1200 2400 0 -- \
  python -u -m hanabi_sad_tpu.train.selfplay \
    --preset iql_2p --seed 22 \
    --compute_dtype bfloat16 --num_envs 1024 --num_update_per_chunk 16 \
    --eval_freq_epochs 2 --num_epoch 400 \
    --load_model docs/runs/iql_2p_r2_model.pkl \
    --save_dir exps/iql_2p_r5

if [ -f exps/iql_2p_r5/model4.pkl ]; then
  cp exps/iql_2p_r5/model4.pkl docs/runs/iql_2p_r5_model4.pkl
fi

mark "TAIL round5 complete"
cp "$STATUS" docs/runs/round5_tail_status.log || true
