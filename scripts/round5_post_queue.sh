#!/bin/bash
# Round-5 post-queue chip work (runs when round5b_chip_queue.sh has released
# the chip):
#   1. Snapshot-sampling latency A/B — the in-queue attempt failed on this
#      machine because `PYTHONPATH=.` overwrote the path that delivers the
#      JAX PJRT plugin; append instead.
#   2. If snapshot sampling is >=5% faster, an equal-wallclock learning A/B
#      (fixed 900 s per arm) — defaults flip only on a win at equal learning.
set -u
cd "$(dirname "$0")/.."
mkdir -p exps

STATUS=exps/round5_post_queue_status.log
START_TS=$(date +%s)
BUDGET_SECS=${BUDGET_SECS:-3600}
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

mark "POST-QUEUE round5 begin (budget=${BUDGET_SECS}s)"

# --- 1. Snapshot-sampling latency A/B ---
stage snapshot_ab 420 1500 1900 -- bash -c '
  for snap in 0 1; do
    echo "=== fused=1 snapshot=$snap ==="
    PYTHONPATH=.:${PYTHONPATH:-} timeout 700 python -u scripts/bench_chunk_parts.py \
      --fused 1 --snapshot "$snap" 2>&1 | grep -v WARNING
  done | tee exps/perf_ab_r5.log'

# --- 2. Equal-wallclock learning A/B, only on a latency win ---
if [ -f exps/perf_ab_r5.log ]; then
  CHUNKS=$(grep -o "^chunk *[0-9.]*" exps/perf_ab_r5.log | awk '{print $2}')
  C0=$(echo "$CHUNKS" | sed -n 1p); C1=$(echo "$CHUNKS" | sed -n 2p)
  if [ -n "$C0" ] && [ -n "$C1" ] && \
     awk -v a="$C0" -v b="$C1" 'BEGIN{exit !(b < a*0.95)}'; then
    mark "snapshot latency win ($C0 -> $C1 ms): running learning A/B"
    stage snap_learn_ab 1900 2000 0 -- bash -c '
      for v in 0 1; do
        timeout 900 python -u -m hanabi_sad_tpu.train.selfplay --preset iql_2p \
          --seed 911 --compute_dtype bfloat16 --snapshot_sampling "$v" \
          --num_envs 1024 --num_update_per_chunk 16 \
          --num_epoch 80 --num_eval_game 400 --eval_freq_epochs 2 \
          --save_dir "exps/snap_ab_$v"
      done
      for v in 0 1; do
        echo "=== snap_ab_$v curve ==="
        grep -o "eval score: [0-9.]*" "exps/snap_ab_$v/train.log" | tail -8
      done | tee -a exps/perf_ab_r5.log'
  else
    mark "snapshot latency A/B: no >=5% win ($C0 -> $C1 ms); default stays off"
  fi
fi

mark "POST-QUEUE round5 complete"
cp "$STATUS" docs/runs/round5_post_queue_status.log || true
