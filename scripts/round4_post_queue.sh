#!/bin/bash
# Round-4 post-queue chip work, in priority order:
#   1. Finish the flagship lr schedule: the main resume block was wedged at
#      update ~980k of 1.1M (BENCHMARKS.md round-4); resume
#      exps/sad_aux_r2/latest.pkl for the last ~120 epochs at lr -> 1e-5.
#   2. Soup + 5000-game evals of the finished run (the >= 24.0 attempt).
#   3. Perf A/B of the round-4 chunk optimizations (round4_perf_ab.sh).
# Same stage-marker hygiene as round4_chip_queue.sh.
set -u
cd "$(dirname "$0")/.."
mkdir -p exps

STATUS=exps/round4_post_queue_status.log
START_TS=$(date +%s)
BUDGET_SECS=${BUDGET_SECS:-7200}
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

mark "POST-QUEUE round4 begin (budget=${BUDGET_SECS}s)"

# --- 1. Finish the flagship lr schedule (update ~980k -> 1.1M + tail) ---
stage sad_aux_finish 600 3300 2400 -- \
  python -u -m hanabi_sad_tpu.train.selfplay \
    --preset sad_2p --pred_weight 0.25 --seed 31 \
    --compute_dtype bfloat16 --num_envs 1024 --num_update_per_chunk 16 \
    --lr_final 1e-5 --lr_decay_updates 1100000 \
    --num_epoch 180 --load_model exps/sad_aux_r2/latest.pkl \
    --save_dir exps/sad_aux_r3

# --- 2. Soups + 5000-game evals ---
if [ -f exps/sad_aux_r3/model4.pkl ]; then
  python scripts/make_soup.py exps/sad_aux_r3/soup.pkl exps/sad_aux_r3/model[0-4].pkl
  python scripts/make_soup.py exps/sad_aux_r3/soup10.pkl \
    exps/sad_aux_r3/model[0-4].pkl exps/sad_aux_r2/model[0-4].pkl || true
  for m in exps/sad_aux_r3/soup.pkl exps/sad_aux_r3/soup10.pkl exps/sad_aux_r3/model4.pkl; do
    [ -f "$m" ] || continue
    stage "eval5000:$m" 120 1200 1300 -- \
      python -u -m hanabi_sad_tpu.tools.eval_model \
        --paper sad --weight "$m" --num_game 5000 --seed 77
  done
fi

# --- 3. Perf A/B (fused priority x stacked td) ---
stage perf_ab 600 6000 0 -- bash scripts/round4_perf_ab.sh

mark "POST-QUEUE round4 complete"
cp "$STATUS" docs/runs/round4_post_queue_status.log || true
