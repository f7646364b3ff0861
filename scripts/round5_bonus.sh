#!/bin/bash
# Round-5 bonus block (runs if the main queue finishes early): keep pushing
# the hottest curve — auxop_c was still rising (23.80 best epoch eval) when
# its leg timed out — then re-pick and regenerate the cross-play matrix with
# the final per-lineage artifacts.
set -u
cd "$(dirname "$0")/.."
mkdir -p exps docs/runs/zoo

STATUS=exps/round5_bonus_status.log
START_TS=$(date +%s)
BUDGET_SECS=${BUDGET_SECS:-4200}
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

mark "BONUS round5 begin (budget=${BUDGET_SECS}s)"

# --- 1. auxop_c tail extension at the schedule's flat 1e-5 ---
stage auxop_c_ext 900 3000 1100 -- \
  python -u -m hanabi_sad_tpu.train.selfplay \
    --preset sad_aux_op_2p --seed 909 \
    --compute_dtype bfloat16 --num_envs 1024 --num_update_per_chunk 16 \
    --lr 4e-5 --lr_final 1e-5 --lr_decay_updates 420000 \
    --eval_freq_epochs 2 --num_epoch 1200 \
    --load_model exps/auxop_c_r5/latest.pkl \
    --save_dir exps/auxop_c_r5

# --- 2. Re-pick c artifact (new top-5 soup vs current best) ---
if [ -f exps/auxop_c_r5/model4.pkl ]; then
  python scripts/make_soup.py exps/auxop_c_r5/soup2.pkl exps/auxop_c_r5/model[0-4].pkl
  stage auxop_c_repick 180 600 500 -- \
    python -u scripts/pick_best.py docs/runs/zoo/auxop_c_r5.pkl \
      exps/auxop_c_r5/soup2.pkl exps/auxop_c_r5/model4.pkl docs/runs/zoo/auxop_c_r5.pkl
  stage auxop_c_reeval 120 400 300 -- \
    python -u -m hanabi_sad_tpu.tools.eval_model \
      --paper sad --weight docs/runs/zoo/auxop_c_r5.pkl --num_game 5000 --seed 77
fi

# --- 3. Regenerate the matrix with the final artifacts ---
AB=docs/runs/zoo/auxop_b_r5.pkl; [ -f "$AB" ] || AB=docs/runs/zoo/auxop_b.pkl
AC=docs/runs/zoo/auxop_c_r5.pkl
if stage xp_matrix_r5b 200 900 0 -- \
  python -u -m hanabi_sad_tpu.tools.crossplay_matrix \
    --weights "$AB" "$AC" docs/runs/sad_r4_soup.pkl docs/runs/zoo/sad_b.pkl \
    --num_game 1000 --seed 1 --relabel --out exps/xp_r5.txt; then
  {
    echo "# Inter-seed cross-play matrix, round 5 (reference: models/op_raw_data.txt:55-70)"
    echo "# 1000 greedy games per cell, seed 1. Seats 1-2: the two independent"
    echo "# sad-aux-op seeds (606/909) grown this round with long decay legs"
    echo "# ($AB, $AC). Seat 3: band plain-SAD soup. Seat 4: independent"
    echo "# 50-epoch SAD seed. Relabel table pairs plain vs color-relabeled"
    echo "# self-play on the same eval decks."
    echo
    cat exps/xp_r5.txt
  } > docs/runs/xp_matrix_r5.txt
  cp exps/xp_r5.txt.npz docs/runs/xp_r5.npz 2>/dev/null || true
fi

mark "BONUS round5 complete"
cat "$STATUS" >> docs/runs/round5_queue_status.log || true
