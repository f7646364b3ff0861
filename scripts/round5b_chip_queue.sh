#!/bin/bash
# Round-5 chip queue, adapted to THIS build machine: the exps/ full-resume
# states from round 4 do not exist here, so every leg resumes from the
# committed weights-only artifacts in docs/runs/ (fresh Adam, explicit lr
# schedule per leg — the same recipe round 4's sad_band_push used to take
# the round-2 weights from 23.45 to 23.70).
#
# Priorities = round-4 VERDICT:
#   1. Close the OP diagonal: grow auxop_c (22.92) and auxop_b (22.59)
#      with long decay legs; regenerate the matrix (op_raw_data.txt:55-70).
#   2. Snapshot-sampling latency A/B (reference-prefetcher semantics).
#   3. Flagship upper-diagonal attempt (guarded by pick_best vs the 24.05
#      round-4 soup — cannot regress the committed artifact).
#   4. A respectable 3p artifact (from scratch; the round-4 smoke state is
#      not on this machine).
#   5. Plain SAD off the band floor if room remains.
set -u
cd "$(dirname "$0")/.."
mkdir -p exps docs/runs/zoo

STATUS=exps/round5_queue_status.log
START_TS=$(date +%s)
BUDGET_SECS=${BUDGET_SECS:-19800}
DEADLINE=$(( START_TS + BUDGET_SECS ))
remaining() { echo $(( DEADLINE - $(date +%s) )); }
mark() { echo "$(date -u +%FT%TZ) $*" | tee -a "$STATUS"; }
stage() {
  local name=$1 min=$2 cap=$3 reserve=$4; shift 4; shift  # shift past "--"
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

mark "QUEUE round5b begin (budget=${BUDGET_SECS}s)"

# --- 1. Snapshot-sampling latency A/B (short; decides a default) ---
stage snapshot_ab 420 1500 18000 -- bash -c '
  for snap in 0 1; do
    echo "=== fused=1 snapshot=$snap ==="
    PYTHONPATH=. timeout 700 python -u scripts/bench_chunk_parts.py \
      --fused 1 --snapshot "$snap" 2>&1 | grep -v WARNING
  done | tee exps/perf_ab_r5.log'

# --- 2. auxop_c long decay leg (22.92 -> diagonal attempt) ---
stage auxop_c_leg 1800 6600 11000 -- \
  python -u -m hanabi_sad_tpu.train.selfplay \
    --preset sad_aux_op_2p --seed 909 \
    --compute_dtype bfloat16 --num_envs 1024 --num_update_per_chunk 16 \
    --lr 4e-5 --lr_final 1e-5 --lr_decay_updates 420000 \
    --eval_freq_epochs 2 --num_epoch 800 \
    --load_model docs/runs/zoo/auxop_c.pkl \
    --save_dir exps/auxop_c_r5

if [ -f exps/auxop_c_r5/model4.pkl ]; then
  python scripts/make_soup.py exps/auxop_c_r5/soup.pkl exps/auxop_c_r5/model[0-4].pkl
  stage auxop_c_pick 240 1200 10400 -- \
    python -u scripts/pick_best.py docs/runs/zoo/auxop_c_r5.pkl \
      exps/auxop_c_r5/soup.pkl exps/auxop_c_r5/model4.pkl docs/runs/zoo/auxop_c.pkl
  stage auxop_c_eval5000 240 900 10100 -- \
    python -u -m hanabi_sad_tpu.tools.eval_model \
      --paper sad --weight docs/runs/zoo/auxop_c_r5.pkl --num_game 5000 --seed 77
fi

# --- 3. auxop_b decay leg (22.59, same recipe) ---
stage auxop_b_leg 1500 5400 5200 -- \
  python -u -m hanabi_sad_tpu.train.selfplay \
    --preset sad_aux_op_2p --seed 606 \
    --compute_dtype bfloat16 --num_envs 1024 --num_update_per_chunk 16 \
    --lr 4e-5 --lr_final 1e-5 --lr_decay_updates 360000 \
    --eval_freq_epochs 2 --num_epoch 700 \
    --load_model docs/runs/zoo/auxop_b.pkl \
    --save_dir exps/auxop_b_r5

if [ -f exps/auxop_b_r5/model4.pkl ]; then
  python scripts/make_soup.py exps/auxop_b_r5/soup.pkl exps/auxop_b_r5/model[0-4].pkl
  stage auxop_b_pick 240 1200 4600 -- \
    python -u scripts/pick_best.py docs/runs/zoo/auxop_b_r5.pkl \
      exps/auxop_b_r5/soup.pkl exps/auxop_b_r5/model4.pkl docs/runs/zoo/auxop_b.pkl
  stage auxop_b_eval5000 240 900 4300 -- \
    python -u -m hanabi_sad_tpu.tools.eval_model \
      --paper sad --weight docs/runs/zoo/auxop_b_r5.pkl --num_game 5000 --seed 77
fi

# --- 4. Cross-play matrix with the grown OP seeds ---
AB=docs/runs/zoo/auxop_b_r5.pkl; [ -f "$AB" ] || AB=docs/runs/zoo/auxop_b.pkl
AC=docs/runs/zoo/auxop_c_r5.pkl; [ -f "$AC" ] || AC=docs/runs/zoo/auxop_c.pkl
if stage xp_matrix_r5 600 1800 2800 -- \
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

# --- 5. Flagship polish attempt (guarded: pick_best keeps 24.05 soup) ---
stage sad_aux_leg 1200 3300 0 -- \
  python -u -m hanabi_sad_tpu.train.selfplay \
    --preset sad_2p --pred_weight 0.25 --seed 73 \
    --compute_dtype bfloat16 --num_envs 1024 --num_update_per_chunk 16 \
    --lr 1e-5 --lr_final 3e-6 --lr_decay_updates 220000 \
    --eval_freq_epochs 2 --num_epoch 400 \
    --load_model docs/runs/sad_aux_r4_soup10.pkl \
    --save_dir exps/sad_aux_r5

if [ -f exps/sad_aux_r5/model4.pkl ]; then
  python scripts/make_soup.py exps/sad_aux_r5/soup.pkl exps/sad_aux_r5/model[0-4].pkl
  stage sad_aux_pick 240 1200 0 -- \
    python -u scripts/pick_best.py docs/runs/sad_aux_r5_best.pkl \
      exps/sad_aux_r5/soup.pkl exps/sad_aux_r5/model4.pkl \
      docs/runs/sad_aux_r4_soup10.pkl
  stage sad_aux_eval5000 240 900 0 -- \
    python -u -m hanabi_sad_tpu.tools.eval_model \
      --paper sad --weight docs/runs/sad_aux_r5_best.pkl --num_game 5000 --seed 77
fi

# --- 6. 3p from scratch (target >= 15 self-play, VERDICT item 7) ---
stage iql_3p_leg 1200 2700 0 -- \
  python -u -m hanabi_sad_tpu.train.selfplay \
    --preset iql_2p --num_player 3 --seed 334 \
    --compute_dtype bfloat16 --num_envs 1024 --num_update_per_chunk 16 \
    --eval_freq_epochs 4 --num_epoch 400 \
    --save_dir exps/iql_3p_r5

if [ -f exps/iql_3p_r5/model4.pkl ]; then
  cp exps/iql_3p_r5/model4.pkl docs/runs/iql_3p_r5_model4.pkl
  cp exps/iql_3p_r5/train.log docs/runs/iql_3p_r5_train.log
fi

# --- 7. Plain SAD off the band floor (only if room remains) ---
stage sad_leg 1200 3000 0 -- \
  python -u -m hanabi_sad_tpu.train.selfplay \
    --preset sad_2p --seed 48 \
    --compute_dtype bfloat16 --num_envs 1024 --num_update_per_chunk 16 \
    --lr 2e-5 --lr_final 8e-6 --lr_decay_updates 200000 \
    --eval_freq_epochs 2 --num_epoch 400 \
    --load_model docs/runs/sad_r4_model4.pkl \
    --save_dir exps/sad_r5

if [ -f exps/sad_r5/model4.pkl ]; then
  python scripts/make_soup.py exps/sad_r5/soup.pkl exps/sad_r5/model[0-4].pkl
  stage sad_pick 240 1200 0 -- \
    python -u scripts/pick_best.py docs/runs/sad_r5_best.pkl \
      exps/sad_r5/soup.pkl exps/sad_r5/model4.pkl docs/runs/sad_r4_soup.pkl
  stage sad_eval5000 240 900 0 -- \
    python -u -m hanabi_sad_tpu.tools.eval_model \
      --paper sad --weight docs/runs/sad_r5_best.pkl --num_game 5000 --seed 77
fi

mark "QUEUE round5b complete"
cp "$STATUS" docs/runs/round5_queue_status.log || true
