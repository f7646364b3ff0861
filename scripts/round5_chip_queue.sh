#!/bin/bash
# Round-5 chip queue. Runs AFTER the auxop_c_r5 decay leg (launched first,
# separately — the chip is single-tenant). Priorities = round-4 VERDICT:
#   1. Close the OP diagonal: wrap auxop_c, grow auxop_b with the same
#      decay recipe, regenerate the cross-play matrix (op_raw_data.txt:55-70).
#   2. Snapshot-sampling latency A/B (the reference-prefetcher semantics).
#   3. Flagship into the upper diagonal (>= 24.1 soup attempt).
#   4. Plain SAD off the band floor (schedule completion + soup).
#   5. A respectable 3p artifact (resume the rising round-4 smoke).
# Stage-marker hygiene as in round4_chip_queue.sh; budget-adaptive timeouts.
set -u
cd "$(dirname "$0")/.."
mkdir -p exps docs/runs/zoo

STATUS=exps/round5_queue_status.log
START_TS=$(date +%s)
BUDGET_SECS=${BUDGET_SECS:-17000}
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

mark "QUEUE round5 begin (budget=${BUDGET_SECS}s)"

# --- 1. auxop_c wrap: soups + selection + 5000-game eval ---
if [ -f exps/auxop_c_r5/model4.pkl ]; then
  python scripts/make_soup.py exps/auxop_c_r5/soup.pkl exps/auxop_c_r5/model[0-4].pkl
  python scripts/make_soup.py exps/auxop_c_r5/soup10.pkl \
    exps/auxop_c_r5/model[0-4].pkl exps/auxop_c_r4b/model[0-4].pkl || true
  stage auxop_c_pick 240 1500 14500 -- \
    python -u scripts/pick_best.py docs/runs/zoo/auxop_c_r5.pkl \
      exps/auxop_c_r5/soup.pkl exps/auxop_c_r5/soup10.pkl exps/auxop_c_r5/model4.pkl
  stage auxop_c_eval5000 240 900 14200 -- \
    python -u -m hanabi_sad_tpu.tools.eval_model \
      --paper sad --weight docs/runs/zoo/auxop_c_r5.pkl --num_game 5000 --seed 77
fi

# --- 2. auxop_b decay leg (same recipe as auxop_c_r5) ---
stage auxop_b_leg 1200 5400 8500 -- \
  python -u -m hanabi_sad_tpu.train.selfplay \
    --preset sad_aux_op_2p --seed 606 \
    --compute_dtype bfloat16 --num_envs 1024 --num_update_per_chunk 16 \
    --lr_final 1e-5 --lr_decay_updates 1000000 --eval_freq_epochs 2 \
    --num_epoch 800 --load_model exps/auxop_b_r4b/latest.pkl \
    --save_dir exps/auxop_b_r5

if [ -f exps/auxop_b_r5/model4.pkl ]; then
  python scripts/make_soup.py exps/auxop_b_r5/soup.pkl exps/auxop_b_r5/model[0-4].pkl
  python scripts/make_soup.py exps/auxop_b_r5/soup10.pkl \
    exps/auxop_b_r5/model[0-4].pkl exps/auxop_b_r4b/model[0-4].pkl || true
  stage auxop_b_pick 240 1500 7600 -- \
    python -u scripts/pick_best.py docs/runs/zoo/auxop_b_r5.pkl \
      exps/auxop_b_r5/soup.pkl exps/auxop_b_r5/soup10.pkl exps/auxop_b_r5/model4.pkl
  stage auxop_b_eval5000 240 900 7300 -- \
    python -u -m hanabi_sad_tpu.tools.eval_model \
      --paper sad --weight docs/runs/zoo/auxop_b_r5.pkl --num_game 5000 --seed 77
fi

# --- 3. Cross-play matrix with the grown OP seeds ---
AB=docs/runs/zoo/auxop_b_r5.pkl; [ -f "$AB" ] || AB=docs/runs/zoo/auxop_b.pkl
AC=docs/runs/zoo/auxop_c_r5.pkl; [ -f "$AC" ] || AC=docs/runs/zoo/auxop_c.pkl
if stage xp_matrix_r5 600 1800 5800 -- \
  python -u -m hanabi_sad_tpu.tools.crossplay_matrix \
    --weights "$AB" "$AC" docs/runs/sad_r4_soup.pkl docs/runs/zoo/sad_b.pkl \
    --num_game 1000 --seed 1 --relabel --out exps/xp_r5.txt; then
  {
    echo "# Inter-seed cross-play matrix, round 5 (reference: models/op_raw_data.txt:55-70)"
    echo "# 1000 greedy games per cell, seed 1. Seats 1-2: the two independent"
    echo "# sad-aux-op seeds (606/909) grown to lr-schedule completion this"
    echo "# round ($AB, $AC). Seat 3: band plain-SAD soup. Seat 4: independent"
    echo "# 50-epoch SAD seed. Relabel table pairs plain vs color-relabeled"
    echo "# self-play on the same eval decks."
    echo
    cat exps/xp_r5.txt
  } > docs/runs/xp_matrix_r5.txt
  cp exps/xp_r5.txt.npz docs/runs/xp_r5.npz 2>/dev/null || true
fi

# --- 4. Snapshot-sampling latency A/B ---
stage snapshot_ab 420 1500 4800 -- bash -c '
  for snap in 0 1; do
    echo "=== fused=1 snapshot=$snap ==="
    PYTHONPATH=.:${PYTHONPATH:-} timeout 700 python -u scripts/bench_chunk_parts.py \
      --fused 1 --snapshot "$snap" 2>&1 | grep -v WARNING
  done | tee exps/perf_ab_r5.log'

# --- 4b. Equal-wallclock learning A/B, only if the latency A/B won ---
# (VERDICT item 4 "Done" criterion: defaults flip only on a win at equal
# learning.) Latency win = snapshot chunk at least 5% faster.
if [ -f exps/perf_ab_r5.log ]; then
  CHUNKS=$(grep -o "^chunk *[0-9.]*" exps/perf_ab_r5.log | awk '{print $2}')
  C0=$(echo "$CHUNKS" | sed -n 1p); C1=$(echo "$CHUNKS" | sed -n 2p)
  if [ -n "$C0" ] && [ -n "$C1" ] && \
     awk -v a="$C0" -v b="$C1" 'BEGIN{exit !(b < a*0.95)}'; then
    mark "snapshot latency win ($C0 -> $C1 ms): running learning A/B"
    # One stage, FIXED 900 s per arm — the equal-wallclock comparison must
    # not inherit unequal budget-adaptive timeouts.
    stage snap_learn_ab 1900 2000 5200 -- bash -c '
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

# --- 5. Flagship polish leg: 5e-6 -> ~2e-6 linear over the leg ---
# sad_aux_r4p/latest.pkl sits at update ~1.21M, lr flat 5e-6. The linear
# schedule is absolute-count-based, so (lr0, final, steps) are chosen to put
# lr(1.21M) = 5e-6 and decay ~1.25e-11/step to 2e-6 at 1.45M.
stage sad_aux_leg 900 2400 2600 -- \
  python -u -m hanabi_sad_tpu.train.selfplay \
    --preset sad_2p --pred_weight 0.25 --seed 73 \
    --compute_dtype bfloat16 --num_envs 1024 --num_update_per_chunk 16 \
    --lr 2.0125e-5 --lr_final 2e-6 --lr_decay_updates 1450000 \
    --eval_freq_epochs 2 \
    --num_epoch 400 --load_model exps/sad_aux_r4p/latest.pkl \
    --save_dir exps/sad_aux_r5

if [ -f exps/sad_aux_r5/model4.pkl ]; then
  python scripts/make_soup.py exps/sad_aux_r5/soup.pkl exps/sad_aux_r5/model[0-4].pkl
  python scripts/make_soup.py exps/sad_aux_r5/soup15.pkl \
    exps/sad_aux_r5/model[0-4].pkl exps/sad_aux_r4p/model[0-4].pkl \
    exps/sad_aux_r3/model[0-4].pkl || true
  stage sad_aux_pick 240 1500 1900 -- \
    python -u scripts/pick_best.py docs/runs/sad_aux_r5_best.pkl \
      exps/sad_aux_r5/soup.pkl exps/sad_aux_r5/soup15.pkl \
      docs/runs/sad_aux_r4_soup10.pkl
  stage sad_aux_eval5000 240 900 1600 -- \
    python -u -m hanabi_sad_tpu.tools.eval_model \
      --paper sad --weight docs/runs/sad_aux_r5_best.pkl --num_game 5000 --seed 77
fi

# --- 6. Plain SAD: finish the 400k lr schedule + 1e-5 tail ---
stage sad_leg 900 2400 900 -- \
  python -u -m hanabi_sad_tpu.train.selfplay \
    --preset sad_2p --seed 48 \
    --compute_dtype bfloat16 --num_envs 1024 --num_update_per_chunk 16 \
    --lr 3e-5 --lr_final 1e-5 --lr_decay_updates 400000 \
    --eval_freq_epochs 2 \
    --num_epoch 400 --load_model exps/sad_r4/latest.pkl \
    --save_dir exps/sad_r5

if [ -f exps/sad_r5/model4.pkl ]; then
  python scripts/make_soup.py exps/sad_r5/soup.pkl exps/sad_r5/model[0-4].pkl
  python scripts/make_soup.py exps/sad_r5/soup10.pkl \
    exps/sad_r5/model[0-4].pkl exps/sad_r4/model[0-4].pkl || true
  stage sad_pick 240 1200 300 -- \
    python -u scripts/pick_best.py docs/runs/sad_r5_best.pkl \
      exps/sad_r5/soup.pkl exps/sad_r5/soup10.pkl docs/runs/sad_r4_soup.pkl
  stage sad_eval5000 240 900 0 -- \
    python -u -m hanabi_sad_tpu.tools.eval_model \
      --paper sad --weight docs/runs/sad_r5_best.pkl --num_game 5000 --seed 77
fi

# --- 7. 3p growth: resume the round-4 smoke (rising at cutoff) ---
stage iql_3p_leg 900 2100 0 -- \
  python -u -m hanabi_sad_tpu.train.selfplay \
    --preset iql_2p --num_player 3 --seed 334 \
    --compute_dtype bfloat16 --num_envs 1024 --num_update_per_chunk 16 \
    --eval_freq_epochs 4 \
    --num_epoch 400 --load_model exps/iql_3p_smoke/latest.pkl \
    --save_dir exps/iql_3p_r5

if [ -f exps/iql_3p_r5/model4.pkl ]; then
  cp exps/iql_3p_r5/model4.pkl docs/runs/iql_3p_r5_model4.pkl
  cp exps/iql_3p_r5/train.log docs/runs/iql_3p_r5_train.log
fi

# --- 8. Bonus (only if everything above left room): IQL 2p growth ---
stage iql_2p_bonus 900 1800 0 -- \
  python -u -m hanabi_sad_tpu.train.selfplay \
    --preset iql_2p --seed 22 \
    --compute_dtype bfloat16 --num_envs 1024 --num_update_per_chunk 16 \
    --eval_freq_epochs 2 \
    --num_epoch 400 --load_model docs/runs/iql_2p_r2_model.pkl \
    --save_dir exps/iql_2p_r5

mark "QUEUE round5 complete"
cp "$STATUS" docs/runs/round5_queue_status.log || true
