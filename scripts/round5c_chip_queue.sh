#!/bin/bash
# Round-5 queue, second leg: round5b's auxop_c stage wedged on a device-RPC
# read after heavy host-CPU contention (prodshape + dryrun validation ran
# concurrently); the tunnel stayed healthy and exps/auxop_c_r5/latest.pkl
# (full resume: optimizer + counters + PRNG + schedule position) was 1 min
# old, so this queue resumes the leg in place and re-budgets the rest of
# the round. Remaining priorities unchanged (round-4 VERDICT order), plus
# the tail stages (3p artifact, snapshot A/B) folded in.
set -u
cd "$(dirname "$0")/.."
mkdir -p exps docs/runs/zoo

STATUS=exps/round5_queue_status.log
START_TS=$(date +%s)
BUDGET_SECS=${BUDGET_SECS:-17900}
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

mark "QUEUE round5c begin (budget=${BUDGET_SECS}s)"

# --- 1. auxop_c: resume the wedged leg from its full-resume state ---
stage auxop_c_resume 1800 4800 11500 -- \
  python -u -m hanabi_sad_tpu.train.selfplay \
    --preset sad_aux_op_2p --seed 909 \
    --compute_dtype bfloat16 --num_envs 1024 --num_update_per_chunk 16 \
    --lr 4e-5 --lr_final 1e-5 --lr_decay_updates 420000 \
    --eval_freq_epochs 2 --num_epoch 800 \
    --load_model exps/auxop_c_r5/latest.pkl \
    --save_dir exps/auxop_c_r5

if [ -f exps/auxop_c_r5/model4.pkl ]; then
  python scripts/make_soup.py exps/auxop_c_r5/soup.pkl exps/auxop_c_r5/model[0-4].pkl
  stage auxop_c_pick 240 1000 10800 -- \
    python -u scripts/pick_best.py docs/runs/zoo/auxop_c_r5.pkl \
      exps/auxop_c_r5/soup.pkl exps/auxop_c_r5/model4.pkl docs/runs/zoo/auxop_c.pkl
  stage auxop_c_eval5000 240 700 10300 -- \
    python -u -m hanabi_sad_tpu.tools.eval_model \
      --paper sad --weight docs/runs/zoo/auxop_c_r5.pkl --num_game 5000 --seed 77
fi

# --- 2. auxop_b decay leg ---
stage auxop_b_leg 1500 4400 5900 -- \
  python -u -m hanabi_sad_tpu.train.selfplay \
    --preset sad_aux_op_2p --seed 606 \
    --compute_dtype bfloat16 --num_envs 1024 --num_update_per_chunk 16 \
    --lr 4e-5 --lr_final 1e-5 --lr_decay_updates 300000 \
    --eval_freq_epochs 2 --num_epoch 700 \
    --load_model docs/runs/zoo/auxop_b.pkl \
    --save_dir exps/auxop_b_r5

if [ -f exps/auxop_b_r5/model4.pkl ]; then
  python scripts/make_soup.py exps/auxop_b_r5/soup.pkl exps/auxop_b_r5/model[0-4].pkl
  stage auxop_b_pick 240 1000 5200 -- \
    python -u scripts/pick_best.py docs/runs/zoo/auxop_b_r5.pkl \
      exps/auxop_b_r5/soup.pkl exps/auxop_b_r5/model4.pkl docs/runs/zoo/auxop_b.pkl
  stage auxop_b_eval5000 240 700 4700 -- \
    python -u -m hanabi_sad_tpu.tools.eval_model \
      --paper sad --weight docs/runs/zoo/auxop_b_r5.pkl --num_game 5000 --seed 77
fi

# --- 3. Cross-play matrix with the grown OP seeds ---
AB=docs/runs/zoo/auxop_b_r5.pkl; [ -f "$AB" ] || AB=docs/runs/zoo/auxop_b.pkl
AC=docs/runs/zoo/auxop_c_r5.pkl; [ -f "$AC" ] || AC=docs/runs/zoo/auxop_c.pkl
if stage xp_matrix_r5 600 1500 3300 -- \
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

# --- 4. 3p from scratch (target >= 15 self-play, VERDICT item 7) ---
stage iql_3p_leg 1200 2400 1400 -- \
  python -u -m hanabi_sad_tpu.train.selfplay \
    --preset iql_2p --num_player 3 --seed 334 \
    --compute_dtype bfloat16 --num_envs 1024 --num_update_per_chunk 16 \
    --eval_freq_epochs 4 --num_epoch 400 \
    --save_dir exps/iql_3p_r5

if [ -f exps/iql_3p_r5/model4.pkl ]; then
  cp exps/iql_3p_r5/model4.pkl docs/runs/iql_3p_r5_model4.pkl
  cp exps/iql_3p_r5/train.log docs/runs/iql_3p_r5_train.log
fi

# --- 5. Snapshot-sampling latency A/B (PYTHONPATH appended, not replaced) ---
stage snapshot_ab 420 1400 0 -- bash -c '
  for snap in 0 1; do
    echo "=== fused=1 snapshot=$snap ==="
    PYTHONPATH=.:${PYTHONPATH:-} timeout 650 python -u scripts/bench_chunk_parts.py \
      --fused 1 --snapshot "$snap" 2>&1 | grep -v WARNING
  done | tee exps/perf_ab_r5.log'

mark "QUEUE round5c complete"
cp "$STATUS" docs/runs/round5_queue_status.log || true
