#!/bin/bash
# Round-5 queue, final leg (fresh machine, exps/ lost again -> resume from
# committed weights with fresh Adam + per-leg schedules, the round-4 recipe).
# Priorities per VERDICT round-4 "Next round" list, in order:
#   1. auxop_c polish leg: 23.75 -> target >= 23.9 (last score axis below
#      the reference, op_raw_data.txt:55-70 diagonal 23.9-24.2).
#   2. OP 2x2 cross-seed matrix + relabel on the grown seeds (the
#      "done" evidence for item 1).
#   3. Flagship polish leg: 24.05 -> target >= 24.1 (round-4 polish recipe:
#      short low-lr leg on the soup, then re-soup).
# Stages self-trim to BUDGET_SECS; each later stage is guarded by a reserve
# so an overrun drops the tail, not the head.
set -u
cd "$(dirname "$0")/.."
mkdir -p exps docs/runs/zoo

STATUS=exps/round5d_queue_status.log
START_TS=$(date +%s)
BUDGET_SECS=${BUDGET_SECS:-3000}
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

mark "QUEUE round5d begin (budget=${BUDGET_SECS}s)"

# --- 1. auxop_c polish leg (23.75 self-play -> 23.9+) ---
stage auxop_c_polish 480 840 2100 -- \
  python -u -m hanabi_sad_tpu.train.selfplay \
    --preset sad_aux_op_2p --seed 909 \
    --compute_dtype bfloat16 --num_envs 1024 --num_update_per_chunk 16 \
    --lr 8e-6 --lr_final 4e-6 --lr_decay_updates 70000 \
    --eval_freq_epochs 2 --num_epoch 800 \
    --load_model docs/runs/zoo/auxop_c_r5.pkl \
    --save_dir exps/auxop_c_r5p

if [ -f exps/auxop_c_r5p/model4.pkl ]; then
  python scripts/make_soup.py exps/auxop_c_r5p/soup.pkl exps/auxop_c_r5p/model[0-4].pkl
  python scripts/make_soup.py exps/auxop_c_r5p/soup6.pkl \
    exps/auxop_c_r5p/model[0-4].pkl docs/runs/zoo/auxop_c_r5.pkl || true
  stage auxop_c_pick 200 560 1550 -- \
    python -u scripts/pick_best.py docs/runs/zoo/auxop_c_r5.pkl \
      exps/auxop_c_r5p/soup.pkl exps/auxop_c_r5p/soup6.pkl \
      exps/auxop_c_r5p/model4.pkl docs/runs/zoo/auxop_c_r5.pkl
fi

# --- 2. Headline eval + OP 2x2 cross-seed matrix on the grown seeds ---
stage auxop_c_eval 200 460 1100 -- \
  python -u -m hanabi_sad_tpu.tools.eval_model \
    --paper sad --weight docs/runs/zoo/auxop_c_r5.pkl --num_game 3000 --seed 77

if stage xp_op_r5d 360 700 420 -- \
  python -u -m hanabi_sad_tpu.tools.crossplay_matrix \
    --weights docs/runs/zoo/auxop_b_r5.pkl docs/runs/zoo/auxop_c_r5.pkl \
    --num_game 1000 --seed 1 --relabel --out exps/xp_op_r5d.txt; then
  {
    echo "# OP cross-seed 2x2, round-5 final leg (reference: op_raw_data.txt:55-70)"
    echo "# 1000 greedy games per cell, seed 1; the two independent sad-aux-op"
    echo "# seeds (606/909) after this leg's polish. Relabel table pairs plain"
    echo "# vs color-relabeled self-play on the same decks."
    echo
    cat exps/xp_op_r5d.txt
  } > docs/runs/xp_op_r5d.txt
  cp exps/xp_op_r5d.txt.npz docs/runs/xp_op_r5d.npz 2>/dev/null || true
fi

# --- 3. Flagship polish leg (24.05 soup -> 24.1+) ---
stage flagship_polish 400 720 320 -- \
  python -u -m hanabi_sad_tpu.train.selfplay \
    --preset sad_2p --pred_weight 0.25 --seed 31 \
    --compute_dtype bfloat16 --num_envs 1024 --num_update_per_chunk 16 \
    --lr 6e-6 --lr_final 3e-6 --lr_decay_updates 60000 \
    --eval_freq_epochs 2 --num_epoch 800 \
    --load_model docs/runs/sad_aux_r4_soup10.pkl \
    --save_dir exps/sad_aux_r5p

if [ -f exps/sad_aux_r5p/model4.pkl ]; then
  python scripts/make_soup.py exps/sad_aux_r5p/soup.pkl exps/sad_aux_r5p/model[0-4].pkl
  python scripts/make_soup.py exps/sad_aux_r5p/soup6.pkl \
    exps/sad_aux_r5p/model[0-4].pkl docs/runs/sad_aux_r4_soup10.pkl || true
  stage flagship_pick 200 560 0 -- \
    python -u scripts/pick_best.py docs/runs/sad_aux_r5_soup.pkl \
      exps/sad_aux_r5p/soup.pkl exps/sad_aux_r5p/soup6.pkl \
      exps/sad_aux_r5p/model4.pkl docs/runs/sad_aux_r4_soup10.pkl
fi

# --- 4. Flagship headline eval, only if budget remains ---
if [ -f docs/runs/sad_aux_r5_soup.pkl ]; then
  stage flagship_eval 200 460 0 -- \
    python -u -m hanabi_sad_tpu.tools.eval_model \
      --paper sad --weight docs/runs/sad_aux_r5_soup.pkl --num_game 3000 --seed 78
fi

mark "QUEUE round5d complete"
cp "$STATUS" docs/runs/round5d_queue_status.log || true
