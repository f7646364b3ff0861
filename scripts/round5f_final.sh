#!/bin/bash
# Round-5 final block: (1) multi-seed paired eval to choose the shipped
# flagship artifact honestly (single-seed picks flipped ordering across
# seeds 11/78/91 — seed noise ~±0.05); (2) plain-SAD polish leg, the last
# VERDICT score item (23.70 -> toward 23.9), with soup + pick + headline eval.
set -u
cd "$(dirname "$0")/.."
mkdir -p exps

STATUS=exps/round5f_status.log
START_TS=$(date +%s)
BUDGET_SECS=${BUDGET_SECS:-1150}
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

mark "FINAL round5f begin (budget=${BUDGET_SECS}s)"

# --- 1. Flagship artifact selection across 3 fresh seeds x 2000 games ---
stage flag_multiseed 120 300 800 -- bash -c '
  for w in docs/runs/sad_aux_r5_soup.pkl docs/runs/sad_aux_r4_soup10.pkl exps/soup_flag_wide.pkl; do
    for s in 101 102 103; do
      echo "== $w seed $s =="
      python -u -m hanabi_sad_tpu.tools.eval_model \
        --paper sad --weight "$w" --num_game 2000 --seed "$s" 2>&1 | grep score
    done
  done | tee exps/flag_multiseed.log'

# --- 2. Plain-SAD polish leg on the band soup ---
stage sad_polish 360 620 160 -- \
  python -u -m hanabi_sad_tpu.train.selfplay \
    --preset sad_2p --seed 41 \
    --compute_dtype bfloat16 --num_envs 1024 --num_update_per_chunk 16 \
    --lr 6e-6 --lr_final 3e-6 --lr_decay_updates 60000 \
    --eval_freq_epochs 2 --num_epoch 800 \
    --load_model docs/runs/sad_r4_soup.pkl \
    --save_dir exps/sad_r5p

if [ -f exps/sad_r5p/model4.pkl ]; then
  python scripts/make_soup.py exps/sad_r5p/soup.pkl exps/sad_r5p/model[0-4].pkl
  python scripts/make_soup.py exps/sad_r5p/soup6.pkl \
    exps/sad_r5p/model[0-4].pkl docs/runs/sad_r4_soup.pkl || true
  stage sad_pick 80 200 60 -- \
    python -u scripts/pick_best.py docs/runs/sad_r5_soup.pkl \
      exps/sad_r5p/soup.pkl exps/sad_r5p/soup6.pkl \
      exps/sad_r5p/model4.pkl docs/runs/sad_r4_soup.pkl --num_game 2000
  stage sad_eval5000 60 150 0 -- \
    python -u -m hanabi_sad_tpu.tools.eval_model \
      --paper sad --weight docs/runs/sad_r5_soup.pkl --num_game 5000 --seed 91
fi

mark "FINAL round5f complete"
