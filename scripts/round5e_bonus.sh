#!/bin/bash
# Round-5 bonus block (after round5d): evals turned out ~100x cheaper than
# budgeted (compilation cache warm), so explore soup combinations across
# each lineage's committed checkpoints, then spend the remaining wall on a
# plain-SAD polish leg (VERDICT item 3: lift 23.70 toward 23.9).
set -u
cd "$(dirname "$0")/.."
mkdir -p exps

STATUS=exps/round5e_status.log
START_TS=$(date +%s)
BUDGET_SECS=${BUDGET_SECS:-1100}
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

mark "BONUS round5e begin (budget=${BUDGET_SECS}s)"

# --- 1. Flagship lineage soup exploration (same seed-31 lineage r2->r5) ---
if [ -f exps/sad_aux_r5p/model4.pkl ]; then
  python scripts/make_soup.py exps/soup_flag_wide.pkl \
    exps/sad_aux_r5p/model[0-4].pkl docs/runs/sad_aux_r4_soup10.pkl \
    docs/runs/sad_aux_r3_soup.pkl || true
  python scripts/make_soup.py exps/soup_flag_deep.pkl \
    exps/sad_aux_r5p/model[0-4].pkl docs/runs/sad_aux_r4_soup10.pkl \
    docs/runs/sad_aux_r3_soup.pkl docs/runs/sad_aux_r2_soup.pkl || true
  stage flag_soup_pick 120 420 560 -- \
    python -u scripts/pick_best.py docs/runs/sad_aux_r5_soup.pkl \
      docs/runs/sad_aux_r5_soup.pkl exps/soup_flag_wide.pkl \
      exps/soup_flag_deep.pkl --num_game 2000
fi

# --- 2. auxop_c lineage soup exploration ---
if [ -f exps/auxop_c_r5p/model4.pkl ]; then
  python scripts/make_soup.py exps/soup_c_wide.pkl \
    exps/auxop_c_r5p/model[0-4].pkl docs/runs/zoo/auxop_c_r5.pkl \
    docs/runs/zoo/auxop_c.pkl || true
  stage auxopc_soup_pick 100 300 420 -- \
    python -u scripts/pick_best.py docs/runs/zoo/auxop_c_r5.pkl \
      docs/runs/zoo/auxop_c_r5.pkl exps/soup_c_wide.pkl --num_game 2000
fi

# --- 3. Headline 5000-game evals on fresh seeds ---
stage flag_eval5000 80 260 260 -- \
  python -u -m hanabi_sad_tpu.tools.eval_model \
    --paper sad --weight docs/runs/sad_aux_r5_soup.pkl --num_game 5000 --seed 91
stage auxopc_eval5000 80 260 120 -- \
  python -u -m hanabi_sad_tpu.tools.eval_model \
    --paper sad --weight docs/runs/zoo/auxop_c_r5.pkl --num_game 5000 --seed 91

mark "BONUS round5e complete"
