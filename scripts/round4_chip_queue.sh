#!/bin/bash
# Round-4 chip queue. Priority order per VERDICT.md round-3 review:
#   0. 3-player on-chip training smoke (item 4 — queued two rounds, never ran).
#   1. Resume the SAD-AUX flagship to lr-schedule completion (item 1 — the
#      schedule was cut at update 798,560 of 1,100,000; ~305 epochs remain).
#   2. Soup the new top-5 (and the combined round-3+round-4 ten) and run
#      5000-game evals — target >= 24.0 (the SAD-AUX family diagonal).
#   3. Plain-SAD band push (item 2): resume sad_2p_r2 weights with the
#      round-3 recipe (continuous + exact priority + lr decay) toward 23.6.
#   4. Grow auxop_b/auxop_c (item 3) toward band-level self-play.
#   5. Regenerate the inter-seed cross-play matrix with the grown seeds and
#      the band-level plain-SAD seat — quantitative op_raw_data comparison.
#
# Queue hygiene (VERDICT item 9): every stage writes START/DONE/SKIPPED with
# timestamps and exit codes to $STATUS (committed at round end), so a stage
# squeezed out by the time box is visible instead of silent. Stage timeouts
# adapt to the remaining budget; stages whose minimum useful time no longer
# fits are SKIPPED explicitly.
set -u
cd "$(dirname "$0")/.."
mkdir -p exps docs/runs/zoo

STATUS=exps/round4_queue_status.log
START_TS=$(date +%s)
BUDGET_SECS=${BUDGET_SECS:-22500}   # 6.25 h of chip by default
DEADLINE=$(( START_TS + BUDGET_SECS ))

remaining() { echo $(( DEADLINE - $(date +%s) )); }
mark() { echo "$(date -u +%FT%TZ) $*" | tee -a "$STATUS"; }

# stage <name> <min_secs> <cap_secs> <reserve_for_later> -- cmd...
# Runs cmd under `timeout min(cap, remaining - reserve)`; skips (with a
# visible SKIPPED marker) when that is below min_secs.
stage() {
  local name=$1 min=$2 cap=$3 reserve=$4; shift 4; shift  # consume "--"
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

mark "QUEUE round4 begin (budget=${BUDGET_SECS}s)"

# --- 0. 3-player on-chip training smoke (15 min) ---
if stage iql_3p_smoke 300 900 20000 -- \
  python -u -m hanabi_sad_tpu.train.selfplay --preset iql_2p \
    --num_player 3 --seed 333 --compute_dtype bfloat16 \
    --num_epoch 40 --num_eval_game 400 --eval_freq_epochs 4 \
    --save_dir exps/iql_3p_smoke; then
  grep -E "eval score" exps/iql_3p_smoke/train.log | tail -10
  cp exps/iql_3p_smoke/train.log docs/runs/iql_3p_smoke_train.log || true
fi

# --- 1. Flagship resume: finish the lr schedule (798,560 -> 1,100,000) ---
# Same flags as the round-3 launch (scripts/round3_chip_queue.sh stage 1);
# full-resume restores params+opt(incl. lr-schedule step)+counters+PRNG.
stage sad_aux_resume 1200 6600 9000 -- \
  python -u -m hanabi_sad_tpu.train.selfplay \
    --preset sad_2p --pred_weight 0.25 --seed 31 \
    --compute_dtype bfloat16 --num_envs 1024 --num_update_per_chunk 16 \
    --lr_final 1e-5 --lr_decay_updates 1100000 \
    --num_epoch 420 --load_model docs/runs/sad_aux_r1_latest.pkl \
    --save_dir exps/sad_aux_r2

# --- 2. Soups + 5000-game evals (the >= 24.0 attempt) ---
if [ -f exps/sad_aux_r2/model4.pkl ]; then
  python scripts/make_soup.py exps/sad_aux_r2/soup.pkl exps/sad_aux_r2/model[0-4].pkl
  python scripts/make_soup.py exps/sad_aux_r2/soup10.pkl \
    exps/sad_aux_r2/model[0-4].pkl exps/sad_aux_r1/model[0-4].pkl || true
  for m in exps/sad_aux_r2/soup.pkl exps/sad_aux_r2/soup10.pkl exps/sad_aux_r2/model4.pkl; do
    [ -f "$m" ] || continue
    stage "eval5000:$m" 300 1200 6500 -- \
      python -u -m hanabi_sad_tpu.tools.eval_model \
        --paper sad --weight "$m" --num_game 5000 --seed 77
  done
  cp exps/sad_aux_r2/soup.pkl docs/runs/sad_aux_r2_soup.pkl || true
  cp exps/sad_aux_r2/model4.pkl docs/runs/sad_aux_r2_model4.pkl || true
  [ -f exps/sad_aux_r2/soup10.pkl ] && cp exps/sad_aux_r2/soup10.pkl docs/runs/sad_aux_r2_soup10.pkl
fi

# --- 3. Plain-SAD band push: round-3 recipe on the sad_2p_r2 lineage ---
# Weights-only load (optimizer restarts); lr continues from the round-2
# manual 3e-5 and decays to 1e-5 across this block's updates.
if stage sad_band_push 1200 4800 3600 -- \
  python -u -m hanabi_sad_tpu.train.selfplay \
    --preset sad_2p --seed 47 \
    --compute_dtype bfloat16 --num_envs 1024 --num_update_per_chunk 16 \
    --lr 3e-5 --lr_final 1e-5 --lr_decay_updates 400000 \
    --num_epoch 600 --load_model docs/runs/sad_2p_r2_model.pkl \
    --save_dir exps/sad_r4; then
  python scripts/make_soup.py exps/sad_r4/soup.pkl exps/sad_r4/model[0-4].pkl
  for m in exps/sad_r4/soup.pkl exps/sad_r4/model4.pkl; do
    stage "eval5000:$m" 300 1200 2400 -- \
      python -u -m hanabi_sad_tpu.tools.eval_model \
        --paper sad --weight "$m" --num_game 5000 --seed 77
  done
  cp exps/sad_r4/soup.pkl docs/runs/sad_r4_soup.pkl || true
  cp exps/sad_r4/model4.pkl docs/runs/sad_r4_model4.pkl || true
fi

# --- 4. Grow the independent OP seeds toward the band ---
for s in b c; do
  if stage "auxop_${s}_grow" 900 2100 1800 -- \
    python -u -m hanabi_sad_tpu.train.selfplay \
      --preset sad_aux_op_2p --seed 0 \
      --compute_dtype bfloat16 --num_envs 1024 --num_update_per_chunk 16 \
      --eval_freq_epochs 2 --num_epoch 800 \
      --load_model "exps/auxop_${s}_r3/latest.pkl" \
      --save_dir "exps/auxop_${s}_r4"; then
    cp "exps/auxop_${s}_r4/model4.pkl" "docs/runs/zoo/auxop_${s}.pkl" || true
  fi
done

# --- 5. Quantitative inter-seed cross-play matrix ---
# Seats: two independent grown OP seeds + the band-level plain-SAD lineages
# (sad_r4 from stage 3 and the independent round-2 zoo seed sad_b).
SAD_NEW=docs/runs/sad_r4_soup.pkl
[ -f "$SAD_NEW" ] || SAD_NEW=docs/runs/sad_2p_r3_soup.pkl
if stage xp_matrix_r4 600 3000 0 -- \
  python -u -m hanabi_sad_tpu.tools.crossplay_matrix \
    --weights docs/runs/zoo/auxop_b.pkl docs/runs/zoo/auxop_c.pkl \
              "$SAD_NEW" docs/runs/zoo/sad_b.pkl \
    --num_game 1000 --seed 1 --relabel --out exps/xp_r4.txt; then
  {
    echo "# Inter-seed cross-play matrix, round 4 (reference: models/op_raw_data.txt)"
    echo "# 1000 greedy games per cell, seed 1. auxop_b/auxop_c are independent"
    echo "# sad-aux-op seeds grown across rounds 3-4; seat 3 is the band-level"
    echo "# plain-SAD lineage ($SAD_NEW); sad_b is an independent 50-epoch SAD"
    echo "# seed. The relabel table pairs plain vs relabeled self-play on the"
    echo "# same eval decks (paired comparison)."
    echo
    cat exps/xp_r4.txt
  } > docs/runs/xp_matrix_r4.txt
  cp exps/xp_r4.txt.npz docs/runs/xp_r4.npz || true
fi

mark "QUEUE round4 complete"
cp "$STATUS" docs/runs/round4_queue_status.log || true
