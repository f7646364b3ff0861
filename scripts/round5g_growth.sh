#!/bin/bash
# Round-5 open-ended growth loop for auxop_c (VERDICT item 1: the OP
# diagonal, last score axis below the reference). Polish legs are
# exhausted (round5d/f evidence) — this resumes GROWTH-scale lr
# (2e-5 -> 8e-6 over a long horizon) in 10-minute cycles. Each cycle:
# train under timeout (full-resume latest.pkl makes the cut lossless) ->
# soup -> pick_best against the incumbent -> commit only on improvement.
# The loop turns an unknown remaining wall-clock into monotone committed
# progress: whenever the session ends, the last committed artifact stands.
# Chip stays single-tenant: train and eval never overlap.
set -u
cd "$(dirname "$0")/.."
mkdir -p exps

STATUS=exps/round5g_status.log
START_TS=$(date +%s)
BUDGET_SECS=${BUDGET_SECS:-14400}
DEADLINE=$(( START_TS + BUDGET_SECS ))
mark() { echo "$(date -u +%FT%TZ) $*" | tee -a "$STATUS"; }
mark "GROWTH round5g begin (budget=${BUDGET_SECS}s)"

CYCLE=0
while :; do
  rem=$(( DEADLINE - $(date +%s) ))
  (( rem < 780 )) && { mark "STOP (remaining=${rem}s < 780s)"; break; }
  CYCLE=$(( CYCLE + 1 ))

  LOAD=docs/runs/zoo/auxop_c_r5.pkl
  [ -f exps/auxop_c_g/latest.pkl ] && LOAD=exps/auxop_c_g/latest.pkl
  mark "CYCLE $CYCLE train (load=$LOAD remaining=${rem}s)"
  timeout 600 python -u -m hanabi_sad_tpu.train.selfplay \
    --preset sad_aux_op_2p --seed 909 \
    --compute_dtype bfloat16 --num_envs 1024 --num_update_per_chunk 16 \
    --lr 2e-5 --lr_final 8e-6 --lr_decay_updates 300000 \
    --eval_freq_epochs 2 --num_epoch 3000 \
    --load_model "$LOAD" \
    --save_dir exps/auxop_c_g
  mark "CYCLE $CYCLE train done (rc=$?)"

  [ -f exps/auxop_c_g/model4.pkl ] || { mark "CYCLE $CYCLE no checkpoints; abort"; break; }
  python scripts/make_soup.py exps/auxop_c_g/soup.pkl exps/auxop_c_g/model[0-4].pkl
  python scripts/make_soup.py exps/auxop_c_g/soup6.pkl \
    exps/auxop_c_g/model[0-4].pkl docs/runs/zoo/auxop_c_r5.pkl || true
  BEFORE=$(md5sum docs/runs/zoo/auxop_c_r5.pkl | cut -d' ' -f1)
  timeout 420 python -u scripts/pick_best.py docs/runs/zoo/auxop_c_r5.pkl \
    exps/auxop_c_g/soup.pkl exps/auxop_c_g/soup6.pkl \
    exps/auxop_c_g/model4.pkl docs/runs/zoo/auxop_c_r5.pkl \
    --num_game 2000 2>&1 | tee -a "$STATUS" | tail -6
  AFTER=$(md5sum docs/runs/zoo/auxop_c_r5.pkl | cut -d' ' -f1)
  if [ "$BEFORE" != "$AFTER" ]; then
    timeout 300 python -u -m hanabi_sad_tpu.tools.eval_model \
      --paper sad --weight docs/runs/zoo/auxop_c_r5.pkl \
      --num_game 3000 --seed 91 2>&1 | tee exps/auxop_c_g/headline.txt | tail -2
    git add docs/runs/zoo/auxop_c_r5.pkl
    git commit -q -m "auxop_c growth cycle $CYCLE: artifact improved on 2000-game pick ($(grep -o 'score: [0-9.]*' exps/auxop_c_g/headline.txt | head -1 || echo 'see log') on 3000 fresh-seed games)" || true
    mark "CYCLE $CYCLE committed improved artifact"
  else
    mark "CYCLE $CYCLE incumbent kept"
  fi
done
mark "GROWTH round5g complete"
cp "$STATUS" docs/runs/round5g_status.log 2>/dev/null || true
