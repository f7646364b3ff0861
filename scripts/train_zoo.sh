#!/bin/bash
# Round-2 model zoo: short from-scratch runs of each model family, used to
# regenerate the reference's op_raw_data.txt-style cross-play artifact
# (reference models/op_raw_data.txt:19-70). One seed of each family first so
# a truncated queue still yields a full matrix; score ceilings are set by the
# short budget, the artifact's point is the cross-play *structure*
# (OP row means >> non-OP row means).
set -e
cd "$(dirname "$0")/.."
EPOCHS=${EPOCHS:-40}
run() {
  name=$1; shift
  if [ -f "exps/zoo/$name/model0.pkl" ]; then echo "=== $name: done, skip ==="; return; fi
  echo "=== $name ==="
  python -m hanabi_sad_tpu.train.selfplay "$@" \
    --num_epoch "$EPOCHS" --num_eval_game 400 --eval_freq_epochs 2 \
    --save_dir "exps/zoo/$name"
}
run sad_a   --preset sad_2p --seed 101
run op_a    --preset op_2p --seed 303
run auxop_a --preset sad_aux_op_2p --seed 505
run aux_a   --preset sad_2p --pred_weight 0.25 --seed 707
run sad_b   --preset sad_2p --seed 202
run op_b    --preset op_2p --seed 404
run auxop_b --preset sad_aux_op_2p --seed 606
run aux_b   --preset sad_2p --pred_weight 0.25 --seed 808
echo "zoo complete"

# Continuous-priority A/B (VERDICT weak #4): same run +- exact priorities.
run prio_approx --preset iql_2p --seed 909
run prio_exact  --preset iql_2p --seed 909 --continuous_exact_priority 1
echo "prio A/B complete"
