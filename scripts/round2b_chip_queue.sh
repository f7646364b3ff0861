#!/bin/bash
# Session queue for the one real chip: (1) regenerate the op_raw_data-style
# cross-play artifact over the trained zoo, (2) resume the flagship sad_2p
# lineage from the top-5 weight soup at a decayed lr for the score-band push.
set -e
cd "$(dirname "$0")/.."

mkdir -p exps
NUM_GAME=400
SEED=1
# --- 1. Cross-play matrix artifact (reference models/op_raw_data.txt) ---
# sad-family block: equal-budget zoo seeds + flagship lineage + aux branches.
python -u -m hanabi_sad_tpu.tools.crossplay_matrix \
  --weights docs/runs/zoo/sad_a.pkl docs/runs/zoo/sad_b.pkl \
            docs/runs/sad_2p_r3_model4.pkl docs/runs/sad_2p_r3_soup.pkl \
            docs/runs/sad_aux_warm_model0.pkl docs/runs/zoo/auxop_a.pkl \
  --num_game "$NUM_GAME" --seed "$SEED" --relabel --out exps/xp_sad.txt
# op family (sad=False seats cannot mix with sad=True): self + relabel.
python -u -m hanabi_sad_tpu.tools.crossplay_matrix \
  --weights docs/runs/zoo/op_a.pkl docs/runs/iql_2p_r2_model.pkl \
  --num_game "$NUM_GAME" --seed "$SEED" --relabel --out exps/xp_op.txt

{
  echo "# Cross-play matrix (reference artifact: models/op_raw_data.txt)"
  echo "# $NUM_GAME greedy games per cell, seed $SEED. Zoo seeds (sad_a/b, op_a,"
  echo "# auxop_a) are 50-epoch equal-budget runs; flagship models are the"
  echo "# accumulated sad_2p lineage. 'relabeled' = self-play with each seat"
  echo "# observing through an independent random color permutation (the"
  echo "# Other-Play paper's cross-play metric): color-symmetric (OP) policies"
  echo "# keep their score, convention-bound (SAD) policies collapse."
  echo
  echo "## sad-family seats (sad=True)"
  cat exps/xp_sad.txt
  echo
  echo "## vdn-family seats (sad=False): op_a (shuffle_color) vs iql baseline"
  cat exps/xp_op.txt
} > docs/runs/xp_matrix.txt
echo "=== xp_matrix.txt written ==="

# --- 2. Score push: resume from the soup at decayed lr ---
python -u -m hanabi_sad_tpu.train.selfplay --preset sad_2p --seed 17 \
  --load_model docs/runs/sad_2p_r3_soup.pkl --lr 2e-5 \
  --num_epoch 400 --save_dir exps/sad_2p_r4
