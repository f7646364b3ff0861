#!/bin/bash
# Round-3 stage 4 (extended): inter-seed cross-play matrix including the
# round-3 flagship. Replaces round3_chip_queue.sh's stage 4 (run manually
# after auxop_c finishes; the queue bash is stopped first so stages don't
# double-run on the single chip).
#
# Seats (all sad=True):
#   auxop_b, auxop_c  — INDEPENDENT sad-aux-op seeds (606/909, round 3)
#   sad_a, sad_b      — independent plain-SAD seeds (round-2 zoo)
#   sad_aux_r1        — round-3 flagship (SAD-AUX from scratch, non-OP)
# Expected op_raw_data.txt signature: auxop_b x auxop_c cross ~= self;
# sad/aux seeds collapse off-diagonal; relabel drop ~0 for auxop only.
set -u
cd "$(dirname "$0")/.."
if pgrep -f hanabi_sad_tpu.train.selfplay > /dev/null; then
  echo "training still running; aborting" >&2
  exit 1
fi
NUM_GAME=${NUM_GAME:-1000}
SEED=${SEED:-1}
FLAGSHIP=${FLAGSHIP:-docs/runs/sad_aux_r1_soup.pkl}

timeout 4500 python -u -m hanabi_sad_tpu.tools.crossplay_matrix \
  --weights docs/runs/zoo/auxop_b.pkl docs/runs/zoo/auxop_c.pkl \
            docs/runs/zoo/sad_a.pkl docs/runs/zoo/sad_b.pkl "$FLAGSHIP" \
  --num_game "$NUM_GAME" --seed "$SEED" --relabel --out exps/xp_r3.txt
{
  echo "# Inter-seed cross-play matrix, round 3 (reference: models/op_raw_data.txt)"
  echo "# $NUM_GAME greedy games per cell, seed $SEED."
  echo "# auxop_b/auxop_c: INDEPENDENT sad-aux-op seeds (sad_aux_op_2p preset,"
  echo "# seeds 606/909, ~45 min each on one chip, round 3)."
  echo "# sad_a/sad_b: independent plain-SAD seeds (round-2 zoo, 50 epochs)."
  echo "# $FLAGSHIP: the round-3 flagship (SAD-AUX from"
  echo "# scratch, non-OP) — high-score contrast seat."
  echo "# relabel table: plain vs relabeled self-play on the SAME decks"
  echo "# (paired; only the per-seat color permutation differs)."
  echo
  cat exps/xp_r3.txt
} > docs/runs/xp_matrix_r3.txt
echo "=== extended matrix written ==="
