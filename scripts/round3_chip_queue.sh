#!/bin/bash
# Round-3 chip queue. Priority order per VERDICT.md round-2 review:
#   1. SAD-AUX from scratch (the reference's best-scoring family,
#      models/op_raw_data.txt:37-52) with in-run linear lr decay — the
#      score-band push gets the big uninterrupted block FIRST this round.
#   2. Soup + 5000-game evals of the flagship run.
#   3. Two independent sad-aux-op seeds (the reference's strongest
#      cross-play family, op_raw_data.txt:55-70) for the inter-seed matrix.
#   4. The combined cross-play matrix artifact over independent seeds.
# Every stage is time-boxed with `timeout` so a hung stage can't eat the
# round; checkpoints save continuously so SIGTERM loses nothing.
set -u
cd "$(dirname "$0")/.."
mkdir -p exps

# Single-tenant chip: refuse to start while another trainer is alive
# (detection only — never kill by pattern).
if pgrep -f hanabi_sad_tpu.train.selfplay > /dev/null; then
  echo "another selfplay process is running; aborting queue" >&2
  exit 1
fi

NUM_ENVS=${NUM_ENVS:-1024}
UPDATES=${UPDATES:-16}
FLAGSHIP_SECS=${FLAGSHIP_SECS:-13500}   # ~3.75 h
OPSEED_SECS=${OPSEED_SECS:-2700}        # 45 min each

# --- 1. Flagship: SAD-AUX from scratch, lr 6.25e-5 -> 1e-5 over 1M updates ---
timeout "$FLAGSHIP_SECS" python -u -m hanabi_sad_tpu.train.selfplay \
  --preset sad_2p --pred_weight 0.25 --seed 31 \
  --compute_dtype bfloat16 --num_envs "$NUM_ENVS" --num_update_per_chunk "$UPDATES" \
  --lr_final 1e-5 --lr_decay_updates 1100000 \
  --num_epoch 2000 --save_dir exps/sad_aux_r1
echo "=== flagship block done (rc=$?) ==="

# --- 2. Soup the top-5 and run 5000-game evals of soup + best single ---
python scripts/make_soup.py exps/sad_aux_r1/soup.pkl exps/sad_aux_r1/model[0-4].pkl
for m in exps/sad_aux_r1/soup.pkl exps/sad_aux_r1/model4.pkl; do
  echo "=== eval $m (5000 games) ==="
  timeout 2400 python -u -m hanabi_sad_tpu.tools.eval_model \
    --paper sad --weight "$m" --num_game 5000 --seed 77
done
cp exps/sad_aux_r1/soup.pkl docs/runs/sad_aux_r1_soup.pkl 2>/dev/null || true
cp exps/sad_aux_r1/model4.pkl docs/runs/sad_aux_r1_model4.pkl 2>/dev/null || true

# --- 3. Independent sad-aux-op seeds (equal budget, different seeds) ---
for s in b:606 c:909; do
  name=auxop_${s%%:*}; seed=${s##*:}
  timeout "$OPSEED_SECS" python -u -m hanabi_sad_tpu.train.selfplay \
    --preset sad_aux_op_2p --seed "$seed" \
    --compute_dtype bfloat16 --num_envs "$NUM_ENVS" --num_update_per_chunk "$UPDATES" \
    --eval_freq_epochs 2 --num_epoch 400 --save_dir "exps/${name}_r3"
  echo "=== $name block done (rc=$?) ==="
  cp "exps/${name}_r3/model4.pkl" "docs/runs/zoo/${name}.pkl" 2>/dev/null || \
    cp "exps/${name}_r3/model3.pkl" "docs/runs/zoo/${name}.pkl" 2>/dev/null || true
done

# --- 4. Inter-seed cross-play matrix: OP family vs SAD family ---
# auxop_a (round 2, 50 epochs) is outclassed by the new seeds; the matrix
# pairs the two fresh independent auxop seeds with the two independent sad
# seeds. Expected signature (op_raw_data.txt): auxop_b x auxop_c cross-play
# ~= their self-play; sad_a x sad_b collapses.
NUM_GAME=1000
SEED=1
timeout 5400 python -u -m hanabi_sad_tpu.tools.crossplay_matrix \
  --weights docs/runs/zoo/auxop_b.pkl docs/runs/zoo/auxop_c.pkl \
            docs/runs/zoo/sad_a.pkl docs/runs/zoo/sad_b.pkl \
  --num_game "$NUM_GAME" --seed "$SEED" --relabel --out exps/xp_r3.txt
{
  echo "# Inter-seed cross-play matrix, round 3 (reference: models/op_raw_data.txt)"
  echo "# $NUM_GAME greedy games per cell, seed $SEED. auxop_b/auxop_c are"
  echo "# INDEPENDENT sad-aux-op seeds (--preset sad_aux_op_2p, seeds 606/909,"
  echo "# ${OPSEED_SECS}s each); sad_a/sad_b are independent plain-SAD seeds"
  echo "# (50-epoch round-2 zoo runs). The relabel table pairs plain vs"
  echo "# relabeled self-play on the SAME eval decks (paired comparison)."
  echo
  cat exps/xp_r3.txt
} > docs/runs/xp_matrix_r3.txt
echo "=== round-3 queue complete ==="
