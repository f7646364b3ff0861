#!/bin/bash
# End-of-block finisher for the sad_2p_r4 soup-resume run: soup the run's
# top-5 checkpoints, 5000-game greedy self-play eval of the best single
# checkpoint and the soup, and snapshot both into docs/runs/.
# Run ONLY after the training process has exited (single-tenant chip).
set -e
cd "$(dirname "$0")/.."
dir=${1:-exps/sad_2p_r4}
n=${2:-5000}

models=$(ls "$dir"/model[0-4].pkl 2>/dev/null)
[ -n "$models" ] || { echo "no checkpoints in $dir"; exit 1; }
python scripts/make_soup.py "$dir/soup.pkl" $models

# Sort on the extracted numeric score only — extra colons elsewhere in the
# line (e.g. timestamps) must not break the key.
best=$(grep -ho "eval score: [0-9.]*" "$dir/train.log" | sort -t: -k2 -rn | head -1 || true)
echo "best epoch line: $best"

for m in "$dir/soup.pkl" "$dir"/model4.pkl "$dir"/model3.pkl; do
  [ -f "$m" ] || continue
  echo "=== $m ($n games) ==="
  python -u -m hanabi_sad_tpu.tools.eval_model --paper sad --weight "$m" --num_game "$n" --seed 77
done

cp "$dir/soup.pkl" docs/runs/sad_2p_r4_soup.pkl
cp "$dir/model4.pkl" docs/runs/sad_2p_r4_model4.pkl 2>/dev/null || true
echo "snapshotted to docs/runs/"
