#!/bin/bash
# Round-4 post-campaign TPU pipeline: large_grid evaluation of the
# update-parity campaign (VERDICT item 1 'Done' check), then the
# fidelity-knob calibration sweep (item 5).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache
SEEDS=10000,20000,30000,40000,50000,60000,70000,80000,90000,100000

echo "=== large_grid evaluation (5 agents x 10 seeds) ==="
python main.py --base-dir runs/eval_large_grid evaluate \
    --agents greedy,ma2c,ia2c,iqll,iqld --evaluation-seeds "$SEEDS" \
    2>&1 | tail -3
python tools/eval_summary.py runs/eval_large_grid/eva_data \
    figs/large_grid_eval_summary.csv
python tools/plot_results.py eval figs/large_grid_eval.png \
    runs/eval_large_grid/eva_data

echo "=== calibration sweep (dawdle x impatience) ==="
for combo in "0.5 15" "0.5 7" "0.3 15" "0.3 7" "0.0 7"; do
  set -- $combo
  echo "--- dawdle=$1 impatience=$2 ---"
  python tools/calibrate_greedy.py --dawdle "$1" --impatience "$2" \
      2>/dev/null | tail -9
done
