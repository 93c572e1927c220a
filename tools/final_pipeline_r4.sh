#!/bin/bash
# Round-4 tail pipeline: legacy-demand evaluation, deterministic-policy
# large_grid evaluation, seed-variance campaign, retuned b1k flagship run.
# Run AFTER tools/legacy_campaign.sh finishes.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache
SEEDS=10000,20000,30000,40000,50000,60000,70000,80000,90000,100000

echo "=== legacy-demand real_net evaluation ==="
python main.py --base-dir runs/eval_real_net_legacy evaluate \
    --agents greedy,ma2c,ia2c --evaluation-seeds "$SEEDS" 2>&1 | tail -2
python tools/eval_summary.py runs/eval_real_net_legacy/eva_data \
    figs/real_net_legacy_eval_summary.csv

echo "=== deterministic-policy large_grid evaluation (ma2c, ia2c) ==="
mkdir -p runs/eval_large_grid_det
ln -sfn ../large_grid_ma2c runs/eval_large_grid_det/ma2c
ln -sfn ../large_grid_ia2c runs/eval_large_grid_det/ia2c
python main.py --base-dir runs/eval_large_grid_det evaluate \
    --agents ma2c,ia2c --evaluation-seeds "$SEEDS" \
    --evaluation-policy-type deterministic 2>&1 | tail -2
python tools/eval_summary.py runs/eval_large_grid_det/eva_data \
    figs/large_grid_det_eval_summary.csv

echo "=== seed-variance campaign (VERDICT items 3 & 9) ==="
bash tools/seed_campaign.sh ma2c:13 ma2c:14 ia2c:13 ia2c:14

echo "=== retuned b1k flagship ==="
rm -rf runs/ma2c_large_b1k_r4
python main.py --base-dir runs/ma2c_large_b1k_r4 train \
    --config-dir deeprl_signal_control_tpu/configs/config_ma2c_large_b1k.ini \
    --test-mode no_test > runs/ma2c_large_b1k_r4.out 2>&1
tail -2 runs/ma2c_large_b1k_r4/log/*.log | head -2
echo "=== pipeline done ==="
