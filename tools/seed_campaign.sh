#!/bin/bash
# Seed-variance campaign (VERDICT round-3 items 3 & 9): re-run large_grid
# MA2C/IA2C at update parity with different env seeds so the training
# figures can show mean +/- seed bands (BASELINE.json "within seed
# variance"), and exercise the in-train test harness on one real run.
#
# Usage: tools/seed_campaign.sh ma2c:13 ma2c:14 ia2c:13 ia2c:14
# The FIRST ma2c run gets --test-mode in_train_test with the reference's
# cadence (50 in-train tests over the run, utils.py:257-275 parity).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache
mkdir -p runs/campaign_cfg
TOTAL_STEP="${TOTAL_STEP:-6.4e7}"
NUM_ENVS="${NUM_ENVS:-64}"
first_ma2c=1
for pair in "$@"; do
  alg=${pair%%:*}; seed=${pair##*:}
  name="large_grid_${alg}_s${seed}"
  cfg="runs/campaign_cfg/config_${name}.ini"
  test_mode=no_test
  if [ "$alg" = ma2c ] && [ "$first_ma2c" = 1 ]; then
    test_mode=in_train_test; first_ma2c=0
  fi
  python - "$alg" "$cfg" "$TOTAL_STEP" "$NUM_ENVS" "$seed" << 'PY'
import configparser, sys
alg, out, total_step, num_envs, seed = sys.argv[1:6]
cp = configparser.ConfigParser()
cp.read(f"deeprl_signal_control_tpu/configs/config_{alg}_large.ini")
cp["TRAIN_CONFIG"]["num_envs"] = num_envs
cp["TRAIN_CONFIG"]["total_step"] = total_step
cp["TRAIN_CONFIG"]["log_interval"] = "1e6"
# reference cadence: 50 in-train tests per run (1e6/2e4); at B=64 global
# steps that is test_interval = total_step/50
cp["TRAIN_CONFIG"]["test_interval"] = str(float(total_step) / 50)
cp["ENV_CONFIG"]["seed"] = seed
with open(out, "w") as f:
    cp.write(f)
PY
  echo "=== training $name (test-mode $test_mode) ==="
  rm -rf "runs/$name"
  python main.py --base-dir "runs/$name" train --config-dir "$cfg" \
      --test-mode "$test_mode" > "runs/${name}.out" 2>&1
  tail -2 "runs/$name/log/"*.log | head -2
done
