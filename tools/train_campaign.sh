#!/bin/bash
# Parity campaign (VERDICT round-1 item 1): train every algorithm on
# large_grid and real_net with batched envs, writing runs/<scenario>_<agent>.
# Reference targets: MA2C ~ IQL-LR > IA2C on large_grid; MA2C > IA2C >
# IQL-LR on real_net (README.md:63; real_net final rewards MA2C -30.8,
# IA2C -41.7, IQL-LR -104.6, IQL-DNN -126.4).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache
mkdir -p runs/campaign_cfg
# TOTAL_STEP/NUM_ENVS overridable: default full per-env parity with the
# reference (1e6 steps per env, ref config total_step; with B=64 envs and
# real_net's batch_size=40 that is also EXACTLY the reference's 25k updates)
TOTAL_STEP="${TOTAL_STEP:-6.4e7}"
NUM_ENVS="${NUM_ENVS:-64}"
for pair in "$@"; do
  alg=${pair%%:*}; scen=${pair##*:}
  name="${scen}_${alg}"
  cfg="runs/campaign_cfg/config_${name}.ini"
  python - "$alg" "$scen" "$cfg" "$TOTAL_STEP" "$NUM_ENVS" << 'PY'
import configparser, sys
alg, scen, out, total_step, num_envs = sys.argv[1:6]
short = {"large_grid": "large", "real_net": "real"}[scen]
cp = configparser.ConfigParser()
cp.read(f"deeprl_signal_control_tpu/configs/config_{alg}_{short}.ini")
cp["TRAIN_CONFIG"]["num_envs"] = num_envs
cp["TRAIN_CONFIG"]["total_step"] = total_step
cp["TRAIN_CONFIG"]["log_interval"] = "1e6"
with open(out, "w") as f:
    cp.write(f)
PY
  echo "=== training $name ==="
  rm -rf "runs/$name"
  python main.py --base-dir "runs/$name" train --config-dir "$cfg" \
      --test-mode no_test > "runs/${name}.out" 2>&1
  tail -2 "runs/$name/log/"*.log | head -2
done
