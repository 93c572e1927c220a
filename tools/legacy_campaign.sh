#!/bin/bash
# Legacy-demand real_net campaign (VERDICT round-3 item 2): train + the
# reference's shipped eva_data were generated with an OLDER demand profile
# than build_file.py produces today (CALIBRATION.md "Demand provenance").
# Train under ENV_CONFIG demand=legacy so our eval table and the
# reference's shipped real_net numbers finally compare the same traffic.
#
# Usage: tools/legacy_campaign.sh ma2c ia2c [iqll ...]
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache
mkdir -p runs/campaign_cfg
TOTAL_STEP="${TOTAL_STEP:-6.4e7}"
NUM_ENVS="${NUM_ENVS:-64}"
for alg in "$@"; do
  name="real_net_${alg}_legacy"
  cfg="runs/campaign_cfg/config_${name}.ini"
  python - "$alg" "$cfg" "$TOTAL_STEP" "$NUM_ENVS" << 'PY'
import configparser, sys
alg, out, total_step, num_envs = sys.argv[1:5]
cp = configparser.ConfigParser()
cp.read(f"deeprl_signal_control_tpu/configs/config_{alg}_real.ini")
cp["TRAIN_CONFIG"]["num_envs"] = num_envs
cp["TRAIN_CONFIG"]["total_step"] = total_step
cp["TRAIN_CONFIG"]["log_interval"] = "1e6"
cp["ENV_CONFIG"]["demand"] = "legacy"
with open(out, "w") as f:
    cp.write(f)
PY
  echo "=== training $name ==="
  rm -rf "runs/$name"
  python main.py --base-dir "runs/$name" train --config-dir "$cfg" \
      --test-mode no_test > "runs/${name}.out" 2>&1
  tail -2 "runs/$name/log/"*.log | head -2
done
