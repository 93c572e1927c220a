#!/usr/bin/env bash
# Environment setup (the reference's setup_ubuntu.sh/setup_mac.sh analog,
# /root/reference/setup_ubuntu.sh). No SUMO and no TF1 needed here: the
# simulator is on-device JAX and the learner is JAX/optax.
set -euo pipefail

python3 -m pip install --upgrade \
    "jax[tpu]" optax orbax-checkpoint numpy pandas pytest

# optional: native shortest-path router for scenario compilation
if command -v g++ >/dev/null; then
    make -C "$(dirname "$0")/native"
fi

echo "ok: run 'python3 -m pytest tests/ -q' to self-check"
