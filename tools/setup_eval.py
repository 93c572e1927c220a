"""Reshuffle trained run directories into an evaluation tree.

Replaces the reference's setup_eval.py:14-51: copies each agent's model
checkpoints, the config that traveled with the run, and the training-reward
CSV from a training tree into the layout ``main.py evaluate`` expects.

Usage:
    python tools/setup_eval.py <train_base> <eval_base> agent1 [agent2 ...]
"""

from __future__ import annotations

import os
import shutil
import sys


def main(train_base: str, eval_base: str, agents):
    for agent in agents:
        src = os.path.join(train_base, agent)
        dst = os.path.join(eval_base, agent)
        for sub in ("model", "data"):
            s, d = os.path.join(src, sub), os.path.join(dst, sub)
            if os.path.isdir(s):
                os.makedirs(d, exist_ok=True)
                shutil.copytree(s, d, dirs_exist_ok=True)
                print(f"copied {s} -> {d}")
            else:
                print(f"missing {s}, skipped")


if __name__ == "__main__":
    if len(sys.argv) < 4:
        raise SystemExit(__doc__)
    main(sys.argv[1], sys.argv[2], sys.argv[3:])
