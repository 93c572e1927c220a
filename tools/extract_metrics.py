"""Extract a metric series from run directories into one tidy CSV.

Replaces the reference's extract_tensorboard.py (TB event files -> CSV,
extract_tensorboard.py:29-56). This framework logs metrics as CSV natively,
so extraction = collect + filter + concat across runs.

Usage:
    python tools/extract_metrics.py <out.csv> <tag> <base_dir1> [...]

``tag``: 'train_reward' (test_id == -1 rows) or 'test_reward'
(test_id >= 0 rows) from each run's data/train_reward.csv.
"""

from __future__ import annotations

import os
import sys

import pandas as pd


def extract(out_csv: str, tag: str, base_dirs):
    frames = []
    for base in base_dirs:
        path = os.path.join(base, "data", "train_reward.csv")
        if not os.path.exists(path):
            path = os.path.join(base, "train_reward.csv")
        df = pd.read_csv(path)
        df = df[df["test_id"] == -1] if tag == "train_reward" else df[
            df["test_id"] >= 0
        ]
        df = df[["agent", "step", "avg_reward", "std_reward"]].copy()
        df["run"] = os.path.basename(os.path.normpath(base))
        frames.append(df)
    pd.concat(frames).to_csv(out_csv, index=False)
    print("wrote", out_csv, f"({sum(len(f) for f in frames)} rows)")


if __name__ == "__main__":
    if len(sys.argv) < 4:
        raise SystemExit(__doc__)
    extract(sys.argv[1], sys.argv[2], sys.argv[3:])
