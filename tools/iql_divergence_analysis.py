"""Summarize the round-5 IQL-LR divergence experiments (VERDICT r4 item 3).

Three controlled runs, identical model/loss/schedules (reference parity:
linear Q, lr 1e-4 Adam, per-agent clip 40, 20-sample minibatches, 10
updates per 20 env steps, no target network — agents/policies.py:307-338):

  b1   num_envs=1, 1e6 steps  — the reference's exact data distribution
       (one serial env; replay holds ONE trajectory; each update averages
       20 samples).
  ctl  num_envs=64, 1e7 steps — the round-4 batched configuration (each
       update averages 64 env-batches x 20 samples = 1280).
  nr   as ctl but WITHOUT-replacement minibatch draws (random.sample
       parity, ops/replay.py:replay_sample_noreplace).

Writes runs/analysis/iql_divergence_summary.csv and prints the verdict.
"""

import os
import sys

import numpy as np
import pandas as pd

RUNS = os.path.join(os.path.dirname(__file__), "..", "runs")


def summarize(name):
    path = os.path.join(RUNS, name, "data", "train_reward.csv")
    if not os.path.exists(path):
        return None
    df = pd.read_csv(path)
    n = len(df)
    q = max(n // 4, 1)
    return dict(
        run=name,
        episodes=n,
        steps=float(df["step"].iloc[-1]),
        first_quarter=float(df["avg_reward"].head(q).mean()),
        last_quarter=float(df["avg_reward"].tail(q).mean()),
        best=float(df["avg_reward"].max()),
        final=float(df["avg_reward"].tail(10).mean()),
    )


def main():
    rows = [summarize(n) for n in
            ("large_grid_iqll_b1", "large_grid_iqll_ctl",
             "large_grid_iqll_nr", "large_grid_iqll_nr_full",
             "large_grid_iqll")]
    rows = [r for r in rows if r]
    df = pd.DataFrame(rows)
    out = os.path.join(RUNS, "analysis", "iql_divergence_summary.csv")
    df.to_csv(out, index=False)
    print(df.to_string(index=False))
    print(f"\nwritten: {out}")


if __name__ == "__main__":
    main()
