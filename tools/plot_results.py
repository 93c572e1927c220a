"""Training-curve and evaluation plots.

Replaces the reference's result_plot.ipynb: rolling mean +/- std training
curves from train_reward.csv, and evaluation comparisons from the
``{scenario}_{agent}_{traffic,trip}.csv`` outputs.

Usage:
    python tools/plot_results.py train  <out.png> <base_dir1> [base_dir2 ...]
    python tools/plot_results.py eval   <out.png> <eva_data_dir>
    python tools/plot_results.py train-seeds <out.png> \
        <label>:<dir1>,<dir2>[,...] [<label2>:...]

``train-seeds`` draws one curve per label: the across-seed MEAN of the
per-run rolling-mean reward, with a band spanning the across-seed min/max
(the "within seed variance" evidence BASELINE.json asks for; each <dirN>
is the same config trained under a different ENV_CONFIG seed).
"""

from __future__ import annotations

import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd

WINDOW = 10


def plot_train(out_png: str, base_dirs):
    fig, ax = plt.subplots(figsize=(9, 6))
    for base in base_dirs:
        path = os.path.join(base, "data", "train_reward.csv")
        if not os.path.exists(path):
            path = os.path.join(base, "train_reward.csv")
        raw = pd.read_csv(path)
        df = raw[raw["test_id"] == -1]
        # dir name disambiguates multiple runs of the same agent
        label = os.path.basename(os.path.normpath(base)) or (
            df["agent"].iloc[0] if len(df) else base)
        r = df["avg_reward"].rolling(WINDOW, min_periods=1)
        mean, std = r.mean(), r.std().fillna(0)
        (line,) = ax.plot(df["step"], mean, label=label)
        ax.fill_between(df["step"], mean - std, mean + std, alpha=0.2)
        # fixed-seed in-train test episodes (test_id >= 0, the reference's
        # utils.py:257-275 rows): mean over seeds per test point, dashed
        tests = raw[raw["test_id"] >= 0]
        if len(tests):
            g = tests.groupby("step")["avg_reward"].mean()
            ax.plot(g.index, g.values, "--", marker="o", ms=3,
                    color=line.get_color(), alpha=0.7,
                    label=f"{label} (in-train test)")
    ax.set_xlabel("env step")
    ax.set_ylabel("average episode reward")
    ax.legend()
    ax.grid(alpha=0.3)
    fig.savefig(out_png, dpi=120, bbox_inches="tight")
    print("wrote", out_png)


def _run_curve(base):
    path = os.path.join(base, "data", "train_reward.csv")
    if not os.path.exists(path):
        path = os.path.join(base, "train_reward.csv")
    df = pd.read_csv(path)
    df = df[df["test_id"] == -1]
    mean = df["avg_reward"].rolling(WINDOW, min_periods=1).mean()
    return df["step"].to_numpy(), mean.to_numpy()


def plot_train_seeds(out_png: str, groups):
    """``groups``: list of "label:dir1,dir2[,...]" — across-seed mean curve
    with a min/max band per label."""
    fig, ax = plt.subplots(figsize=(9, 6))
    for spec in groups:
        label, dirs = spec.split(":", 1)
        curves = [_run_curve(d) for d in dirs.split(",")]
        # common step grid = the run covering the SMALLEST step range, so
        # np.interp never flat-extrapolates a shorter run past its end
        grid = min((c[0] for c in curves), key=lambda st: st[-1])
        vals = np.stack([np.interp(grid, s, v) for s, v in curves])
        mean = vals.mean(axis=0)
        ax.plot(grid, mean, label=f"{label} (n={len(curves)} seeds)")
        ax.fill_between(grid, vals.min(axis=0), vals.max(axis=0), alpha=0.2)
    ax.set_xlabel("env step")
    ax.set_ylabel("average episode reward (rolling mean over %d)" % WINDOW)
    ax.legend()
    ax.grid(alpha=0.3)
    fig.savefig(out_png, dpi=120, bbox_inches="tight")
    print("wrote", out_png)


def plot_eval(out_png: str, eva_dir: str):
    traffic = sorted(f for f in os.listdir(eva_dir) if f.endswith("_traffic.csv"))
    fig, axes = plt.subplots(2, 2, figsize=(12, 8))
    for f in traffic:
        name = f[: -len("_traffic.csv")]
        df = pd.read_csv(os.path.join(eva_dir, f))
        g = df.groupby("time_sec").mean(numeric_only=True)
        axes[0, 0].plot(g.index, g["number_total_car"], label=name)
        axes[0, 1].plot(g.index, g["avg_queue"], label=name)
        axes[1, 0].plot(g.index, g["avg_speed_mps"], label=name)
        axes[1, 1].plot(g.index, g["avg_wait_sec"], label=name)
    for ax, title in zip(
        axes.ravel(),
        ["vehicles in network", "avg queue / detector lane",
         "avg speed (m/s)", "avg wait (s)"],
    ):
        ax.set_title(title)
        ax.grid(alpha=0.3)
        ax.legend(fontsize=7)
    fig.savefig(out_png, dpi=120, bbox_inches="tight")
    print("wrote", out_png)


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "train":
        plot_train(sys.argv[2], sys.argv[3:])
    elif mode == "eval":
        plot_eval(sys.argv[2], sys.argv[3])
    elif mode == "train-seeds":
        plot_train_seeds(sys.argv[2], sys.argv[3:])
    else:
        raise SystemExit(__doc__)
