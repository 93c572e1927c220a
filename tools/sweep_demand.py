"""Sweep large_grid demand to find the paper's congested regime.

The reference's headline 5x5 result (README.md:63, figs/large_grid_train.png)
lives in a regime where greedy saturates (avg queue well above 1 veh/lane);
our engine at the reference's nominal demand (peak_flow 1100/925) settles at
greedy queue ~0.67 veh/lane, where greedy is near-optimal and RL cannot win
(VERDICT r4 "What's missing" #1). This sweep scales peak_flow1/2 (and
optionally init_density) and reports the greedy controller's equilibrium so
the RL campaign can be re-run at matched congestion.

Usage: python tools/sweep_demand.py [mult ...]   (default sweep 1.0..2.5)
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import pandas as pd

from deeprl_signal_control_tpu.config import ExperimentConfig
from deeprl_signal_control_tpu.runner import GreedyEvaluator
from deeprl_signal_control_tpu.sim.env import TrafficEnv

CFG = os.path.join(os.path.dirname(__file__), "..",
                   "runs/campaign_cfg/config_large_grid_ma2c.ini")
SEEDS = list(range(10000, 100001, 10000))  # the reference's 10 eval seeds


def run_one(mult: float, density: float = 0.0):
    cfg = ExperimentConfig.from_file(CFG)
    cfg.env.agent = "greedy"
    cfg.env.peak_flow1 = int(round(1100 * mult))
    cfg.env.peak_flow2 = int(round(925 * mult))
    cfg.env.init_density = density
    env = TrafficEnv(cfg.env)
    with tempfile.TemporaryDirectory() as td:
        out = GreedyEvaluator(env, td).run(SEEDS)
        trip = pd.read_csv(os.path.join(td, "large_grid_greedy_trip.csv"))
        traf = pd.read_csv(os.path.join(td, "large_grid_greedy_traffic.csv"))
    # equilibrium congestion: mean over the last half of the episode
    half = traf[traf.time_sec > traf.time_sec.max() / 2]
    return dict(
        mult=mult, density=density,
        reward=out["avg_reward"],
        avg_queue=float(half.avg_queue.mean()),
        peak_queue=float(traf.groupby("time_sec").avg_queue.mean().max()),
        avg_wait=float(half.avg_wait_sec.mean()),
        trip_duration=float(trip.duration_sec.mean()),
        trip_wait=float(trip.wait_sec.mean()),
        n_trips=float(len(trip)) / len(SEEDS),
        n_veh_end=float(traf[traf.time_sec == traf.time_sec.max()]
                        .number_total_car.mean()),
    )


def main():
    mults = [float(m) for m in sys.argv[1:]] or [1.0, 1.25, 1.5, 1.75, 2.0, 2.5]
    rows = []
    for m in mults:
        r = run_one(m)
        rows.append(r)
        print({k: round(v, 2) if isinstance(v, float) else v
               for k, v in r.items()}, flush=True)
    df = pd.DataFrame(rows)
    out = os.path.join(os.path.dirname(__file__), "..",
                       "runs/analysis/demand_sweep.csv")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    header = not os.path.exists(out)
    df.to_csv(out, mode="a", header=header, index=False)
    print(df.to_string(index=False))


if __name__ == "__main__":
    main()
