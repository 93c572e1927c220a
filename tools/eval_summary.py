"""Aggregate evaluation CSVs into the cross-algorithm comparison table.

The reference's headline result is this table computed over its shipped
``eva_data`` (real_net_experimental_data/eva_data/real_net_*_{trip,traffic}.csv;
schema from /root/reference/envs/env.py:498-542): average trip duration /
waiting time, queue, and network speed per agent. This tool produces the
same aggregates from our Evaluator outputs.

Usage: python tools/eval_summary.py <eva_data_dir> [<out.csv>]
"""

from __future__ import annotations

import glob
import os
import sys

import pandas as pd


def summarize(eva_dir: str) -> pd.DataFrame:
    rows = []
    for f in sorted(glob.glob(os.path.join(eva_dir, "*_trip.csv"))):
        base = os.path.basename(f)[: -len("_trip.csv")]
        scenario, agent = base.rsplit("_", 1)
        trip = pd.read_csv(f)
        traffic = pd.read_csv(f.replace("_trip.csv", "_traffic.csv"))
        n_wrapped = int(trip["wrapped"].sum()) if "wrapped" in trip else 0
        if n_wrapped:
            print(f"WARNING: {base}: {n_wrapped} trip rows come from wrapped "
                  "ring episodes (oldest trips lost); aggregates are partial",
                  file=sys.stderr)
        rows.append(dict(
            scenario=scenario, agent=agent,
            wrapped_rows=n_wrapped,
            avg_trip_duration_sec=trip["duration_sec"].mean(),
            avg_trip_wait_sec=trip["wait_sec"].mean(),
            trips_per_episode=len(trip) / max(trip["episode"].nunique(), 1),
            avg_queue=traffic["avg_queue"].mean(),
            avg_speed_mps=traffic["avg_speed_mps"].mean(),
            n_veh_mean=traffic["number_total_car"].mean(),
        ))
    return pd.DataFrame(rows)


def main():
    eva_dir = sys.argv[1]
    df = summarize(eva_dir).round(2)
    print(df.to_string(index=False))
    if len(sys.argv) > 2:
        df.to_csv(sys.argv[2], index=False)
        print("wrote", sys.argv[2])


if __name__ == "__main__":
    main()
