"""Calibrate the microsim engine against the reference's shipped evaluation
data (the only SUMO ground truth available offline).

Runs the rule-based greedy controller on a scenario with the reference's
10 evaluation seeds (real_net_env.py:166: range(10000, 100001, 10000)) and
diffs the headline traffic metrics against the CSVs the reference repo ships
in real_net_experimental_data/eva_data/ (produced by SUMO + TraCI).

Usage:  python tools/calibrate_greedy.py [--agent greedy] [--scenario real_net]
"""

import argparse
import os
import sys
import tempfile

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon TPU plugin ignores JAX_PLATFORMS; force it via the config
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_EVA = "/root/reference/real_net_experimental_data/eva_data"


def reference_aggregates(agent: str):
    import pandas as pd

    trip = pd.read_csv(f"{REF_EVA}/real_net_{agent}_trip.csv")
    traffic = pd.read_csv(f"{REF_EVA}/real_net_{agent}_traffic.csv")
    return dict(
        avg_trip_duration_sec=trip["duration_sec"].mean(),
        avg_trip_wait_sec=trip["wait_sec"].mean(),
        trips_per_episode=len(trip) / trip["episode"].nunique(),
        avg_queue=traffic["avg_queue"].mean(),
        avg_speed_mps=traffic["avg_speed_mps"].mean(),
        n_veh_mean=traffic["number_total_car"].mean(),
        arrived_per_episode=(
            traffic.groupby("episode")["number_arrived_car"].sum().mean()
        ),
    )


def our_aggregates(scenario: str, seeds, spec_overrides=None):
    import dataclasses

    import pandas as pd

    from deeprl_signal_control_tpu.config import EnvConfig
    from deeprl_signal_control_tpu.runner import GreedyEvaluator
    from deeprl_signal_control_tpu.scenarios import build_scenario
    from deeprl_signal_control_tpu.sim.env import TrafficEnv

    cfg = EnvConfig(
        scenario=scenario, agent="greedy", norm_wave=5.0, clip_wave=2.0,
        objective="queue", coef_wait=0.0, episode_length_sec=3600,
        demand="legacy",  # the shipped eva_data was generated with the
        # reference's older demand config (see real_net_impl.LEGACY_*)
    )
    spec = build_scenario(scenario, cfg)
    if spec_overrides:
        spec = dataclasses.replace(spec, **spec_overrides)
    env = TrafficEnv(cfg, spec=spec)
    out_dir = tempfile.mkdtemp(prefix="calib_")
    GreedyEvaluator(env, out_dir).run(seeds)
    trip = pd.read_csv(f"{out_dir}/{scenario}_greedy_trip.csv")
    traffic = pd.read_csv(f"{out_dir}/{scenario}_greedy_traffic.csv")
    return dict(
        avg_trip_duration_sec=trip["duration_sec"].mean(),
        avg_trip_wait_sec=trip["wait_sec"].mean(),
        trips_per_episode=len(trip) / max(trip["episode"].nunique(), 1),
        avg_queue=traffic["avg_queue"].mean(),
        avg_speed_mps=traffic["avg_speed_mps"].mean(),
        n_veh_mean=traffic["number_total_car"].mean(),
        arrived_per_episode=(
            traffic.groupby("episode")["number_arrived_car"].sum().mean()
        ),
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--agent", default="greedy")
    p.add_argument("--scenario", default="real_net")
    p.add_argument("--seeds", default=",".join(
        str(s) for s in range(10000, 100001, 10000)))
    # engine-fidelity knobs (NetworkSpec overrides) for calibration sweeps
    p.add_argument("--dawdle", type=float, default=None,
                   help="Krauss sigma analog (spec.dawdle_sigma)")
    p.add_argument("--impatience", type=float, default=None,
                   help="spec.yield_impatience_sec")
    p.add_argument("--headway", type=float, default=None,
                   help="spec.discharge_headway_sec")
    p.add_argument("--dawdle-exempt", action="store_true",
                   help="spec.dawdle_exempt_stopline (no dawdling within "
                        "~2s of the stop line)")
    args = p.parse_args()

    overrides = {}
    if args.dawdle_exempt:
        overrides["dawdle_exempt_stopline"] = True
    if args.dawdle is not None:
        overrides["dawdle_sigma"] = args.dawdle
    if args.impatience is not None:
        overrides["yield_impatience_sec"] = args.impatience
    if args.headway is not None:
        overrides["discharge_headway_sec"] = args.headway
    if overrides:
        print("spec overrides:", overrides)

    ref = reference_aggregates(args.agent)
    ours = our_aggregates(args.scenario, [int(s) for s in args.seeds.split(",")],
                          spec_overrides=overrides or None)
    print(f"\n{'metric':28s} {'reference':>12s} {'ours':>12s} {'ratio':>8s}")
    for k in ref:
        r, o = ref[k], ours[k]
        print(f"{k:28s} {r:12.2f} {o:12.2f} {o / max(r, 1e-9):8.2f}")


if __name__ == "__main__":
    main()
