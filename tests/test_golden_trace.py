"""Golden-trace engine regression: fixed-seed greedy rollouts whose
observation/reward/state traces are checked bit-for-bit against committed
artifacts.

Guards the microsim against silent behavioral drift during performance work
(the role SUMO's own regression suite plays for the reference's external
simulator core). Any change to vehicle kinematics, signal logic, junction
contention, routing, or the selector-transport machinery that alters a
single vehicle trajectory shows up here as a checksum mismatch within a few
control steps.

Regenerate (ONLY for an intentional behavioral change, with justification
in the commit message)::

    GOLDEN_REGEN=1 python -m pytest tests/test_golden_trace.py -q
"""

import os

import jax
import numpy as np
import pytest

from deeprl_signal_control_tpu.config import EnvConfig
from deeprl_signal_control_tpu.sim.env import TrafficEnv

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

# (name, EnvConfig kwargs, control steps, batch)
CASES = {
    "small_grid": (dict(scenario="small_grid", agent="greedy"), 60, 2),
    "large_grid": (dict(scenario="large_grid", agent="greedy",
                        init_density=0.1), 60, 2),
    # legacy demand = the Monaco regime used for the calibration replay;
    # 180 steps = 900 s, far enough into the demand ramp that junction
    # contention / permissive yielding / multi-lane entry are all exercised
    "real_net_legacy": (dict(scenario="real_net", agent="greedy",
                             objective="queue", coef_wait=0.0,
                             demand="legacy", episode_length_sec=1000), 180, 2),
}


def _trace(name):
    cfg_kw, n_steps, batch = CASES[name]
    env = TrafficEnv(EnvConfig(**cfg_kw))
    keys = jax.random.split(jax.random.key(7), batch)
    state, obs = env.reset(keys)

    obs_sum = np.zeros(n_steps, np.float64)
    obs_abs = np.zeros(n_steps, np.float64)
    rew = np.zeros((n_steps, batch), np.float64)
    queue = np.zeros(n_steps, np.float64)
    for i in range(n_steps):
        a = env.greedy_action(obs)
        state, obs, r, done, g, info = env.step(state, a)
        o = np.asarray(obs, np.float64)
        obs_sum[i] = o.sum()
        obs_abs[i] = np.abs(o).sum()
        rew[i] = np.asarray(g, np.float64)
        queue[i] = float(np.asarray(info["stats"].avg_queue,
                                    np.float64).sum())
    final = np.array(
        [
            np.asarray(state.n_departed, np.float64).sum(),
            np.asarray(state.n_arrived, np.float64).sum(),
            np.asarray(state.n_teleported, np.float64).sum(),
            np.asarray(state.active, np.float64).sum(),
            np.asarray(state.pos, np.float64).sum(),
            np.asarray(state.wait, np.float64).sum(),
        ]
    )
    return dict(obs_sum=obs_sum, obs_abs=obs_abs, rew=rew, queue=queue,
                final=final)


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden_trace(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    got = _trace(name)
    if not os.path.exists(path):
        if os.environ.get("GOLDEN_REGEN"):
            os.makedirs(GOLDEN_DIR, exist_ok=True)
            np.savez_compressed(path, **got)
            pytest.skip(f"golden trace regenerated at {path}")
        raise AssertionError(
            f"missing golden artifact {path}; run with GOLDEN_REGEN=1 "
            "to create it")
    want = np.load(path)
    for k in ("obs_sum", "obs_abs", "rew", "queue", "final"):
        w, g = np.asarray(want[k]), np.asarray(got[k])
        if not np.array_equal(w, g):
            bad = np.flatnonzero(
                ~np.isclose(w, g, rtol=0, atol=0, equal_nan=True).reshape(
                    w.shape[0], -1).all(axis=-1))
            first = int(bad[0]) if len(bad) else -1
            raise AssertionError(
                f"{name}: field {k!r} drifted from golden trace "
                f"(first mismatch at step {first}; "
                f"want {w.reshape(w.shape[0], -1)[first][:4]}, "
                f"got {g.reshape(g.shape[0], -1)[first][:4]}). "
                "If the behavior change is intentional, regenerate with "
                "GOLDEN_REGEN=1 and justify in the commit message.")
