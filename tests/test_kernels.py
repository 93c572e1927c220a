"""Pallas kernel equivalence: the hand-fused [K, L] passes must reproduce
the XLA reference implementation bit-for-bit (interpret mode stands in for
the TPU lowering; both perform identical IEEE arithmetic)."""

import dataclasses

import jax
import numpy as np
import pytest

from deeprl_signal_control_tpu.config import EnvConfig
from deeprl_signal_control_tpu.sim.env import TrafficEnv


def _rollout(env, n_steps, use_pallas):
    eng = env.engine
    eng._use_pallas = use_pallas
    eng._pallas_interpret = True  # CPU
    try:
        keys = jax.random.split(jax.random.key(3), 2)
        state, obs = env.reset(keys)
        for _ in range(n_steps):
            a = env.greedy_action(obs)
            state, obs, r, done, g, info = env.step(state, a)
        return state, np.asarray(obs), np.asarray(g)
    finally:
        eng._use_pallas = False


@pytest.mark.parametrize("scenario,kw", [
    ("small_grid", {}),
    ("small_grid", dict(dawdle=True)),
])
def test_pallas_matches_xla(scenario, kw):
    cfg = EnvConfig(scenario=scenario, agent="greedy")
    env = TrafficEnv(cfg)
    if kw.get("dawdle"):
        spec = dataclasses.replace(
            env.spec, dawdle_sigma=0.5, dawdle_exempt_stopline=True)
        env = TrafficEnv(cfg, spec=spec)
    # enough steps for departures, transfers, junction contention, arrivals
    s_x, o_x, g_x = _rollout(env, 30, use_pallas=False)
    s_p, o_p, g_p = _rollout(env, 30, use_pallas=True)
    assert np.array_equal(o_x, o_p)
    assert np.array_equal(g_x, g_p)
    for f in dataclasses.fields(s_x):
        a, b = getattr(s_x, f.name), getattr(s_p, f.name)
        if f.name == "key":
            a, b = jax.random.key_data(a), jax.random.key_data(b)
        assert np.array_equal(np.asarray(a), np.asarray(b)), (
            f"state field {f.name} diverged")
