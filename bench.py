"""Headline benchmark: env-steps/s/chip on the 5x5 large grid.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference steps one SUMO process over a TCP socket at roughly real time
(5 TraCI round-trips per 5 s control step, /root/reference/envs/env.py:461-471)
-> ~1 control step per wall-second per environment, i.e. O(1) env-steps/s.
BASELINE.json sets the target at >= 100k env-steps/s/chip; ``vs_baseline``
reports value / 100_000.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

TARGET = 100_000.0


def main():
    from deeprl_signal_control_tpu.config import EnvConfig
    from deeprl_signal_control_tpu.sim.env import TrafficEnv

    env = TrafficEnv(EnvConfig(scenario="large_grid", agent="greedy"))
    B = 4096
    n_step = 48

    @jax.jit
    def rollout(state, obs):
        def body(carry, _):
            state, obs = carry
            a = env.greedy_action(obs)
            state, m = jax.vmap(
                lambda st, ac: env.engine.control_step(
                    st, ac, env.yellow_interval_sec,
                    env.control_interval_sec - env.yellow_interval_sec,
                    collect_stats=False,
                )
            )(state, a)
            obs = jax.vmap(env._assemble_obs, in_axes=(0, 0, None))(
                m["wave"], m["wait"], env._uniform_fp()
            )
            return (state, obs), None

        (state, obs), _ = jax.lax.scan(body, (state, obs), None, length=n_step)
        return state, obs

    keys = jax.random.split(jax.random.key(0), B)
    state, obs = jax.jit(jax.vmap(env.reset_fn))(keys)
    state, obs = rollout(state, obs)  # compile + warm
    jax.block_until_ready(obs)
    t0 = time.time()
    state, obs = rollout(state, obs)
    jax.block_until_ready(obs)
    dt = time.time() - t0
    steps_per_sec = B * n_step / dt
    print(json.dumps({
        "metric": "env_steps_per_sec_per_chip_large_grid",
        "value": round(steps_per_sec, 1),
        "unit": "env-steps/s/chip",
        "vs_baseline": round(steps_per_sec / TARGET, 3),
    }))


if __name__ == "__main__":
    main()
