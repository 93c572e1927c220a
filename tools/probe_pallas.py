"""Probe the Pallas substep path: A/B throughput + optimized-HLO copy audit.

Usage: DSCT_PALLAS={0,1} python tools/probe_pallas.py [--scenario real_net]
       [--hlo out.txt] [--B 64] [--steps 64]

Measures the raw substep scan (stats off, greedy-free: fixed phase codes)
exactly where the Pallas kernels act, and optionally dumps the optimized
HLO so layout copies at the custom-call boundary can be counted by shape.
"""
from __future__ import annotations

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenario", default="real_net")
    ap.add_argument("--B", type=int, default=64)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--hlo", default=None)
    args = ap.parse_args()

    from deeprl_signal_control_tpu.config import EnvConfig
    from deeprl_signal_control_tpu.sim.env import TrafficEnv
    from deeprl_signal_control_tpu.utils.jitting import jit_lifted

    env = TrafficEnv(EnvConfig(scenario=args.scenario, agent="greedy"))
    eng = env.engine
    print(f"pallas={eng._use_pallas} K={eng.K} L={eng.L} "
          f"F={eng.F} C={eng.C}", file=sys.stderr)
    B = args.B

    act0 = jnp.zeros((eng.N,), jnp.int32)
    code = jnp.broadcast_to(
        eng.lane_codes(eng.signal_codes(act0, act0, False)),
        (B, eng.L, eng.C))

    def run(state):
        def body(st, _):
            st, _ = jax.vmap(
                lambda s, c: eng.substep(s, c, collect_stats=False)
            )(st, code)
            return st, None
        state, _ = jax.lax.scan(run_body := body, state, None,
                                length=args.steps)
        return state

    run_j = jit_lifted(run, env)
    keys = jax.random.split(jax.random.key(0), B)
    state, _ = jit_lifted(jax.vmap(env.reset_fn), env)(keys)

    if args.hlo:
        lowered = jax.jit(run).lower(state)
        txt = lowered.compile().as_text()
        with open(args.hlo, "w") as f:
            f.write(txt)
        # copy audit: find explicit copy instructions and their shapes
        copies = re.findall(r"= (\S+)\[[^\]]*\][^=]*copy\(", txt)
        ncopy = txt.count(" copy(")
        print(f"HLO dumped to {args.hlo}: {ncopy} copy ops",
              file=sys.stderr)

    state = run_j(state)
    jax.block_until_ready(state.t)
    best = 0.0
    for _ in range(3):
        t0 = time.time()
        state = run_j(state)
        jax.block_until_ready(state.t)
        best = max(best, B * args.steps / (time.time() - t0))
    print(f"substeps*B/s: {best:.0f}")


if __name__ == "__main__":
    main()
