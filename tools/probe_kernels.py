"""Isolate the Pallas kernels: time prepass/outpass alone in a scan at
Monaco shapes (B=64, K=22, L=1087) vs the HBM roundtrip bound."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from deeprl_signal_control_tpu.sim import kernels

B, K, L = 64, 22, 1087


def make_state(key):
    ks = jax.random.split(key, 10)
    f = lambda k: jax.random.uniform(k, (B, K, L), jnp.float32)
    i16 = lambda k: jax.random.randint(k, (B, K, L), 0, 100, jnp.int16)
    return (f(ks[0]), f(ks[1]), f(ks[2]), i16(ks[3]), i16(ks[4]),
            i16(ks[5]), i16(ks[6]), i16(ks[7]),
            jax.random.randint(ks[8], (B, K, L), -1, 5, jnp.int8),
            jax.random.randint(ks[9], (B, K, L), 0, 2, jnp.int8))


def bench(fn, state, n=50, label=""):
    out = fn(state)
    jax.block_until_ready(out)
    t0 = time.time()
    out = fn(state)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{label}: {dt*1e6:.0f} us/iter")
    return dt


def main():
    key = jax.random.key(0)
    state = make_state(key)
    vmax = jnp.full((L,), 13.0)
    lane_len = jnp.full((L,), 200.0)
    vecs = jnp.zeros((B, kernels.NV, L), jnp.float32)
    vecs = vecs.at[:, kernels.IV_VMAX].set(vmax)
    vecs = vecs.at[:, kernels.IV_LANELEN].set(lane_len)

    kw = dict(accel=2.5, d_jam=7.5)

    @jax.jit
    def run_pre(st):
        def body(c, _):
            n_act, back, front = jax.vmap(
                lambda s: kernels.prepass(s, vmax, lane_len, None, **kw)
            )(c)
            # feed something back so the scan isn't dead-code eliminated
            c = (c[0] + back[:, None, :] * 1e-9,) + c[1:]
            return c, None
        c, _ = jax.lax.scan(body, st, None, length=50)
        return c[0]

    @jax.jit
    def run_out(st):
        def body(c, _):
            out = jax.vmap(
                lambda s, v: kernels.outpass(s, v, None, **kw)
            )(c, vecs)
            return tuple(out), None
        c, _ = jax.lax.scan(body, st, None, length=50)
        return c[0]

    bench(run_pre, state, label="prepass x50")
    bench(run_out, state, label="outpass x50")
    # HBM bound: state bytes
    nbytes = sum(x.size * x.dtype.itemsize for x in state)
    print(f"state bytes: {nbytes/1e6:.1f} MB; roundtrip at 1.2TB/s = "
          f"{nbytes*2/1.2e12*1e6:.0f} us")


if __name__ == "__main__":
    main()
