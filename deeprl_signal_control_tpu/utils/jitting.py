"""Constant-lifting jit wrapper.

The engine's routing/selector matrices scale as O(L^2) — ~250 MB on the
Monaco net. Embedded as jit constants they make (remote) TPU compilation
intractable; passed as ARGUMENTS the traced program is bit-identical but the
compiler only sees parameter shapes. ``jit_lifted`` wraps a function so the
engine's large arrays (engine.consts()) are appended as a trailing pytree
argument and swapped in for tracing via ``engine.bind``.
"""

from __future__ import annotations

import contextlib

import jax


def engine_consts(env):
    """(consts_fn, bind_fn) for an env; no-ops for engineless debug envs."""
    eng = getattr(env, "engine", None)
    if eng is None:
        return (lambda: {}), (lambda cs: contextlib.nullcontext())
    return eng.consts, eng.bind


def jit_lifted(fn, env, donate_argnums=()):
    """jit ``fn`` with the env engine's big constants passed as a trailing
    argument instead of being embedded in the program (see engine.bind)."""
    consts_fn, bind_fn = engine_consts(env)

    def body(*args):
        *core, cs = args
        with bind_fn(cs):
            return fn(*core)

    jitted = jax.jit(body, donate_argnums=donate_argnums)
    return lambda *args: jitted(*args, consts_fn())
