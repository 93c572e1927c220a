"""On-device ring replay buffer.

Replaces the reference's python-list ReplayBuffer
(/root/reference/agents/utils.py:231-263): fixed-capacity ring with uniform
sampling, stored as a pytree of device arrays so adds and samples stay inside
jit. Batched over env instances by vmap.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ReplayState:
    data: dict  # each leaf [capacity, ...]
    ptr: jnp.ndarray  # () i32 next write slot
    size: jnp.ndarray  # () i32 current fill


def replay_init(capacity: int, example: dict) -> ReplayState:
    data = jax.tree.map(
        lambda x: jnp.zeros((capacity,) + jnp.shape(x), jnp.asarray(x).dtype),
        example,
    )
    return ReplayState(
        data=data, ptr=jnp.zeros((), jnp.int32), size=jnp.zeros((), jnp.int32)
    )


def replay_add(state: ReplayState, item: dict) -> ReplayState:
    data = jax.tree.map(
        lambda buf, x: buf.at[state.ptr].set(x), state.data, item
    )
    cap = jax.tree.leaves(state.data)[0].shape[0]
    return ReplayState(
        data=data,
        ptr=(state.ptr + 1) % cap,
        size=jnp.minimum(state.size + 1, cap),
    )


def replay_add_many(state: ReplayState, items: dict) -> ReplayState:
    """Add a [T, ...] window of transitions (scan over T)."""

    def body(st, item):
        return replay_add(st, item), None

    state, _ = jax.lax.scan(body, state, items)
    return state


def replay_add_window(state: ReplayState, items: dict) -> ReplayState:
    """Add a [T, ...] window in ONE scatter (ring-wrapped indices).

    Equivalent to ``replay_add_many`` for T <= capacity but issues a single
    T-row scatter per leaf instead of T interleaved dynamic-update-slices —
    the fast path for the training chunk's per-window buffer insert.
    """
    T = jax.tree.leaves(items)[0].shape[0]
    cap = jax.tree.leaves(state.data)[0].shape[0]
    idx = (state.ptr + jnp.arange(T, dtype=jnp.int32)) % cap
    data = jax.tree.map(
        lambda buf, x: buf.at[idx].set(x), state.data, items
    )
    return ReplayState(
        data=data,
        ptr=(state.ptr + T) % cap,
        size=jnp.minimum(state.size + T, cap),
    )


def replay_sample(state: ReplayState, key, batch_size: int) -> dict:
    """Uniform sample with replacement over the filled region
    (the reference samples without replacement, agents/utils.py:253; with a
    1000-deep buffer and 20-wide batches the difference is negligible)."""
    idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(state.size, 1))
    return jax.tree.map(lambda buf: buf[idx], state.data)


def replay_sample_noreplace(state: ReplayState, key, batch_size: int) -> dict:
    """Uniform sample WITHOUT replacement over the filled region — the
    reference's exact ``random.sample`` semantics (agents/utils.py:253).

    Gumbel-top-k over the capacity axis with filled-region masking: the
    ``batch_size`` largest perturbed keys are a uniform without-replacement
    draw from the filled slots. Requires ``size >= batch_size`` (the runner
    only samples once the buffer holds at least one window)."""
    cap = jax.tree.leaves(state.data)[0].shape[0]
    g = jax.random.gumbel(key, (cap,))
    g = jnp.where(jnp.arange(cap) < state.size, g, -jnp.inf)
    _, idx = jax.lax.top_k(g, batch_size)
    return jax.tree.map(lambda buf: buf[idx], state.data)
