"""Hyperparameter schedules (ref /root/reference/agents/utils.py:268-281)."""

from __future__ import annotations

import jax.numpy as jnp


class Scheduler:
    """linear: val_init -> val_min over total_step; constant otherwise.

    ``get(step)`` is a pure function of the global step (unlike the
    reference's stateful accumulator) so it can be evaluated inside jit and
    is resume-correct.
    """

    def __init__(self, val_init, val_min=0.0, total_step=0, decay="linear"):
        self.val = float(val_init)
        self.val_min = float(val_min)
        self.N = float(max(total_step, 1))
        self.decay = decay

    def get(self, step):
        if self.decay == "linear":
            frac = jnp.asarray(step, jnp.float32) / self.N
            return jnp.maximum(self.val_min, self.val * (1.0 - frac))
        return jnp.asarray(self.val, jnp.float32)
