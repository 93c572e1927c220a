"""Return / advantage computation.

Replicates OnPolicyBuffer._add_R_Adv (/root/reference/agents/utils.py:202-214):
discounted n-step returns computed backward through the window with the
*post-step* done flags, advantages = R - v. Expressed as a reverse
``lax.scan`` so it lives on-device inside the jitted update.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def nstep_returns(rewards, values, dones_post, bootstrap, gamma):
    """rewards/values: [T, ...]; dones_post: [T, ...] done AFTER each step;
    bootstrap: [...] value estimate after the window (0 when terminal).

    Returns (Rs [T, ...], Advs [T, ...]).
    """

    def body(R, inp):
        r, done = inp
        R = r + gamma * R * (1.0 - done)
        return R, R

    _, Rs = jax.lax.scan(
        body, bootstrap, (rewards, dones_post.astype(rewards.dtype)), reverse=True
    )
    return Rs, Rs - values
