"""Core NN layers as pure functions over parameter pytrees.

Replaces the reference's TF1 graph ops (/root/reference/agents/utils.py:47-116)
with jit-friendly JAX: ``fc`` and a done-resetting LSTM whose scan form
replicates the reference's manually unrolled cell (c,h multiplied by
``1 - done`` before every step, gate order i,f,o,u).

All layers support an optional leading *agent* axis on parameters so N
heterogeneous agents (padded to common widths) evaluate as one batched
einsum — the TPU-native replacement for the reference's per-agent
``sess.run`` loop.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .initializers import ortho_init


def fc_init(rng, n_in: int, n_out: int, active_rows=None):
    """Dense params. ``active_rows``: optionally restrict the orthogonal
    init to the first ``active_rows`` input rows (the rest stay zero) so a
    padded agent gets exactly the init its unpadded layer would have."""
    w = np.zeros((n_in, n_out), np.float32)
    rows = n_in if active_rows is None else int(active_rows)
    if rows > 0:
        w[:rows] = ortho_init(rng, (rows, n_out))
    return {"w": jnp.asarray(w), "b": jnp.zeros((n_out,), jnp.float32)}


def fc_apply(params, x, act=jax.nn.relu):
    """x: [..., n_in] (+ optional agent axis matching params' leading axis)."""
    w, b = params["w"], params["b"]
    if w.ndim == 3:  # stacked agents: x [N, n_in], w [N, n_in, n_out]
        z = jnp.einsum("...ni,nio->...no", x, w) + b
    else:
        z = x @ w + b
    return act(z) if act is not None else z


def conv_init(rng, n_in_ch: int, n_out_ch: int, filter_size, conv_dim: int = 1):
    """Conv params (ref agents/utils.py:47-64 ``conv``; unused in the
    reference's main path but part of its op inventory). ``filter_size`` is an
    int (1d) or (h, w) pair (2d); weights are orthogonally initialized over
    the flattened receptive field like the reference's ortho_init."""
    if conv_dim == 1:
        fs = int(filter_size)
        w = ortho_init(rng, (fs * n_in_ch, n_out_ch)).reshape(
            fs, n_in_ch, n_out_ch
        )
    else:
        fh, fw = filter_size
        w = ortho_init(rng, (fh * fw * n_in_ch, n_out_ch)).reshape(
            fh, fw, n_in_ch, n_out_ch
        )
    return {"w": jnp.asarray(np.asarray(w)), "b": jnp.zeros((n_out_ch,), jnp.float32)}


def conv_apply(params, x, stride: int = 1, act=jax.nn.relu, pad="VALID"):
    """1d: x [B, T, C]; 2d: x [B, H, W, C] (NHWC, matching the reference's
    data_format defaults). TPU note: XLA lowers convs onto the MXU."""
    w, b = params["w"], params["b"]
    if w.ndim == 3:  # 1d
        z = jax.lax.conv_general_dilated(
            x, w, (stride,), pad, dimension_numbers=("NWC", "WIO", "NWC")
        )
    else:
        z = jax.lax.conv_general_dilated(
            x, w, (stride, stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    z = z + b
    return act(z) if act is not None else z


def lstm_init(rng, n_in: int, n_h: int, active_rows=None):
    wx = np.zeros((n_in, 4 * n_h), np.float32)
    rows = n_in if active_rows is None else int(active_rows)
    if rows > 0:
        wx[:rows] = ortho_init(rng, (rows, 4 * n_h))
    return {
        "wx": jnp.asarray(wx),
        "wh": jnp.asarray(ortho_init(rng, (n_h, 4 * n_h))),
        "b": jnp.zeros((4 * n_h,), jnp.float32),
    }


def lstm_step(params, x, done, carry):
    """One cell step with done-reset (ref agents/utils.py:103-113).

    x: [..., n_in]; done: broadcastable scalar/batch; carry: (c, h).
    Stacked agents: params leading axis N, x [N, n_in], done scalar.
    """
    c, h = carry
    keep = 1.0 - done
    c = c * keep
    h = h * keep
    wx, wh, b = params["wx"], params["wh"], params["b"]
    if wx.ndim == 3:
        z = jnp.einsum("...ni,nio->...no", x, wx) + jnp.einsum(
            "...nh,nho->...no", h, wh
        ) + b
    else:
        z = x @ wx + h @ wh + b
    i, f, o, u = jnp.split(z, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    u = jnp.tanh(u)
    c = f * c + i * u
    h = o * jnp.tanh(c)
    return h, (c, h)


def lstm_scan(params, xs, dones, carry) -> Tuple[jnp.ndarray, Tuple]:
    """Run the cell over a [T, ...] window. Returns (hs [T, ...], carry)."""

    def body(carry, inp):
        x, d = inp
        h, carry = lstm_step(params, x, d, carry)
        return carry, h

    carry, hs = jax.lax.scan(body, carry, (xs, dones))
    return hs, carry
