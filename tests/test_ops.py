"""NN ops: init distribution, lstm done-reset, returns math, replay, clip."""

import jax
import jax.numpy as jnp
import numpy as np

from deeprl_signal_control_tpu.ops import (
    Scheduler,
    fc_apply,
    fc_init,
    lstm_init,
    lstm_scan,
    lstm_step,
    nstep_returns,
    replay_add_many,
    replay_init,
    replay_sample,
)
from deeprl_signal_control_tpu.models.algorithms import per_agent_clip


def test_ortho_init_shapes_and_scale():
    rng = np.random.default_rng(0)
    p = fc_init(rng, 10, 8)
    w = np.asarray(p["w"])
    # columns orthogonal * sqrt(2): w.T @ w = 2 I
    assert np.allclose(w.T @ w, 2.0 * np.eye(8), atol=1e-5)


def test_fc_padded_rows_zero():
    rng = np.random.default_rng(0)
    p = fc_init(rng, 10, 8, active_rows=6)
    w = np.asarray(p["w"])
    assert np.allclose(w[6:], 0.0)
    assert not np.allclose(w[:6], 0.0)


def test_lstm_done_reset():
    rng = np.random.default_rng(1)
    p = lstm_init(rng, 3, 5)
    x = jnp.ones((3,))
    c0 = jnp.full((5,), 0.7)
    h0 = jnp.full((5,), -0.3)
    # with done=1 the carry must be wiped before the step
    h1, (c1, _) = lstm_step(p, x, 1.0, (c0, h0))
    h2, (c2, _) = lstm_step(p, x, 1.0, (jnp.zeros(5), jnp.zeros(5)))
    assert np.allclose(np.asarray(h1), np.asarray(h2))
    # without done, the carry matters
    h3, _ = lstm_step(p, x, 0.0, (c0, h0))
    assert not np.allclose(np.asarray(h1), np.asarray(h3))


def test_lstm_scan_matches_manual_unroll():
    rng = np.random.default_rng(2)
    p = lstm_init(rng, 4, 6)
    T = 7
    xs = jnp.asarray(np.random.default_rng(3).standard_normal((T, 4)), jnp.float32)
    dones = jnp.asarray([1.0, 0, 0, 1.0, 0, 0, 0])
    carry = (jnp.zeros(6), jnp.zeros(6))
    hs, final = lstm_scan(p, xs, dones, carry)
    c, h = jnp.zeros(6), jnp.zeros(6)
    for t in range(T):
        ht, (c, h) = lstm_step(p, xs[t], dones[t], (c, h))
        assert np.allclose(np.asarray(hs[t]), np.asarray(ht), atol=1e-6)


def test_nstep_returns_match_reference_loop():
    """Golden math vs OnPolicyBuffer._add_R_Adv (agents/utils.py:202-214)."""
    rng = np.random.default_rng(0)
    T = 9
    gamma = 0.93
    rs = rng.standard_normal(T).astype(np.float32)
    vs = rng.standard_normal(T).astype(np.float32)
    dones = (rng.random(T) < 0.3).astype(np.float32)
    R_boot = 1.7
    # reference backward loop
    R = R_boot
    Rs_ref, Advs_ref = [], []
    for r, v, done in zip(rs[::-1], vs[::-1], dones[::-1]):
        R = r + gamma * R * (1.0 - done)
        Rs_ref.append(R)
        Advs_ref.append(R - v)
    Rs_ref.reverse()
    Advs_ref.reverse()
    Rs, Advs = nstep_returns(
        jnp.asarray(rs), jnp.asarray(vs), jnp.asarray(dones), jnp.asarray(R_boot),
        gamma,
    )
    assert np.allclose(np.asarray(Rs), Rs_ref, atol=1e-5)
    assert np.allclose(np.asarray(Advs), Advs_ref, atol=1e-5)


def test_replay_ring_and_sample():
    ex = {"a": jnp.zeros((2,)), "b": jnp.zeros((), jnp.int32)}
    st = replay_init(5, ex)
    items = {
        "a": jnp.arange(14, dtype=jnp.float32).reshape(7, 2),
        "b": jnp.arange(7, dtype=jnp.int32),
    }
    st = replay_add_many(st, items)
    assert int(st.size) == 5
    assert int(st.ptr) == 2
    # ring overwrote oldest: buffer holds b in {2..6}
    held = set(np.asarray(st.data["b"]).tolist())
    assert held == {2, 3, 4, 5, 6}
    batch = replay_sample(st, jax.random.key(0), 64)
    assert set(np.asarray(batch["b"]).tolist()) <= held


def test_scheduler():
    s = Scheduler(1.0, 0.1, 100, decay="linear")
    assert float(s.get(0)) == 1.0
    assert np.isclose(float(s.get(50)), 0.5)
    assert np.isclose(float(s.get(1000)), 0.1)
    c = Scheduler(0.3, decay="constant")
    assert np.isclose(float(c.get(999)), 0.3)


def test_per_agent_clip():
    g = {"w": jnp.stack([jnp.full((4,), 100.0), jnp.full((4,), 0.1)])}
    out = per_agent_clip(g, 1.0)
    n0 = float(jnp.linalg.norm(out["w"][0]))
    n1 = float(jnp.linalg.norm(out["w"][1]))
    assert np.isclose(n0, 1.0, atol=1e-5)  # clipped
    assert np.isclose(n1, 0.2, atol=1e-5)  # untouched


def test_conv_ops():
    """conv parity surface (ref agents/utils.py:47-64; unused in main path)."""
    from deeprl_signal_control_tpu.ops.layers import conv_apply, conv_init

    rng = np.random.default_rng(0)
    p1 = conv_init(rng, n_in_ch=3, n_out_ch=8, filter_size=4, conv_dim=1)
    x1 = jnp.asarray(rng.standard_normal((2, 16, 3)), jnp.float32)
    y1 = conv_apply(p1, x1)
    # default pad is VALID like the reference conv (agents/utils.py:47)
    assert y1.shape == (2, 13, 8)
    assert np.all(np.asarray(y1) >= 0)  # relu
    y1s = conv_apply(p1, x1, pad="SAME")
    assert y1s.shape == (2, 16, 8)

    p2 = conv_init(rng, n_in_ch=3, n_out_ch=5, filter_size=(3, 3), conv_dim=2)
    x2 = jnp.asarray(rng.standard_normal((2, 8, 8, 3)), jnp.float32)
    y2 = conv_apply(p2, x2, stride=2, act=None)
    assert y2.shape == (2, 3, 3, 5)
