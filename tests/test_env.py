"""Env wrapper: dimension negotiation, obs assembly, reward shaping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeprl_signal_control_tpu.config import EnvConfig
from deeprl_signal_control_tpu.sim.env import TrafficEnv


def make_env(agent, scenario="large_grid", **kw):
    return TrafficEnv(EnvConfig(scenario=scenario, agent=agent, **kw))


class TestDims:
    """n_s_ls/n_a_ls/n_w_ls/n_f_ls parity with env.py:303-323."""

    def test_greedy(self):
        env = make_env("greedy")
        assert env.n_s_ls == [6] * 25

    def test_ia2c(self):
        env = make_env("ia2c")
        # internal node: own 6 + 4 neighbors x 6 + wait 6 = 36
        idx = env.spec.node_names.index("nt13")
        assert env.n_s_ls[idx] == 6 + 24 + 6
        assert env.n_w_ls[idx] == 6
        assert env.n_f_ls[idx] == 0
        # corner nt1: 2 neighbors
        idx1 = env.spec.node_names.index("nt1")
        assert env.n_s_ls[idx1] == 6 + 12 + 6

    def test_ma2c(self):
        env = make_env("ma2c")
        idx = env.spec.node_names.index("nt13")
        # + fingerprints: 4 neighbors x (5-1)
        assert env.n_f_ls[idx] == 16
        assert env.n_s_ls[idx] == 36 + 16
        assert env.n_a_ls == [5] * 25

    def test_n_a_global(self):
        env = make_env("ia2c")
        assert env.n_a == 5**25


class TestObsAssembly:
    def test_ma2c_neighbor_discount_and_fp(self):
        env = make_env("ma2c", coop_gamma=0.5)
        wave = jnp.arange(25 * 6, dtype=jnp.float32).reshape(25, 6)
        wait = jnp.zeros((25, 6))
        fp = jnp.full((25, 4), 0.25)
        obs = np.asarray(env._assemble_obs(wave / 1.0, wait, fp))
        n = env.spec.node_names.index("nt13")
        nw = np.asarray(wave) / env.cfg.norm_wave
        # own wave first
        assert np.allclose(obs[n, :6], np.clip(nw[n], 0, env.cfg.clip_wave))
        # first neighbor wave discounted by coop_gamma
        m = env.spec.node_neighbor[n][0]
        assert np.allclose(obs[n, 6:12], 0.5 * np.clip(nw[m], 0, env.cfg.clip_wave))
        # fingerprint tail
        assert np.allclose(obs[n, env.n_s_ls[n] - 16 : env.n_s_ls[n]], 0.25)
        # padding zeroed
        assert np.allclose(obs[n, env.n_s_ls[n] :], 0.0)

    def test_ia2c_no_discount(self):
        env = make_env("ia2c", coop_gamma=0.5)
        wave = jnp.ones((25, 6))
        obs = np.asarray(env._assemble_obs(wave, jnp.zeros((25, 6)), jnp.zeros((25, 4))))
        n = env.spec.node_names.index("nt13")
        assert np.allclose(obs[n, 6:30], 1.0 / env.cfg.norm_wave)


class TestRewardShaping:
    """env.py:590-631 semantics."""

    def test_iql_shares_global(self):
        env = make_env("iqll")
        r = jnp.arange(25.0)
        out = np.asarray(env._shape_reward(r))
        assert np.allclose(out, float(r.sum()))

    def test_ma2c_spatial_discount(self):
        env = make_env("ma2c", coop_gamma=0.9)
        r = jnp.ones(25)
        out = np.asarray(env._shape_reward(r))
        n = env.spec.node_names.index("nt13")
        assert np.isclose(out[n], 1 + 0.9 * 4)
        n1 = env.spec.node_names.index("nt1")
        assert np.isclose(out[n1], 1 + 0.9 * 2)

    def test_objective_modes(self):
        wait = jnp.ones((25, 6))
        queue = 2 * jnp.ones((25, 6))
        env_q = make_env("ia2c", objective="queue")
        env_w = make_env("ia2c", objective="wait")
        env_h = make_env("ia2c", objective="hybrid", coef_wait=0.2)
        assert np.allclose(np.asarray(env_q._raw_reward(wait, queue)), -12.0)
        assert np.allclose(np.asarray(env_w._raw_reward(wait, queue)), -6.0)
        assert np.allclose(np.asarray(env_h._raw_reward(wait, queue)), -12.0 - 0.2 * 6)


def test_greedy_action_respects_mask():
    env = make_env("greedy", scenario="small_grid",
                   norm_wave=1.0, clip_wave=1000.0)
    obs = jnp.zeros((2, 6, env.n_s_max)).at[:, :, 0].set(5.0)
    a = np.asarray(env.greedy_action(obs))
    assert (a < np.array(env.n_a_ls)[None, :]).all()


def test_norm_clip():
    env = make_env("ia2c", norm_wave=5.0, clip_wave=2.0)
    x = jnp.array([[100.0]])
    out = np.asarray(env._norm_clip(x, 5.0, 2.0))
    assert out[0, 0] == 2.0
