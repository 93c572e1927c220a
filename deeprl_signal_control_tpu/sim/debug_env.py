"""Simulator-free debug environments.

The reference ships ``GymEnv`` (/root/reference/envs/test_env.py) adapting
classic-control tasks to the multi-agent env interface so algorithms can be
debugged without SUMO. TPU-natively we provide:

* :class:`CartPoleEnv` — the classic cart-pole balancing task as a pure JAX
  function (same physics constants as gym's CartPole-v0), single agent,
  observations scaled to [-1, 1] like GymEnv (test_env.py:24-26).
* :class:`BanditEnv` — an N-agent contextual bandit with persistent context;
  each agent must map its one-hot context to the matching action. Converges
  in a few hundred steps, which makes it the unit-test workhorse.

Both expose the TrafficEnv step/reset/dims contract.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DebugState:
    x: jnp.ndarray
    t: jnp.ndarray
    key: jnp.ndarray


class _DebugEnvBase:
    """Attributes the runner layer expects from any env (TrafficEnv surface:
    agent/cfg/train_mode/n_node plus the dim lists the subclasses set)."""

    agent = "iqld"
    cfg = None
    train_mode = True

    @property
    def n_node(self):
        return self.n_agent

    def _uniform_fp(self):
        a = jnp.asarray(self.n_a_ls, jnp.float32)
        j = jnp.arange(max(1, self.n_a_max - 1), dtype=jnp.float32)[None, :]
        return jnp.where(j < (a[:, None] - 1), 1.0 / a[:, None], 0.0)


class CartPoleEnv(_DebugEnvBase):
    GRAV, MCART, MPOLE, LEN, FORCE, TAU = 9.8, 1.0, 0.1, 0.5, 10.0, 0.02
    X_LIM, TH_LIM = 2.4, 12 * 3.14159 / 180.0

    def __init__(self, episode_len=1000):
        self.n_agent = 1
        self.n_s_ls = [4]
        self.n_a_ls = [2]
        self.n_w_ls = [0]
        self.n_f_ls = [0]
        self.n_s_max, self.n_a_max = 4, 2
        self.T = episode_len
        self.scale = jnp.array([2.4, 3.0, 0.21, 3.5])

    def reset_fn(self, key):
        k1, k2 = jax.random.split(key)
        x = jax.random.uniform(k1, (4,), minval=-0.05, maxval=0.05)
        state = DebugState(x=x, t=jnp.zeros((), jnp.int32), key=k2)
        return state, self._obs(x)

    def _obs(self, x):
        return (x / self.scale)[None, :]  # [N=1, S=4]

    def step_fn(self, state, action, fp=None):
        x, xd, th, thd = state.x
        force = jnp.where(action[0] > 0, self.FORCE, -self.FORCE)
        costh, sinth = jnp.cos(th), jnp.sin(th)
        total_m = self.MCART + self.MPOLE
        pm_l = self.MPOLE * self.LEN
        temp = (force + pm_l * thd**2 * sinth) / total_m
        th_acc = (self.GRAV * sinth - costh * temp) / (
            self.LEN * (4.0 / 3.0 - self.MPOLE * costh**2 / total_m)
        )
        x_acc = temp - pm_l * th_acc * costh / total_m
        nx = jnp.array(
            [x + self.TAU * xd, xd + self.TAU * x_acc,
             th + self.TAU * thd, thd + self.TAU * th_acc]
        )
        fell = (jnp.abs(nx[0]) > self.X_LIM) | (jnp.abs(nx[2]) > self.TH_LIM)
        t = state.t + 1
        done = fell | (t >= self.T)
        reward = jnp.where(fell, 0.0, 1.0)[None]
        new_state = DebugState(x=nx, t=t, key=state.key)
        return new_state, self._obs(nx), reward, done, reward.sum(), {}


class BanditEnv(_DebugEnvBase):
    """n_agent agents; obs = own one-hot context (+ zeros padding); reward
    per agent = 1 if action == context else 0. Context resampled each step."""

    def __init__(self, n_agent=3, n_ctx=3, episode_len=40):
        self.n_agent = n_agent
        self.n_ctx = n_ctx
        self.n_s_ls = [n_ctx] * n_agent
        self.n_a_ls = [n_ctx] * n_agent
        self.n_w_ls = [0] * n_agent
        self.n_f_ls = [0] * n_agent
        self.n_s_max, self.n_a_max = n_ctx, n_ctx
        self.T = episode_len

    def _obs(self, ctx):
        return jax.nn.one_hot(ctx, self.n_ctx)

    def reset_fn(self, key):
        k1, k2 = jax.random.split(key)
        ctx = jax.random.randint(k1, (self.n_agent,), 0, self.n_ctx)
        return DebugState(x=ctx, t=jnp.zeros((), jnp.int32), key=k2), self._obs(ctx)

    def step_fn(self, state, action, fp=None):
        reward = (action == state.x).astype(jnp.float32)
        key, k1 = jax.random.split(state.key)
        ctx = jax.random.randint(k1, (self.n_agent,), 0, self.n_ctx)
        t = state.t + 1
        done = t >= self.T
        new_state = DebugState(x=ctx, t=t, key=key)
        return new_state, self._obs(ctx), reward, done, reward.sum(), {}
