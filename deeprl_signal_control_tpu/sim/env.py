"""Gym-like multi-agent traffic env on top of the JAX microsim engine.

Mirrors the reference ``TrafficSimulator`` contract
(/root/reference/envs/env.py): the env owns all model input dimensions
(``n_s_ls/n_a_ls/n_w_ls/n_f_ls``, env.py:244-323), assembles per-agent
observations in the hard-coded order [own wave | neighbor waves | own wait |
neighbor fingerprints] (env.py:163-205), and applies the per-algorithm reward
shaping of env.py:590-631. Everything is precompiled to gather indices so a
batched step is one gather + elementwise math.

All public step/reset functions are pure and unbatched over envs; training
code vmaps/shards them. ``TrafficEnv`` also exposes convenience jitted batched
wrappers for interactive use and evaluation.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EnvConfig
from ..scenarios import build_scenario
from ..scenarios.spec import NetworkSpec
from .engine import Engine, EnvState

REALNET_REWARD_NORM = 20.0  # env.py:18


class TrafficEnv:
    def __init__(self, env_config: EnvConfig, spec: Optional[NetworkSpec] = None):
        self.cfg = env_config
        self.spec = spec if spec is not None else build_scenario(env_config.scenario, env_config)
        self.engine = Engine(self.spec)
        self.agent = env_config.agent
        self.coop_gamma = env_config.coop_gamma
        self.n_node = self.spec.n_nodes
        self.episode_length_sec = env_config.episode_length_sec
        self.control_interval_sec = env_config.control_interval_sec
        self.yellow_interval_sec = env_config.yellow_interval_sec
        self.T = int(np.ceil(self.episode_length_sec / self.control_interval_sec))
        # episode seconds ride i16 state fields (depart/acc_wait/wait_cnt,
        # engine.EnvState) and two-channel base-256 bf16 transport splits
        # (< 65536); enforce the tighter i16 bound here so an over-long
        # episode fails at build time instead of silently wrapping clocks
        assert self.episode_length_sec + self.control_interval_sec < 32768, (
            f"episode_length_sec={self.episode_length_sec} exceeds the "
            "i16 range of the engine's per-vehicle time fields")

        self._build_dims()
        self._build_obs_tables()
        self._build_reward_tables()
        self.train_mode = True
        # capacity of the per-vehicle trip ring used by evaluation resets:
        # sized from scenario demand (sum of flow rate x active duration =
        # the expected departures; exact for periodic flows, the mean for
        # Bernoulli ones — the 1.25x headroom dwarfs the binomial tail at
        # thousands of trips) so a high-demand scenario cannot silently
        # wrap the ring that feeds the headline trip table (VERDICT r3
        # item 10); an explicit positive trip_cap config value overrides.
        exp_dep = float(np.sum(
            self.spec.flow_rate
            * np.maximum(
                0.0,
                np.minimum(self.spec.flow_end, self.episode_length_sec)
                - self.spec.flow_begin,
            )
        ))
        # init-density seeded vehicles also complete trips (they count as
        # departed at t=0, engine._init_state_seeded); include their exact
        # per-lane seed counts so a dense warm start cannot wrap the ring
        density = float(getattr(env_config, "init_density", 0.0) or 0.0)
        if density > 0 and self.spec.init_lanes is not None:
            eng = self.engine
            fit = np.maximum(
                np.asarray(self.spec.lane_length) / eng.d_jam - 1, 0
            ).astype(np.int64)
            n_per = int(self.spec.init_max_car * density)
            exp_dep += float(sum(
                min(n_per, int(fit[li]), eng.K - 2)
                for li in np.asarray(self.spec.init_lanes)))
        derived = 1 << int(np.ceil(np.log2(max(exp_dep * 1.25, 1024.0))))
        self.trip_cap = int(getattr(env_config, "trip_cap", 0)
                            or max(8192, derived))

        # engine big-constant lifting (engine.consts/bind): pass the O(L^2)
        # selector matrices as jit arguments, not embedded constants
        from ..utils.jitting import jit_lifted

        self._jit_reset = jit_lifted(jax.vmap(self.reset_fn), self)
        self._jit_step = jit_lifted(
            jax.vmap(self.step_fn, in_axes=(0, 0, 0)), self
        )

    # ------------------------------------------------------------------
    def _build_dims(self):
        spec, agent = self.spec, self.agent
        n_ild = np.array(spec.n_ild_ls)
        n_a = np.array(spec.n_a_ls)
        marl = agent not in ("a2c", "greedy")
        # greedy observes waves only (_get_state, env.py:173-174)
        use_wait = spec.use_wait_state and agent != "greedy"
        self.n_a_ls = [int(a) for a in n_a]
        self.n_w_ls, self.n_f_ls, self.n_s_ls = [], [], []
        for n in range(self.n_node):
            num_wave = int(n_ild[n])
            num_fp = 0
            for m in spec.node_neighbor[n]:
                if m < 0:
                    continue
                if marl:
                    num_wave += int(n_ild[m])
                if agent == "ma2c":
                    num_fp += int(n_a[m]) - 1
            num_wait = int(n_ild[n]) if use_wait else 0
            self.n_w_ls.append(num_wait)
            self.n_f_ls.append(num_fp)
            self.n_s_ls.append(num_wave + num_wait + num_fp)
        self.n_s = int(np.sum(self.n_s_ls))
        self.n_a = int(np.prod(n_a))
        self.n_s_max = max(self.n_s_ls)
        self.n_a_max = max(self.n_a_ls)
        self.n_f_max = max(self.n_f_ls) if self.n_f_ls else 0

    def _build_obs_tables(self):
        """Precompute the gather that assembles padded per-agent observations
        from the flat (wave | wait | fingerprint) source vector."""
        spec, agent = self.spec, self.agent
        N, I = self.n_node, spec.node_ild.shape[1]
        A1 = max(1, self.n_a_max - 1)
        n_ild = spec.n_ild_ls
        wave_base, wait_base, fp_base = 0, N * I, 2 * N * I
        zero_idx = 2 * N * I + N * A1
        S = self.n_s_max
        idx = np.full((N, S), zero_idx, np.int64)
        scale = np.zeros((N, S), np.float32)
        marl = agent not in ("a2c", "greedy")
        for n in range(N):
            k = 0
            for j in range(n_ild[n]):  # own wave
                idx[n, k] = wave_base + n * I + j
                scale[n, k] = 1.0
                k += 1
            if marl:
                for m in spec.node_neighbor[n]:
                    if m < 0:
                        continue
                    for j in range(n_ild[m]):  # neighbor waves
                        idx[n, k] = wave_base + m * I + j
                        scale[n, k] = self.coop_gamma if agent == "ma2c" else 1.0
                        k += 1
            if self.n_w_ls[n]:
                for j in range(n_ild[n]):  # own wait
                    idx[n, k] = wait_base + n * I + j
                    scale[n, k] = 1.0
                    k += 1
            if agent == "ma2c":
                for m in spec.node_neighbor[n]:
                    if m < 0:
                        continue
                    for j in range(int(spec.node_n_a[m]) - 1):
                        idx[n, k] = fp_base + m * A1 + j
                        scale[n, k] = 1.0
                        k += 1
            assert k == self.n_s_ls[n], (n, k, self.n_s_ls[n])
        self._obs_idx = jnp.asarray(idx)
        self._obs_scale = jnp.asarray(scale)
        self._fp_width = A1
        # action validity mask for padded action dims
        self.action_mask = jnp.asarray(
            np.arange(self.n_a_max)[None, :] < np.array(spec.n_a_ls)[:, None]
        )
        if spec.greedy_w is not None:
            gw = np.zeros((N, self.n_a_max, I), np.float32)
            g = spec.greedy_w
            gw[:, : g.shape[1], : g.shape[2]] = g
            self._greedy_w = jnp.asarray(gw)
        else:
            self._greedy_w = None

    def _build_reward_tables(self):
        spec = self.spec
        N = self.n_node
        adj = np.zeros((N, N), np.float32)
        for n in range(N):
            for m in spec.node_neighbor[n]:
                if m >= 0:
                    adj[n, m] = 1.0
        self._adj = jnp.asarray(adj)
        self._degree = jnp.asarray(1.0 + adj.sum(1))
        self._is_realnet = spec.name == "real_net"

    # -- pure functions (single env) ------------------------------------
    def _norm_clip(self, x, norm, clip):
        x = x / norm
        return jnp.where(clip < 0, x, jnp.clip(x, 0, clip))

    def _assemble_obs(self, wave, wait, fp):
        """wave/wait [N, I] raw; fp [N, A_max-1] -> obs [N, S_max]."""
        cfg = self.cfg
        wave_n = self._norm_clip(wave, cfg.norm_wave, cfg.clip_wave)
        wait_n = self._norm_clip(wait, cfg.norm_wait, cfg.clip_wait)
        src = jnp.concatenate(
            [wave_n.ravel(), wait_n.ravel(), fp.ravel(), jnp.zeros(1)]
        )
        return src[self._obs_idx] * self._obs_scale

    def _uniform_fp(self):
        n_a = jnp.asarray(np.array(self.spec.n_a_ls, np.float32))
        j = jnp.arange(self._fp_width, dtype=jnp.float32)[None, :]
        fp = jnp.where(j < (n_a[:, None] - 1), 1.0 / n_a[:, None], 0.0)
        return fp

    def _raw_reward(self, wait, queue):
        """Per-node reward (env.py:325-367)."""
        cfg = self.cfg
        q = queue.sum(axis=1)
        w = wait.sum(axis=1)
        if cfg.objective == "queue":
            return -q
        if cfg.objective == "wait":
            return -w
        return -q - cfg.coef_wait * w

    def _shape_reward(self, r):
        """Training reward shaping per algorithm (env.py:590-631)."""
        agent = self.agent
        g = r.sum()
        if agent in ("a2c", "greedy"):
            return jnp.broadcast_to(g, r.shape)
        if agent != "ma2c":
            out = jnp.broadcast_to(g, r.shape)
            if self._is_realnet:
                out = out / (self.n_node * REALNET_REWARD_NORM)
            return out
        out = r + self.coop_gamma * (self._adj @ r)
        if self._is_realnet:
            out = out / (self._degree * REALNET_REWARD_NORM)
        return out

    def _reset(self, key, trip_cap: int) -> Tuple[EnvState, jnp.ndarray]:
        state = self.engine.init_state(
            key,
            density=float(getattr(self.cfg, "init_density", 0.0) or 0.0),
            trip_cap=trip_cap,
        )
        wave, wait, queue = self.engine.measure(state)
        obs = self._assemble_obs(wave, wait, self._uniform_fp())
        return state, obs

    def reset_fn(self, key) -> Tuple[EnvState, jnp.ndarray]:
        return self._reset(key, 0)

    def reset_eval_fn(self, key) -> Tuple[EnvState, jnp.ndarray]:
        """Reset with the per-vehicle trip ring allocated (evaluation runs
        record tripinfo-style rows, ref env.py:498-515)."""
        return self._reset(key, self.trip_cap)

    def step_fn(self, state: EnvState, action, fp=None):
        """One control step.

        -> (state, obs [N,S], reward [N], done (), global_reward (), info)
        ``fp``: [N, A_max-1] neighbor fingerprints (ma2c; pass None otherwise).
        """
        if fp is None:
            fp = self._uniform_fp()
        green_sec = self.control_interval_sec - self.yellow_interval_sec
        state, m = self.engine.control_step(
            state, action, self.yellow_interval_sec, green_sec
        )
        obs = self._assemble_obs(m["wave"], m["wait"], fp)
        r = self._raw_reward(m["wait"], m["queue"])
        global_reward = r.sum()
        reward = self._shape_reward(r) if self.train_mode else r
        done = state.t >= self.episode_length_sec
        info = dict(stats=m["stats"], raw_reward=r)
        return state, obs, reward, done, global_reward, info

    def greedy_action(self, obs):
        """Batched greedy controller: argmax over per-phase green-wave scores
        (SmallGridController / LargeGridController / RealNetController)."""
        I = self.spec.node_ild.shape[1]
        scores = jnp.einsum("nai,...ni->...na", self._greedy_w, obs[..., :I])
        scores = jnp.where(self.action_mask, scores, -jnp.inf)
        return jnp.argmax(scores, axis=-1).astype(jnp.int32)

    # -- batched conveniences -------------------------------------------
    def reset(self, keys):
        return self._jit_reset(keys)

    def step(self, state, action, fp=None):
        if fp is None:
            B = action.shape[0]
            fp = jnp.broadcast_to(
                self._uniform_fp(), (B, self.n_node, self._fp_width)
            )
        return self._jit_step(state, action, fp)
