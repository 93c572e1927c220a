"""Centralized A2C (ref models.py:15-129): global action codec parity with
env._transfer_action (env.py:473-483), observation flattening, and learning
on the bandit debug env."""

import jax
import jax.numpy as jnp
import numpy as np

from deeprl_signal_control_tpu.config import EnvConfig, ModelConfig
from deeprl_signal_control_tpu.models.algorithms import A2C, make_algorithm
from deeprl_signal_control_tpu.runner import Trainer
from deeprl_signal_control_tpu.sim import make_env
from deeprl_signal_control_tpu.sim.debug_env import BanditEnv
from deeprl_signal_control_tpu.utils.experiment import Counter


def _ref_transfer_action(action, phase_nums):
    """Literal reimplementation of env.py:473-483 for parity checking."""
    action_ls = []
    for i in range(len(phase_nums) - 1):
        action, cur_action = divmod(action, phase_nums[i])
        action_ls.append(cur_action)
    action_ls.append(action)
    return action_ls


def _make_a2c(n_a_ls, n_s_ls=None, n_w_ls=None):
    n_s_ls = n_s_ls or [4] * len(n_a_ls)
    n_w_ls = n_w_ls or [0] * len(n_a_ls)
    mc = ModelConfig(batch_size=8, reward_norm=1.0, reward_clip=0.0)
    return A2C(n_s_ls, n_a_ls, n_w_ls, 1000, mc, seed=0)


class TestActionCodec:
    def test_decode_matches_reference(self):
        phase_nums = [2, 3, 2, 4]
        alg = _make_a2c(phase_nums)
        n_global = int(np.prod(phase_nums))
        g = jnp.arange(n_global)[:, None]
        local = np.asarray(alg.decode_global(g))
        for a in range(n_global):
            assert local[a].tolist() == _ref_transfer_action(a, phase_nums)

    def test_roundtrip(self):
        phase_nums = [3, 2, 5]
        alg = _make_a2c(phase_nums)
        g = jnp.arange(int(np.prod(phase_nums)))[:, None]
        assert np.array_equal(
            np.asarray(alg.encode_global(alg.decode_global(g))), np.asarray(g)
        )

    def test_intractable_raises(self):
        import pytest

        with pytest.raises(ValueError):
            _make_a2c([5] * 25)  # large_grid product space


class TestFlatten:
    def test_wave_wait_reordering(self):
        # two nodes, row layout [wave | wait]: flattening must produce
        # [wave0, wave1 | wait0, wait1] to match the policy section masks
        alg = _make_a2c([2, 2], n_s_ls=[3, 4], n_w_ls=[1, 2])
        obs = jnp.asarray(
            [[1.0, 2.0, 10.0, 0.0], [3.0, 4.0, 5.0, 20.0]]
        )  # node 0: wave [1,2] wait [10]; node 1: wave [3,4,5] wait [20]...
        # node1 n_s=4, n_w=2 -> wave [3,4], wait [5,20]
        flat = np.asarray(alg._flatten_obs(obs))[0]
        assert flat.tolist() == [1.0, 2.0, 3.0, 4.0, 10.0, 5.0, 20.0]


class TestLearning:
    def test_bandit_learns(self):
        env = BanditEnv(n_agent=2, n_ctx=2, episode_len=10**6)
        mc = ModelConfig(batch_size=16, lr_init=5e-2, gamma=0.5,
                         reward_norm=1.0, reward_clip=0.0, num_lstm=16,
                         num_fw=32)
        alg = A2C(env.n_s_ls, env.n_a_ls, env.n_w_ls, 100_000, mc, seed=0)
        ts = alg.init_train_state()
        B = 16
        bc = lambda x: jax.tree.map(
            lambda a: jnp.broadcast_to(a, (B,) + a.shape), x
        )

        @jax.jit
        def chunk(ts, est, obs, done, states, key):
            init_states = states

            def step(carry, k):
                est, obs, done, states = carry
                a, pi, v, states2 = alg.act(ts.params, obs, done, states, k)
                est, obs2, r, done2, g, _ = jax.vmap(env.step_fn)(est, a, None)
                out = dict(obs=obs, actions=a, values=v, rewards=r,
                           dones_pre=done, dones_post=done2.astype(jnp.float32),
                           g=g)
                return (est, obs2, done2.astype(jnp.float32), states2), out

            keys = jax.random.split(key, alg.n_step)
            (est, obs, done, states), batch = jax.lax.scan(
                step, (est, obs, done, states), keys
            )
            batch["bootstrap"] = alg.value(ts.params, obs, done, states) * (
                1.0 - done[:, None]
            )
            batch["init_states"] = init_states
            g = batch.pop("g")
            ts2, _ = alg.update(ts, batch, 5e-2, 0.01)
            return ts2, est, obs, done, states, g.mean()

        keys = jax.random.split(jax.random.key(0), B)
        est, obs = jax.vmap(env.reset_fn)(keys)
        done = jnp.ones((B,), jnp.float32)
        states = bc(alg.init_states())
        gs = []
        for i in range(450):
            ts, est, obs, done, states, g = chunk(
                ts, est, obs, done, states,
                jax.random.fold_in(jax.random.key(1), i),
            )
            gs.append(float(g))
        # joint reward per step <= 2.0, random = 1.0
        assert np.mean(gs[-20:]) > 1.5, np.mean(gs[-20:])

    def test_trainer_integration(self):
        env = BanditEnv(n_agent=2, n_ctx=2, episode_len=40)
        env.agent = "a2c"
        env.cfg = EnvConfig(scenario="bandit", agent="a2c")
        mc = ModelConfig(batch_size=8, reward_norm=1.0, reward_clip=0.0,
                         num_lstm=8, num_fw=8)
        alg = make_algorithm("a2c", env, 10_000, mc, seed=0)
        trainer = Trainer(env, alg, Counter(10_000, 10**9, 10**9), "/tmp/",
                          num_envs=4, seed=0)
        ts = alg.init_train_state()
        ts, stats = trainer.run_episode(ts, train_mode=True)
        assert np.isfinite(stats["avg_reward"])
        # deterministic eval path exercises greedy_from_pi's global decode
        env.train_mode = False
        keys = jax.random.split(jax.random.key(5), 4)
        est, obs = jax.vmap(env.reset_fn)(keys)
        out = trainer.perform(ts, est, obs, 4, policy_type="deterministic")
        assert np.isfinite(out["avg_reward"])


class TestMakeEnv:
    def test_traffic_and_debug(self):
        env = make_env(EnvConfig(scenario="bandit", agent="iqld"))
        assert env.n_node == env.n_agent
        env2 = make_env(EnvConfig(scenario="cartpole", agent="iqld"))
        assert env2.n_s_ls == [4]
