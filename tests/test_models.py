"""Policies and algorithms: shapes, masking, and actual learning on the
debug envs (replacing the reference's manual test_layers + gym debugging)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeprl_signal_control_tpu.config import ModelConfig
from deeprl_signal_control_tpu.models.algorithms import IA2C, IQL, MA2C
from deeprl_signal_control_tpu.models.policies import (
    MultiAgentLstmACPolicy,
    MultiAgentQPolicy,
)
from deeprl_signal_control_tpu.sim.debug_env import BanditEnv


class TestPolicyShapes:
    def test_heterogeneous_masked_softmax(self):
        pol = MultiAgentLstmACPolicy(
            n_s_ls=[10, 7, 12], n_a_ls=[5, 2, 3], n_w_ls=[2, 2, 3],
            n_f_ls=[3, 1, 2],
        )
        params = pol.init(0)
        obs = jnp.ones((3, pol.S))
        pi, v, states = pol.forward_step(params, obs, 1.0, pol.init_states())
        assert pi.shape == (3, 5) and v.shape == (3,)
        pi = np.asarray(pi)
        # invalid action slots must carry zero probability
        assert np.allclose(pi[1, 2:], 0.0)
        assert np.allclose(pi.sum(-1), 1.0, atol=1e-5)

    def test_padded_obs_ignored(self):
        pol = MultiAgentLstmACPolicy(
            n_s_ls=[6, 4], n_a_ls=[2, 2], n_w_ls=[0, 0], n_f_ls=None
        )
        params = pol.init(0)
        obs1 = jnp.asarray(np.random.default_rng(0).standard_normal((2, 6)),
                           jnp.float32)
        obs2 = obs1.at[1, 4:].set(99.0)  # agent 1 padding region
        pi1, v1, _ = pol.forward_step(params, obs1, 1.0, pol.init_states())
        pi2, v2, _ = pol.forward_step(params, obs2, 1.0, pol.init_states())
        assert np.allclose(np.asarray(pi1), np.asarray(pi2))

    def test_seq_matches_steps(self):
        pol = MultiAgentLstmACPolicy(
            n_s_ls=[5, 5], n_a_ls=[3, 3], n_w_ls=[1, 1], n_f_ls=None
        )
        params = pol.init(1)
        T = 6
        obs = jnp.asarray(
            np.random.default_rng(1).standard_normal((T, 2, 5)), jnp.float32
        )
        dones = jnp.asarray([1.0, 0, 0, 1, 0, 0])
        st = pol.init_states()
        pis = []
        for t in range(T):
            pi, v, st = pol.forward_step(params, obs[t], dones[t], st)
            pis.append(np.asarray(pi))
        pis_seq, _ = pol.forward_seq(
            params, obs, dones[:, None, None], pol.init_states()
        )
        assert np.allclose(np.asarray(pis_seq), np.stack(pis), atol=1e-5)

    def test_q_policy(self):
        pol = MultiAgentQPolicy(
            n_s_ls=[8, 6], n_a_ls=[4, 2], n_w_ls=[2, 2], model_type="dqn"
        )
        q = pol.q_values(pol.init(0), jnp.ones((2, pol.S)))
        assert q.shape == (2, 4)
        assert np.asarray(q)[1, 2] < -1e8  # masked
        lr = MultiAgentQPolicy(
            n_s_ls=[8, 6], n_a_ls=[4, 2], n_w_ls=[0, 0], model_type="lr"
        )
        q2 = lr.q_values(lr.init(0), jnp.ones((2, lr.S)))
        assert q2.shape == (2, 4)


def rollout_a2c(alg, env, train_state, n_updates, T, key, B=16):
    """Minimal batched on-policy loop for debug envs."""
    reset_keys = jax.random.split(key, B)
    state, obs = jax.vmap(env.reset_fn)(reset_keys)

    @jax.jit
    def run_update(train_state, state, obs, key, step):
        lstm0 = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape), alg.init_states()
        )

        def env_step(carry, k):
            state, obs, done, states = carry
            a, pi, v, new_states = alg.act(train_state.params, obs, done, states, k)
            state, obs2, r, done2, g, _ = jax.vmap(env.step_fn)(state, a)
            out = dict(obs=obs, actions=a, values=v,
                       rewards=alg.normalize_reward(r),
                       dones_pre=done.astype(jnp.float32),
                       dones_post=jnp.broadcast_to(done2, (B,)).astype(jnp.float32))
            return (state, obs2, jnp.broadcast_to(done2, (B,)), new_states), out

        keys = jax.random.split(key, T)
        done0 = jnp.ones((B,), bool)
        (state, obs, done, states), batch = jax.lax.scan(
            env_step, (state, obs, done0, lstm0), keys
        )
        bootstrap = alg.value(train_state.params, obs, done, states)
        batch["bootstrap"] = bootstrap * (1.0 - done[:, None].astype(jnp.float32))
        batch["init_states"] = lstm0
        lr = alg.lr_scheduler.get(step)
        beta = alg.beta_scheduler.get(step)
        train_state, metrics = alg.update(train_state, batch, lr, beta)
        avg_r = batch["rewards"].mean()
        return train_state, state, obs, avg_r

    rewards = []
    for i in range(n_updates):
        key, k = jax.random.split(key)
        train_state, state, obs, avg_r = run_update(
            train_state, state, obs, k, i * T
        )
        rewards.append(float(avg_r))
    return train_state, rewards


@pytest.mark.parametrize("cls", [IA2C, MA2C])
def test_a2c_learns_bandit(cls):
    # TF1-parity RMSProp (accumulator init 1.0) makes early updates small,
    # so give the loop enough updates to see clear learning.
    env = BanditEnv(n_agent=3, n_ctx=3, episode_len=10**6)
    mc = ModelConfig(batch_size=16, reward_norm=1.0, reward_clip=0.0,
                     lr_init=2e-2, num_fw=32, num_ft=8, num_fp=8, num_lstm=16,
                     gamma=0.5)
    alg = cls(env.n_s_ls, env.n_a_ls, env.n_w_ls, env.n_f_ls, 100000, mc, seed=0)
    ts = alg.init_train_state()
    ts, rewards = rollout_a2c(alg, env, ts, 400, 16, jax.random.key(0))
    early = np.mean(rewards[:10])
    late = np.mean(rewards[-10:])
    assert late > 0.55, (early, late)  # random = 1/3


def test_iql_learns_bandit():
    from deeprl_signal_control_tpu.ops import replay_add_many, replay_init, replay_sample

    env = BanditEnv(n_agent=2, n_ctx=3, episode_len=1000)
    mc = ModelConfig(batch_size=32, reward_norm=1.0, reward_clip=0.0,
                     lr_init=3e-3, buffer_size=500, num_fc=32, num_h=16,
                     epsilon_decay="constant", epsilon_init=0.2)
    alg = IQL(env.n_s_ls, env.n_a_ls, env.n_w_ls, 100000, mc, seed=0)
    ts = alg.init_train_state()
    ex = dict(
        obs=jnp.zeros((env.n_agent, env.n_s_max)),
        actions=jnp.zeros((env.n_agent,), jnp.int32),
        rewards=jnp.zeros((env.n_agent,)),
        next_obs=jnp.zeros((env.n_agent, env.n_s_max)),
        dones=jnp.zeros((), bool),
    )
    rstate = replay_init(500, ex)
    key = jax.random.key(0)
    state, obs = env.reset_fn(jax.random.key(1))

    @jax.jit
    def collect_and_update(ts, rstate, state, obs, key, eps):
        def env_step(carry, k):
            state, obs = carry
            a, q = alg.act(ts.params, obs, k, eps)
            state, obs2, r, done, g, _ = env.step_fn(state, a)
            item = dict(obs=obs, actions=a, rewards=alg.normalize_reward(r),
                        next_obs=obs2, dones=done)
            return (state, obs2), (item, r.mean())
        keys = jax.random.split(key, 32)
        (state, obs), (items, rs) = jax.lax.scan(env_step, (state, obs), keys)
        rstate = replay_add_many(rstate, items)

        def mb(carry, k):
            ts = carry
            batch = replay_sample(rstate, k, 32)
            ts, m = alg.update_minibatch(ts, batch, 3e-3)
            return ts, None
        ts, _ = jax.lax.scan(mb, ts, jax.random.split(key, 10))
        return ts, rstate, state, obs, rs.mean()

    rewards = []
    for i in range(120):
        key, k = jax.random.split(key)
        ts, rstate, state, obs, avg_r = collect_and_update(
            ts, rstate, state, obs, k, 0.1
        )
        rewards.append(float(avg_r))
    # random = 1/3; epsilon=0.1 caps the ceiling around 0.93
    assert np.mean(rewards[-10:]) > 0.6, rewards[-10:]


class TestFcPolicy:
    """FC actor-critic variant (ref FcACPolicy/FPFcACPolicy, policies.py:214-282)."""

    def _pol(self):
        from deeprl_signal_control_tpu.models.policies import MultiAgentFcACPolicy

        return MultiAgentFcACPolicy(
            n_s_ls=[10, 7, 12], n_a_ls=[5, 2, 3], n_w_ls=[2, 2, 3],
            n_f_ls=[3, 1, 2],
        )

    def test_shapes_and_masking(self):
        pol = self._pol()
        params = pol.init(0)
        obs = jnp.ones((3, pol.S))
        pi, v, states = pol.forward_step(params, obs, 1.0, pol.init_states())
        assert pi.shape == (3, 5) and v.shape == (3,)
        pi = np.asarray(pi)
        assert np.allclose(pi[1, 2:], 0.0)
        assert np.allclose(pi.sum(-1), 1.0, atol=1e-5)

    def test_stateless_seq_matches_steps(self):
        pol = self._pol()
        params = pol.init(1)
        T = 4
        obs = jnp.asarray(
            np.random.default_rng(2).standard_normal((T, 3, pol.S)), jnp.float32
        )
        dones = jnp.zeros(T)
        st = pol.init_states()
        pis = []
        for t in range(T):
            pi, v, st = pol.forward_step(params, obs[t], dones[t], st)
            pis.append(np.asarray(pi))
        pis_seq, _ = pol.forward_seq(params, obs, dones[:, None, None],
                                     pol.init_states())
        assert np.allclose(np.asarray(pis_seq), np.stack(pis), atol=1e-5)


def test_a2c_fc_actor_learns_bandit():
    """actor_type='fc' wires MultiAgentFcACPolicy through the A2C stack."""
    env = BanditEnv(n_agent=3, n_ctx=3, episode_len=10**6)
    mc = ModelConfig(batch_size=16, reward_norm=1.0, reward_clip=0.0,
                     lr_init=2e-2, num_fw=32, num_ft=8, num_fp=8, num_lstm=16,
                     gamma=0.5, actor_type="fc")
    alg = IA2C(env.n_s_ls, env.n_a_ls, env.n_w_ls, env.n_f_ls, 100000, mc, seed=0)
    from deeprl_signal_control_tpu.models.policies import MultiAgentFcACPolicy

    assert isinstance(alg.policy, MultiAgentFcACPolicy)
    ts = alg.init_train_state()
    ts, rewards = rollout_a2c(alg, env, ts, 400, 16, jax.random.key(0))
    assert np.mean(rewards[-10:]) > 0.55


def test_schedules_decay_over_global_steps_at_large_batch():
    """Step accounting with batched envs (config.py docstring): schedules
    are pure functions of the GLOBAL step, so with num_envs=B the decay
    spans total_step regardless of B (ref agents/models.py:53-69)."""
    import numpy as np

    from deeprl_signal_control_tpu.ops.schedules import Scheduler

    total = 1.5e8  # the b1k preset's budget
    s = Scheduler(1.0, 0.05, total, "linear")
    B, n_step = 1024, 120
    steps = np.arange(0, total + 1, B * n_step * 100)  # every 100th update
    vals = np.array([float(s.get(x)) for x in steps])
    assert vals[0] == 1.0
    assert np.isclose(vals[-1], 0.05, atol=1e-6)
    assert (np.diff(vals) <= 1e-9).all()  # monotone decay
    # halfway through the budget the schedule is ~halfway decayed
    assert abs(float(s.get(total / 2)) - 0.5) < 0.01
