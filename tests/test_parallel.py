"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    action, pi, v = out
    assert action.shape == (25,)
    assert np.isfinite(np.asarray(pi)).all()


def test_sharded_matches_single_device():
    """The env-sharded + replicated-learner step must produce the same
    update as the unsharded program. The chunk donates its carried buffers,
    so each invocation gets freshly built inputs."""
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from deeprl_signal_control_tpu.parallel.mesh import (
        make_mesh, replicate, shard_env_batch,
    )
    from deeprl_signal_control_tpu.runner import Trainer, _bc
    from deeprl_signal_control_tpu.utils.experiment import Counter

    env, alg = ge._build(episode_length_sec=30)
    alg.n_step = env.T
    B = 8
    trainer = Trainer(env, alg, Counter(10**9, 10**9, 10**9), "/tmp/",
                      num_envs=B)

    def fresh_args():
        keys = jax.random.split(jax.random.key(0), B)
        env_state, obs = jax.jit(jax.vmap(env.reset_fn))(keys)
        fp = _bc(env._uniform_fp(), B)
        states = _bc(alg.init_states(), B)
        done = jnp.ones((B,), jnp.float32)
        ts = alg.init_train_state()
        return (ts, env_state, obs, fp, done, states, jax.random.key(1),
                jnp.zeros((), jnp.float32))

    out_single = trainer._chunk(*fresh_args())
    single_params = [np.asarray(x) for x in jax.tree.leaves(out_single[0].params)]

    mesh = make_mesh(8)
    ts, env_state, obs, fp, done, states, key, step = fresh_args()
    args_sh = (
        replicate(ts, mesh),
        shard_env_batch(env_state, mesh),
        shard_env_batch(obs, mesh),
        shard_env_batch(fp, mesh),
        shard_env_batch(done, mesh),
        shard_env_batch(states, mesh),
        key, step,
    )
    out_sharded = trainer._chunk(*args_sh)
    sharded_params = jax.tree.leaves(out_sharded[0].params)
    for a, b in zip(single_params, sharded_params):
        assert np.allclose(a, np.asarray(b), atol=1e-5)


def test_iql_sharded_matches_single_device():
    """IQL chunk with its mesh-sharded replay state: sharded == unsharded
    (replay scatter, uniform sampling, and the 10-minibatch update all ride
    the env-sharded layout)."""
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from deeprl_signal_control_tpu.parallel.mesh import (
        make_mesh, replicate, shard_env_batch,
    )
    from deeprl_signal_control_tpu.runner import Trainer
    from deeprl_signal_control_tpu.utils.experiment import Counter

    B = 8
    mesh = make_mesh(8)

    def run(use_mesh):
        env, alg = ge._build(episode_length_sec=30, agent="iqll")
        alg.n_step = env.T
        trainer = Trainer(env, alg, Counter(10**9, 10**9, 10**9), "/tmp/",
                          num_envs=B, mesh=mesh if use_mesh else None)
        keys = jax.random.split(jax.random.key(0), B)
        env_state, obs = jax.jit(jax.vmap(env.reset_fn))(keys)
        ts = alg.init_train_state()
        if use_mesh:
            env_state = shard_env_batch(env_state, mesh)
            obs = shard_env_batch(obs, mesh)
            ts = replicate(ts, mesh)
        out = trainer._chunk(ts, trainer._replay, env_state, obs,
                             jax.random.key(1), jnp.zeros((), jnp.float32))
        return [np.asarray(x) for x in jax.tree.leaves(out[0].params)]

    single = run(False)
    sharded = run(True)
    for a, b in zip(single, sharded):
        assert np.allclose(a, b, atol=1e-5)
