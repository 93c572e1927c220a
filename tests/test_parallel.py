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
    update as the unsharded program."""
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
    keys = jax.random.split(jax.random.key(0), B)
    env_state, obs = jax.jit(jax.vmap(env.reset_fn))(keys)
    fp = _bc(env._uniform_fp(), B)
    states = _bc(alg.init_states(), B)
    done = jnp.ones((B,), jnp.float32)
    ts = alg.init_train_state()
    args = (ts, env_state, obs, fp, done, states, jax.random.key(1),
            jnp.zeros((), jnp.float32))

    out_single = trainer._chunk(*args)
    single_params = jax.tree.leaves(out_single[0].params)

    mesh = make_mesh(8)
    args_sh = (
        replicate(ts, mesh),
        shard_env_batch(env_state, mesh),
        shard_env_batch(obs, mesh),
        shard_env_batch(fp, mesh),
        shard_env_batch(done, mesh),
        shard_env_batch(states, mesh),
        jax.random.key(1),
        jnp.zeros((), jnp.float32),
    )
    out_sharded = trainer._chunk(*args_sh)
    sharded_params = jax.tree.leaves(out_sharded[0].params)
    for a, b in zip(single_params, sharded_params):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)
