"""Monaco real_net scenario: parsing, dims, conservation, MA2C smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeprl_signal_control_tpu.config import EnvConfig, ModelConfig
from deeprl_signal_control_tpu.models.algorithms import make_algorithm
from deeprl_signal_control_tpu.scenarios import build_scenario
from deeprl_signal_control_tpu.sim.env import TrafficEnv


@pytest.fixture(scope="module")
def spec():
    return build_scenario("real_net", EnvConfig(scenario="real_net", agent="ma2c"))


@pytest.fixture(scope="module")
def env(spec):
    cfg = EnvConfig(scenario="real_net", agent="greedy", objective="queue",
                    coef_wait=0.0, norm_wave=5.0, clip_wave=2.0,
                    episode_length_sec=300)
    return TrafficEnv(cfg, spec=spec)


def test_topology(spec):
    assert spec.n_nodes == 28
    assert spec.n_links == 264  # tls connections in most.net.xml
    # 585 base edges / 1043 lanes plus long-edge chain segments
    assert spec.n_edges >= 585
    assert spec.n_lanes >= 1043
    # segmentation keeps every lane under the 150 m target
    assert spec.lane_length.max() <= 160.0
    # per-node action counts match the PHASES table keys
    idx = {n: i for i, n in enumerate(spec.node_names)}
    assert spec.node_n_a[idx["10026"]] == 6
    assert spec.node_n_a[idx["8940"]] == 2
    assert spec.node_n_a[idx["9429"]] == 5


def test_wave_only_state(spec):
    assert not spec.use_wait_state
    assert spec.queue_cap == 10.0
    assert spec.teleport_sec == 300.0
    assert (spec.det_start == 0).all()  # full-lane measures


def test_routes_follow_connections(spec):
    for r in spec.route_edges:
        edges = [e for e in r if e >= 0]
        for a, b in zip(edges[:-1], edges[1:]):
            assert b in spec.eout_edge[a], (a, b)


def test_ma2c_dims(spec):
    cfg = EnvConfig(scenario="real_net", agent="ma2c")
    env = TrafficEnv(cfg, spec=spec)
    # wave-only: n_w = 0 everywhere; fingerprints from neighbor n_a
    assert all(w == 0 for w in env.n_w_ls)
    idx = {n: i for i, n in enumerate(spec.node_names)}
    n = idx["8940"]  # neighbors 9007 (n_a 2), 9429 (n_a 5)
    assert env.n_f_ls[n] == (2 - 1) + (5 - 1)
    own = spec.n_ild_ls[n]
    nb_waves = sum(spec.n_ild_ls[idx[m]] for m in ("9007", "9429"))
    assert env.n_s_ls[n] == own + nb_waves + env.n_f_ls[n]


def test_conservation_and_flow(env):
    state, obs = env.reset(jax.random.split(jax.random.key(0), 1))
    for _ in range(60):  # 300 s
        a = env.greedy_action(obs)
        state, obs, r, done, g, info = env.step(state, a)
    dep = int(np.asarray(state.n_departed)[0])
    arr = int(np.asarray(state.n_arrived)[0])
    act = int(np.asarray(state.active)[0].sum())
    assert dep - arr == act
    assert dep > 50


def test_ma2c_trains_on_real_net():
    cfg = EnvConfig(scenario="real_net", agent="ma2c", objective="queue",
                    coef_wait=0.0, episode_length_sec=100,
                    control_interval_sec=5)
    env = TrafficEnv(cfg)
    mc = ModelConfig(batch_size=20, num_fw=16, num_ft=4, num_fp=4, num_lstm=8,
                     reward_norm=40.0)
    alg = make_algorithm("ma2c", env, 1000, mc, seed=0)
    from deeprl_signal_control_tpu.runner import Trainer
    from deeprl_signal_control_tpu.utils.experiment import Counter

    trainer = Trainer(env, alg, Counter(40, 10**9, 100), "/tmp/", num_envs=1)
    ts = alg.init_train_state()
    ts = trainer.run(ts)
    assert trainer.counter.cur_step >= 40
