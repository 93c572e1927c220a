"""Scenario compiler tests: topology/dimension parity with the reference."""

import numpy as np
import pytest

from deeprl_signal_control_tpu.config import EnvConfig
from deeprl_signal_control_tpu.scenarios import build_scenario


@pytest.fixture(scope="module")
def large():
    return build_scenario("large_grid", EnvConfig(scenario="large_grid"))


@pytest.fixture(scope="module")
def small():
    return build_scenario("small_grid", EnvConfig(scenario="small_grid"))


def test_large_grid_shape(large):
    # 40 ext street lanes + 20 ext avenue + 80 int street + 40 int avenue
    assert large.n_lanes == 180
    assert large.n_edges == 120
    assert large.n_nodes == 25
    assert large.n_links == 25 * 12
    assert large.n_a_ls == [5] * 25
    assert large.n_ild_ls == [6] * 25


def test_large_grid_neighbors(large):
    idx = {n: i for i, n in enumerate(large.node_names)}
    # reference neighbor map rows (large_grid_env.py:73-101)
    def nbrs(name):
        row = large.node_neighbor[idx[name]]
        return [large.node_names[m] for m in row if m >= 0]

    assert nbrs("nt1") == ["nt6", "nt2"]
    assert nbrs("nt13") == ["nt18", "nt14", "nt8", "nt12"]
    assert nbrs("nt25") == ["nt20", "nt24"]
    assert nbrs("nt10") == ["nt15", "nt5", "nt9"]


def test_large_grid_phases(large):
    # 5 phases of 12 links (large_grid_env.py:38-43)
    assert large.phase_table.shape == (25, 5, 12)
    # phase 0 = NS through: N links (0,1) G, 2 g; S links (6,7) G, 8 g
    p0 = large.phase_table[0, 0]
    assert list(p0) == [3, 3, 2, 0, 0, 0, 3, 3, 2, 0, 0, 0]
    p4 = large.phase_table[0, 4]
    assert list(p4) == [0] * 9 + [3, 3, 3]


def test_large_grid_flows(large):
    # 84 flow entries: (7 bins x 6 OD) x 2 waves (build_file.py:297-324)
    assert len(large.flow_edge) == 84
    # peak rates present: peak_flow1=1100 at ratio 1.0
    assert np.isclose(large.flow_rate.max() * 3600, 1100.0)
    # routes are connected edge sequences
    for r in large.route_edges:
        edges = [e for e in r if e >= 0]
        for a, b in zip(edges[:-1], edges[1:]):
            assert b in large.eout_edge[a], (a, b)


def test_small_grid_shape(small):
    assert small.n_nodes == 6
    assert small.n_a_ls == [3, 2, 2, 2, 2, 2]
    assert small.n_ild_ls == [3, 2, 2, 2, 2, 2]
    assert small.node_names[0] == "nt1"


def test_small_grid_greedy_map(small):
    # greedy gives green to the busiest approach: for nt2 the ild order is
    # alphabetical [nt1_nt2, nt3_nt2] while link order is [nt3, nt1]; wave on
    # ob0 (nt1 approach) must select action 1 ('rrGG' = nt1 green).
    w = small.greedy_w  # padded [6, A_max=3, I_max=3]
    assert np.argmax((w[1] @ np.array([5.0, 1.0, 0.0]))[:2]) == 1
    assert np.argmax((w[1] @ np.array([1.0, 5.0, 0.0]))[:2]) == 0
    assert np.argmax(w[0] @ np.array([0.0, 9.0, 1.0])) == 1


def test_turn_probs_normalized(small):
    sums = small.turn_prob.sum(axis=2)
    has_out = (small.eout_edge >= 0).any(axis=1)
    assert np.allclose(sums[:, has_out], 1.0, atol=1e-5)


def test_small_grid_time_varying_npc_turns(small):
    # nt1_npc split varies across 600s bins (build_file.py:278-293)
    names = {}
    assert small.turn_prob.shape[0] == 12
    assert small.turn_bin_sec == 600.0
    var = small.turn_prob.std(axis=0).max()
    assert var > 0.01
