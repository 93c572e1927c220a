"""5x5 large-grid scenario compiler.

Reproduces the reference network and demand
(/root/reference/large_grid/data/build_file.py, envs/large_grid_env.py):

* 25 signalized intersections ``nt1..nt25`` on a 200 m grid, 20 perimeter
  terminals ``np1..np20``.
* Horizontal "streets": 2 lanes @ 20 m/s; vertical "avenues": 1 lane @ 11 m/s
  (build_file.py:15-17, 53-58); perimeter stubs are 75 m (L0_end).
* Per node 12 signalized movements ordered clockwise from the north approach,
  each approach contributing (right, straight, left) — the link order the
  reference's hand-written phase strings assume. The 5-phase set is verbatim
  LargeGridPhase (large_grid_env.py:38-43):
  0 'GGgrrrGGgrrr' N+S straight/right (permissive left), 1 'rrrGrGrrrGrG'
  E+W left+right, 2 'rrrGGrrrrGGr' E+W straight/right, 3 E all, 4 W all.
* Observation order per node: [N0, E0, E1, S0, W0, W1] (dedup of controlled
  lanes in link order, ref env.py:219-230), consistent with the greedy
  controller's hard-coded index map (large_grid_env.py:56-60).
* Demand: 4 flow groups of 3 OD pairs over 300 s bins with the
  peak_flow1/peak_flow2 ramp profiles (build_file.py:268-326); routes are
  shortest travel-time paths (replacing SUMO's on-insertion routing).
"""

from __future__ import annotations

import numpy as np

from . import register
from .builder import NetBuilder
from .spec import NetworkSpec

L0 = 200.0
L0_END = 75.0
SPEED_ST = 20.0  # streets (type a)
SPEED_AV = 11.0  # avenues (type b)

PHASES = [
    "GGgrrrGGgrrr",
    "rrrGrGrrrGrG",
    "rrrGGrrrrGGr",
    "rrrGGGrrrrrr",
    "rrrrrrrrrGGG",
]

# greedy flows -> phase map (large_grid_env.py:56-60):
# flows = [ob0+ob3, ob2+ob5, ob1+ob4, ob1+ob2, ob4+ob5] over [N0,E0,E1,S0,W0,W1]
GREEDY_W = np.array(
    [
        [1, 0, 0, 1, 0, 0],
        [0, 0, 1, 0, 0, 1],
        [0, 1, 0, 0, 1, 0],
        [0, 1, 1, 0, 0, 0],
        [0, 0, 0, 0, 1, 1],
    ],
    np.float32,
)


def _nt(i: int) -> str:
    return f"nt{i}"


def _rc(i: int):
    return (i - 1) // 5, (i - 1) % 5


def _neighbors(i: int):
    """Adjacent signal nodes in N,E,S,W order (matches the hand-written
    neighbor_map, large_grid_env.py:73-101)."""
    r, c = _rc(i)
    out = []
    if r < 4:
        out.append(_nt(i + 5))
    if c < 4:
        out.append(_nt(i + 1))
    if r > 0:
        out.append(_nt(i - 5))
    if c > 0:
        out.append(_nt(i - 1))
    return out


# perimeter terminal of each boundary node, per side (build_file.py:69-83)
_EXT_E = {5: 6, 10: 7, 15: 8, 20: 9, 25: 10}
_EXT_W = {21: 16, 16: 17, 11: 18, 6: 19, 1: 20}
_EXT_S = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5}
_EXT_N = {25: 11, 24: 12, 23: 13, 22: 14, 21: 15}


def _nbr_name(i: int, d: str) -> str:
    """Name of the node in direction d ('n','e','s','w'), nt or np."""
    r, c = _rc(i)
    if d == "n":
        return _nt(i + 5) if r < 4 else f"np{_EXT_N[i]}"
    if d == "s":
        return _nt(i - 5) if r > 0 else f"np{_EXT_S[i]}"
    if d == "e":
        return _nt(i + 1) if c < 4 else f"np{_EXT_E[i]}"
    return _nt(i - 1) if c > 0 else f"np{_EXT_W[i]}"


@register("large_grid")
def build_large_grid(env_config) -> NetworkSpec:
    b = NetBuilder("large_grid")
    peak1 = getattr(env_config, "peak_flow1", 1100)
    peak2 = getattr(env_config, "peak_flow2", 925)

    # nodes
    for i in range(1, 26):
        r, c = _rc(i)
        b.add_point(_nt(i), c * L0, r * L0)
    for i, x in zip(range(1, 6), np.arange(0, 5) * L0):
        b.add_point(f"np{i}", x, -L0_END)
    for i, y in zip(range(6, 11), np.arange(0, 5) * L0):
        b.add_point(f"np{i}", 4 * L0 + L0_END, y)
    for i, x in zip(range(11, 16), (np.arange(4, -1, -1)) * L0):
        b.add_point(f"np{i}", x, 4 * L0 + L0_END)
    for i, y in zip(range(16, 21), (np.arange(4, -1, -1)) * L0):
        b.add_point(f"np{i}", -L0_END, y)

    # edges: streets horizontal (2 lanes), avenues vertical (1 lane)
    for i in range(1, 26):
        r, c = _rc(i)
        if c < 4:  # internal street east
            b.add_edge(_nt(i), _nt(i + 1), 2, SPEED_ST)
            b.add_edge(_nt(i + 1), _nt(i), 2, SPEED_ST)
        if r < 4:  # internal avenue north
            b.add_edge(_nt(i), _nt(i + 5), 1, SPEED_AV)
            b.add_edge(_nt(i + 5), _nt(i), 1, SPEED_AV)
    for i, j in _EXT_E.items():
        b.add_edge(_nt(i), f"np{j}", 2, SPEED_ST)
        b.add_edge(f"np{j}", _nt(i), 2, SPEED_ST)
    for i, j in _EXT_W.items():
        b.add_edge(_nt(i), f"np{j}", 2, SPEED_ST)
        b.add_edge(f"np{j}", _nt(i), 2, SPEED_ST)
    for i, j in _EXT_S.items():
        b.add_edge(_nt(i), f"np{j}", 1, SPEED_AV)
        b.add_edge(f"np{j}", _nt(i), 1, SPEED_AV)
    for i, j in _EXT_N.items():
        b.add_edge(_nt(i), f"np{j}", 1, SPEED_AV)
        b.add_edge(f"np{j}", _nt(i), 1, SPEED_AV)

    # connections + signals (build_file.py:107-124 movement set)
    for i in range(1, 26):
        cur = _nt(i)
        nn, en, sn, wn = (_nbr_name(i, d) for d in "nesw")
        in_n, in_e = f"{nn}_{cur}", f"{en}_{cur}"
        in_s, in_w = f"{sn}_{cur}", f"{wn}_{cur}"
        out_n, out_e = f"{cur}_{nn}", f"{cur}_{en}"
        out_s, out_w = f"{cur}_{sn}", f"{cur}_{wn}"
        # N approach: right->W, straight->S, left->E(lane1)
        b.connect(in_n, out_w, 0, 0)
        b.connect(in_n, out_s, 0, 0)
        b.connect(in_n, out_e, 0, 1)
        # E approach (2 lanes): right->N, straight->W, left(lane1)->S
        b.connect(in_e, out_n, 0, 0)
        b.connect(in_e, out_w, 0, 0)
        b.connect(in_e, out_s, 1, 0)
        # S approach: right->E, straight->N, left->W(lane1)
        b.connect(in_s, out_e, 0, 0)
        b.connect(in_s, out_n, 0, 0)
        b.connect(in_s, out_w, 0, 1)
        # W approach (2 lanes): right->S, straight->E, left(lane1)->N
        b.connect(in_w, out_s, 0, 0)
        b.connect(in_w, out_e, 0, 0)
        b.connect(in_w, out_n, 1, 0)
        link_order = [
            (in_n, out_w), (in_n, out_s), (in_n, out_e),
            (in_e, out_n), (in_e, out_w), (in_e, out_s),
            (in_s, out_e), (in_s, out_n), (in_s, out_w),
            (in_w, out_s), (in_w, out_e), (in_w, out_n),
        ]
        ilds = [(in_n, 0), (in_e, 0), (in_e, 1), (in_s, 0), (in_w, 0), (in_w, 1)]
        b.add_signal(cur, link_order, PHASES, ilds, det_len=50.0)

    b.set_neighbor_map({_nt(i): _neighbors(i) for i in range(1, 26)})

    # perimeter out-edges absorb traffic
    for d, m in (("e", _EXT_E), ("w", _EXT_W), ("s", _EXT_S), ("n", _EXT_N)):
        for i, j in m.items():
            b.mark_sink(f"{_nt(i)}_np{j}")

    # --- demand (build_file.py:268-326) -------------------------------
    edge_maps = [0, 1, 2, 3, 4, 5, 5, 10, 15, 20, 25, 25, 24, 23, 22, 21, 21, 16, 11, 6, 1]

    def ext(out_nodes, dest=True):
        edges = []
        for j in out_nodes:
            i = edge_maps[j]
            edges.append(f"nt{i}_np{j}" if dest else f"np{j}_nt{i}")
        return edges

    srcs = [ext([12, 13, 14], False), ext([16, 18, 20], False),
            ext([2, 3, 4], False), ext([6, 8, 10], False)]
    sinks = [ext([2, 3, 4]), ext([6, 8, 10]), ext([14, 13, 12]), ext([20, 18, 16])]

    route_id = {}
    for g in range(4):
        for s, t in zip(srcs[g], sinks[g]):
            if (s, t) not in route_id:
                route_id[(s, t)] = b.add_route(b.shortest_route(s, t))

    ratios1 = np.array([0.4, 0.7, 0.9, 1.0, 0.75, 0.5, 0.25])
    ratios2 = np.array([0.3, 0.8, 0.9, 1.0, 0.8, 0.6, 0.2])
    flows = [peak1 * 0.6 * ratios1, peak1 * ratios1,
             peak2 * 0.6 * ratios2, peak2 * ratios2]
    times = np.arange(0, 3001, 300)
    id1 = len(ratios1)
    id2 = len(times) - 1 - id1
    for i in range(len(times) - 1):
        t0, t1 = float(times[i]), float(times[i + 1])
        if i < id1:
            for g in [0, 1]:
                for s, t in zip(srcs[g], sinks[g]):
                    b.add_flow(s, t0, t1, flows[g][i], route=route_id[(s, t)])
        if i >= id2:
            for g in [2, 3]:
                for s, t in zip(srcs[g], sinks[g]):
                    b.add_flow(s, t0, t1, flows[g][i - id2], route=route_id[(s, t)])

    spec = b.build()
    spec.greedy_w = np.broadcast_to(GREEDY_W, (25, 5, 6)).copy()
    # init_density seeding targets every internal street/avenue lane
    # (init_routes, build_file.py:241-265: both lanes of each internal
    # street, lane 0 of each internal avenue = all internal-edge lanes)
    internal = [
        i for i, e in enumerate(b._edges)
        if e["frm"].startswith("nt") and e["to"].startswith("nt")
    ]
    el = np.asarray(spec.edge_lane)
    spec.init_lanes = el[internal][el[internal] >= 0].astype(np.int32)
    return spec
