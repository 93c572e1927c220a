"""6-intersection small-grid scenario compiler.

Reproduces /root/reference/small_grid/data/build_file.py +
envs/small_grid_env.py: 6 signalized nodes nt1..nt6 around an unsignalized
center ``npc``, 5 source terminals feeding time-varying flows that are routed
by turn probabilities (the reference pipes them through jtrrouter,
build_file.py:310-335), plus explicit-route "mf" probability flows.

Link order per node is clockwise from north (netconvert convention);
observation (ild) order is alphabetical by lane name, which is the ordering
the reference's hard-coded greedy STATE_PHASE_MAP assumes
(small_grid_env.py:29-30, 51-55) — the two orderings differ for nt2..nt6 and
only this combination makes the reference's greedy controller actually give
green to the busiest approach.

Notes vs the reference:
* The reference's neighbor map lists the unsignalized 'npc' as a neighbor
  (small_grid_env.py:20-25); it has no agent/state, and the reference would
  KeyError if a MARL agent ran on small_grid. We keep only signalized
  neighbors.
* jtrrouter's implicit default turn ratios at nt3/nt5 for vehicles arriving
  from nt4 are approximated with the same 0.3/0.7 split used for arrivals
  from npc.
"""

from __future__ import annotations

import numpy as np

from . import register
from .builder import NetBuilder
from .spec import FLOW_BERNOULLI, NetworkSpec

SPEED = 20.0
L0, L1, L0_END = 200.0, 400.0, 75.0

ROUTES = [
    ["nt1_npc", "npc_nt5", "nt5_np11"],
    ["nt1_npc", "npc_nt5", "nt5_nt6", "nt6_np12"],
    ["nt4_nt5", "nt5_np11"],
    ["nt4_nt5", "nt5_nt6", "nt6_np12"],
    ["nt1_nt2", "nt2_np4"],
    ["nt1_nt6", "nt6_np13"],
    ["nt1_npc", "npc_nt3", "nt3_np6"],
    ["nt1_npc", "npc_nt3", "nt3_nt2", "nt2_np5"],
    ["nt4_nt3", "nt3_np6"],
    ["nt4_nt3", "nt3_nt2", "nt2_np5"],
]
MF_CASES = [(3, 4, 5), (0, 3, 4), (1, 2, 5), (4, 5, 9), (5, 6, 9), (4, 7, 8)]

# per-600s-bin source rates, rows = np1,np2,np3,np8,np9 (build_file.py:192-196)
SRC_FLOWS = np.array(
    [
        [500, 100, 700, 800, 550, 550, 100, 200, 250, 250, 400, 800],
        [600, 700, 100, 200, 50, 100, 1000, 500, 450, 150, 400, 200],
        [100, 400, 400, 200, 600, 550, 100, 500, 500, 800, 400, 200],
        [100, 200, 300, 300, 300, 400, 600, 600, 800, 500, 400, 300],
        [600, 400, 400, 600, 800, 400, 300, 300, 300, 200, 250, 250],
    ],
    np.float64,
)

NEIGHBOR_MAP = {
    "nt1": ["nt2", "nt6"],
    "nt2": ["nt1", "nt3"],
    "nt3": ["nt2", "nt4"],
    "nt4": ["nt3", "nt5"],
    "nt5": ["nt4", "nt6"],
    "nt6": ["nt1", "nt5"],
}


@register("small_grid")
def build_small_grid(env_config) -> NetworkSpec:
    b = NetBuilder("small_grid")
    num_car_hourly = getattr(env_config, "num_extra_car_per_hour", 1000)

    L2 = L0 / np.sqrt(2)
    L2e = L0_END / np.sqrt(2)
    pts = {
        "nt1": (0, 0), "nt2": (L1, 0), "nt3": (L1, L0), "nt4": (L1, L1),
        "nt5": (L0, L1), "nt6": (0, L1),
        "np1": (0, -L0_END), "np2": (-L2e, -L2e), "np3": (-L0_END, 0),
        "np4": (L0_END + L1, 0), "np5": (L1, -L0_END), "np6": (L0_END + L1, L0),
        "np8": (L0_END + L1, L1), "np9": (L1, L0_END + L1),
        "np11": (L0, L0_END + L1), "np12": (-L0_END, L1), "np13": (0, L0_END + L1),
        "npc": (L2, L2),
    }
    for n, (x, y) in pts.items():
        b.add_point(n, x, y)

    edges = (
        [("np%d" % i, "nt1") for i in (1, 2, 3)]
        + [("np%d" % i, "nt4") for i in (8, 9)]
        + [("nt1", "nt2"), ("nt1", "npc"), ("nt1", "nt6"), ("npc", "nt3"),
           ("npc", "nt5"), ("nt5", "nt6"), ("nt4", "nt3"), ("nt4", "nt5"),
           ("nt3", "nt2")]
        + [("nt6", "np12"), ("nt6", "np13"), ("nt2", "np4"), ("nt2", "np5"),
           ("nt5", "np11"), ("nt3", "np6")]
    )
    for frm, to in edges:
        b.add_edge(frm, to, 1, SPEED)
    for sink in ["nt6_np12", "nt6_np13", "nt2_np4", "nt2_np5", "nt5_np11", "nt3_np6"]:
        b.mark_sink(sink)

    # connections
    for src in ("np1", "np2", "np3"):
        for dst in ("nt2", "nt6", "npc"):
            b.connect(f"{src}_nt1", f"nt1_{dst}")
    for src in ("np8", "np9"):
        for dst in ("nt3", "nt5"):
            b.connect(f"{src}_nt4", f"nt4_{dst}")
    for dst in ("nt3", "nt5"):
        b.connect("nt1_npc", f"npc_{dst}")
    for src in ("nt1", "nt3"):
        for dst in ("np4", "np5"):
            b.connect(f"{src}_nt2", f"nt2_{dst}")
    for src in ("nt1", "nt5"):
        for dst in ("np12", "np13"):
            b.connect(f"{src}_nt6", f"nt6_{dst}")
    for src in ("npc", "nt4"):
        for dst in ("np6", "nt2"):
            b.connect(f"{src}_nt3", f"nt3_{dst}")
    for src in ("npc", "nt4"):
        for dst in ("np11", "nt6"):
            b.connect(f"{src}_nt5", f"nt5_{dst}")

    # signals --------------------------------------------------------------
    three = ["GGGrrrrrr", "rrrGGGrrr", "rrrrrrGGG"]
    two = ["GGrr", "rrGG"]

    def links(in_edges, out_map):
        order = []
        for ie in in_edges:
            for oe in out_map[ie]:
                order.append((ie, oe))
        return order

    # nt1: approaches clockwise from north = [np1(S), np2(SW), np3(W)]
    outs1 = {f"np{i}_nt1": ["nt1_nt2", "nt1_nt6", "nt1_npc"] for i in (1, 2, 3)}
    b.add_signal(
        "nt1",
        links(["np1_nt1", "np2_nt1", "np3_nt1"], outs1),
        three,
        [("np1_nt1", 0), ("np2_nt1", 0), ("np3_nt1", 0)],
    )
    # two-phase nodes: link order clockwise from north, ilds alphabetical
    spec2 = {
        "nt2": (["nt3_nt2", "nt1_nt2"], {"nt3_nt2": ["nt2_np4", "nt2_np5"], "nt1_nt2": ["nt2_np4", "nt2_np5"]}),
        "nt3": (["nt4_nt3", "npc_nt3"], {"nt4_nt3": ["nt3_np6", "nt3_nt2"], "npc_nt3": ["nt3_np6", "nt3_nt2"]}),
        "nt4": (["np9_nt4", "np8_nt4"], {"np9_nt4": ["nt4_nt3", "nt4_nt5"], "np8_nt4": ["nt4_nt3", "nt4_nt5"]}),
        "nt5": (["nt4_nt5", "npc_nt5"], {"nt4_nt5": ["nt5_np11", "nt5_nt6"], "npc_nt5": ["nt5_np11", "nt5_nt6"]}),
        "nt6": (["nt5_nt6", "nt1_nt6"], {"nt5_nt6": ["nt6_np12", "nt6_np13"], "nt1_nt6": ["nt6_np12", "nt6_np13"]}),
    }
    for node, (in_edges, outs) in spec2.items():
        ilds = [(e, 0) for e in sorted(in_edges)]  # alphabetical state order
        b.add_signal(node, links(in_edges, outs), two, ilds)

    b.set_neighbor_map(NEIGHBOR_MAP)

    # turn probabilities ---------------------------------------------------
    b.set_turns("np1_nt1", [[("nt1_nt2", 0.2), ("nt1_nt6", 0.5), ("nt1_npc", 0.3)]], 7200)
    b.set_turns("np2_nt1", [[("nt1_nt2", 0.15), ("nt1_nt6", 0.15), ("nt1_npc", 0.7)]], 7200)
    b.set_turns("np3_nt1", [[("nt1_nt2", 0.5), ("nt1_nt6", 0.15), ("nt1_npc", 0.35)]], 7200)
    b.set_turns("np8_nt4", [[("nt4_nt3", 0.4), ("nt4_nt5", 0.6)]], 7200)
    b.set_turns("np9_nt4", [[("nt4_nt3", 0.6), ("nt4_nt5", 0.4)]], 7200)
    b.set_turns("nt3_nt2", [[("nt2_np5", 1.0)]], 7200)
    b.set_turns("nt1_nt2", [[("nt2_np4", 1.0)]], 7200)
    b.set_turns("nt5_nt6", [[("nt6_np12", 1.0)]], 7200)
    b.set_turns("nt1_nt6", [[("nt6_np13", 1.0)]], 7200)
    for e in ("npc_nt3", "nt4_nt3"):
        b.set_turns(e, [[("nt3_nt2", 0.3), ("nt3_np6", 0.7)]], 7200)
    for e in ("npc_nt5", "nt4_nt5"):
        b.set_turns(e, [[("nt5_nt6", 0.3), ("nt5_np11", 0.7)]], 7200)
    # nt1_npc: time-varying split toward nt3/nt5 (build_file.py:278-293)
    base_probs = np.array([[0.15, 0.15], [0.35, 0.35], [0.15, 0.2]])
    npc_bins = []
    for i in range(12):
        p = SRC_FLOWS[:3, i] @ base_probs
        p = p / p.sum()
        npc_bins.append([("npc_nt3", float(p[0])), ("npc_nt5", float(p[1]))])
    b.set_turns("nt1_npc", npc_bins, 600.0)

    # demand ---------------------------------------------------------------
    src_edges = ["np1_nt1", "np2_nt1", "np3_nt1", "np8_nt4", "np9_nt4"]
    for bin_i in range(12):
        t0, t1 = 600.0 * bin_i, 600.0 * (bin_i + 1)
        for j, e in enumerate(src_edges):
            b.add_flow(e, t0, t1, float(SRC_FLOWS[j, bin_i]))
    route_ids = [b.add_route(r) for r in ROUTES]
    for bin_i in range(6):
        t0, t1 = 1200.0 * bin_i, 1200.0 * (bin_i + 1)
        for c in MF_CASES[bin_i]:
            b.add_flow(
                ROUTES[c][0], t0, t1, num_car_hourly,
                route=route_ids[c], mode=FLOW_BERNOULLI,
            )

    spec = b.build()
    # greedy: reference STATE_PHASE_MAP small_grid_env.py:29-30
    gw = np.zeros((6, 3, 3), np.float32)
    gw[0] = np.eye(3)  # nt1: [0,1,2]
    for n in range(1, 6):  # nt2..nt6: [1,0]
        gw[n, 1, 0] = 1.0
        gw[n, 0, 1] = 1.0
    spec.greedy_w = gw
    return spec
