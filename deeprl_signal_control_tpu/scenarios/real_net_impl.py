"""Monaco (MoST) real-network scenario compiler.

Parses the reference's static SUMO assets once —
``real_net/data/in/most.net.xml`` (585 normal edges, 1043 lanes, 28
signalized junctions, ref /root/reference/envs/real_net_env.py) — into
NetworkSpec arrays, replacing the live TraCI topology negotiation
(env.py:207-242).

Scenario facts reproduced from the reference:

* ``NODES``: per-signal phase-set key + neighbor lists
  (real_net_env.py:20-47); ``PHASES``: 15 distinct phase sets of 2-6 phases
  (real_net_env.py:49-68). Link order = linkIndex from the net.xml tls
  connections.
* Observations are wave-only (STATE_NAMES, real_net_env.py:18), measured on
  the full controlled lane (sim.lane.*, env.py:377), queue capped at 10
  (env.py:333); teleport after 300 s (env.py:284).
* Demand: the hand-picked OD flows with via-routes and the vols_a/vols_b
  300 s ramp profiles (real_net/data/build_file.py:15-105), scaled by
  ``flow_rate``; routes expanded by the native Dijkstra router (the
  reference leaves routing to SUMO).

Simplification (round 1): where a signalized movement spans several parallel
lanes, routed vehicles take the lowest-linkIndex connection; the extra lanes
still exist, carry detectors, and appear in the observation/action contract.
"""

from __future__ import annotations

import os
import xml.etree.cElementTree as ET

import numpy as np

from ..native import EdgeGraphRouter
from .spec import NetworkSpec, encode_phases, pad_rows

NET_XML = "/root/reference/real_net/data/in/most.net.xml"

# (phase key, neighbor list) per signalized node — real_net_env.py:20-47
NODES = {
    "10026": ("6.0", ["9431", "9561", "cluster_9563_9597", "9531"]),
    "8794": ("4.0", ["cluster_8985_9609", "9837", "9058", "cluster_9563_9597"]),
    "8940": ("2.1", ["9007", "9429"]),
    "8996": ("2.2", ["cluster_9389_9689", "9713"]),
    "9007": ("2.3", ["9309", "8940"]),
    "9058": ("4.0", ["cluster_8985_9609", "8794", "joinedS_0"]),
    "9153": ("2.0", ["9643"]),
    "9309": ("4.0", ["9466", "9007", "cluster_9043_9052"]),
    "9413": ("2.3", ["9721", "9837"]),
    "9429": ("5.0", ["cluster_9043_9052", "joinedS_1", "8940"]),
    "9431": ("2.4", ["9721", "9884", "9561", "10026"]),
    "9433": ("2.5", ["joinedS_1"]),
    "9466": ("4.0", ["9309", "joinedS_0", "cluster_9043_9052"]),
    "9480": ("2.3", ["8996", "9713"]),
    "9531": ("2.6", ["joinedS_1", "10026"]),
    "9561": ("4.0", ["cluster_9389_9689", "10026", "9431", "9884"]),
    "9643": ("2.3", ["9153"]),
    "9713": ("3.0", ["9721", "9884", "8996"]),
    "9721": ("6.0", ["9431", "9713", "9413"]),
    "9837": ("3.1", ["9413", "8794", "cluster_8985_9609"]),
    "9884": ("2.7", ["9713", "9431", "cluster_9389_9689", "9561"]),
    "cluster_8751_9630": ("4.0", ["cluster_9389_9689"]),
    "cluster_8985_9609": ("4.0", ["9837", "8794", "9058"]),
    "cluster_9043_9052": ("4.1", ["cluster_9563_9597", "9466", "9309", "10026",
                                  "joinedS_1"]),
    "cluster_9389_9689": ("4.0", ["9884", "9561", "cluster_8751_9630", "8996"]),
    "cluster_9563_9597": ("4.2", ["10026", "8794", "joinedS_0",
                                  "cluster_9043_9052"]),
    "joinedS_0": ("6.1", ["9058", "cluster_9563_9597", "9466"]),
    "joinedS_1": ("3.2", ["9531", "9429"]),
}

# phase sets — real_net_env.py:49-68
PHASES = {
    "4.0": ["GGgrrrGGgrrr", "rrrGGgrrrGGg", "rrGrrrrrGrrr", "rrrrrGrrrrrG"],
    "4.1": ["GGgrrGGGrrr", "rrGrrrrrrrr", "rrrGgrrrGGg", "rrrrGrrrrrG"],
    "4.2": ["GGGGrrrrrrrr", "GGggrrGGggrr", "rrrGGGGrrrrr", "grrGGggrrGGg"],
    "2.0": ["GGrrr", "ggGGG"],
    "2.1": ["GGGrrr", "rrGGGg"],
    "2.2": ["Grr", "gGG"],
    "2.3": ["GGGgrr", "GrrrGG"],
    "2.4": ["GGGGrr", "rrrrGG"],
    "2.5": ["Gg", "rG"],
    "2.6": ["GGGg", "rrrG"],
    "2.7": ["GGg", "rrG"],
    "3.0": ["GGgrrrGGg", "rrGrrrrrG", "rrrGGGGrr"],
    "3.1": ["GgrrGG", "rGrrrr", "rrGGGr"],
    "3.2": ["GGGGrrrGG", "rrrrGGGGr", "GGGGrrGGr"],
    "5.0": ["GGGGgrrrrGGGggrrrr", "grrrGrrrrgrrGGrrrr", "GGGGGrrrrrrrrrrrrr",
            "rrrrrrrrrGGGGGrrrr", "rrrrrGGggrrrrrggGg"],
    "6.0": ["GGGgrrrGGGgrrr", "rrrGrrrrrrGrrr", "GGGGrrrrrrrrrr",
            "rrrrrrrrrrGGGG", "rrrrGGgrrrrGGg", "rrrrrrGrrrrrrG"],
    "6.1": ["GGgrrGGGrrrGGGgrrrGGGg", "rrGrrrrrrrrrrrGrrrrrrG",
            "GGGrrrrrGGgrrrrGGgrrrr", "GGGrrrrrrrGrrrrrrGrrrr",
            "rrrGGGrrrrrrrrrrrrGGGG", "rrrGGGrrrrrGGGgrrrGGGg"],
}

# demand (real_net/data/build_file.py:15-105): (src, sink, via) per group
FLOW_GROUPS = [
    [("-10114#1", "-10079", "10115#2 -10109"),
     ("-10114#1", "-10079", "-10114#0 10108#0 gneE5"),
     ("-10114#1", "-10079", "-10114#0 10108#0 10102"),
     ("-10114#1", "10076", "-10114#0 10107 10102")],
    [("10096#1", "10063", "10089#3"),
     ("-10185#1", "-10071#3", "gneE20"),
     ("10096#1", "10063", "10109"),
     ("-10185#1", "-10061#5", "gneE19")],
    [("10052#1", "10104", "10181#1 -10089#3"),
     ("-10064#9", "10104", "-10068 10102"),
     ("-10051#2", "10043", "10181#1 gneE4"),
     ("-10064#9", "-10110", "-10064#4 -10064#3")],
    [("10061#4", "-10085", "10065#2 10102"),
     ("10071#3", "10085", "10065#2 -10064#3"),
     ("-10070#1", "-10086", "gneE9"),
     ("-10063", "10085", "gneE8")],
]
VOLS_A = [1, 2, 4, 4, 4, 4, 2, 1, 0, 0, 0]
VOLS_B = [0, 0, 0, 1, 2, 4, 4, 4, 4, 2, 1]

# The reference repo's *shipped* real_net evaluation CSVs
# (real_net_experimental_data/eva_data) were generated with an OLDER demand
# still present as comments in real_net/data/build_file.py:21-71: six flows
# per group with longer via-routes, vols peaking at 6, and random per-bin
# flow selection. Verifiable from the trip ids in the shipped CSVs (bin 0
# has 4 flows = old vols_a[0]*2; bin 3 has 14 = 6*2 + 1*2). Selecting
# ENV_CONFIG ``demand = legacy`` reproduces that demand (with deterministic
# first-N flow selection in place of np.random.choice) so the engine can be
# calibrated against the shipped SUMO ground truth.
LEGACY_FLOW_GROUPS = [
    [("-10114#1", "-10079", "10115#2 -10109 10089#3 -10116"),
     ("-10114#1", "-10079", "-10114#0 10108#0 10108#5 -10090#1 gneE18"),
     ("-10114#1", "-10079", "-10114#0 10108#0 10108#5 gneE5 gneE18"),
     ("-10114#1", "10076", "-10114#0 10108#0 -10067#1 gneE9 gneE18"),
     ("-10114#1", "10076", "-10114#0 10107 10080#0 gneE12 10102"),
     ("-10114#1", "10180#1", "-10114#0 10108#0 -10104 10115#5 -10090#1")],
    [("10096#1", "10063", "10089#3 10091 gneE12 -10065#2"),
     ("10096#1", "10063", "10089#3 gneE4 -10090#1 gneE10"),
     ("-10095", "-10071#3", "10109 10106#3 10115#5 -10080#0"),
     ("-10185#1", "-10071#3", "gneE20 gneE13 -10046#0 -10090#1"),
     ("-10185#1", "-10061#5", "gneE19 -10046#5 10089#4 gneE12"),
     ("10197#1", "-10061#5", "10089#3 -10049 10043 10053#0")],
    [("10052#1", "10104", "10181#1 10116 -10089#3 10109"),
     ("10052#1", "10104", "10181#1 -10089#4 gneE4 gneE7"),
     ("-10051#2", "10043", "10179 10181#1 10116 -10089#3 10109"),
     ("-10051#2", "10043", "10179 10181#1 -10089#4 gneE4 gneE7"),
     ("-10051#2", "-10110", "-10051#0 10181#1 -10089#4 gneE4 -10115#5"),
     ("-10051#2", "-10110", "-10051#0 10181#1 -10089#3 -10049")],
    [("-10064#9", "-10085", "-10068 -10064#3 gneE5 10046#0"),
     ("-10064#9", "10085", "-10064#4 -10064#3 gneE5 10046#0"),
     ("-10064#9", "-10086", "-10064#4 10102 10031#1 10046#0"),
     ("10061#4", "-10085", "10065#2 10102 10031#1 10046#0"),
     ("10069#0", "10085", "10065#2 -10064#3 gneE5 10046#0"),
     ("-10058#0", "-10086", "10071#5 10108#5 gneE5 10046#0")],
]
LEGACY_VOLS_A = [2, 3, 4, 6, 4, 2, 1, 0, 0, 0, 0]
LEGACY_VOLS_B = [0, 0, 0, 1, 2, 3, 5, 4, 3, 2, 1]


SEG_LEN = 150.0  # split longer edges into chained segments (memory bound:
# slots-per-lane K follows the longest lane; chaining keeps K ~ 22 instead of
# ~120 for the 878 m Monaco arterials, with an uncontrolled always-green link
# between segments)


def build(env_config) -> NetworkSpec:
    flow_rate = getattr(env_config, "flow_rate", 325)
    root = ET.parse(NET_XML).getroot()

    # ---- edges & lanes (with long-edge segmentation) -----------------
    edges = []  # segment names
    edge_id = {}  # segment name -> idx
    seg_first = {}  # original edge id -> first segment name
    seg_last = {}  # original edge id -> last segment name
    seg_chain = {}  # original edge id -> [segment names]
    lane_length, lane_vmax, lane_edge = [], [], []
    edge_lane_rows = []
    chain_conns = []  # (from_seg, to_seg, lane_local) uncontrolled links

    shape_ends = {}  # (orig edge id, local lane) -> (first_pt, last_pt)

    for e in root:
        if e.tag != "edge" or e.get("function") == "internal":
            continue
        eid = e.get("id")
        lanes = sorted(
            (l for l in e if l.tag == "lane"), key=lambda l: int(l.get("index"))
        )
        for li, l in enumerate(lanes):
            pts = [tuple(map(float, p.split(","))) for p in l.get("shape").split()]
            shape_ends[(eid, li)] = (pts[0][:2], pts[-1][:2])
        lens = [max(float(l.get("length")), 1.0) for l in lanes]
        speeds = [float(l.get("speed")) for l in lanes]
        n_seg = max(1, int(np.ceil(max(lens) / SEG_LEN)))
        names = [eid if n_seg == 1 else f"{eid}@seg{k}" for k in range(n_seg)]
        seg_chain[eid] = names
        seg_first[eid], seg_last[eid] = names[0], names[-1]
        for k, name in enumerate(names):
            edge_id[name] = len(edges)
            row = []
            for li in range(len(lanes)):
                row.append(len(lane_length))
                lane_length.append(lens[li] / n_seg)
                lane_vmax.append(speeds[li])
                lane_edge.append(edge_id[name])
            edges.append(name)
            edge_lane_rows.append(row)
            if k > 0:
                for li in range(len(lanes)):
                    chain_conns.append((names[k - 1], name, li))
    E = len(edges)
    L = len(lane_length)

    # det_chain: every segment lane counts toward the final segment's lane,
    # so full-lane measures (wave/queue via sim.lane.*, ref env.py:377,
    # 332-333) cover the whole original lane despite segmentation
    det_chain = np.full(L, -1, np.int32)
    for eid, segs in seg_chain.items():
        if len(segs) < 2:
            continue
        last_row = edge_lane_rows[edge_id[segs[-1]]]
        for seg in segs[:-1]:
            for li, gl in enumerate(edge_lane_rows[edge_id[seg]]):
                det_chain[gl] = last_row[li]

    # ---- connections --------------------------------------------------
    # per-edge outgoing slots; keep every connection (multi-lane movements
    # occupy separate slots). TLS connections remember (node, linkIndex).
    conns_by_edge = {i: [] for i in range(E)}
    by_from_lane = {}  # (orig edge, local lane) -> [rec, ...] in doc order
    tls_links = {n: {} for n in NODES}  # node -> linkIndex -> conn tuple
    for c in root:
        if c.tag != "connection":
            continue
        fe, te = c.get("from"), c.get("to")
        if fe.startswith(":") or fe not in seg_last or te not in seg_first:
            continue
        # junction connections depart the LAST segment, arrive on the FIRST
        fe_seg, te_seg = seg_last[fe], seg_first[te]
        fl, tl = int(c.get("fromLane")), int(c.get("toLane"))
        from_lane = edge_lane_rows[edge_id[fe_seg]][fl]
        to_lane = edge_lane_rows[edge_id[te_seg]][tl]
        p_in, p_out = shape_ends[(fe, fl)][1], shape_ends[(te, tl)][0]
        rec = dict(fe=edge_id[fe_seg], te=edge_id[te_seg], from_lane=from_lane,
                   to_lane=to_lane, link=-1,
                   # movement chord endpoints for right-of-way conflicts and
                   # junction-interior traversal distance: stop line = end of
                   # the from-lane shape, junction exit = start of the
                   # to-lane shape
                   entry=p_in, exit=p_out,
                   via=float(np.hypot(p_out[0] - p_in[0], p_out[1] - p_in[1])))
        tl_node = c.get("tl")
        if tl_node in NODES:
            tls_links[tl_node][int(c.get("linkIndex"))] = rec
        conns_by_edge[edge_id[fe_seg]].append(rec)
        by_from_lane.setdefault((fe, fl), []).append(rec)
    # uncontrolled chaining links between segments of split edges
    for fe_seg, te_seg, li in chain_conns:
        conns_by_edge[edge_id[fe_seg]].append(dict(
            fe=edge_id[fe_seg], te=edge_id[te_seg],
            from_lane=edge_lane_rows[edge_id[fe_seg]][li],
            to_lane=edge_lane_rows[edge_id[te_seg]][li], link=-1,
        ))

    # ---- signals ------------------------------------------------------
    node_names = sorted(NODES)  # reference sorts node names (env.py:232)
    link_node, link_pos, link_recs = [], [], []
    for ni, name in enumerate(node_names):
        key = NODES[name][0]
        phases = PHASES[key]
        links = tls_links[name]
        assert len(links) == len(phases[0]), (
            name, len(links), len(phases[0])
        )
        for pos in sorted(links):
            rec = links[pos]
            rec["link"] = len(link_node)
            link_node.append(ni)
            link_pos.append(pos)
            link_recs.append(rec)

    # ---- right-of-way from the net's junction <request> tables --------
    # SUMO encodes exact conflicts per junction: ``foes`` = geometric
    # crossings, ``response`` = directed must-yield bits (rightmost char =
    # link 0). Junction link order = connections grouped by incLanes order
    # (validated: reproduces every tls linkIndex in most.net.xml).
    # * the 28 RL-controlled tls junctions get symmetric conflicts from
    #   ``foes`` (runtime G/g codes decide who yields);
    # * priority / right_before_left junctions (and the 2 tls junctions the
    #   reference does not control) get STATIC links: code 3 = major,
    #   code 2 = yields, with directed conflicts from ``response``.
    n_tls = len(link_node)
    prio_codes = []
    pairs = []  # (row yields-to col) over extended global link ids
    n_skipped = 0
    for j in root:
        if j.tag != "junction":
            continue
        typ = j.get("type")
        is_rl_tls = typ == "traffic_light" and j.get("id") in NODES
        if typ not in ("priority", "right_before_left", "traffic_light"):
            continue
        ordered = []
        for lane in (j.get("incLanes") or "").split():
            if lane.startswith(":"):
                continue
            fe, fl = lane.rsplit("_", 1)
            ordered += by_from_lane.get((fe, int(fl)), [])
        reqs = {int(r.get("index")): (r.get("response"), r.get("foes"))
                for r in j if r.tag == "request"}
        if len(ordered) != len(reqs):
            n_skipped += 1
            continue  # alignment failed; leave uncontrolled
        if is_rl_tls:
            for i, rec in enumerate(ordered):
                foes = reqs[i][1]
                for k in range(len(ordered)):
                    if foes[-1 - k] == "1":
                        pairs.append((rec["link"], ordered[k]["link"]))
        else:
            for i, rec in enumerate(ordered):
                rec["link"] = n_tls + len(prio_codes)
                prio_codes.append(2 if "1" in reqs[i][0] else 3)
            for i, rec in enumerate(ordered):
                resp = reqs[i][0]
                for k in range(len(ordered)):
                    if resp[-1 - k] == "1":
                        pairs.append((rec["link"], ordered[k]["link"]))
    # link-order reconstruction must align everywhere (233/233 junctions on
    # most.net.xml); a silent skip would leave a junction uncontrolled and a
    # stale link == -1 would scatter into row -1 of the conflict matrix
    assert n_skipped == 0, (
        f"{n_skipped} junctions failed <request> link-order alignment"
    )
    assert all(a >= 0 and b >= 0 for a, b in pairs), "unassigned link id in pairs"
    n_ext = n_tls + len(prio_codes)
    link_conflict = np.zeros((n_ext, n_ext), bool)
    for a, b in pairs:
        link_conflict[a, b] = True
        if a < n_tls and b < n_tls:
            link_conflict[b, a] = True  # tls foes are symmetric

    C = max(1, max(len(v) for v in conns_by_edge.values()))
    eout_edge = np.full((E, C), -1, np.int32)
    eout_from = np.full((E, C), -1, np.int32)
    eout_to = np.full((E, C), -1, np.int32)
    eout_link = np.full((E, C), -1, np.int32)
    eout_via = np.zeros((E, C), np.float32)
    for ei, recs in conns_by_edge.items():
        for ci, rec in enumerate(recs):
            eout_edge[ei, ci] = rec["te"]
            eout_from[ei, ci] = rec["from_lane"]
            eout_to[ei, ci] = rec["to_lane"]
            eout_link[ei, ci] = rec["link"]
            eout_via[ei, ci] = rec.get("via", 0.0)

    # ---- observation: ilds = dedup controlled lanes in link order ------
    node_ild_rows, greedy_rows = [], []
    a_max = max(len(PHASES[NODES[n][0]]) for n in node_names)
    for name in node_names:
        links = tls_links[name]
        ilds = []
        for pos in sorted(links):
            fl = links[pos]["from_lane"]
            if fl not in ilds:
                ilds.append(fl)
        node_ild_rows.append(ilds)
        # greedy: green-wave score per phase, each ild counted once
        # (RealNetController.greedy, real_net_env.py:90-111)
        phases = PHASES[NODES[name][0]]
        gw = np.zeros((a_max, len(ilds)), np.float32)
        for a, ph in enumerate(phases):
            seen = set()
            for pos, ch in enumerate(ph):
                if ch == "G":
                    fl = links[pos]["from_lane"]
                    if fl not in seen:
                        seen.add(fl)
                        gw[a, ilds.index(fl)] = 1.0
        greedy_rows.append(gw)
    i_max = max(len(r) for r in node_ild_rows)
    node_ild = pad_rows(node_ild_rows, i_max)
    greedy_w = np.zeros((len(node_names), a_max, i_max), np.float32)
    for n, gw in enumerate(greedy_rows):
        greedy_w[n, :, : gw.shape[1]] = gw

    lk_max = max(len(tls_links[n]) for n in node_names)
    phase_table = np.stack([
        encode_phases(PHASES[NODES[n][0]], a_max, lk_max) for n in node_names
    ])
    node_n_a = np.array(
        [len(PHASES[NODES[n][0]]) for n in node_names], np.int32
    )
    nidx = {n: i for i, n in enumerate(node_names)}
    nb_max = max(len(v[1]) for v in NODES.values())
    node_neighbor = pad_rows(
        [[nidx[m] for m in NODES[n][1]] for n in node_names], nb_max
    )

    # ---- demand -------------------------------------------------------
    succ = [[] for _ in range(E)]
    for ei, recs in conns_by_edge.items():
        for rec in recs:
            if rec["te"] not in succ[ei]:
                succ[ei].append(rec["te"])
    cost = [
        lane_length[edge_lane_rows[e][0]] / max(lane_vmax[edge_lane_rows[e][0]], 1.0)
        for e in range(E)
    ]
    router = EdgeGraphRouter(E, succ, cost)

    route_cache = {}
    route_rows = []

    def route_id(src, sink, via):
        key = (src, sink, via)
        if key not in route_cache:
            wp = [edge_id[seg_first[src]]] + [
                edge_id[seg_first[v]] for v in via.split()
            ] + [edge_id[seg_last[sink]]]
            route_rows.append(router.route_via(wp))
            route_cache[key] = len(route_rows) - 1
        return route_cache[key]

    legacy = getattr(env_config, "demand", "current") == "legacy"
    groups = LEGACY_FLOW_GROUPS if legacy else FLOW_GROUPS
    va = LEGACY_VOLS_A if legacy else VOLS_A
    vb = LEGACY_VOLS_B if legacy else VOLS_B
    flow_edge, flow_route, flow_begin, flow_end, flow_rates = [], [], [], [], []
    times = np.arange(0, 3301, 300)
    for i in range(len(times) - 1):
        t0, t1 = float(times[i]), float(times[i + 1])
        for g, vols in ((0, va), (1, va), (2, vb), (3, vb)):
            vol = vols[i]
            for ind in range(vol):
                src, sink, via = groups[g][ind]
                flow_edge.append(edge_id[seg_first[src]])
                flow_route.append(route_id(src, sink, via))
                flow_begin.append(t0)
                flow_end.append(t1)
                flow_rates.append(flow_rate / 3600.0)

    rl_max = max(len(r) for r in route_rows)
    route_edges = pad_rows(route_rows, rl_max)

    # uniform turn probabilities (no turn-routed vehicles in this scenario)
    turn_prob = np.zeros((1, E, C), np.float32)
    for ei in range(E):
        n_out = int((eout_edge[ei] >= 0).sum())
        if n_out:
            turn_prob[0, ei, :n_out] = 1.0 / n_out

    spec = NetworkSpec(
        name="real_net",
        lane_length=np.asarray(lane_length, np.float32),
        lane_vmax=np.asarray(lane_vmax, np.float32),
        lane_edge=np.asarray(lane_edge, np.int32),
        edge_nlanes=np.asarray([len(r) for r in edge_lane_rows], np.int32),
        edge_lane=pad_rows(edge_lane_rows, max(len(r) for r in edge_lane_rows)),
        edge_is_sink=np.zeros(E, bool),
        eout_edge=eout_edge,
        eout_from_lane=eout_from,
        eout_to_lane=eout_to,
        eout_link=eout_link,
        node_names=node_names,
        node_n_a=node_n_a,
        phase_table=phase_table,
        link_node=np.asarray(link_node, np.int32),
        link_pos=np.asarray(link_pos, np.int32),
        node_neighbor=node_neighbor,
        node_ild=node_ild,
        det_start=np.zeros(L, np.float32),  # full-lane measures (env.py:377)
        flow_edge=np.asarray(flow_edge, np.int32),
        flow_route=np.asarray(flow_route, np.int32),
        flow_begin=np.asarray(flow_begin, np.float32),
        flow_end=np.asarray(flow_end, np.float32),
        flow_rate=np.asarray(flow_rates, np.float32),
        flow_mode=np.zeros(len(flow_edge), np.int32),
        route_edges=route_edges,
        turn_prob=turn_prob,
        turn_bin_sec=1e9,
        teleport_sec=300.0,  # env.py:284
        use_wait_state=False,  # STATE_NAMES wave-only
        queue_cap=10.0,  # env.py:333
        greedy_w=greedy_w,
        link_conflict=link_conflict,
        det_chain=det_chain,
        eout_via_len=eout_via,
        prio_link_code=np.asarray(prio_codes, np.int8),
    )
    spec.validate()
    return spec
