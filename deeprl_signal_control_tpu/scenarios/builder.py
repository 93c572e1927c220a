"""Scenario construction toolkit.

Replaces the reference's XML + external-binary pipeline (build_file.py writes
nod/edg/con/tll XML -> netconvert compiles -> jtrrouter expands flows,
/root/reference/large_grid/data/build_file.py:411-450) with a direct in-memory
compiler producing :class:`NetworkSpec` arrays.

The router replaces SUMO's shortest-path routing of ``<flow from to>`` trips:
Dijkstra over the edge graph with travel-time costs (length / speed limit).
"""

from __future__ import annotations

import heapq
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .spec import (
    FLOW_BERNOULLI,
    FLOW_PERIODIC,
    GREEN_MINOR,
    NetworkSpec,
    compute_link_conflicts,
    encode_phases,
    pad_rows,
)


class NetBuilder:
    def __init__(self, name: str):
        self.name = name
        self._nodes: Dict[str, Tuple[float, float]] = {}
        self._edges: List[dict] = []
        self._edge_id: Dict[str, int] = {}
        # connections[(from_edge, to_edge)] = (from_lane_local, to_lane_local)
        # keyed (from_edge, to_edge, from_lane): SUMO/netconvert allow
        # PARALLEL connections between the same edge pair on different
        # lanes (multi-lane movements, e.g. a 2-lane through street)
        self._conns: Dict[Tuple[str, str, int], int] = {}
        # signalized nodes, in registration order
        self._signals: List[dict] = []
        self._neighbor_map: Dict[str, List[str]] = {}
        self._flows: List[dict] = []
        self._routes: List[List[str]] = []
        self._turns: Dict[str, List[List[Tuple[str, float]]]] = {}
        self._turn_bin_sec = 1e9
        self._sinks: set = set()
        self._det_len: Dict[str, float] = {}
        self.veh = dict(
            veh_len=5.0, veh_accel=5.0, veh_decel=10.0, min_gap=2.5, teleport_sec=600.0
        )

    # -- topology ------------------------------------------------------
    def add_point(self, name: str, x: float, y: float) -> None:
        self._nodes[name] = (float(x), float(y))

    def add_edge(
        self,
        frm: str,
        to: str,
        nlanes: int,
        speed: float,
        length: Optional[float] = None,
    ) -> str:
        """Add directed edge named '<frm>_<to>' (reference edge-id convention)."""
        name = f"{frm}_{to}"
        if length is None:
            (x0, y0), (x1, y1) = self._nodes[frm], self._nodes[to]
            length = float(np.hypot(x1 - x0, y1 - y0))
        self._edge_id[name] = len(self._edges)
        self._edges.append(
            dict(name=name, frm=frm, to=to, nlanes=nlanes, speed=speed, length=length)
        )
        return name

    def connect(self, from_edge: str, to_edge: str, from_lane: int = 0, to_lane: int = 0):
        self._conns[(from_edge, to_edge, from_lane)] = to_lane

    def _conn_key(self, conn) -> Tuple[str, str, int]:
        """Normalize a connection reference: (fe, te) resolves to the
        unique connection between the pair; (fe, te, fl) is exact."""
        if len(conn) == 3:
            return tuple(conn)
        fe, te = conn
        keys = [k for k in self._conns if k[0] == fe and k[1] == te]
        assert len(keys) == 1, (
            f"ambiguous link {conn}: parallel connections {keys}; "
            "use (from_edge, to_edge, from_lane)")
        return keys[0]

    def mark_sink(self, edge: str) -> None:
        self._sinks.add(edge)

    # -- signals -------------------------------------------------------
    def add_signal(
        self,
        node: str,
        link_order: Sequence[Tuple[str, str]],
        phases: Sequence[str],
        ild_lanes: Sequence[Tuple[str, int]],
        det_len: float = 50.0,
    ) -> None:
        """Register a signalized node.

        ``link_order``: connections (from_edge, to_edge) in phase-string
        position order (clockwise from north, the netconvert convention).
        ``phases``: green phase strings over those links ('r/y/g/G').
        ``ild_lanes``: (edge, local_lane) detector lanes in observation order
        (ref: dedup of getControlledLanes, env.py:219-230).
        """
        for p in phases:
            assert len(p) == len(link_order), (node, p)
        self._signals.append(
            dict(
                node=node,
                link_order=list(link_order),
                phases=list(phases),
                ilds=list(ild_lanes),
                det_len=det_len,
            )
        )

    def set_neighbor_map(self, mapping: Dict[str, List[str]]) -> None:
        self._neighbor_map = mapping

    # -- demand --------------------------------------------------------
    def add_route(self, edges: Sequence[str]) -> int:
        self._routes.append(list(edges))
        return len(self._routes) - 1

    def add_flow(
        self,
        edge: str,
        begin: float,
        end: float,
        veh_per_hour: float,
        route: Optional[int] = None,
        mode: int = FLOW_PERIODIC,
    ) -> None:
        if veh_per_hour <= 0:
            return
        self._flows.append(
            dict(
                edge=edge,
                begin=float(begin),
                end=float(end),
                rate=float(veh_per_hour) / 3600.0,
                route=-1 if route is None else int(route),
                mode=mode,
            )
        )

    def set_turns(
        self, edge: str, probs_per_bin: List[List[Tuple[str, float]]], bin_sec: float
    ) -> None:
        """Turn probabilities for turn-routed vehicles leaving ``edge``.

        ``probs_per_bin``: one [(to_edge, prob), ...] list per time bin; a
        single-element list means time-constant.
        """
        self._turns[edge] = probs_per_bin
        if len(probs_per_bin) > 1:
            self._turn_bin_sec = min(self._turn_bin_sec, bin_sec)

    # -- route computation --------------------------------------------
    def shortest_route(self, src_edge: str, dst_edge: str) -> List[str]:
        """Dijkstra over the edge graph, travel-time cost (replaces SUMO's
        routing of <flow from to> trips)."""
        succ: Dict[str, List[str]] = {}
        for (fe, te, _fl) in self._conns:
            if te not in succ.setdefault(fe, []):
                succ[fe].append(te)
        cost = {
            e["name"]: e["length"] / e["speed"] for e in self._edges
        }
        dist = {src_edge: cost[src_edge]}
        prev: Dict[str, str] = {}
        pq = [(dist[src_edge], src_edge)]
        while pq:
            d, e = heapq.heappop(pq)
            if e == dst_edge:
                break
            if d > dist.get(e, np.inf):
                continue
            for nxt in succ.get(e, ()):
                nd = d + cost[nxt]
                if nd < dist.get(nxt, np.inf):
                    dist[nxt] = nd
                    prev[nxt] = e
                    heapq.heappush(pq, (nd, nxt))
        if dst_edge not in dist:
            raise ValueError(f"no route {src_edge} -> {dst_edge}")
        path = [dst_edge]
        while path[-1] != src_edge:
            path.append(prev[path[-1]])
        return path[::-1]

    # -- compilation ---------------------------------------------------
    def build(self) -> NetworkSpec:
        E = len(self._edges)
        # lanes
        lane_length, lane_vmax, lane_edge = [], [], []
        edge_lane_rows: List[List[int]] = []
        for ei, e in enumerate(self._edges):
            lanes = []
            for _ in range(e["nlanes"]):
                lanes.append(len(lane_length))
                lane_length.append(e["length"])
                lane_vmax.append(e["speed"])
                lane_edge.append(ei)
            edge_lane_rows.append(lanes)
        max_lanes = max(len(r) for r in edge_lane_rows)

        def gid(edge_name: str, local_lane: int) -> int:
            return edge_lane_rows[self._edge_id[edge_name]][local_lane]

        # signal links: global ids in node order then local phase position
        link_of_conn: Dict[Tuple[str, str], int] = {}
        link_node, link_pos = [], []
        node_names = [s["node"] for s in self._signals]
        for ni, s in enumerate(self._signals):
            for pos, conn in enumerate(s["link_order"]):
                key = self._conn_key(conn)
                assert key in self._conns, f"phase link {conn} has no connection"
                link_of_conn[key] = len(link_node)
                link_node.append(ni)
                link_pos.append(pos)

        # per-edge outgoing tables
        out_by_edge: Dict[int, List[Tuple[str, str, int]]] = {
            i: [] for i in range(E)}
        for key in self._conns:
            out_by_edge[self._edge_id[key[0]]].append(key)
        C = max(1, max(len(v) for v in out_by_edge.values()))
        eout_edge = np.full((E, C), -1, np.int32)
        eout_from_lane = np.full((E, C), -1, np.int32)
        eout_to_lane = np.full((E, C), -1, np.int32)
        eout_link = np.full((E, C), -1, np.int32)
        slot_of_conn: Dict[Tuple[str, str, int], int] = {}
        for ei in range(E):
            ordered = sorted(
                out_by_edge[ei], key=lambda k: (self._edge_id[k[1]], k[2])
            )
            for c, key in enumerate(ordered):
                fe, te, fl = key
                tl = self._conns[key]
                eout_edge[ei, c] = self._edge_id[te]
                eout_from_lane[ei, c] = gid(fe, fl)
                eout_to_lane[ei, c] = gid(te, tl)
                eout_link[ei, c] = link_of_conn.get(key, -1)
                slot_of_conn[key] = c

        # permissive-green right-of-way conflicts: synthesize per-movement
        # chord endpoints from node coordinates with right-hand-traffic lane
        # offsets (entry on the right side of the approach road, exit on the
        # right side of the departure road; lane 0 = rightmost = largest
        # offset), then test pairwise chord crossings per node.
        n_links_total = len(link_node)
        entry_pts = np.zeros((n_links_total, 2))
        exit_pts = np.zeros((n_links_total, 2))
        link_from_edge = np.zeros(n_links_total, np.int64)
        link_to_lane = np.zeros(n_links_total, np.int64)
        R_JUNC, W0, W1 = 10.0, 4.0, 1.5
        for s in self._signals:
            px, py = self._nodes[s["node"]]
            for conn in s["link_order"]:
                key = self._conn_key(conn)
                li = link_of_conn[key]
                fe, te, fl = key
                tl = self._conns[key]
                link_from_edge[li] = self._edge_id[fe]
                link_to_lane[li] = gid(te, tl)
                for edge_name, lane, is_entry in ((fe, fl, True), (te, tl, False)):
                    e = self._edges[self._edge_id[edge_name]]
                    nb = e["frm"] if is_entry else e["to"]
                    dx, dy = self._nodes[nb][0] - px, self._nodes[nb][1] - py
                    nrm = max(np.hypot(dx, dy), 1e-9)
                    dx, dy = dx / nrm, dy / nrm
                    w = W0 - W1 * min(lane, 2)
                    if is_entry:
                        entry_pts[li] = (R_JUNC * dx - w * dy, R_JUNC * dy + w * dx)
                    else:
                        exit_pts[li] = (R_JUNC * dx + w * dy, R_JUNC * dy - w * dx)
        link_conflict = compute_link_conflicts(
            np.array(link_node, np.int32), entry_pts, exit_pts,
            link_from_edge, link_to_lane,
        )
        # junction-interior traversal distance per connection = chord length
        # (netconvert internal-lane analog)
        eout_via_len = np.zeros((E, C), np.float32)
        for conn, li in link_of_conn.items():
            e, c = self._edge_id[conn[0]], slot_of_conn[conn]
            eout_via_len[e, c] = float(
                np.hypot(*(exit_pts[li] - entry_pts[li]))
            )

        # phase tables
        a_max = max(len(s["phases"]) for s in self._signals)
        lk_max = max(len(s["link_order"]) for s in self._signals)
        phase_table = np.stack(
            [encode_phases(s["phases"], a_max, lk_max) for s in self._signals]
        )
        node_n_a = np.array([len(s["phases"]) for s in self._signals], np.int32)

        # detectors / observation order
        i_max = max(len(s["ilds"]) for s in self._signals)
        node_ild = pad_rows(
            [[gid(e, l) for (e, l) in s["ilds"]] for s in self._signals], i_max
        )
        det_start = np.zeros(len(lane_length), np.float32)
        for s in self._signals:
            for (e, l) in s["ilds"]:
                li = gid(e, l)
                det_start[li] = max(0.0, lane_length[li] - s["det_len"])

        # neighbors
        nidx = {n: i for i, n in enumerate(node_names)}
        nb_max = max((len(v) for v in self._neighbor_map.values()), default=1)
        node_neighbor = pad_rows(
            [
                [nidx[m] for m in self._neighbor_map.get(n, []) if m in nidx]
                for n in node_names
            ],
            nb_max,
        )

        # demand
        F = len(self._flows)
        flow_edge = np.array([self._edge_id[f["edge"]] for f in self._flows], np.int32)
        flow_route = np.array([f["route"] for f in self._flows], np.int32)
        flow_begin = np.array([f["begin"] for f in self._flows], np.float32)
        flow_end = np.array([f["end"] for f in self._flows], np.float32)
        flow_rate = np.array([f["rate"] for f in self._flows], np.float32)
        flow_mode = np.array([f["mode"] for f in self._flows], np.int32)
        if F == 0:
            flow_edge = np.zeros(0, np.int32)

        rl_max = max((len(r) for r in self._routes), default=1)
        route_edges = pad_rows(
            [[self._edge_id[e] for e in r] for r in self._routes], rl_max
        )

        # turn probabilities (time-binned); default: uniform over outgoing
        turn_bin_sec = self._turn_bin_sec if self._turn_bin_sec < 1e9 else 1e9
        tb = 1
        for probs in self._turns.values():
            if len(probs) > 1:
                tb = max(tb, len(probs))
        turn_prob = np.zeros((tb, E, C), np.float32)
        for ei in range(E):
            n_out = int((eout_edge[ei] >= 0).sum())
            if n_out:
                turn_prob[:, ei, :n_out] = 1.0 / n_out
        for edge, probs_per_bin in self._turns.items():
            ei = self._edge_id[edge]
            for b in range(tb):
                probs = probs_per_bin[min(b, len(probs_per_bin) - 1)]
                row = np.zeros(C, np.float32)
                for te, p in probs:
                    slots = [c for k, c in slot_of_conn.items()
                             if k[0] == edge and k[1] == te]
                    for c in slots:
                        row[c] = p / len(slots)
                turn_prob[b, ei] = row / max(row.sum(), 1e-9)

        spec = NetworkSpec(
            name=self.name,
            lane_length=np.array(lane_length, np.float32),
            lane_vmax=np.array(lane_vmax, np.float32),
            lane_edge=np.array(lane_edge, np.int32),
            edge_nlanes=np.array([e["nlanes"] for e in self._edges], np.int32),
            edge_lane=pad_rows(edge_lane_rows, max_lanes),
            edge_is_sink=np.array(
                [e["name"] in self._sinks for e in self._edges], bool
            ),
            eout_edge=eout_edge,
            eout_from_lane=eout_from_lane,
            eout_to_lane=eout_to_lane,
            eout_link=eout_link,
            node_names=node_names,
            node_n_a=node_n_a,
            phase_table=phase_table,
            link_node=np.array(link_node, np.int32),
            link_pos=np.array(link_pos, np.int32),
            node_neighbor=node_neighbor,
            node_ild=node_ild,
            det_start=det_start,
            flow_edge=flow_edge,
            flow_route=flow_route,
            flow_begin=flow_begin,
            flow_end=flow_end,
            flow_rate=flow_rate,
            flow_mode=flow_mode,
            route_edges=route_edges,
            turn_prob=turn_prob,
            turn_bin_sec=turn_bin_sec,
            # only carry the conflict table when a 'g' code exists — the
            # engine skips the yielding pass entirely otherwise
            link_conflict=(
                link_conflict if (phase_table == GREEN_MINOR).any() else None
            ),
            eout_via_len=eout_via_len,
            **self.veh,
        )
        spec.validate()
        return spec
