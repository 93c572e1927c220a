"""Compiled static network description: the contract between scenario
compilers and the JAX microsim engine.

This replaces the reference's external toolchain — netconvert/jtrrouter XML
networks plus live TraCI topology queries (/root/reference/envs/env.py:207-242,
large_grid/data/build_file.py, small_grid/data/build_file.py) — with one
in-memory bundle of numpy arrays. Everything the jitted simulator touches is a
fixed-shape array here; the builder (plain Python) runs once per scenario.

Conventions
-----------
* Lanes are the simulation unit. Lanes of an edge occupy contiguous ids,
  lane 0 = rightmost.
* Outgoing connectivity is stored per-edge in fixed-width slots ``C_OUT``:
  ``eout_edge[e, c]`` is the c-th outgoing edge of ``e`` (-1 pad), with the
  from/to lanes and the traffic-signal link index controlling that movement.
* Signalized movements are global "links". Per node, links are ordered
  clockwise starting from the north approach (netconvert's ordering, which
  the reference's hand-written phase strings assume — see the decode of
  'GGgrrrGGgrrr' in scenarios/large_grid.py).
* Phase tables store per (node, action, local link) a signal code
  ``0=r, 1=y, 2=g (permissive), 3=G (protected)`` with -1 padding.
  Yellow phases are *not* stored: the engine derives them from
  (prev_action, action) exactly like env.py:128-152.
* Observations: per node an ordered list of detector lanes ("ilds",
  ref env.py:224-230); detector spans per lane.
* Demand: fixed-width flow table (entry edge, optional fixed route id,
  [begin, end) seconds, veh/s rate, insertion mode) + a route table and
  per-edge turn-probability table for jtrrouter-style probabilistic routing.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

# signal codes
RED, YELLOW, GREEN_MINOR, GREEN_MAJOR = 0, 1, 2, 3

# flow insertion modes
FLOW_PERIODIC = 0  # SUMO vehsPerHour: evenly spaced departures
FLOW_BERNOULLI = 1  # SUMO probability flows: Bernoulli per second


@dataclasses.dataclass
class NetworkSpec:
    name: str

    # --- lanes ---
    lane_length: np.ndarray  # [L] f32, metres
    lane_vmax: np.ndarray  # [L] f32, m/s
    lane_edge: np.ndarray  # [L] i32 edge id

    # --- edges ---
    edge_nlanes: np.ndarray  # [E] i32
    edge_lane: np.ndarray  # [E, max_lanes_per_edge] i32 lane ids, -1 pad
    edge_is_sink: np.ndarray  # [E] bool — vehicles arriving here despawn at edge end

    # --- outgoing connections, per edge (C_OUT slots) ---
    eout_edge: np.ndarray  # [E, C] i32 to-edge, -1 pad
    eout_from_lane: np.ndarray  # [E, C] i32 global lane id the movement departs from
    eout_to_lane: np.ndarray  # [E, C] i32 global lane id the movement arrives on
    eout_link: np.ndarray  # [E, C] i32 global signal link id, -1 = uncontrolled

    # --- signalized nodes ---
    node_names: List[str]
    node_n_a: np.ndarray  # [N] i32 number of green phases (actions)
    phase_table: np.ndarray  # [N, A_max, LK_max] i8 signal codes, -1 pad
    link_node: np.ndarray  # [n_links] i32 owning node
    link_pos: np.ndarray  # [n_links] i32 local index within node's phase string
    node_neighbor: np.ndarray  # [N, NB_max] i32 node ids, -1 pad

    # --- observation (induction-loop detectors) ---
    node_ild: np.ndarray  # [N, I_max] i32 lane ids in state order, -1 pad
    det_start: np.ndarray  # [L] f32 detector start position (end = lane end)

    # --- demand ---
    flow_edge: np.ndarray  # [F] i32 entry edge
    flow_route: np.ndarray  # [F] i32 route id, -1 = turn-probability routing
    flow_begin: np.ndarray  # [F] f32 sec
    flow_end: np.ndarray  # [F] f32 sec
    flow_rate: np.ndarray  # [F] f32 veh per second
    flow_mode: np.ndarray  # [F] i32 FLOW_PERIODIC | FLOW_BERNOULLI
    route_edges: np.ndarray  # [R, RL_max] i32 edge ids, -1 pad
    turn_prob: np.ndarray  # [TB, E, C] f32 prob of taking eout slot c
    turn_bin_sec: float  # width of the turn-probability time bins

    # --- vehicle model ---
    veh_len: float = 5.0  # vType length (build_file vType length="5")
    veh_accel: float = 5.0  # accel="5"
    veh_decel: float = 10.0  # decel="10"
    min_gap: float = 2.5  # SUMO default minGap
    teleport_sec: float = 600.0  # --time-to-teleport (env.py:281-284)

    # 'wait' participates in the state for the grid scenarios but not
    # real_net (STATE_NAMES, small_grid_env.py:27 vs real_net_env.py:18)
    use_wait_state: bool = True
    # real_net caps per-lane queue at 10 and reads full-lane detectors
    # (env.py:332-333)
    queue_cap: float = -1.0
    # optional cap on vehicle slots per lane (long-lane memory bound);
    # 0 = derive from the longest lane
    k_cap: int = 0

    # --- controller (greedy baseline) ---
    # action = argmax_a sum_i greedy_w[n, a, i] * wave[n, i]  (masked to n_a)
    greedy_w: Optional[np.ndarray] = None  # [N, A_max, I_max] f32

    # --- permissive-green ('g') yielding ---
    # [n_links, n_links] bool: link i must yield to link j when i shows 'g'
    # and j shows 'G' with a vehicle approaching (SUMO right-of-way foes,
    # assumed by the reference phase strings e.g. large_grid_env.py:38-43).
    # None = no yielding (no 'g' codes in the scenario).
    link_conflict: Optional[np.ndarray] = None
    # seconds a yielding driver waits at a permissive green before taking a
    # gap anyway (SUMO impatience analog; bounds 'g' starvation)
    yield_impatience_sec: float = 15.0
    # Krauss driver-imperfection analog (SUMO vType sigma, default 0.5 when
    # unset — the reference's build_file vTypes never set it): each second
    # every vehicle's desired speed drops by U(0,1) * sigma * accel. 0
    # disables dawdling (the engine's historical behavior; grids keep 0).
    dawdle_sigma: float = 0.0
    # limit dawdling to vehicles that cannot reach the stop line within
    # ~2 s, so the calibrated discharge headway is not double-counted
    # (see CALIBRATION.md round-4 sweep)
    dawdle_exempt_stopline: bool = False
    # mean stop-line discharge headway in seconds (1.0 <= h <= 2.0). The
    # 1 s-quantized engine realizes fractional headways stochastically: after
    # an exit, the next exit from that lane is blocked for one second with
    # probability (h - 1). Calibrated to 1.25 s against the reference's
    # shipped real_net greedy evaluation data (tools/calibrate_greedy.py
    # sweep over {1.0, 1.25, 1.35, 1.5, 2.0}; see CALIBRATION.md).
    discharge_headway_sec: float = 1.25

    # optional [L] map: lane -> the ild lane its vehicles also count toward
    # (-1 = none). Used when long edges are split into chained segments so
    # full-lane measures (real_net sim.lane.*, ref env.py:377) cover the
    # whole original lane, not just the final segment.
    det_chain: Optional[np.ndarray] = None

    # optional [E, C] junction-interior traversal distance (metres) of each
    # connection — the length of SUMO's internal lane. A transferring
    # vehicle enters the target lane at position (overshoot - via_len), i.e.
    # negative while crossing the junction box; None = instantaneous
    # crossings.
    eout_via_len: Optional[np.ndarray] = None

    # unsignalized right-of-way: connections at priority junctions get
    # "static links" with ids in [n_links, n_links + n_prio) and a fixed
    # signal code each — 3 ('G', major) or 2 ('g', must yield). Their
    # conflicts live in link_conflict (which then has n_links + n_prio
    # rows, and may be DIRECTED: row i yields to column j). Parsed from the
    # SUMO junction <request response=...> bitmasks for real_net.
    prio_link_code: Optional[np.ndarray] = None  # [n_prio] i8

    # --- initial-density seeding (large_grid init_routes,
    # build_file.py:223-266): lanes eligible for t=0 vehicle placement and
    # the per-lane max count scaled by ENV_CONFIG init_density.
    init_lanes: Optional[np.ndarray] = None  # [n_init] i32 global lane ids
    init_max_car: int = 30  # MAX_CAR_NUM (large_grid_env.py:35 comment)

    # ------------------------------------------------------------------
    @property
    def n_lanes(self) -> int:
        return int(self.lane_length.shape[0])

    @property
    def n_edges(self) -> int:
        return int(self.edge_nlanes.shape[0])

    @property
    def n_nodes(self) -> int:
        return len(self.node_names)

    @property
    def n_links(self) -> int:
        return int(self.link_node.shape[0])

    @property
    def n_a_ls(self) -> List[int]:
        return [int(a) for a in self.node_n_a]

    @property
    def n_ild_ls(self) -> List[int]:
        return [int((row >= 0).sum()) for row in self.node_ild]

    def validate(self) -> None:
        L, E, N = self.n_lanes, self.n_edges, self.n_nodes
        assert self.lane_vmax.shape == (L,) and self.lane_edge.shape == (L,)
        assert self.eout_edge.shape == self.eout_from_lane.shape
        assert self.eout_edge.shape == self.eout_to_lane.shape
        assert self.eout_edge.shape == self.eout_link.shape
        assert self.phase_table.shape[0] == N
        assert self.node_ild.shape[0] == N
        assert int(self.lane_edge.max()) < E
        # every from_lane belongs to its edge
        valid = self.eout_edge >= 0
        e_idx = np.broadcast_to(np.arange(E)[:, None], self.eout_edge.shape)
        assert (self.lane_edge[self.eout_from_lane[valid]] == e_idx[valid]).all()
        assert (self.lane_edge[self.eout_to_lane[valid]] == self.eout_edge[valid]).all()
        # link table consistency (tls links + optional static priority links)
        n_prio = 0 if self.prio_link_code is None else len(self.prio_link_code)
        if self.n_links or n_prio:
            assert int(self.eout_link.max()) < self.n_links + n_prio
            assert (self.link_node >= 0).all() and (self.link_node < N).all()
        # turn probabilities sum to ~1 over valid slots on non-sink edges w/ outgoing
        has_out = valid.any(axis=1) & (~self.edge_is_sink)
        sums = self.turn_prob.sum(axis=2)[:, has_out]
        assert np.allclose(sums, 1.0, atol=1e-5), "turn probs must sum to 1"


def pad_rows(rows: List[List[int]], width: int, fill: int = -1) -> np.ndarray:
    out = np.full((len(rows), width), fill, dtype=np.int32)
    for i, r in enumerate(rows):
        if len(r) > width:
            raise ValueError(f"row {i} longer than width {width}: {len(r)}")
        out[i, : len(r)] = r
    return out


PHASE_CODE = {"r": RED, "y": YELLOW, "g": GREEN_MINOR, "G": GREEN_MAJOR}


def _ccw(a, b, c) -> float:
    return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])


def _segments_cross(p1, p2, q1, q2) -> bool:
    """Strict proper intersection of open segments (shared endpoints and
    collinear touching do NOT count — diverging/merging movements are handled
    by the separate same-target-lane rule)."""
    d1, d2 = _ccw(q1, q2, p1), _ccw(q1, q2, p2)
    d3, d4 = _ccw(p1, p2, q1), _ccw(p1, p2, q2)
    return (d1 * d2 < 0) and (d3 * d4 < 0)


def compute_link_conflicts(
    link_node: np.ndarray,
    entry_pts: np.ndarray,
    exit_pts: np.ndarray,
    from_edge: np.ndarray,
    to_lane: np.ndarray,
) -> np.ndarray:
    """Static right-of-way conflict table for permissive-green yielding.

    Each signalized movement (link) is modelled as the straight chord from its
    stop-line entry point to its junction exit point (for compiled scenarios
    these are synthesized from node coordinates with right-hand-traffic lane
    offsets; for parsed SUMO nets they come from the lane shape endpoints).
    Two links at the same node conflict iff their chords properly cross, or
    they merge onto the same target lane from different approaches — the
    geometric rule netconvert itself uses to derive junction foes (the
    reference relies on those via SUMO, e.g. the permissive lefts in
    'GGgrrrGGgrrr', /root/reference/envs/large_grid_env.py:38-43).

    Returns [n_links, n_links] bool, symmetric, False diagonal.
    """
    n = len(link_node)
    out = np.zeros((n, n), bool)
    for i in range(n):
        for j in range(i + 1, n):
            if link_node[i] != link_node[j] or from_edge[i] == from_edge[j]:
                continue
            if to_lane[i] == to_lane[j] or _segments_cross(
                entry_pts[i], exit_pts[i], entry_pts[j], exit_pts[j]
            ):
                out[i, j] = out[j, i] = True
    return out


def encode_phases(phase_strs: List[str], a_max: int, lk_max: int) -> np.ndarray:
    """Encode one node's green-phase strings into an [A_max, LK_max] i8 table."""
    out = np.full((a_max, lk_max), -1, dtype=np.int8)
    for a, s in enumerate(phase_strs):
        for i, ch in enumerate(s):
            out[a, i] = PHASE_CODE[ch]
    return out
