"""Vectorized on-device traffic microsimulator.

Replaces the reference's SUMO subprocess + TraCI TCP stepping
(/root/reference/envs/env.py:271-294, 461-471) with a pure, jittable JAX
function over the compiled :class:`NetworkSpec`. One `Engine` instance holds
the static network arrays; the per-environment dynamic state is the
:class:`EnvState` pytree, so thousands of instances run in lockstep under
``jax.vmap`` and shard across chips with ``shard_map``.

Design notes (TPU-first):

* State layout is ``[K_slots, n_lanes]`` with slot 0 = front-most vehicle and
  actives compacted to low slots. The hot update is *fully elementwise*: a
  follower may advance at most to ``leader_old_pos - d_jam``; because leaders
  only move forward this is collision-free, order-preserving, and needs no
  sequential scan (Krauss-with-tau=1 semantics, forming realistic stop-and-go
  queues with ~1 s discharge headway).
* All connectivity lookups are **pre-gathered into static per-lane tables**
  at build time (first hop ``[L, C]``, second hop ``[L, C, C]``); the runtime
  selects the dynamic connection slot with one-hot contractions over the tiny
  static C axis. Batched multi-dimensional gathers — which XLA:TPU lowers to
  very slow per-element loops — never appear in the hot path; the only
  dynamic gathers are cheap same-size 1-D ones.
* Cross-lane transport is **edge-major**: every hot-loop read is "a value at
  some lane of edge X" where X depends only on the reader's EDGE, so the
  one-hot routing matrices live at edge granularity ([E*P, L] lane->edge,
  [E*C, E] target-edge gather, [E*D, E] incoming-edge gather, [L, E]
  broadcast — ~25 MB total on Monaco) with the lanes of an edge as a tiny
  static P axis. A lane-major formulation of the same transport
  ([L*C*(C+1), L] etc.) measured ~115 MB of selectors and dominated the
  Monaco substep's HBM traffic.
* At most one vehicle leaves / enters a lane per 1 s substep (saturation flow
  <= 3600 veh/h/lane, same order as SUMO's Krauss model), so lane transfer is
  one-hot selects + a 1-D scatter for junction contention.
* Signals: green masks come from the phase table; yellow transitions are
  derived from (prev_action, action) exactly like env.py:128-152 (G/g -> r
  shows yellow, r -> G/g held red, nodes with no switch-off go green
  directly).
* Waiting time follows SUMO semantics: consecutive seconds with
  speed < 0.1 m/s; lanearea "wave" = vehicle count on the detector span;
  "wait" observation = waiting time of the front-most vehicle on the detector
  (env.py:369-407); queue = halted count on the detector (env.py:325-336).
* Vehicles stuck at the head of a lane longer than ``teleport_sec`` are
  evicted like SUMO's --time-to-teleport (env.py:281-284): removed from the
  network without being counted as arrivals or contributing trip stats
  (a separate ``n_teleported`` counter tracks them).
"""

from __future__ import annotations

import contextlib
import dataclasses
import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..scenarios.spec import FLOW_BERNOULLI, NetworkSpec
from . import kernels

HALT_SPEED = 0.1  # SUMO halting / waiting threshold (m/s)
BIG = 1e9


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EnvState:
    """Dynamic per-environment state (single env; vmap adds the batch axis).

    The hot loop is HBM-bandwidth bound, so per-slot fields are stored in the
    narrowest dtype that is exact for their range (f16 counts integers exactly
    to 2048; waits are bounded by the teleport threshold, i16 covers the rest)
    and widened to f32/i32 inside the fused substep computation.
    """

    # per vehicle slot [K, L]
    pos: jnp.ndarray  # front-bumper distance from lane start (f32)
    speed: jnp.ndarray  # f32 (Mosaic has no f16; exact kinematics)
    wait: jnp.ndarray  # consecutive waiting seconds (f32)
    acc_wait: jnp.ndarray  # total waiting seconds (i16)
    wait_cnt: jnp.ndarray  # number of waiting episodes (i16)
    depart: jnp.ndarray  # departure sim-second (i16)
    route: jnp.ndarray  # route id, -1 = turn-probability routed (i16)
    ridx: jnp.ndarray  # position of current edge within route (i16)
    next_slot: jnp.ndarray  # outgoing-connection slot at end of lane, -1 = arrive (i8)
    active: jnp.ndarray  # bool
    # per lane [L]: True = a vehicle crossed the stop line last second;
    # blocks this second's exit -> 2 s discharge headway (~1800 veh/h/lane
    # saturation flow, matching SUMO Krauss tau=1 discharge; without it the
    # engine discharges at 3600/h and queues drain twice too fast)
    exit_cool: jnp.ndarray  # bool
    # per flow [F]
    flow_acc: jnp.ndarray  # accumulated vehicles owed (f32)
    # per node [N]
    prev_action: jnp.ndarray  # last green phase, -1 before first (i32)
    # scalars
    t: jnp.ndarray  # sim second (i32)
    key: jnp.ndarray  # episode PRNG key
    # episode accumulators
    n_departed: jnp.ndarray  # i32
    n_arrived: jnp.ndarray  # i32
    n_teleported: jnp.ndarray  # i32 teleport-clock evictions (never counted
    # as arrivals; conservation: departed - arrived - teleported = active)
    trip_dur_sum: jnp.ndarray  # f32
    trip_wait_sum: jnp.ndarray  # f32
    trip_cnt_sum: jnp.ndarray  # f32
    # per-vehicle trip ring [cap, 4]: (depart, duration, wait_sec, wait_cnt)
    # rows for finished trips (the reference's tripinfo XML records,
    # env.py:498-515). cap == 1 disables collection (training); n_arrived is
    # the ring write pointer.
    trip_buf: jnp.ndarray  # f32


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StepStats:
    """Per-second network statistics (ref env.py:409-437 schema)."""

    n_veh: jnp.ndarray
    n_departed: jnp.ndarray
    n_arrived: jnp.ndarray
    avg_wait: jnp.ndarray
    avg_speed: jnp.ndarray
    avg_queue: jnp.ndarray
    std_queue: jnp.ndarray


def _onehot(idx, n):
    """Float one-hot over a small static axis (exact for small ints)."""
    return (idx[..., None] == jnp.arange(n)).astype(jnp.float32)


def _exact_matmuls(fn):
    """Trace ``fn`` with full-f32 matmul precision.

    The engine's one-hot "routing" contractions carry integer VALUES (edge /
    lane / route ids, departure times, contention priorities) through
    matmuls. TPU's default matmul precision is single-pass bf16 (8 mantissa
    bits): any id > 256 gets rounded (415 -> 416), which silently corrupts
    routing and junction contention on nets with > 256 edges (Monaco: 636
    segment edges, 1043+ lanes). Under vmap these contractions are true
    MXU matmuls, so the default precision applies; pin 'highest' for exact
    f32 semantics.

    The HOT selector matmuls do NOT use this blanket setting: 'highest'
    decomposes every f32 matmul into 6 bf16 MXU passes, which made the big
    [rows, L] selector contractions ~245 GFLOP per Monaco substep. They go
    through :func:`_sel_mm` instead — single-pass bf16 with f32
    accumulation, exact because both sides carry only bf16-exact values
    (0/1 indicators and ints <= 256; larger ids ride two base-256
    channels via :func:`_split_id`). Only the small residual f32 einsums
    (turn-probability tables, route lookups) still pay 'highest'.
    """

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapper


def _sel_mm(sel: jnp.ndarray, mat: jnp.ndarray,
            out_dtype=jnp.float32) -> jnp.ndarray:
    """Exact single-pass gather-by-matmul: ``sel`` is a 0/1 selector stored
    bf16; every entry of ``mat`` must be exactly representable in bf16
    (indicator bits, ints with |v| <= 256, or base-256 channel splits).
    Accumulates f32 on the MXU, so counts/sums of exact products are exact.
    6x fewer MXU passes and 2x less selector HBM traffic than the blanket
    'highest'-precision f32 matmuls these replace (the Monaco hot loop).

    ``out_dtype=jnp.bfloat16`` additionally halves the OUTPUT traffic — the
    profiled Monaco substep spends as much HBM on the [B, rows, ch]
    intermediates as on the selectors. Only valid when every RESULT value
    (including chain sums) stays <= 256, which holds for all hot-loop
    gathers by construction (single-nonzero rows transport <= 256-valued
    channels); measure()'s chain sums keep the f32 default."""
    mat_b = mat.astype(jnp.bfloat16)
    if jax.default_backend() == "cpu":
        # XLA:CPU cannot execute a BF16xBF16=F32 dot thunk; compute in f32
        # there. The operands still round-trip through bf16 (input AND
        # output) so the exactness contract is exercised identically on
        # every backend, making CPU test results bit-equal to the TPU path.
        out = jnp.matmul(
            sel.astype(jnp.float32),
            mat_b.astype(jnp.float32),
            precision=jax.lax.Precision.DEFAULT,
        )
        return out.astype(out_dtype)
    return jnp.matmul(
        sel.astype(jnp.bfloat16),
        mat_b,
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=out_dtype,
    )


def _split_id(x: jnp.ndarray):
    """Exact two-channel base-256 encoding of an integer-valued f32 array
    (-65536 < x < 65536): both channels are bf16-exact (hi in [-256, 256),
    lo in [0, 256)), and ``_join_id(*_split_id(x)) == x`` bit-exactly."""
    hi = jnp.floor(x * (1.0 / 256.0))
    return hi, x - hi * 256.0


def _join_id(hi: jnp.ndarray, lo: jnp.ndarray) -> jnp.ndarray:
    # upcast first: joined values reach 65535, far past bf16's exact range,
    # so the arithmetic must happen in f32 even when the channels arrive as
    # bf16 matmul outputs
    return hi.astype(jnp.float32) * 256.0 + lo.astype(jnp.float32)


def _exact_einsum(subs: str, *ops, out_dtype=jnp.float32):
    """Einsum over bf16-exact operands without materializing f32 copies.

    Every operand must carry only bf16-exact values (0/1 one-hot weights,
    ints <= 256, base-256 channel splits), and at least one operand of each
    pairwise contraction must be one-hot — then all intermediates are
    single-selected bf16-exact values and the result is exact. On TPU the
    contraction runs in bf16 with f32 accumulation (single MXU pass,
    escaping the surrounding 'highest' 6-pass context); XLA:CPU lacks the
    bf16 dot thunk, so it contracts in f32 there — bit-identical output."""
    if jax.default_backend() == "cpu":
        ops = [o.astype(jnp.float32) for o in ops]
        return jnp.einsum(
            subs, *ops, precision=jax.lax.Precision.DEFAULT
        ).astype(out_dtype)
    ops = [o.astype(jnp.bfloat16) for o in ops]
    return jnp.einsum(
        subs, *ops, precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=out_dtype,
    )


def _split_f32(x: jnp.ndarray):
    """Exact three-channel bf16 decomposition of an arbitrary f32 array.

    ``hi`` = bf16 round of x (top ~8 significand bits); ``mid`` = bf16 round
    of the exact f32 residual (next 8 bits); ``lo`` = what remains (<= 8
    significant bits, hence itself bf16-exact). Both subtractions are exact
    in f32 because each rounded term is within half an ulp of its operand,
    so ``_join_f32(*_split_f32(x)) == x`` bit-for-bit. Lets real-valued
    kinematic channels (junction overshoot, crossing speed) ride the same
    single-pass bf16 selector transport as the integer channels."""
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    r = x - hi
    mid = r.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, mid, r - mid


def _join_f32(hi: jnp.ndarray, mid: jnp.ndarray, lo: jnp.ndarray):
    # inner-out order: mid + lo reconstructs the exact residual, then adding
    # hi reconstructs x; every step is an exact f32 addition
    return hi.astype(jnp.float32) + (
        mid.astype(jnp.float32) + lo.astype(jnp.float32)
    )


class Engine:
    def __init__(self, spec: NetworkSpec):
        self.spec = spec
        self.d_jam = float(spec.veh_len + spec.min_gap)
        self.K = int(np.ceil(spec.lane_length.max() / self.d_jam)) + 2
        if spec.k_cap:
            self.K = min(self.K, int(spec.k_cap))
        self.L = spec.n_lanes
        self.F = max(1, len(spec.flow_edge))
        self.N = spec.n_nodes
        self.C = spec.eout_edge.shape[1]
        self.n_links = spec.n_links
        # Pallas hand-fused [K, L] passes (sim/kernels.py): bit-identical
        # to the XLA path (tests/test_kernels.py) and 10x leaner on paper,
        # but currently DISABLED by default: XLA assigns pallas custom-call
        # operands a different (untiled) layout than the scan-carried
        # state, inserting ~110 MB of layout copies per Monaco substep that
        # eat the kernels' entire saving (measured 29.2k vs 39.5k
        # substeps*B/s at B=64). Set DSCT_PALLAS=1 to experiment.
        _flag = os.environ.get("DSCT_PALLAS")
        _backend = jax.default_backend()
        self._use_pallas = _flag == "1"
        self._pallas_interpret = _backend != "tpu"
        # the exact single-pass bf16 selector transport (_sel_mm) carries
        # per-lane counts (<= K) in one channel and ids (< 65536) in two
        # base-256 channels; keep the ranges inside what bf16 represents
        # exactly (set spec.k_cap to bound K on very long lanes)
        assert self.K <= 256, (
            f"K={self.K} slots/lane exceeds the bf16-exact count range; "
            "set NetworkSpec.k_cap <= 256")
        assert self.L < 65536 and self.F < 65536
        # route ids travel the same two-channel split in the transfer path
        assert spec.route_edges.shape[0] < 65536

        L, C, F, N = self.L, self.C, self.F, self.N
        lane_edge = np.asarray(spec.lane_edge)
        eout_edge = np.asarray(spec.eout_edge)
        eout_from = np.asarray(spec.eout_from_lane)
        eout_to = np.asarray(spec.eout_to_lane)
        eout_link = np.asarray(spec.eout_link)
        lane0 = np.asarray(spec.edge_lane[:, 0])
        dead_e = np.asarray(spec.edge_is_sink) | ~(eout_edge >= 0).any(axis=1)
        turn_prob = np.asarray(spec.turn_prob, np.float32)  # [TB, E, C]
        self.TB = turn_prob.shape[0]

        as_j = lambda x, dt: jnp.asarray(np.asarray(x), dtype=dt)
        self.lane_len = as_j(spec.lane_length, jnp.float32)
        self.lane_vmax = as_j(spec.lane_vmax, jnp.float32)
        self.det_start = as_j(spec.det_start, jnp.float32)

        # ---- first-hop static per-lane tables [L, C] ------------------
        te = eout_edge[lane_edge]  # [L, C] target edge of slot c (-1 pad)
        self.lane_tgt_edge = as_j(te, jnp.float32)
        # link space = tls links + static priority-junction links + 1 dummy
        # (uncontrolled = always green). Priority links carry a fixed code
        # (3 major / 2 yields) so unsignalized right-of-way rides the same
        # yielding machinery as permissive greens.
        self.n_prio = (0 if spec.prio_link_code is None
                       else len(spec.prio_link_code))
        self.n_ext = self.n_links + self.n_prio
        self._prio_codes = jnp.asarray(
            np.asarray(spec.prio_link_code, np.float32)
            if self.n_prio else np.zeros(0, np.float32)
        )
        # link ids are per (EDGE, slot) — eout_link — so the link-code
        # lookup map is edge-level [E*C, n_ext+1]; per-lane codes are an
        # edge->lane broadcast away (lane_codes / the conflict path)
        lli_e = np.where(eout_link < 0, self.n_ext, eout_link)  # [E, C]
        self._code_sel_e = jnp.asarray(
            (lli_e.reshape(-1)[:, None] == np.arange(self.n_ext + 1)[None, :]
             ).astype(np.float32), dtype=jnp.bfloat16
        )

        # ---- second-hop static tables [L, C, C] -----------------------
        te_safe = np.maximum(te, 0)
        h2_eout = eout_edge[te_safe]  # [L, C, C] next-next edge
        # toLane of MY chosen movement (l, c): where SUMO physically drops
        # a crossing vehicle (net.xml connection toLane). Used as the
        # tie-break preference below; NOT as the arrival fallback — the
        # round-5 bisect (runs/calib_r5_multilane.out + /tmp variants)
        # measured toLane-pinned arrivals at 0.45x completed trips on
        # Monaco: without SUMO's continuous lane-changing, arrivals parked
        # on movement from-lanes displace through-traffic storage that the
        # stop-line merge gate cannot recover. lane0-funneled arrivals
        # (the original choice) keep the macro flow calibrated.
        h2_tolane = np.maximum(eout_to[lane_edge], 0)  # [L, C]
        h2_entry = np.where(
            h2_eout >= 0, eout_from[te_safe], lane0[te_safe][..., None]
        )  # arrival lane given the following movement
        h2_dead = dead_e[te_safe]  # [L, C]
        # extended entry table: option index C = "no onward movement,
        # arrive on lane0 of the target edge". One consistent table for
        # both the entry-lane choice and every at-the-entry-lane gather.
        h2_entry_ext = np.concatenate(
            [h2_entry, lane0[te_safe][..., None]], axis=-1
        )  # [L, C, C+1]
        self.h2_eout = as_j(h2_eout, jnp.float32)
        self.h2_entry = as_j(h2_entry_ext, jnp.float32)
        self.h2_dead = as_j(h2_dead, jnp.float32)
        # own-toLane tie-break for the entry-lane choice: when two parallel
        # fronts see equal queues they must NOT herd onto the same entry
        # lane (each SUMO connection lands on its own toLane); +0.5 breaks
        # integer-queue ties without ever overriding a strictly shorter
        # queue
        self.h2_tol_bonus = as_j(
            h2_entry_ext == h2_tolane[..., None], jnp.float32
        )  # [L, C, C+1]
        # [TB, L, C, C2] cumulative turn probs of each candidate target edge
        h2_tc = np.cumsum(turn_prob[:, te_safe, :], axis=-1)
        self.h2_turn_cum = as_j(h2_tc, jnp.float32)

        # ---- signal static tables -------------------------------------
        # per-link phase codes for every action: [n_links, A_max]
        link_node = np.asarray(spec.link_node)
        link_pos = np.asarray(spec.link_pos)
        pt = np.asarray(spec.phase_table)  # [N, A, LK]
        self.link_phase = as_j(pt[link_node, :, link_pos], jnp.float32)
        self.A_max = pt.shape[1]
        self._link_node_sel = jnp.asarray(
            (link_node[:, None] == np.arange(N)[None, :]).astype(np.float32)
        )  # [n_links, N]
        self.link_node = as_j(link_node, jnp.int32)

        # permissive-green ('g') right-of-way: static [n_links+1, n_links+1]
        # conflict matrix (dummy link = always-green uncontrolled, no foes).
        # SUMO 'g' links must yield to conflicting 'G' traffic — without this
        # the permissive lefts in e.g. 'GGgrrrGGgrrr' (large_grid_env.py:38)
        # would never yield, inflating left-turn capacity.
        self.has_conflicts = spec.link_conflict is not None
        if self.has_conflicts:
            lc = np.asarray(spec.link_conflict, np.float32)
            assert lc.shape[0] in (self.n_links, self.n_ext), lc.shape
            cm = np.zeros((self.n_ext + 1, self.n_ext + 1), np.float32)
            cm[: lc.shape[0], : lc.shape[1]] = lc
            self._conflict = jnp.asarray(cm, dtype=jnp.bfloat16)

        # ---- routes ---------------------------------------------------
        self.route_edges = as_j(spec.route_edges, jnp.float32)  # [R, RL]
        self.R, self.RL = spec.route_edges.shape

        # ---- flows (all-static pre-gather) ----------------------------
        if len(spec.flow_edge):
            fe = np.asarray(spec.flow_edge)
            fr = np.asarray(spec.flow_route)
            f_begin, f_end = np.asarray(spec.flow_begin), np.asarray(spec.flow_end)
            f_rate, f_mode = np.asarray(spec.flow_rate), np.asarray(spec.flow_mode)
        else:
            fe = np.zeros(1, np.int64)
            fr = -np.ones(1, np.int64)
            f_begin = f_end = f_rate = np.zeros(1)
            f_mode = np.zeros(1, np.int64)
        self.flow_route = as_j(fr, jnp.int32)
        self.flow_begin = as_j(f_begin, jnp.float32)
        self.flow_end = as_j(f_end, jnp.float32)
        self.flow_rate = as_j(f_rate, jnp.float32)
        self.flow_is_bern = as_j(f_mode == FLOW_BERNOULLI, jnp.float32)
        f_eout = eout_edge[fe]  # [F, C]
        f_from = eout_from[fe]
        # route flows: entry slot is fully static
        re = np.asarray(spec.route_edges)
        nxt = np.where(fr >= 0, re[np.maximum(fr, 0), 1] if re.shape[1] > 1
                       else -1, -1)
        match = f_eout == nxt[:, None]
        f_route_slot = np.where(match.any(1), match.argmax(1), -1)
        self.f_route_slot = as_j(f_route_slot, jnp.int32)
        self.f_dead = as_j(dead_e[fe], bool)
        self.f_eout = as_j(f_eout, jnp.float32)
        self.f_from = as_j(f_from, jnp.float32)
        self.f_lane0 = as_j(lane0[fe], jnp.float32)
        self.f_turn_cum = as_j(np.cumsum(turn_prob[:, fe, :], axis=-1), jnp.float32)

        # ---- static one-hot "routing" matrices (edge-major) -----------
        # TPU XLA lowers batched dynamic gathers/scatters to ~1 element/ns
        # sequential loops; profiled at ~2 ms per [B=1024, L] gather. All
        # cross-lane communication is therefore expressed as matmuls with
        # static 0/1 matrices (MXU) + one-hot selects over tiny static axes.
        #
        # The selectors are EDGE-major: every cross-lane read in the hot
        # loop is "a value at some lane of edge X" where X depends only on
        # the source lane's EDGE (its target edges te[e, c], or the edges
        # feeding into it). Lane-level selectors therefore carry an L/E-fold
        # row redundancy AND an (arrival-candidate)-fold column blowup —
        # [L*C*(C+1), L] reached ~71 MB on Monaco. Edge-major transport
        # routes through [E*P, L] / [E*C, E] / [E*D, E] matrices (~4 MB
        # each), with the lanes of an edge as a tiny static P axis:
        #   lane values -> edge-major [E, P, ch]        (_l2e_sel)
        #   value at every lane of my slot-c target     (_te_sel)
        #   value at every lane of my incoming edges    (_ine_sel)
        #   edge-level results -> lane-major            (_e2l_oh)
        # Same exact-bf16 value contract as before; decision formulas are
        # unchanged, so trajectories are bit-identical to the lane-major
        # layout (tests/test_golden_trace.py).
        E = eout_edge.shape[0]
        self.E = E
        el_tbl = np.asarray(spec.edge_lane)  # [E, P], -1 pad
        P = el_tbl.shape[1]
        self.P = P
        lane_a = np.zeros(L, np.int64)  # index of lane within its edge
        for e in range(E):
            for a in range(P):
                if el_tbl[e, a] >= 0:
                    lane_a[el_tbl[e, a]] = a
        self.lane_a_oh = as_j(
            lane_a[:, None] == np.arange(P)[None, :], jnp.float32
        )  # [L, P]
        l2e = np.zeros((E * P, L), np.float32)
        el_flat = el_tbl.reshape(-1)
        rows = np.arange(E * P)[el_flat >= 0]
        l2e[rows, el_flat[el_flat >= 0]] = 1.0
        self._l2e_sel = jnp.asarray(l2e, dtype=jnp.bfloat16)
        e2l = np.zeros((L, E), np.float32)
        e2l[np.arange(L), lane_edge] = 1.0
        self._e2l_oh = jnp.asarray(e2l, dtype=jnp.bfloat16)
        # target-edge gather: row (e, c) selects te[e, c] (invalid -> zero)
        te_e = eout_edge  # [E, C]
        te_sel = np.zeros((E * C, E), np.float32)
        te_rows = np.arange(E * C)[te_e.reshape(-1) >= 0]
        te_sel[te_rows, te_e.reshape(-1)[te_e.reshape(-1) >= 0]] = 1.0
        self._te_sel = jnp.asarray(te_sel, dtype=jnp.bfloat16)
        # incoming-edge sets: edges with a connection into edge f
        in_edges: list = [[] for _ in range(E)]
        for e in range(E):
            for c in range(C):
                if te_e[e, c] >= 0 and e not in in_edges[te_e[e, c]]:
                    in_edges[te_e[e, c]].append(e)
        self.D_in = max(1, max(len(v) for v in in_edges))
        ine_np = np.zeros((E, self.D_in), np.int64)
        ine_valid = np.zeros((E, self.D_in), bool)
        for f, v in enumerate(in_edges):
            ine_np[f, : len(v)] = v
            ine_valid[f, : len(v)] = True
        ine_sel = np.zeros((E * self.D_in, E), np.float32)
        ine_sel[np.arange(E * self.D_in), ine_np.reshape(-1)] = 1.0
        ine_sel[~ine_valid.reshape(-1)] = 0.0
        self._ine_sel = jnp.asarray(ine_sel, dtype=jnp.bfloat16)
        # global lane ids of each (in-edge, lane) candidate slot [E, D, P]
        # (-1 for padded slots) — the contention winner's source lane id
        ine_src_lane = np.where(
            ine_valid[..., None], el_tbl[ine_np], -1
        ).astype(np.float32)
        self.ine_src_lane = as_j(ine_src_lane, jnp.float32)
        # channel-major transfer transport: one [L, M*E] one-hot (M = D*P
        # candidate slots) reads every candidate's source-lane value in a
        # single matmul whose big axes stay MINOR. The [E, M, 17]-shaped
        # batched einsums this replaces forced the 17-channel axis minor,
        # which XLA tile-pads to 128 — a ~160 MB/substep materialization
        # that profiled as ~40% of the Monaco substep at B=64. Columns are
        # ordered m-major (col = m*E + e) so the [V, M*E] product reshapes
        # to [V*M, E] for the lane expansion for free.
        M_c = self.D_in * P
        cand_cols = (
            np.arange(M_c)[None, :] * E + np.arange(E)[:, None]
        ).reshape(-1)  # column of candidate (e, m)
        cand_src = ine_src_lane.reshape(E * M_c).astype(np.int64)
        cand_sel = np.zeros((L, M_c * E), np.float32)
        ok = cand_src >= 0
        cand_sel[cand_src[ok], cand_cols[ok]] = 1.0
        self._cand_selT = jnp.asarray(cand_sel, dtype=jnp.bfloat16)
        # value-at-my-edge expansion, [E, L]: column l is one-hot at e(l)
        self._e2lT_oh = jnp.asarray(e2l.T.copy(), dtype=jnp.bfloat16)
        # candidate source-lane ids per (m, lane) [M, L], -1 pad
        self.cand_lane_T = as_j(
            ine_src_lane.reshape(E, M_c)[lane_edge].T, jnp.float32)
        # target-lane ids of each edge's P slots (-1 pad), f32
        self.edge_lane_f = as_j(np.where(el_tbl >= 0, el_tbl, -1), jnp.float32)
        # lane-in-edge index of every entry candidate h2_entry_ext[l, c, d]
        # (all candidates are lanes of te[e(l), c], so the P axis + this
        # small static table replace the 71 MB _entry_sel)
        self.opt_a_l = as_j(
            lane_a[h2_entry_ext.astype(np.int64)], jnp.float32
        )  # [L, C, C+1]
        # sibling mask for the per-movement exit gate: other REAL lanes of
        # my own edge (pads excluded, self excluded)
        lane_valid_p = el_tbl[lane_edge] >= 0  # [L, P]
        self.lane_sib_valid = as_j(
            lane_valid_p
            & (np.arange(P)[None, :] != lane_a[:, None]),
            bool,
        )
        # from-lane of each (lane's edge, slot) movement [L, C]
        self.lane_slot_from = as_j(eout_from[lane_edge], jnp.float32)
        # junction-interior traversal distance per (lane, slot) [L, C]
        via = (np.asarray(spec.eout_via_len, np.float32)
               if spec.eout_via_len is not None else np.zeros_like(eout_edge, np.float32))
        self.lane_via = as_j(via[lane_edge], jnp.float32)
        self.max_via = float(via.max()) if via.size else 0.0

        # (c) flow->lane plumbing: each flow's possible entry lanes are
        # the C from-lanes of its entry edge plus lane0 (option index C).
        # Small one-hot maps ([F*(C+1), L] and its transpose) carry the
        # room lookup and the winner's lane-side values; flow CONTENTION is
        # a pairwise [F, F] comparison (F is tens) — no dynamic scatters,
        # which XLA:TPU lowers to slow sequential loops.
        fl_valid = np.concatenate(
            [f_from >= 0, np.ones((F, 1), bool)], axis=1
        )  # [F, C+1]
        fl_opts = np.concatenate([f_from, lane0[fe][:, None]], axis=1)
        fl_opts = np.maximum(fl_opts, 0)
        flopt_sel = np.zeros((F * (self.C + 1), L), np.float32)
        flopt_sel[np.arange(F * (self.C + 1)), fl_opts.reshape(-1)] = 1.0
        flopt_sel[~fl_valid.reshape(-1)] = 0.0
        self._flopt_sel = jnp.asarray(flopt_sel, dtype=jnp.bfloat16)
        self._flopt_selT = jnp.asarray(flopt_sel.T, dtype=jnp.bfloat16)

        # ---- observation static maps ----------------------------------
        # det_chain: with segmented long edges, every chain segment's lane
        # contributes to its controlled lane's full-lane measures
        # (ref sim.lane.* on the original lane, env.py:377)
        node_ild = np.asarray(spec.node_ild)
        self.I_max = node_ild.shape[1]
        chain = (np.asarray(spec.det_chain) if spec.det_chain is not None
                 else np.full(L, -1, np.int64))
        members = {int(li): [int(li)] for li in node_ild[node_ild >= 0]}
        for l in range(L):
            if chain[l] >= 0 and int(chain[l]) in members and l != int(chain[l]):
                members[int(chain[l])].append(l)
        sel = np.zeros((N * self.I_max, L), np.float32)
        for n in range(N):
            for j in range(self.I_max):
                if node_ild[n, j] >= 0:
                    for l in members[int(node_ild[n, j])]:
                        sel[n * self.I_max + j, l] = 1.0
        self._ild_sel = jnp.asarray(sel, dtype=jnp.bfloat16)  # [N*I, L]
        det_lanes = np.unique(node_ild[node_ild >= 0])
        dls = np.zeros((len(det_lanes), L), np.float32)
        for i, li in enumerate(det_lanes):
            for l in members[int(li)]:
                dls[i, l] = 1.0
        self._det_sel = jnp.asarray(dls, dtype=jnp.bfloat16)
        self.n_det_lanes = len(det_lanes)

        # ---- constant lifting -----------------------------------------
        # The edge-major selector matrices above total ~25 MB on the Monaco
        # net (the round-4 lane-major layout reached ~115 MB). Embedded as
        # jit CONSTANTS they still slow the (remote) TPU compile (constant
        # folding + layout over multi-MB literals); lifted to jit ARGUMENTS
        # the program is bit-identical but the compiler only sees parameter
        # shapes. Every jit entry point wraps its body in
        # ``engine.bind(consts)`` and passes ``engine.consts()`` as a
        # trailing argument.
        self._const_names = tuple(sorted(
            name for name in vars(self)
            if hasattr(getattr(self, name), "nbytes")
            and getattr(self, name).nbytes >= (1 << 20)
        ))

    def consts(self) -> dict:
        """The lifted large static arrays, passed as jit arguments."""
        return {k: getattr(self, k) for k in self._const_names}

    @contextlib.contextmanager
    def bind(self, cs: dict):
        """Temporarily swap the lifted arrays for their traced stand-ins
        while a jitted function body is being traced."""
        old = {k: getattr(self, k) for k in cs}
        for k, v in cs.items():
            setattr(self, k, v)
        try:
            yield
        finally:
            for k, v in old.items():
                setattr(self, k, v)

    # ------------------------------------------------------------------
    def init_state(self, key, density: float = 0.0, trip_cap: int = 0) -> EnvState:
        """Fresh episode state; ``density`` > 0 seeds int(init_max_car *
        density) stationary vehicles per eligible lane at random free
        positions (ref init_routes, large_grid/data/build_file.py:223-266;
        departPos="random_free", departSpeed=0). Deviation: the reference
        routes seeded cars to a random perimeter sink; here they are
        turn-probability routed (uniform per-junction turns) so the static
        route table stays small — both drain the warm-start traffic through
        the grid to the perimeter."""
        K, L, F, N = self.K, self.L, self.F, self.N
        if density > 0 and self.spec.init_lanes is not None:
            return self._init_state_seeded(key, density, trip_cap)
        z = lambda dt: jnp.zeros((K, L), dt)
        return EnvState(
            pos=z(jnp.float32), speed=z(jnp.float32), wait=z(jnp.float32),
            acc_wait=z(jnp.int16), wait_cnt=z(jnp.int16),
            depart=z(jnp.int16),
            route=-jnp.ones((K, L), jnp.int16),
            ridx=jnp.zeros((K, L), jnp.int16),
            next_slot=-jnp.ones((K, L), jnp.int8),
            active=jnp.zeros((K, L), bool),
            exit_cool=jnp.zeros(L, bool),
            flow_acc=jnp.zeros(F, jnp.float32),
            prev_action=-jnp.ones(N, jnp.int32),
            t=jnp.zeros((), jnp.int32),
            key=key,
            n_departed=jnp.zeros((), jnp.int32),
            n_arrived=jnp.zeros((), jnp.int32),
            n_teleported=jnp.zeros((), jnp.int32),
            trip_dur_sum=jnp.zeros((), jnp.float32),
            trip_wait_sum=jnp.zeros((), jnp.float32),
            trip_cnt_sum=jnp.zeros((), jnp.float32),
            trip_buf=jnp.zeros((max(trip_cap, 1), 4), jnp.float32),
        )

    def _init_state_seeded(self, key, density: float, trip_cap: int = 0) -> EnvState:
        K, L = self.K, self.L
        spec = self.spec
        lane_len = np.asarray(spec.lane_length)
        # static per-lane seed counts: int(MAX_CAR_NUM * density), capped so
        # the vehicles physically fit with jam gaps
        n_init = np.zeros(L, np.int32)
        fit = np.maximum(lane_len / self.d_jam - 1, 0).astype(np.int32)
        n_per = int(spec.init_max_car * density)
        for li in np.asarray(spec.init_lanes):
            n_init[li] = min(n_per, int(fit[li]), K - 2)
        n_init_j = jnp.asarray(n_init)
        iota_k = jnp.arange(K, dtype=jnp.int32)[:, None]  # [K, 1]
        seeded = iota_k < n_init_j[None, :]  # [K, L]

        k_pos, k_slot = jax.random.split(key)
        # order-statistics placement: slot k (0 = front) takes the k-th
        # largest of n iid uniforms over the free span, plus (n-1-k) jam
        # gaps -> descending positions with >= d_jam spacing, uniformly
        # "random_free"-like
        u = jnp.sort(jax.random.uniform(k_pos, (K, L)), axis=0, descending=True)
        span = jnp.maximum(
            jnp.asarray(lane_len) - n_init_j.astype(jnp.float32) * self.d_jam, 0.0
        )
        gaps = (n_init_j[None, :] - 1 - iota_k).astype(jnp.float32) * self.d_jam
        pos = jnp.where(seeded, u * span[None, :] + gaps, 0.0)

        # turn-probability routing: sample each seeded vehicle's exit slot
        # from its lane's (time-bin 0) turn distribution
        turn_cum = np.cumsum(
            np.asarray(spec.turn_prob, np.float32)[0][np.asarray(spec.lane_edge)],
            axis=-1,
        )  # [L, C]
        u2 = jax.random.uniform(k_slot, (K, L))
        # clamp: f32 cum probs can sum slightly under 1.0, which would yield
        # slot == C (an all-zero one-hot that reads signal code 0 forever)
        slot = jnp.minimum(
            jnp.sum(u2[..., None] > jnp.asarray(turn_cum)[None], axis=-1),
            turn_cum.shape[-1] - 1,
        )
        dead = jnp.asarray(
            np.asarray(spec.edge_is_sink)[np.asarray(spec.lane_edge)]
        )
        slot = jnp.where(dead[None, :], -1, slot).astype(jnp.int8)

        z = lambda dt: jnp.zeros((K, L), dt)
        return EnvState(
            pos=pos,
            speed=z(jnp.float32), wait=z(jnp.float32),
            acc_wait=z(jnp.int16), wait_cnt=z(jnp.int16),
            depart=z(jnp.int16),
            route=-jnp.ones((K, L), jnp.int16),
            ridx=jnp.zeros((K, L), jnp.int16),
            next_slot=jnp.where(seeded, slot, jnp.int8(-1)),
            active=seeded,
            exit_cool=jnp.zeros(L, bool),
            flow_acc=jnp.zeros(self.F, jnp.float32),
            prev_action=-jnp.ones(self.N, jnp.int32),
            t=jnp.zeros((), jnp.int32),
            key=key,
            # seeded vehicles count as departed at t=0 (SUMO inserts the
            # init flows at begin=0), keeping departed - arrived == active
            n_departed=jnp.asarray(int(n_init.sum()), jnp.int32),
            n_arrived=jnp.zeros((), jnp.int32),
            n_teleported=jnp.zeros((), jnp.int32),
            trip_dur_sum=jnp.zeros((), jnp.float32),
            trip_wait_sum=jnp.zeros((), jnp.float32),
            trip_cnt_sum=jnp.zeros((), jnp.float32),
            trip_buf=jnp.zeros((max(trip_cap, 1), 4), jnp.float32),
        )

    # -- signals -------------------------------------------------------
    @_exact_matmuls
    def link_codes(self, action: jnp.ndarray) -> jnp.ndarray:
        """Per-link signal code for node actions [N] -> [n_links] (f32)."""
        act_l = self._link_node_sel @ action.astype(jnp.float32)  # [n_links]
        a_oh = _onehot(act_l.astype(jnp.int32), self.A_max)
        return (self.link_phase * a_oh).sum(-1)

    @_exact_matmuls
    def signal_codes(self, action, prev_action, is_yellow):
        """Green-phase or derived yellow-transition codes (env.py:128-152)."""
        cur = self.link_codes(action)
        prev = self.link_codes(jnp.where(prev_action < 0, action, prev_action))
        switch_red = (prev >= 2) & (cur == 0)
        switch_green = (prev == 0) & (cur >= 2)
        node_any_red = (
            self._link_node_sel.T @ switch_red.astype(jnp.float32)
        ) > 0  # [N]
        changed = (prev_action >= 0) & (action != prev_action)
        node_ylw = node_any_red & changed & is_yellow
        use_yellow = self._link_node_sel @ node_ylw.astype(jnp.float32) > 0
        ylw = jnp.where(switch_red, 1.0, jnp.where(switch_green, 0.0, cur))
        return jnp.where(use_yellow, ylw, cur)

    @_exact_matmuls
    def lane_codes(self, link_code: jnp.ndarray) -> jnp.ndarray:
        """Per-lane, per-connection-slot signal codes [L, C] from per-link
        codes [n_links]. Hoisted out of the per-second loop: within a control
        interval only two code vectors exist (yellow-segment, green-segment),
        so the one-hot matmul runs twice per control step instead of 5x."""
        padded = jnp.concatenate(
            [link_code.astype(jnp.float32), self._prio_codes, jnp.array([3.0])]
        )
        # codes <= 4: exact in single-pass bf16; link ids are per (edge,
        # slot), so look up edge-level and broadcast to lanes
        code_ec = _sel_mm(self._code_sel_e, padded).reshape(self.E, self.C)
        return self._edge_to_lane(code_ec).astype(jnp.float32)

    # -- edge-major transport helpers ----------------------------------
    def _to_edge(self, mat: jnp.ndarray) -> jnp.ndarray:
        """Per-lane channels [L, ch] -> edge-major [E, P, ch] (padded lane
        slots read 0). Exact single-pass bf16 transport (_sel_mm rules)."""
        return _sel_mm(
            self._l2e_sel, mat, out_dtype=jnp.bfloat16
        ).reshape(self.E, self.P, -1)

    def _edge_to_lane(self, mat_e: jnp.ndarray) -> jnp.ndarray:
        """Edge-level channels [E, ch] -> per-lane [L, ch] broadcast."""
        return _sel_mm(self._e2l_oh, mat_e, out_dtype=jnp.bfloat16)

    def _at_target_edges(self, mat: jnp.ndarray) -> jnp.ndarray:
        """Per-lane channels [L, ch] -> [L, C, P, ch]: the channel values at
        every lane (P axis) of the slot-c target edge te[e(l), c]. The
        edge-major replacement for the lane-level entry pre-gather."""
        x_e = self._to_edge(mat)  # [E, P, ch]
        g = _sel_mm(
            self._te_sel, x_e.reshape(self.E, -1), out_dtype=jnp.bfloat16
        )  # [E*C, P*ch]
        return self._edge_to_lane(
            g.reshape(self.E, -1)
        ).reshape(self.L, self.C, self.P, -1)

    # -- helpers -------------------------------------------------------
    def _turn_bin_oh(self, t):
        b = (t.astype(jnp.float32) / self.spec.turn_bin_sec).astype(jnp.int32)
        return _onehot(jnp.clip(b, 0, self.TB - 1), self.TB)  # [TB]

    @_exact_matmuls
    def _route_next_edge(self, route, ridx):
        """route_edges[route, ridx] via one-hot contractions; -1 if OOR."""
        r_oh = _onehot(jnp.maximum(route, 0), self.R)  # [L, R]
        row = r_oh @ self.route_edges  # [L, RL]
        k = jnp.clip(ridx, 0, self.RL - 1)
        val = (row * _onehot(k, self.RL)).sum(-1)
        return jnp.where((ridx >= self.RL) | (route < 0), -1.0, val)

    # -- one simulation second ----------------------------------------
    @_exact_matmuls
    def substep(self, state: EnvState, code_lc: jnp.ndarray, collect_stats=True):
        """Advance 1 s. ``code_lc`` [L, C] lane codes (see lane_codes).
        -> (state, stats).

        Structured for XLA fusion: one elementwise+reduction pass over the
        moved [K, L] state, a block of tiny [L]-sized decision ops, then a
        single fused select-expression per output field (movement, compaction
        shift, transfer insert and injection insert all folded into one
        ``where`` chain). Lane occupancy/back-gap after each mutation is
        derived *analytically* instead of re-reducing: removing the front
        vehicle never changes the lane's minimum position (the front has the
        maximum), and inserts happen at known positions.
        """
        K, L, C = self.K, self.L, self.C
        d_jam = self.d_jam
        s = state
        t_f = s.t.astype(jnp.float32)
        key = jax.random.fold_in(s.key, s.t)
        # ONE fused uniform draw for every per-second random decision: the
        # threefry keystream is compute-heavy on TPU (each separate draw
        # costs a full hash chain over its output shape), and the four
        # independent draws here profiled as ~420 scalar-int ops per
        # substep. Slices of one (2L + 2F) draw are identically uniform.
        F = self.F
        u_all = jax.random.uniform(key, (2 * L + 2 * F,))
        u_turn_all = u_all[:L]
        u_cool_all = u_all[L:2 * L]
        u_bern_all = u_all[2 * L:2 * L + F]
        u_ft_all = u_all[2 * L + F:]

        # widened views of the narrow-dtype state (fused into consumers)
        s_speed = s.speed.astype(jnp.float32)
        s_wait = s.wait.astype(jnp.float32)

        # ---- pass 1: hypothetical movement + single reduction ---------
        # Followers' movement never depends on the front's exit decision
        # (bounds use *old* leader positions), so move everyone with the
        # front held at the stop line, reduce once, and patch the front row
        # later inside the fused output expression.
        if self.spec.dawdle_sigma > 0:
            # Krauss dawdling (SUMO sigma): random per-vehicle speed
            # reduction each second; the front row's draw is reused for the
            # separate front-of-lane computation below. With
            # dawdle_exempt_stopline, vehicles that could reach the stop
            # line within ~2 s keep full speed: the r4 calibration sweep
            # showed whole-population dawdling double-counts the already
            # headway-calibrated discharge and tips Monaco's peak into
            # gridlock (CALIBRATION.md round-4 sweep), while mid-lane
            # dawdling is the part that matches SUMO's free-flow speeds.
            daw = jax.random.uniform(jax.random.fold_in(key, 13), (K, L)) * (
                self.spec.dawdle_sigma * self.spec.veh_accel
            )
            if self.spec.dawdle_exempt_stopline:
                v_des0 = jnp.minimum(
                    s_speed + self.spec.veh_accel, self.lane_vmax[None, :])
                daw = jnp.where(
                    s.pos + 2.0 * v_des0 < self.lane_len[None, :], daw, 0.0
                )
        else:
            daw = None
        if self._use_pallas:
            active_i8 = s.active.astype(jnp.int8)
            state_fields = (s.pos, s.speed, s.wait, s.acc_wait, s.wait_cnt,
                            s.depart, s.route, s.ridx, s.next_slot, active_i8)
            n_active, back_new, front = kernels.prepass(
                state_fields, self.lane_vmax, self.lane_len,
                daw, accel=self.spec.veh_accel, d_jam=d_jam,
                interpret=self._pallas_interpret)
        else:
            v_des = jnp.minimum(
                s_speed + self.spec.veh_accel, self.lane_vmax[None, :])
            if daw is not None:
                v_des = jnp.maximum(v_des - daw, 0.0)
            leader_pos = jnp.concatenate(
                [jnp.full((1, L), BIG), s.pos[:-1]], axis=0)
            bound_held = leader_pos - d_jam
            bound_held = bound_held.at[0].set(self.lane_len)
            mpos = jnp.maximum(jnp.minimum(s.pos + v_des, bound_held), s.pos)
            mpos = jnp.where(s.active, mpos, 0.0)
            n_active = s.active.sum(0).astype(jnp.float32)  # [L]
            back_new = jnp.min(jnp.where(s.active, mpos, BIG), axis=0)

        # ---- [L]-sized decisions --------------------------------------
        # front rows come out of the prepass kernel on the pallas path so
        # the [K, L] state has no other consumers (layout copies at the
        # pallas boundary would otherwise eat the kernels' savings)
        if self._use_pallas:
            route0 = front[6].astype(jnp.int32)
            ridx0 = front[7].astype(jnp.int32)
            front_active = front[9] > 0.5
            front_pos, front_speed = front[0], front[1]
            wait0 = front[2]
            front_acc_wait0, front_wait_cnt0 = front[3], front[4]
            depart0_f = front[5]
            c_front = front[8].astype(jnp.int32)  # [L], -1 = arriving
        else:
            route0 = s.route[0].astype(jnp.int32)
            ridx0 = s.ridx[0].astype(jnp.int32)
            front_active = s.active[0]
            front_pos, front_speed = s.pos[0], s_speed[0]
            wait0 = s_wait[0]
            front_acc_wait0 = s.acc_wait[0].astype(jnp.float32)
            front_wait_cnt0 = s.wait_cnt[0].astype(jnp.float32)
            depart0_f = s.depart[0].astype(jnp.float32)
            c_front = s.next_slot[0].astype(jnp.int32)  # [L], -1 = arriving
        v_des_front = jnp.minimum(front_speed + self.spec.veh_accel, self.lane_vmax)
        if self.spec.dawdle_sigma > 0:
            v_des_front = jnp.maximum(v_des_front - daw[0], 0.0)
        free_front = front_pos + v_des_front  # position if allowed to cross
        reach_end = front_active & (free_front >= self.lane_len - 1e-6)
        is_arriving = c_front < 0
        # Route vehicles at the front may take ANY connection slot of their
        # edge that reaches their next route edge, preferring the one with
        # the best current signal — the stop-line analog of SUMO's lane
        # changing. Without this, a movement whose first-listed link shows
        # red while a parallel link is green would deadlock until teleport.
        nxt1 = self._route_next_edge(route0, ridx0 + 1)  # [L]
        match1 = (self.lane_tgt_edge == nxt1[:, None]) & (
            self.lane_tgt_edge >= 0
        )  # [L, C] — guard the -1 pads against the -1 route sentinel
        lane_ids_f = jnp.arange(L, dtype=jnp.float32)
        own_slot = self.lane_slot_from == lane_ids_f[:, None]  # [L, C]
        slot_score = jnp.where(
            match1, (code_lc + 1.0) * 2.0 + own_slot.astype(jnp.float32), 0.0
        )
        best_c = jnp.argmax(slot_score, axis=-1).astype(jnp.int32)
        use_best = (route0 >= 0) & match1.any(-1)
        c_front = jnp.where(use_best, best_c, c_front)
        c_oh = _onehot(jnp.maximum(c_front, 0), C)  # [L, C]
        sig_code = (code_lc * c_oh).sum(-1)  # [L]
        if self.has_conflicts:
            # permissive-green gap acceptance: a 'g' (code 2) movement may
            # cross only if no conflicting 'G' (code 3) movement has a
            # vehicle about to reach its stop line (within ~2 s). Foe
            # presence is scattered lane->link and gathered back through the
            # same static one-hot matmuls as the code lookup (MXU, no
            # dynamic gathers).
            foe = (
                front_active & ~is_arriving & (sig_code >= 3)
                & (front_pos + 2.0 * v_des_front >= self.lane_len)
            )
            # per-(edge, slot) foe occupancy: transport each lane's foe bit
            # and chosen slot edge-major, then bin the fronts by slot
            foe_e = self._to_edge(jnp.stack(
                [foe.astype(jnp.float32), c_front.astype(jnp.float32)],
                axis=-1,
            )).astype(jnp.float32)  # [E, P, 2]
            occ_ec = (
                (foe_e[..., 0:1] > 0.5)
                & (foe_e[..., 1:2] == jnp.arange(C, dtype=jnp.float32))
            ).astype(jnp.float32).sum(axis=1)  # [E, C]
            # indicator bits + small counts end to end: exact in bf16.
            # Clamp to occupancy 0/1: the padded always-green code column
            # accumulates every uncontrolled foe (can exceed the 256-int
            # bf16-exact range on big nets), and only presence matters to
            # the conflict threshold below.
            link_occ = jnp.minimum(
                _sel_mm(occ_ec.reshape(1, -1), self._code_sel_e)[0], 1.0)
            blocked = (_sel_mm(self._conflict, link_occ) > 0.5).astype(
                jnp.float32)
            blocked_ec = _sel_mm(self._code_sel_e, blocked).reshape(
                self.E, C)
            blocked_l = (
                self._edge_to_lane(blocked_ec).astype(jnp.float32) * c_oh
            ).sum(-1) > 0.5
            # driver impatience (SUMO's impatience/timeToImpatience): after
            # waiting this long at a permissive green the driver takes a gap
            # anyway. Our 1 s kinematics quantize foe arrivals too coarsely
            # to expose the sub-second gaps SUMO's yielding uses, so without
            # a bound, 'g' movements starve under any sustained conflicting
            # queue and seed gridlock webs.
            impatient = wait0 >= self.spec.yield_impatience_sec
            sig_ok = (sig_code >= 3) | (
                (sig_code >= 2) & (~blocked_l | impatient)
            )
        else:
            sig_ok = sig_code >= 2
        # SUMO yellow semantics: a vehicle that cannot comfortably stop
        # continues through 'y' — approximate as "would cross this second at
        # its current speed (no further acceleration)". Without this, yellow
        # is a hard 2 s red on every switch, cutting junction capacity well
        # below SUMO whenever the controller switches often.
        sig_ok = sig_ok | (
            (sig_code == 1) & (front_pos + front_speed >= self.lane_len - 1e-6)
        )

        # second hop: tables pre-gathered, select c_front then c2.
        # Single-time-bin scenarios skip the bin one-hot contraction.
        if self.TB == 1:
            h2_tc = self.h2_turn_cum[0]
        else:
            tb_oh = self._turn_bin_oh(s.t)  # [TB]
            h2_tc = jnp.einsum("t,tlcd->lcd", tb_oh, self.h2_turn_cum)
        tc_c = jnp.einsum("lcd,lc->ld", h2_tc, c_oh)  # [L, C2] cum probs
        u_turn = u_turn_all
        samp_c2 = jnp.minimum(
            jnp.sum(u_turn[:, None] > tc_c, axis=-1), tc_c.shape[-1] - 1
        ).astype(jnp.int32)
        nxt2 = self._route_next_edge(route0, ridx0 + 2)  # [L] f32
        h2e_c = jnp.einsum("lcd,lc->ld", self.h2_eout, c_oh)  # [L, C2]
        match = (h2e_c == nxt2[:, None]) & (h2e_c >= 0)

        # room on the arrival lanes (from the moved, front-held state).
        # All "value at the arrival lane / at the source lane" reads go
        # through static one-hot matmuls — never dynamic gathers.
        has_space = (n_active < K - 1) & ((back_new >= d_jam) | (n_active == 0))

        # per-entry-option tables [L, C+1]: queue length and space at the
        # candidate entry lanes h2_entry_ext[l, c_front, :]. All candidates
        # are lanes of the slot-c target edge, so one edge-major gather
        # ([L, C, P] lanes of te) plus the static lane-in-edge map opt_a_l
        # replaces the [L*C*(C+1), L] lane-level pre-gather.
        g_ent = self._at_target_edges(jnp.stack(
            [n_active.astype(jnp.float32), has_space.astype(jnp.float32)],
            axis=-1,
        ))  # [L, C, P, 2] bf16 — counts <= K, bits: exact
        t_ent = _exact_einsum("lcpv,lc->lpv", g_ent, c_oh)  # [L, P, 2]
        oa_c = jnp.einsum("lcd,lc->ld", self.opt_a_l, c_oh)  # [L, C+1]
        oa_oh = _onehot(oa_c.astype(jnp.int32), self.P)  # [L, C+1, P]
        q_opt = jnp.einsum("ldp,lp->ld", oa_oh, t_ent[..., 0])
        space_opt = jnp.einsum("ldp,lp->ld", oa_oh, t_ent[..., 1]) > 0.5
        # own-toLane bonus: parallel fronts with equal queues split to
        # their own connections' toLanes instead of herding (SUMO parallel
        # entry); never overrides a strictly shorter integer queue
        tol_bonus = jnp.einsum("lcd,lc->ld", self.h2_tol_bonus, c_oh)
        lane_score = jnp.where(
            match, 1e6 - q_opt[:, :C] + 0.5 * tol_bonus[:, :C], -1.0)
        route_c2 = jnp.where(
            match.any(-1), jnp.argmax(lane_score, -1), -1
        ).astype(jnp.int32)
        c2 = jnp.where(route0 >= 0, route_c2, samp_c2)
        h2dead_c = jnp.einsum("lc,lc->l", self.h2_dead, c_oh) > 0
        # route vehicles whose route ends on the target edge also arrive
        route_end = (route0 >= 0) & (route_c2 < 0)
        next_c2 = jnp.where(h2dead_c | route_end, -1, c2)

        # ---- entry-lane choice (SUMO lane-changing analog) -------------
        # Movement slots are edge-level, so a front can exit via its slot
        # from ANY lane of its edge. Route vehicles therefore enter their
        # movement's from-lane when it has room, but OVERFLOW to any other
        # lane of the target edge with space when it is full — modelling the
        # progressive merge SUMO achieves with continuous lane-changing.
        # Without this, single-from-lane movements collapse the storage and
        # discharge of multi-lane edges to one lane and the network
        # gridlocks far below SUMO's capacity.
        d_pref = jnp.where(next_c2 >= 0, next_c2, C)
        pref_oh = _onehot(d_pref, C + 1)
        pref_space = (space_opt * pref_oh).sum(-1) > 0.5
        # overflow score: any option with space, shortest queue first; only
        # options that are real lanes of the target edge (entry >= 0 always
        # holds by construction of h2_entry_ext)
        ovf_score = jnp.where(space_opt, 1e6 - q_opt + 0.5 * tol_bonus, -1.0)
        d_ovf = jnp.argmax(ovf_score, axis=-1).astype(jnp.int32)
        can_ovf = (route0 >= 0) & space_opt.any(-1)
        d_ent = jnp.where(pref_space | ~can_ovf, d_pref, d_ovf)
        c2_oh = _onehot(d_ent, C + 1)
        entry_lane = jnp.einsum(
            "lcd,lc,ld->l", self.h2_entry, c_oh, c2_oh
        ).astype(jnp.int32)

        # chosen entry lane as a lane-in-edge one-hot over the P axis
        # (c2_oh selects among the C+1 candidate options; opt_a_l maps the
        # option to its slot on the target edge)
        b_ent_oh = jnp.einsum("ldp,ld->lp", oa_oh, c2_oh)  # [L, P]

        def at_entry_ids(ids):
            """Per-source-lane value of integer-valued ``ids`` (< 65536) at
            its arrival lane — exact two-channel bf16 transport through the
            target-edge gather, selecting the entry lane's P slot."""
            g = self._at_target_edges(
                jnp.stack(_split_id(ids), axis=-1)
            )  # [L, C, P, 2] bf16
            at = _exact_einsum("lcpv,lc,lp->lv", g, c_oh, b_ent_oh)
            return _join_id(at[..., 0], at[..., 1])

        # space at the chosen (c_front, d_ent) option: already present in
        # space_opt (same target-edge gather, same c_oh contraction) —
        # reuse it instead of paying a second transport pass
        has_space_at = (
            space_opt.astype(jnp.float32) * c2_oh
        ).sum(-1) > 0.5
        # SUMO-like teleport (env.py:281-284): a front vehicle stuck longer
        # than teleport_sec jumps the junction, ignoring the signal (it still
        # needs space downstream); if even that fails for another 60 s it is
        # removed from the simulation.
        front_held_speed = jnp.where(
            front_active, jnp.minimum(free_front, self.lane_len) - front_pos, 0.0
        )
        held_halted = front_active & (front_held_speed < HALT_SPEED)
        tele_jump = held_halted & (wait0 + 1.0 > self.spec.teleport_sec)
        # removal applies to any front whose waiting clock ran out, even if
        # it could creep into a freed slot this second: in a welded jam the
        # whole column's clocks are in sync, so the chain then drains at
        # 1 veh/s (SUMO's per-vehicle time-to-teleport mass-evaporates
        # jammed columns the same way; gating removal on held_halted made
        # the drain 1 veh/360 s because each removal reset the followers'
        # clocks via the creep wave, and Monaco's peak gridlock never
        # cleared: greedy replay locked at reward ~-190 for the last 30
        # min while SUMO recovers to ~0)
        teleport = front_active & (
            wait0 + 1.0 > self.spec.teleport_sec + 60.0
        )

        sig_code = jnp.where(tele_jump, 4.0, sig_code)
        # fractional discharge headway: a cooled lane blocks this second's
        # exit with probability (headway - 1)
        p_block = float(min(max(self.spec.discharge_headway_sec - 1.0, 0.0), 1.0))
        if p_block >= 1.0:
            cool = s.exit_cool
        elif p_block <= 0.0:
            cool = jnp.zeros_like(s.exit_cool)
        else:
            cool = s.exit_cool & (u_cool_all < p_block)
        cand = (
            reach_end & ~is_arriving & (sig_ok | tele_jump) & has_space_at
            & ~teleport & ~cool
        )
        # ---- per-movement exit gate (merge discipline) ------------------
        # At most ONE front crosses per (edge, movement slot) per second:
        # the slot's own from-lane has right of way; fronts merging from
        # sibling lanes (entry overflow above) only fill its gaps. Keeps a
        # single-from-lane movement's DISCHARGE at 1 veh/s while its
        # STORAGE is shared across the edge's lanes.
        own_c = (own_slot * c_oh).sum(-1) > 0.5  # chosen slot departs my lane
        rot_l = (lane_ids_f + t_f) % L
        gate_prio = own_c.astype(jnp.float32) * L + rot_l
        # gate_prio = own_c*L + rot_l exceeds bf16-exact range: transport the
        # factors (own_c bit, rot_l base-256 split) and rebuild at the target
        rl_hi, rl_lo = _split_id(rot_l)
        # siblings = the other lanes of my own edge: one lane->edge
        # transport + an edge->lane broadcast makes them a free P axis
        sib_e = self._to_edge(jnp.stack(
            [cand.astype(jnp.float32), c_front.astype(jnp.float32),
             own_c.astype(jnp.float32), rl_hi, rl_lo],
            axis=-1,
        ))  # [E, P, 5]
        sib_at = self._edge_to_lane(
            sib_e.reshape(self.E, -1)
        ).reshape(L, self.P, 5)
        same_move = (
            self.lane_sib_valid & (sib_at[..., 0] > 0.5)
            & (sib_at[..., 1].astype(jnp.float32)
               == c_front.astype(jnp.float32)[:, None])
        )
        gp_at = sib_at[..., 2].astype(jnp.float32) * L + _join_id(
            sib_at[..., 3], sib_at[..., 4])
        lose_gate = (same_move & (gp_at > gate_prio[:, None])).any(-1)
        cand = cand & ~lose_gate
        # priority: signal class first (teleports outrank everything), then a
        # time-rotating per-lane tie-break so approaches alternate instead of
        # starving
        rot = (lane_ids_f + s.t.astype(jnp.float32)) % L

        # target-side contention, resolved at EDGE level: the candidate
        # sources of every lane of edge f are the [D_in, P] lane slots of
        # the edges feeding into f (a superset of the lanes that can
        # actually reach it — the to_me test on the transported entry-lane
        # id filters exactly as the per-lane source sets did).
        # The priority key sig_code*L + (L-1-rot) exceeds the bf16-exact
        # range, so its small-int FACTORS travel as separate channels
        # (sig_code <= 4; rot < L split base-256) and the key is rebuilt in
        # f32 at the target — bit-identical to transporting it whole.
        el_hi, el_lo = _split_id(entry_lane.astype(jnp.float32))
        rot_hi, rot_lo = _split_id(rot)
        # CHANNEL-MAJOR transport (channels as rows, big axes minor): the
        # candidate selector reads every (in-edge, lane) slot's values in
        # one [6, L] @ [L, M*E] matmul — the [E, D, P, 6]-shaped layout it
        # replaces forced tiny minor dims that XLA tile-pads to 128.
        M_c = self.D_in * self.P
        a6 = _sel_mm(
            jnp.stack([cand.astype(jnp.float32), el_hi, el_lo, sig_code,
                       rot_hi, rot_lo], axis=0),
            self._cand_selT, out_dtype=jnp.bfloat16,
        ).reshape(6, M_c, self.E)  # [6, M, E]
        cand_at = a6[0] > 0.5  # [M, E]
        el_at = _join_id(a6[1], a6[2])  # [M, E]
        to_me = cand_at[None] & (
            el_at[None] == self.edge_lane_f.T[:, None, :]
        )  # [P_tgt, M, E]
        prio_at = a6[3].astype(jnp.float32) * L + (
            L - 1.0 - _join_id(a6[4], a6[5]))
        key_at = jnp.where(to_me, prio_at[None], -1.0)  # [P_tgt, M, E]
        # argmax over the m axis: same d*P+p candidate order as the
        # lane-level source sets, so ties break identically
        win_m = jnp.argmax(key_at, axis=1)  # [P_tgt, E]
        incoming_e = jnp.max(key_at, axis=1) >= 0.0
        win_oh = (jnp.arange(M_c, dtype=jnp.int32)[None, :, None]
                  == win_m[:, None, :])  # [P_tgt, M, E]
        ine_src_me = self.ine_src_lane.reshape(self.E, M_c).T  # [M, E]
        win_src_e = jnp.where(
            incoming_e,
            (win_oh.astype(jnp.float32) * ine_src_me[None]).sum(axis=1),
            -1.0,
        )  # [P_tgt, E] winning source lane id or -1
        # back to lane-major: each lane reads its own (edge, slot) entry
        ws_hi, ws_lo = _split_id(win_src_e)
        back_lanes = _sel_mm(
            jnp.stack([incoming_e.astype(jnp.float32), ws_hi, ws_lo],
                      axis=0).reshape(3 * self.P, self.E),
            self._e2lT_oh, out_dtype=jnp.bfloat16,
        ).reshape(3, self.P, L).astype(jnp.float32)
        a_ohT = self.lane_a_oh.T  # [P, L]
        sel_a_T = lambda v: (v * a_ohT).sum(axis=0)  # exact single-select
        incoming = sel_a_T(back_lanes[0]) > 0.5
        win_src = jnp.where(
            incoming,
            _join_id(sel_a_T(back_lanes[1]), sel_a_T(back_lanes[2])),
            -1.0,
        )  # [L] source lane id or -1

        # source side: did I win my target's contention?
        win_src_at = at_entry_ids(win_src)
        exits = cand & (win_src_at == lane_ids_f)
        # trip statistics count only genuine route completions; a vehicle
        # evicted by the teleport clock never finished, so including it
        # would both inflate completed-trip counts and poison the
        # duration/wait means with ~360 s eviction waits (SUMO's teleported
        # vehicles are re-inserted downstream and complete later, so its
        # tripinfo has no such rows either)
        arrives = reach_end & is_arriving & ~cool
        removed = exits | arrives | teleport

        # waiting state of the front row (for trip stats)
        front_new_pos = jnp.where(
            exits | (reach_end & is_arriving & ~cool), free_front,
            jnp.minimum(free_front, self.lane_len))
        front_new_pos = jnp.where(front_active, front_new_pos, 0.0)
        front_new_speed = jnp.where(front_active, front_new_pos - front_pos, 0.0)
        front_halted = front_active & (front_new_speed < HALT_SPEED)
        front_wait = jnp.where(front_halted, wait0 + 1.0, 0.0)
        front_accw = front_acc_wait0 + front_halted.astype(jnp.float32)
        front_wcnt = front_wait_cnt0 + (
            front_halted & ~(wait0 > 0)
        ).astype(jnp.float32)
        # progress carried into the target lane, minus the junction-interior
        # distance of the chosen movement: a crossing vehicle enters the
        # target lane at a NEGATIVE position and spends ~via/speed seconds
        # traversing the junction box (SUMO internal-lane analog)
        via_c = (self.lane_via * c_oh).sum(-1)
        overshoot = jnp.maximum(front_new_pos - self.lane_len, 0.0) - via_c

        # trip bookkeeping for vehicles that finished (arrived or teleported)
        n_arrived = arrives.sum()
        trip_dur = jnp.where(
            arrives, t_f + 1.0 - depart0_f, 0.0
        ).sum()
        trip_wait = jnp.where(arrives, front_accw, 0.0).sum()
        trip_cnt = jnp.where(arrives, front_wcnt, 0.0).sum()

        # per-vehicle trip ring (eval only, cap > 1): scatter the up-to-L
        # finished trips of this second at n_arrived + running offset
        if s.trip_buf.shape[0] > 1:
            cap = s.trip_buf.shape[0]
            depart0 = depart0_f
            rows = jnp.stack(
                [depart0, t_f + 1.0 - depart0, front_accw, front_wcnt], axis=-1
            )  # [L, 4]
            offs = jnp.cumsum(arrives.astype(jnp.int32)) - 1
            idx = jnp.where(arrives, (s.n_arrived + offs) % cap, cap)
            trip_buf = s.trip_buf.at[idx].set(rows, mode="drop")
        else:
            trip_buf = s.trip_buf

        # transfer values, fetched target-side CHANNEL-MAJOR: the 17
        # channels ride as rows so the big L / M*E / E axes stay minor
        # through both selector matmuls (a channel-minor layout tile-pads
        # 17 -> 128 and profiled as ~40% of the Monaco substep).
        # Integer-valued channels travel exactly in single-pass bf16 via
        # base-256 splits; the two real-valued kinematic channels
        # (junction overshoot, crossing speed) ride an exact three-channel
        # bf16 decomposition (_split_f32), so trajectories stay
        # bit-identical to the all-f32 transport.
        accw_hi, accw_lo = _split_id(front_accw)
        wcnt_hi, wcnt_lo = _split_id(front_wcnt)
        dep_hi, dep_lo = _split_id(depart0_f)
        rte_hi, rte_lo = _split_id(route0.astype(jnp.float32))
        rix_hi, rix_lo = _split_id(ridx0.astype(jnp.float32))
        ov_hi, ov_mid, ov_lo = _split_f32(overshoot)
        sp_hi, sp_mid, sp_lo = _split_f32(front_new_speed)
        tr_T = jnp.stack(
            [accw_hi, accw_lo, wcnt_hi, wcnt_lo, dep_hi, dep_lo,
             rte_hi, rte_lo, rix_hi, rix_lo, next_c2.astype(jnp.float32),
             ov_hi, ov_mid, ov_lo, sp_hi, sp_mid, sp_lo],
            axis=0,
        )  # [17, L]
        M_c = self.D_in * self.P
        # every candidate (in-edge, lane) slot's channel values, then
        # expanded to each lane of the receiving edge — two 2D selector
        # matmuls (the m-major column order makes the reshape free)
        a_cand = _sel_mm(tr_T, self._cand_selT,
                         out_dtype=jnp.bfloat16)  # [17, M*E]
        a_cand_l = _sel_mm(
            a_cand.reshape(17 * M_c, self.E), self._e2lT_oh,
            out_dtype=jnp.bfloat16,
        ).reshape(17, M_c, L)
        # winner mask from the already-transported win_src: candidate
        # slots are distinct lanes, so matching the winning source-lane id
        # reproduces the edge-level argmax winner exactly (pads are -1 and
        # masked; win_src == -1 means no winner -> all-zero column)
        wn = ((self.cand_lane_T == win_src[None, :])
              & (self.cand_lane_T >= 0.0)).astype(jnp.bfloat16)  # [M, L]
        # <=1 nonzero per (channel, lane): the masked sum is a bf16-exact
        # single selection, identical to the one-hot einsum it replaces
        ati_T = (a_cand_l * wn[None, :, :]).sum(axis=1)  # [17, L]
        tv = jnp.stack(
            [_join_f32(ati_T[11], ati_T[12], ati_T[13]),
             _join_f32(ati_T[14], ati_T[15], ati_T[16]),
             _join_id(ati_T[0], ati_T[1]), _join_id(ati_T[2], ati_T[3]),
             _join_id(ati_T[4], ati_T[5]), _join_id(ati_T[6], ati_T[7]),
             _join_id(ati_T[8], ati_T[9]), ati_T[10]],
            axis=-1,
        )  # [L, 8] — same channel layout as the all-f32 transport

        # occupancy after removal + transfer-insert, derived analytically:
        # the front has the max position, so removing it never changes the
        # lane minimum; an empty lane's back becomes BIG.
        n_act2 = n_active - removed
        back2 = jnp.where(n_act2 == 0, BIG, back_new)
        entry_pos = jnp.minimum(tv[:, 0], back2 - d_jam)
        n_act3 = n_act2 + incoming
        back3 = jnp.where(incoming, entry_pos, back2)

        # ---- flow injection decisions ([F]-sized) ---------------------
        fl_active = (t_f >= self.flow_begin) & (t_f < self.flow_end)
        bern = (u_bern_all < self.flow_rate).astype(jnp.float32)
        inc = jnp.where(self.flow_is_bern > 0, bern, self.flow_rate)
        flow_acc = jnp.minimum(
            s.flow_acc + inc * fl_active.astype(jnp.float32), 100.0
        )
        if self.TB == 1:
            f_tc = self.f_turn_cum[0]  # [F, C]
        else:
            f_tc = jnp.einsum("t,tfc->fc", tb_oh, self.f_turn_cum)  # [F, C]
        u_ft = u_ft_all
        samp_fc = jnp.minimum(
            jnp.sum(u_ft[:, None] > f_tc, axis=-1), f_tc.shape[-1] - 1
        ).astype(jnp.int32)
        f_slot = jnp.where(self.flow_route >= 0, self.f_route_slot, samp_fc)
        f_slot = jnp.where(self.f_dead, -1, f_slot)
        fc_oh = _onehot(jnp.maximum(f_slot, 0), C)
        f_lane = jnp.where(
            f_slot >= 0,
            jnp.einsum("fc,fc->f", self.f_from, fc_oh),
            self.f_lane0,
        )  # [F] f32
        # Flow->lane plumbing, scatter-free: room and the winner's values
        # ride the small per-flow option selector ([F*(C+1), L] one-hot and
        # its transpose); flow CONTENTION is a pairwise [F, F] comparison
        # (F is tens of flows). Dynamic scatters measured 2.4x slower on
        # the whole large_grid substep — XLA:TPU lowers them to sequential
        # per-update loops.
        fl_f = f_lane  # [F] entry lane id (f32, always valid)
        opt_idx = jnp.where(f_slot >= 0, f_slot, C)  # chosen option
        opt_oh = _onehot(opt_idx, self.C + 1)  # [F, C+1]
        room_lane = (n_act3 < K - 1) & ((back3 >= d_jam) | (n_act3 == 0))
        room_f = (
            _sel_mm(self._flopt_sel, room_lane.astype(jnp.float32)[:, None]
                    ).reshape(F, self.C + 1) * opt_oh
        ).sum(-1) > 0.5
        want = (flow_acc >= 1.0) & room_f
        # winner = lowest flow id among wants sharing an entry lane
        fids_i = jnp.arange(F, dtype=jnp.int32)
        blocked_by = (
            want[None, :] & (fl_f[:, None] == fl_f[None, :])
            & (fids_i[:, None] > fids_i[None, :])
        )  # [F, F]: a lower-id want targets my lane
        inject = want & ~blocked_by.any(-1)
        # lane-side winner values: zero except the winner's option row, so
        # the selector-transpose sum reproduces exactly the winner's values
        rt_hi, rt_lo = _split_id(self.flow_route.astype(jnp.float32))
        inj_f = inject.astype(jnp.float32)
        # all masked channels are 0 and the winner is unique per lane, so
        # the selector sums reproduce the winner's raw channels exactly
        # (hi in [-1, 255], lo in [0, 255], slot in [-1, C]: bf16-exact)
        ch = jnp.stack(
            [inj_f, inj_f * rt_hi, inj_f * rt_lo,
             inj_f * f_slot.astype(jnp.float32)], axis=-1
        )  # [F, 4]
        rows = (opt_oh[..., None] * ch[:, None, :]).reshape(
            F * (self.C + 1), 4)
        at_l = _sel_mm(self._flopt_selT, rows)  # [L, 4] exact sums
        has_inj = at_l[:, 0] > 0.5
        inj_route = jnp.where(
            has_inj, _join_id(at_l[:, 1], at_l[:, 2]), -1.0)
        inj_slot = at_l[:, 3]
        flow_acc = flow_acc - inject.astype(jnp.float32)
        n_departed = inject.sum()

        # ---- fused per-field output expression ------------------------
        # out[k] = hot1 ? transfer_val : hot2 ? inject_val
        #          : removed ? moved[k+1] : moved[k]
        # On TPU the whole pass (movement commit + waiting updates +
        # compaction shift + inserts, all ten fields) is ONE Pallas kernel
        # (sim/kernels.outpass): state read once, written once. The XLA
        # branch below is the same arithmetic op-for-op (pinned by
        # tests/test_kernels.py).
        if self._use_pallas:
            dep_new = jnp.full(
                (L,), 1.0, jnp.float32) * (s.t + 1).astype(jnp.float32)
            vecs = jnp.stack([
                front_new_pos,
                removed.astype(jnp.float32),
                incoming.astype(jnp.float32),
                has_inj.astype(jnp.float32),
                n_act2, n_act3,
                entry_pos,
                tv[:, 1],                    # transfer speed
                tv[:, 2], tv[:, 3],          # acc_wait, wait_cnt
                tv[:, 4],                    # depart
                tv[:, 5],                    # route
                tv[:, 6] + 1.0,              # ridx, pre-incremented
                tv[:, 7],                    # next_slot
                inj_route, inj_slot,
                dep_new,
                self.lane_vmax, self.lane_len,
            ])  # [NV, L]
            (pos2, speed2, wait2, accw2, wcnt2, dep2, route2, ridx2,
             nslot2, act2_i8) = kernels.outpass(
                (s.pos, s.speed, s.wait, s.acc_wait, s.wait_cnt, s.depart,
                 s.route, s.ridx, s.next_slot, active_i8),
                vecs, daw, accel=self.spec.veh_accel, d_jam=d_jam,
                interpret=self._pallas_interpret)
            act2 = act2_i8 != 0
        else:
            iota_k = jnp.arange(K, dtype=jnp.int32)[:, None]  # [K, 1]
            hot1 = (iota_k == n_act2[None, :]) & incoming[None, :]
            hot2 = (iota_k == n_act3[None, :]) & has_inj[None, :]
            rem_row = removed[None, :]

            def out(moved, shifted, tval, ival):
                base = jnp.where(rem_row, shifted, moved)
                return jnp.where(
                    hot1, tval[None, :], jnp.where(hot2, ival[None, :], base))

            def shift_up(arr, fill):
                return jnp.concatenate(
                    [arr[1:], jnp.full((1, L), fill, arr.dtype)], axis=0
                )

            zL = jnp.zeros(L)
            # flow insertion at the lane entry (pos 0, speed 0). The
            # reference flows declare departPos="random_free" (real_net/
            # data/build_file.py:76), but SUMO's random_free still requires
            # a free gap with speed-adapted headroom, so in a jam insertion
            # is DELAYED much like entry insertion here; free-position
            # insertion without that check over-inserts into the peak and
            # collapses throughput (Monaco greedy replay: completed trips
            # 0.72x SUMO, n_veh 2.16x; entry insertion 0.97x / 1.60x).
            inj_pos = zL
            # movement with the real front bound
            new_pos = mpos.at[0].set(front_new_pos)
            new_speed = jnp.where(s.active, new_pos - s.pos, 0.0)
            halted = s.active & (new_speed < HALT_SPEED)
            wait = jnp.where(halted, s_wait + 1.0, 0.0)
            acc_wait = s.acc_wait + halted.astype(jnp.int16)
            wait_cnt = s.wait_cnt + (halted & ~(s_wait > 0)).astype(jnp.int16)

            zi16 = jnp.zeros(L, jnp.int16)
            pos2 = out(new_pos, shift_up(new_pos, 0.0), entry_pos, inj_pos)
            speed2 = out(new_speed, shift_up(new_speed, 0.0), tv[:, 1], zL)
            wait2 = out(wait, shift_up(wait, 0.0), zL, zL)
            accw2 = out(
                acc_wait, shift_up(acc_wait, 0), tv[:, 2].astype(jnp.int16),
                zi16
            )
            wcnt2 = out(
                wait_cnt, shift_up(wait_cnt, 0), tv[:, 3].astype(jnp.int16),
                zi16
            )
            dep2 = out(
                s.depart, shift_up(s.depart, 0), tv[:, 4].astype(jnp.int16),
                zi16 + (s.t + 1).astype(jnp.int16),
            )
            route2 = out(
                s.route, shift_up(s.route, -1),
                tv[:, 5].astype(jnp.int16), inj_route.astype(jnp.int16),
            )
            ridx2 = out(
                s.ridx, shift_up(s.ridx, 0),
                tv[:, 6].astype(jnp.int16) + 1, zi16,
            )
            nslot2 = out(
                s.next_slot, shift_up(s.next_slot, -1),
                tv[:, 7].astype(jnp.int8), inj_slot.astype(jnp.int8),
            )
            act2 = hot1 | hot2 | jnp.where(
                rem_row, shift_up(s.active, False), s.active)

        # ---- per-second stats (ref env.py:409-437) --------------------
        if collect_stats:
            n_veh = act2.sum()
            sum_wait = jnp.where(act2, wait2.astype(jnp.float32), 0.0).sum()
            sum_speed = jnp.where(act2, speed2.astype(jnp.float32), 0.0).sum()
            halted2 = act2 & (speed2 < HALT_SPEED)
            lane_halt = halted2.sum(0).astype(jnp.float32)
            q = _sel_mm(self._det_sel, lane_halt)  # counts: bf16-exact
            stats = StepStats(
                n_veh=n_veh,
                n_departed=n_departed,
                n_arrived=n_arrived,
                avg_wait=sum_wait / jnp.maximum(n_veh, 1),
                avg_speed=sum_speed / jnp.maximum(n_veh, 1),
                avg_queue=q.mean(),
                std_queue=q.std(),
            )
        else:
            stats = None

        new_state = EnvState(
            pos=pos2, speed=speed2, wait=wait2, acc_wait=accw2, wait_cnt=wcnt2,
            depart=dep2, route=route2, ridx=ridx2, next_slot=nslot2, active=act2,
            # headway cooldown only for vehicles that actually crossed the
            # stop line; a teleported front vanished without discharging, so
            # its lane owes no headway next second
            exit_cool=removed & ~teleport, flow_acc=flow_acc,
            prev_action=s.prev_action,
            t=s.t + 1, key=s.key,
            n_departed=s.n_departed + n_departed,
            n_arrived=s.n_arrived + n_arrived,
            n_teleported=s.n_teleported + teleport.sum().astype(jnp.int32),
            trip_dur_sum=s.trip_dur_sum + trip_dur,
            trip_wait_sum=s.trip_wait_sum + trip_wait,
            trip_cnt_sum=s.trip_cnt_sum + trip_cnt,
            trip_buf=trip_buf,
        )
        return new_state, stats

    # -- measurements at control boundaries -----------------------------
    @_exact_matmuls
    def measure(self, state: EnvState):
        """-> (wave [N,I], wait [N,I], queue [N,I]) raw, unnormalized."""
        s = state
        N, I = self.N, self.I_max
        on_det = s.active & (s.pos >= self.det_start[None, :])
        lane_wave = on_det.sum(0).astype(jnp.float32)
        halted = on_det & (s.speed < HALT_SPEED)
        lane_queue = halted.sum(0).astype(jnp.float32)
        front_on = s.active[0] & (s.pos[0] >= self.det_start)
        lane_wait = jnp.where(front_on, s.wait[0].astype(jnp.float32), 0.0)
        # one fused exact-bf16 pass: wave/queue are counts <= K, wait is
        # integer seconds (< 65536) split base-256
        wt_hi, wt_lo = _split_id(lane_wait)
        g = _sel_mm(
            self._ild_sel,
            jnp.stack([lane_wave, lane_queue, wt_hi, wt_lo], axis=-1),
        ).reshape(N, I, 4)
        gathered_wave, queue = g[..., 0], g[..., 1]
        gathered_wait = _join_id(g[..., 2], g[..., 3])
        # cap applies per controlled lane AFTER chain aggregation
        # (env.py:332-333 clips the full-lane halting count)
        if self.spec.queue_cap > 0:
            queue = jnp.minimum(queue, self.spec.queue_cap)
        return gathered_wave, gathered_wait, queue

    # -- one control step -----------------------------------------------
    def control_step(
        self,
        state: EnvState,
        action: jnp.ndarray,
        yellow_sec: int,
        green_sec: int,
        collect_stats: bool = True,
    ) -> Tuple[EnvState, dict]:
        """Apply ``action`` [N] for one control interval (env.py:566-576):
        yellow transition then green, stepping 1 s at a time."""
        ylw_lc = self.lane_codes(self.signal_codes(action, state.prev_action, True))
        grn_lc = self.lane_codes(self.signal_codes(action, state.prev_action, False))
        state = dataclasses.replace(state, prev_action=action)

        def body(st, i):
            code_lc = jnp.where(i < yellow_sec, ylw_lc, grn_lc)
            st, stats = self.substep(st, code_lc, collect_stats)
            return st, stats

        state, stats = jax.lax.scan(
            body, state, jnp.arange(yellow_sec + green_sec, dtype=jnp.int32)
        )
        wave, wait, queue = self.measure(state)
        return state, dict(wave=wave, wait=wait, queue=queue, stats=stats)
