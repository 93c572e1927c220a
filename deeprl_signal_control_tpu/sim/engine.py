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
* At most one vehicle leaves / enters a lane per 1 s substep (saturation flow
  <= 3600 veh/h/lane, same order as SUMO's Krauss model), so lane transfer is
  one gather + one scatter-max (junction contention) + one one-hot insert.
* Signals: green masks come from the phase table; yellow transitions are
  derived from (prev_action, action) exactly like env.py:128-152 (G/g -> r
  shows yellow, r -> G/g held red, nodes with no switch-off go green
  directly).
* Waiting time follows SUMO semantics: consecutive seconds with
  speed < 0.1 m/s; lanearea "wave" = vehicle count on the detector span;
  "wait" observation = waiting time of the front-most vehicle on the detector
  (env.py:369-407); queue = halted count on the detector (env.py:325-336).
* Vehicles stuck at the head of a lane longer than ``teleport_sec`` are
  removed like SUMO's --time-to-teleport (env.py:281-284) and counted as
  arrived.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..scenarios.spec import FLOW_BERNOULLI, FLOW_PERIODIC, NetworkSpec

HALT_SPEED = 0.1  # SUMO halting / waiting threshold (m/s)
BIG = 1e9


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EnvState:
    """Dynamic per-environment state (single env; vmap adds the batch axis)."""

    # per vehicle slot [K, L]
    pos: jnp.ndarray  # front-bumper distance from lane start (f32)
    speed: jnp.ndarray  # f32
    wait: jnp.ndarray  # consecutive waiting seconds (f32)
    acc_wait: jnp.ndarray  # total waiting seconds (f32)
    wait_cnt: jnp.ndarray  # number of waiting episodes (f32)
    depart: jnp.ndarray  # departure sim-second (f32)
    route: jnp.ndarray  # route id, -1 = turn-probability routed (i32)
    ridx: jnp.ndarray  # position of current edge within route (i32)
    next_slot: jnp.ndarray  # outgoing-connection slot at end of lane, -1 = arrive (i32)
    active: jnp.ndarray  # bool
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
    trip_dur_sum: jnp.ndarray  # f32
    trip_wait_sum: jnp.ndarray  # f32
    trip_cnt_sum: jnp.ndarray  # f32


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


jax.tree_util.register_dataclass(StepStats)


class Engine:
    def __init__(self, spec: NetworkSpec):
        self.spec = spec
        self.d_jam = float(spec.veh_len + spec.min_gap)
        self.K = int(np.ceil(spec.lane_length.max() / self.d_jam)) + 2
        self.L = spec.n_lanes
        self.F = max(1, len(spec.flow_edge))
        self.N = spec.n_nodes
        self.C = spec.eout_edge.shape[1]

        as_j = lambda x, dt: jnp.asarray(np.asarray(x), dtype=dt)
        self.lane_len = as_j(spec.lane_length, jnp.float32)
        self.lane_vmax = as_j(spec.lane_vmax, jnp.float32)
        self.lane_edge = as_j(spec.lane_edge, jnp.int32)
        self.det_start = as_j(spec.det_start, jnp.float32)
        self.eout_edge = as_j(spec.eout_edge, jnp.int32)
        self.eout_from_lane = as_j(spec.eout_from_lane, jnp.int32)
        self.eout_to_lane = as_j(spec.eout_to_lane, jnp.int32)
        self.eout_link = as_j(spec.eout_link, jnp.int32)
        self.edge_lane0 = as_j(spec.edge_lane[:, 0], jnp.int32)
        self.edge_is_sink = as_j(spec.edge_is_sink, bool)
        self.edge_has_out = as_j((spec.eout_edge >= 0).any(axis=1), bool)
        self.phase_table = as_j(spec.phase_table, jnp.int32)  # [N, A, LK]
        self.link_node = as_j(spec.link_node, jnp.int32)
        self.link_pos = as_j(spec.link_pos, jnp.int32)
        self.node_ild = as_j(spec.node_ild, jnp.int32)  # [N, I]
        self.ild_mask = self.node_ild >= 0
        self.node_ild_safe = jnp.maximum(self.node_ild, 0)
        # flows
        if len(spec.flow_edge):
            self.flow_edge = as_j(spec.flow_edge, jnp.int32)
            self.flow_route = as_j(spec.flow_route, jnp.int32)
            self.flow_begin = as_j(spec.flow_begin, jnp.float32)
            self.flow_end = as_j(spec.flow_end, jnp.float32)
            self.flow_rate = as_j(spec.flow_rate, jnp.float32)
            self.flow_mode = as_j(spec.flow_mode, jnp.int32)
        else:  # degenerate no-demand network
            z = jnp.zeros(1)
            self.flow_edge = jnp.zeros(1, jnp.int32)
            self.flow_route = -jnp.ones(1, jnp.int32)
            self.flow_begin, self.flow_end = z, z
            self.flow_rate = z
            self.flow_mode = jnp.zeros(1, jnp.int32)
        self.route_edges = as_j(spec.route_edges, jnp.int32)  # [R, RL]
        self.turn_cum = jnp.cumsum(as_j(spec.turn_prob, jnp.float32), axis=2)
        self.n_turn_bins = spec.turn_prob.shape[0]
        self.turn_bin_sec = float(spec.turn_bin_sec)
        # flattened detector-lane list for network-wide queue stats
        det_lanes = np.unique(spec.node_ild[spec.node_ild >= 0])
        self.det_lanes = as_j(det_lanes, jnp.int32)

    # ------------------------------------------------------------------
    def init_state(self, key) -> EnvState:
        K, L, F, N = self.K, self.L, self.F, self.N
        zf = lambda: jnp.zeros((K, L), jnp.float32)
        return EnvState(
            pos=zf(), speed=zf(), wait=zf(), acc_wait=zf(), wait_cnt=zf(),
            depart=zf(),
            route=-jnp.ones((K, L), jnp.int32),
            ridx=jnp.zeros((K, L), jnp.int32),
            next_slot=-jnp.ones((K, L), jnp.int32),
            active=jnp.zeros((K, L), bool),
            flow_acc=jnp.zeros(F, jnp.float32),
            prev_action=-jnp.ones(N, jnp.int32),
            t=jnp.zeros((), jnp.int32),
            key=key,
            n_departed=jnp.zeros((), jnp.int32),
            n_arrived=jnp.zeros((), jnp.int32),
            trip_dur_sum=jnp.zeros((), jnp.float32),
            trip_wait_sum=jnp.zeros((), jnp.float32),
            trip_cnt_sum=jnp.zeros((), jnp.float32),
        )

    # -- signals -------------------------------------------------------
    def link_codes(self, action: jnp.ndarray) -> jnp.ndarray:
        """Per-link signal code for node actions [N] -> [n_links]."""
        return self.phase_table[self.link_node, action[self.link_node], self.link_pos]

    def signal_codes(self, action, prev_action, is_yellow):
        """Green-phase or derived yellow-transition codes (env.py:128-152)."""
        cur = self.link_codes(action)
        prev = self.link_codes(jnp.where(prev_action < 0, action, prev_action))
        switch_red = (prev >= 2) & (cur == 0)
        switch_green = (prev == 0) & (cur >= 2)
        # node-level: any G/g->r switch at this node?
        node_any_red = jax.ops.segment_max(
            switch_red.astype(jnp.int32), self.link_node, num_segments=self.N
        )
        use_yellow = is_yellow & (node_any_red[self.link_node] > 0) & (
            prev_action[self.link_node] >= 0
        ) & (action[self.link_node] != prev_action[self.link_node])
        ylw = jnp.where(switch_red, 1, jnp.where(switch_green, 0, cur))
        return jnp.where(use_yellow, ylw, cur)

    # -- helpers -------------------------------------------------------
    def _sample_slot(self, cum_probs, u):
        """Inverse-CDF sample of a connection slot. cum_probs [..., C]."""
        return jnp.sum(u[..., None] > cum_probs, axis=-1).astype(jnp.int32)

    def _next_slot_for(self, edge, route, ridx, sampled_c):
        """Outgoing slot a vehicle will take at the end of ``edge``.

        route >= 0: the slot matching route_edges[route, ridx+1];
        route < 0: the turn-sampled slot; sinks / dead-ends: -1.
        """
        nxt_edge = self.route_edges[jnp.maximum(route, 0), jnp.minimum(
            ridx + 1, self.route_edges.shape[1] - 1
        )]
        match = self.eout_edge[edge] == nxt_edge[..., None]  # [..., C]
        route_c = jnp.where(
            match.any(-1), jnp.argmax(match, -1).astype(jnp.int32), -1
        )
        c = jnp.where(route >= 0, route_c, sampled_c)
        dead = self.edge_is_sink[edge] | ~self.edge_has_out[edge]
        return jnp.where(dead, -1, c)

    def _turn_bin(self, t):
        b = (t.astype(jnp.float32) / self.turn_bin_sec).astype(jnp.int32)
        return jnp.clip(b, 0, self.n_turn_bins - 1)

    # -- one simulation second ----------------------------------------
    def substep(self, state: EnvState, link_code: jnp.ndarray):
        """Advance 1 s. Returns (state, StepStats)."""
        K, L, C = self.K, self.L, self.C
        d_jam = self.d_jam
        s = state
        t_f = s.t.astype(jnp.float32)
        key = jax.random.fold_in(s.key, s.t)
        k_turn, k_flowturn, k_bern = jax.random.split(key, 3)
        tbin = self._turn_bin(s.t)

        lane_edge = self.lane_edge  # [L]
        green = link_code >= 2  # g or G passable

        # ---- phase A: who may leave each lane -------------------------
        front_active = s.active[0]  # [L]
        front_pos, front_speed = s.pos[0], s.speed[0]
        v_des_front = jnp.minimum(front_speed + self.spec.veh_accel, self.lane_vmax)
        reach_end = front_active & (front_pos + v_des_front >= self.lane_len - 1e-6)
        c_front = s.next_slot[0]  # [L]
        is_arriving = c_front < 0
        c_safe = jnp.maximum(c_front, 0)
        link = self.eout_link[lane_edge, c_safe]
        sig_ok = jnp.where(link >= 0, green[jnp.maximum(link, 0)], True)
        sig_code = jnp.where(link >= 0, link_code[jnp.maximum(link, 0)], 3)
        # the movement must depart from this lane (it does by construction)
        tgt_edge = self.eout_edge[lane_edge, c_safe]  # [L]
        # sample the *following* movement now so we know the arrival lane
        u_turn = jax.random.uniform(k_turn, (L,))
        samp_c2 = self._sample_slot(self.turn_cum[tbin, jnp.maximum(tgt_edge, 0)], u_turn)
        next_c2 = self._next_slot_for(
            jnp.maximum(tgt_edge, 0), s.route[0], s.ridx[0] + 1, samp_c2
        )
        entry_lane = jnp.where(
            next_c2 >= 0,
            self.eout_from_lane[jnp.maximum(tgt_edge, 0), jnp.maximum(next_c2, 0)],
            self.edge_lane0[jnp.maximum(tgt_edge, 0)],
        )  # [L]

        # room on the arrival lane (positions before movement; conservative)
        n_active = s.active.sum(0)  # [L]
        back_pos = jnp.min(jnp.where(s.active, s.pos, BIG), axis=0)  # [L]
        has_space = (n_active[entry_lane] < K - 1) & (
            (back_pos[entry_lane] >= d_jam) | (n_active[entry_lane] == 0)
        )

        cand = reach_end & ~is_arriving & sig_ok & has_space
        # junction contention: one entrant per lane; G beats g beats others
        lane_ids = jnp.arange(L, dtype=jnp.int32)
        prio = sig_code * L + (L - 1 - lane_ids)
        tgt_key = jnp.full(L, -1, jnp.int32).at[
            jnp.where(cand, entry_lane, L)
        ].max(prio, mode="drop")
        exits = cand & (tgt_key[entry_lane] == prio)
        arrives = reach_end & is_arriving

        # ---- phase B: movement ---------------------------------------
        v_des = jnp.minimum(s.speed + self.spec.veh_accel, self.lane_vmax[None, :])
        leader_pos = jnp.concatenate([jnp.full((1, L), BIG), s.pos[:-1]], axis=0)
        bound = leader_pos - d_jam
        front_bound = jnp.where(exits | arrives, BIG, self.lane_len)
        bound = bound.at[0].set(front_bound)
        new_pos = jnp.minimum(s.pos + v_des, bound)
        new_pos = jnp.maximum(new_pos, s.pos)
        new_speed = jnp.where(s.active, new_pos - s.pos, 0.0)
        new_pos = jnp.where(s.active, new_pos, 0.0)

        # ---- waiting / teleport --------------------------------------
        halted = s.active & (new_speed < HALT_SPEED)
        was_halted = s.wait > 0
        wait = jnp.where(halted, s.wait + 1.0, 0.0)
        acc_wait = s.acc_wait + halted.astype(jnp.float32)
        wait_cnt = s.wait_cnt + (halted & ~was_halted).astype(jnp.float32)
        teleport = (wait[0] > self.spec.teleport_sec) & s.active[0]

        # ---- phase C: removals at slot 0 ------------------------------
        # actually crossed the stop line?
        crossed = (exits | arrives) & (new_pos[0] >= self.lane_len - 1e-6)
        exits = exits & crossed & ~teleport
        arrives = (arrives & crossed) | teleport
        removed = exits | arrives
        overshoot = jnp.maximum(new_pos[0] - self.lane_len, 0.0)

        # trip bookkeeping for vehicles that finished (arrived or teleported)
        fin = arrives
        n_arrived = fin.sum()
        trip_dur = jnp.where(fin, t_f + 1.0 - s.depart[0], 0.0).sum()
        trip_wait = jnp.where(fin, acc_wait[0], 0.0).sum()
        trip_cnt = jnp.where(fin, wait_cnt[0], 0.0).sum()

        # inverse map: for each lane, which source lane sends a vehicle in?
        src_of = jnp.full(L, -1, jnp.int32).at[
            jnp.where(exits, entry_lane, L)
        ].max(lane_ids, mode="drop")
        incoming = src_of >= 0
        src = jnp.maximum(src_of, 0)

        def compact(arr, fill=0.0):
            shifted = jnp.concatenate(
                [arr[1:], jnp.full((1, L), fill, arr.dtype)], axis=0
            )
            return jnp.where(removed[None, :], shifted, arr)

        pos2 = compact(new_pos)
        speed2 = compact(new_speed)
        wait2 = compact(wait)
        accw2 = compact(acc_wait)
        wcnt2 = compact(wait_cnt)
        dep2 = compact(s.depart)
        route2 = compact(s.route, -1)
        ridx2 = compact(s.ridx, 0)
        nslot2 = compact(s.next_slot, -1)
        act2 = compact(s.active, False)

        # ---- insert transferred vehicles at the back ------------------
        n_act2 = act2.sum(0)  # [L]
        back2 = jnp.min(jnp.where(act2, pos2, BIG), axis=0)
        entry_pos = jnp.clip(overshoot[src], 0.0, jnp.maximum(back2 - d_jam, 0.0))
        slot_hot = (
            jnp.arange(K, dtype=jnp.int32)[:, None] == n_act2[None, :]
        ) & incoming[None, :]  # [K, L]

        def insert(arr, vals):
            return jnp.where(slot_hot, vals[None, :], arr)

        pos2 = insert(pos2, entry_pos)
        speed2 = insert(speed2, new_speed[0][src])
        wait2 = insert(wait2, jnp.zeros(L))  # a transferring vehicle is moving
        accw2 = insert(accw2, acc_wait[0][src])
        wcnt2 = insert(wcnt2, wait_cnt[0][src])
        dep2 = insert(dep2, s.depart[0][src])
        route2 = insert(route2, s.route[0][src])
        ridx2 = insert(ridx2, s.ridx[0][src] + 1)
        nslot2 = insert(nslot2, next_c2[src])
        act2 = act2 | slot_hot

        # ---- phase D: flow injection ---------------------------------
        fl_active = (t_f >= self.flow_begin) & (t_f < self.flow_end)
        bern = (
            jax.random.uniform(k_bern, (self.F,)) < self.flow_rate
        ).astype(jnp.float32)
        inc = jnp.where(
            self.flow_mode == FLOW_BERNOULLI, bern, self.flow_rate
        ) * fl_active.astype(jnp.float32)
        flow_acc = jnp.minimum(s.flow_acc + inc, 100.0)

        u_ft = jax.random.uniform(k_flowturn, (self.F,))
        samp_fc = self._sample_slot(self.turn_cum[tbin, self.flow_edge], u_ft)
        f_slot = self._next_slot_for(
            self.flow_edge, self.flow_route, jnp.zeros_like(self.flow_route), samp_fc
        )
        f_lane = jnp.where(
            f_slot >= 0,
            self.eout_from_lane[self.flow_edge, jnp.maximum(f_slot, 0)],
            self.edge_lane0[self.flow_edge],
        )
        n_act3 = act2.sum(0)
        back3 = jnp.min(jnp.where(act2, pos2, BIG), axis=0)
        room = (n_act3[f_lane] < K - 1) & (
            (back3[f_lane] >= d_jam) | (n_act3[f_lane] == 0)
        )
        want = (flow_acc >= 1.0) & room
        fids = jnp.arange(self.F, dtype=jnp.int32)
        lane_winner = jnp.full(L, self.F, jnp.int32).at[
            jnp.where(want, f_lane, L)
        ].min(fids, mode="drop")
        inject = want & (lane_winner[f_lane] == fids)
        flow_acc = flow_acc - inject.astype(jnp.float32)
        n_departed = inject.sum()

        inj_of = jnp.full(L, self.F, jnp.int32).at[
            jnp.where(inject, f_lane, L)
        ].min(fids, mode="drop")
        has_inj = inj_of < self.F
        fsrc = jnp.minimum(inj_of, self.F - 1)
        slot_hot2 = (
            jnp.arange(K, dtype=jnp.int32)[:, None] == n_act3[None, :]
        ) & has_inj[None, :]

        def insert2(arr, vals):
            return jnp.where(slot_hot2, vals[None, :], arr)

        pos2 = insert2(pos2, jnp.zeros(L))
        speed2 = insert2(speed2, jnp.zeros(L))
        wait2 = insert2(wait2, jnp.zeros(L))
        accw2 = insert2(accw2, jnp.zeros(L))
        wcnt2 = insert2(wcnt2, jnp.zeros(L))
        dep2 = insert2(dep2, jnp.full(L, 0.0) + t_f + 1.0)
        route2 = insert2(route2, self.flow_route[fsrc])
        ridx2 = insert2(ridx2, jnp.zeros(L, jnp.int32))
        nslot2 = insert2(nslot2, f_slot[fsrc])
        act2 = act2 | slot_hot2

        # ---- per-second stats (ref env.py:409-437) --------------------
        n_veh = act2.sum()
        sum_wait = jnp.where(act2, wait2, 0.0).sum()
        sum_speed = jnp.where(act2, speed2, 0.0).sum()
        halted2 = act2 & (speed2 < HALT_SPEED)
        lane_halt = halted2.sum(0).astype(jnp.float32)  # full-lane halting
        q = lane_halt[self.det_lanes]
        stats = StepStats(
            n_veh=n_veh,
            n_departed=n_departed,
            n_arrived=n_arrived,
            avg_wait=sum_wait / jnp.maximum(n_veh, 1),
            avg_speed=sum_speed / jnp.maximum(n_veh, 1),
            avg_queue=q.mean(),
            std_queue=q.std(),
        )

        new_state = EnvState(
            pos=pos2, speed=speed2, wait=wait2, acc_wait=accw2, wait_cnt=wcnt2,
            depart=dep2, route=route2, ridx=ridx2, next_slot=nslot2, active=act2,
            flow_acc=flow_acc, prev_action=s.prev_action,
            t=s.t + 1, key=s.key,
            n_departed=s.n_departed + n_departed,
            n_arrived=s.n_arrived + n_arrived,
            trip_dur_sum=s.trip_dur_sum + trip_dur,
            trip_wait_sum=s.trip_wait_sum + trip_wait,
            trip_cnt_sum=s.trip_cnt_sum + trip_cnt,
        )
        return new_state, stats

    # -- measurements at control boundaries -----------------------------
    def measure(self, state: EnvState):
        """-> (wave [N,I], wait [N,I], queue [N,I]) raw, unnormalized."""
        s = state
        on_det = s.active & (s.pos >= self.det_start[None, :])
        lane_wave = on_det.sum(0).astype(jnp.float32)  # [L]
        halted = on_det & (s.speed < HALT_SPEED)
        lane_queue = halted.sum(0).astype(jnp.float32)
        front_on = s.active[0] & (s.pos[0] >= self.det_start)
        lane_wait = jnp.where(front_on, s.wait[0], 0.0)
        gather = lambda x: jnp.where(self.ild_mask, x[self.node_ild_safe], 0.0)
        return gather(lane_wave), gather(lane_wait), gather(lane_queue)

    # -- one 5 s control step -------------------------------------------
    def control_step(
        self, state: EnvState, action: jnp.ndarray, yellow_sec: int, green_sec: int
    ) -> Tuple[EnvState, dict]:
        """Apply ``action`` [N] for one control interval (env.py:566-576):
        yellow transition then green, stepping 1 s at a time."""
        ylw_code = self.signal_codes(action, state.prev_action, True)
        grn_code = self.signal_codes(action, state.prev_action, False)
        state = dataclasses.replace(state, prev_action=action)

        def body(st, i):
            code = jnp.where(i < yellow_sec, ylw_code, grn_code)
            st, stats = self.substep(st, code)
            return st, stats

        state, stats = jax.lax.scan(
            body, state, jnp.arange(yellow_sec + green_sec, dtype=jnp.int32)
        )
        wave, wait, queue = self.measure(state)
        return state, dict(wave=wave, wait=wait, queue=queue, stats=stats)
