"""Pallas TPU kernels for the microsim's dense per-slot passes.

The substep's [K, L] work is two logical passes over the vehicle-slot
state: (1) hypothetical movement + per-lane occupancy reductions, and
(2) the fused per-field output expression (movement commit, compaction
shift, transfer insert, flow insert). Under XLA these lower to ~130
distinct [B, K, L]-shaped ops per substep (materialized broadcasts,
selects, converts — profiled at ~900 MB HBM per Monaco substep at B=64,
the dominant term of the hot loop). Hand-fusing each pass into one Pallas
kernel reads the state once and writes it once (~70 MB), leaving XLA the
[L]-sized decision logic and the selector matmuls it is good at.

Exactness: every operation is the same IEEE f32 elementwise arithmetic /
i32 integer arithmetic the XLA path performs, in the same order; per-lane
reductions (count, min) are exact regardless of order. The interpret-mode
equivalence test (tests/test_kernels.py) pins the kernels to the XLA
reference implementation bit-for-bit.

Layout: [K, L] blocks with K whole per tile (K <= ~32) and lanes tiled by
128-multiples; [L]-sized inputs ride one packed (NV, L) f32 matrix (counts
and ids are integer-valued f32, exact well past the ranges involved).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

HALT_SPEED = 0.1
BIG = 1e9

# rows of the packed [NV, L] vector input to the out-pass kernel
(IV_FNP, IV_REMOVED, IV_INCOMING, IV_HASINJ, IV_NACT2, IV_NACT3,
 IV_ENTRYPOS, IV_TVSPEED, IV_TVACCW, IV_TVWCNT, IV_TVDEP, IV_TVROUTE,
 IV_TVRIDX, IV_TVNSLOT, IV_INJROUTE, IV_INJSLOT, IV_DEPNEW, IV_VMAX,
 IV_LANELEN, NV) = range(20)


def _movement(pos, speed_f32, active, vmax, lane_len, accel, d_jam, daw):
    """Hypothetical movement with the front held at the stop line —
    identical formula to the XLA pass (engine.substep pass 1)."""
    v_des = jnp.minimum(speed_f32 + accel, vmax[None, :])
    if daw is not None:
        v_des = jnp.maximum(v_des - daw, 0.0)
    leader = jnp.concatenate(
        [jnp.full((1, pos.shape[1]), BIG, pos.dtype), pos[:-1]], axis=0
    )
    bound = leader - d_jam
    bound = jnp.concatenate([lane_len[None, :], bound[1:]], axis=0)
    mpos = jnp.maximum(jnp.minimum(pos + v_des, bound), pos)
    return jnp.where(active, mpos, 0.0)


def _prepass_kernel(accel, d_jam, has_daw,
                    pos_ref, speed_ref, wait_ref, accw_ref, wcnt_ref,
                    dep_ref, route_ref, ridx_ref, nslot_ref, active_ref,
                    vecs_ref, daw_ref,
                    nact_ref, back_ref, front_ref):
    pos = pos_ref[:]
    speed = speed_ref[:].astype(jnp.float32)
    active = active_ref[:] != 0
    vmax = vecs_ref[0, :]
    lane_len = vecs_ref[1, :]
    daw = daw_ref[:] if has_daw else None
    mpos = _movement(pos, speed, active, vmax, lane_len, accel, d_jam, daw)
    nact_ref[0, :] = active.sum(axis=0).astype(jnp.float32)
    back_ref[0, :] = jnp.min(jnp.where(active, mpos, BIG), axis=0)
    # front-of-lane rows, exported so the [L] decision logic never touches
    # the [K, L] state outside the kernels (avoids layout copies at the
    # pallas boundary). All values are exact in f32.
    front_ref[0, :] = pos[0]
    front_ref[1, :] = speed[0]
    front_ref[2, :] = wait_ref[0, :].astype(jnp.float32)
    front_ref[3, :] = accw_ref[0, :].astype(jnp.float32)
    front_ref[4, :] = wcnt_ref[0, :].astype(jnp.float32)
    front_ref[5, :] = dep_ref[0, :].astype(jnp.float32)
    front_ref[6, :] = route_ref[0, :].astype(jnp.float32)
    front_ref[7, :] = ridx_ref[0, :].astype(jnp.float32)
    front_ref[8, :] = nslot_ref[0, :].astype(jnp.float32)
    front_ref[9, :] = active_ref[0, :].astype(jnp.float32)


def _outpass_kernel(accel, d_jam, has_daw,
                    pos_ref, speed_ref, wait_ref, accw_ref, wcnt_ref,
                    dep_ref, route_ref, ridx_ref, nslot_ref, active_ref,
                    vecs_ref, daw_ref,
                    pos_o, speed_o, wait_o, accw_o, wcnt_o, dep_o,
                    route_o, ridx_o, nslot_o, act_o):
    K = pos_ref.shape[0]
    TL = pos_ref.shape[1]
    pos = pos_ref[:]
    speed = speed_ref[:].astype(jnp.float32)
    wait = wait_ref[:].astype(jnp.float32)
    # Mosaic cannot select/truncate 1-bit vectors: active travels as i8
    active_i8 = active_ref[:]
    active = active_i8 != 0
    V = vecs_ref[:]
    vmax, lane_len = V[IV_VMAX, :], V[IV_LANELEN, :]
    daw = daw_ref[:] if has_daw else None

    mpos = _movement(pos, speed, active, vmax, lane_len, accel, d_jam, daw)
    # commit the real front-row outcome decided by the [L] logic
    new_pos = jnp.concatenate([V[IV_FNP, :][None, :], mpos[1:]], axis=0)
    new_speed = jnp.where(active, new_pos - pos, 0.0)
    halted = active & (new_speed < HALT_SPEED)
    wait_n = jnp.where(halted, wait + 1.0, 0.0)
    accw_n = accw_ref[:] + halted.astype(jnp.int16)
    wcnt_n = wcnt_ref[:] + (halted & ~(wait > 0)).astype(jnp.int16)

    removed = V[IV_REMOVED, :] > 0.5
    incoming = V[IV_INCOMING, :] > 0.5
    has_inj = V[IV_HASINJ, :] > 0.5
    # tpu.iota is integer-only; the counts are exact small ints in f32
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (K, TL), 0)
    hot1 = (iota_k == V[IV_NACT2, :][None, :].astype(jnp.int32)) \
        & incoming[None, :]
    hot2 = (iota_k == V[IV_NACT3, :][None, :].astype(jnp.int32)) \
        & has_inj[None, :]
    rem_row = removed[None, :]

    def shift_up(arr, fill):
        return jnp.concatenate(
            [arr[1:], jnp.full((1, TL), fill, arr.dtype)], axis=0
        )

    zL = jnp.zeros((TL,), jnp.float32)

    route_w = route_ref[:]
    ridx_w = ridx_ref[:]
    nslot_w = nslot_ref[:]
    dep_w = dep_ref[:]

    # pos
    pos_o[:] = jnp.where(
        hot1, V[IV_ENTRYPOS, :][None, :],
        jnp.where(hot2, zL[None, :],
                  jnp.where(rem_row, shift_up(new_pos, 0.0), new_pos)))
    # speed
    speed_o[:] = jnp.where(
        hot1, V[IV_TVSPEED, :][None, :],
        jnp.where(hot2, zL[None, :],
                  jnp.where(rem_row, shift_up(new_speed, 0.0), new_speed))
    )
    # wait (transfer and inject both reset to 0)
    wait_o[:] = jnp.where(
        hot1 | hot2, zL[None, :],
        jnp.where(rem_row, shift_up(wait_n, 0.0), wait_n)
    )
    # acc_wait
    accw_o[:] = jnp.where(
        hot1, V[IV_TVACCW, :][None, :].astype(jnp.int16),
        jnp.where(hot2, jnp.zeros((1, TL), jnp.int16),
                  jnp.where(rem_row, shift_up(accw_n, 0), accw_n)))
    # wait_cnt
    wcnt_o[:] = jnp.where(
        hot1, V[IV_TVWCNT, :][None, :].astype(jnp.int16),
        jnp.where(hot2, jnp.zeros((1, TL), jnp.int16),
                  jnp.where(rem_row, shift_up(wcnt_n, 0), wcnt_n)))
    # depart
    dep_o[:] = jnp.where(
        hot1, V[IV_TVDEP, :][None, :].astype(jnp.int16),
        jnp.where(hot2, V[IV_DEPNEW, :][None, :].astype(jnp.int16),
                  jnp.where(rem_row, shift_up(dep_w, 0), dep_w)))
    # route
    route_o[:] = jnp.where(
        hot1, V[IV_TVROUTE, :][None, :].astype(jnp.int16),
        jnp.where(hot2, V[IV_INJROUTE, :][None, :].astype(jnp.int16),
                  jnp.where(rem_row, shift_up(route_w, -1), route_w)))
    # ridx (transfer value arrives pre-incremented from the [L] logic)
    ridx_o[:] = jnp.where(
        hot1, V[IV_TVRIDX, :][None, :].astype(jnp.int16),
        jnp.where(hot2, jnp.zeros((1, TL), jnp.int16),
                  jnp.where(rem_row, shift_up(ridx_w, 0), ridx_w)))
    # next_slot
    nslot_o[:] = jnp.where(
        hot1, V[IV_TVNSLOT, :][None, :].astype(jnp.int8),
        jnp.where(hot2, V[IV_INJSLOT, :][None, :].astype(jnp.int8),
                  jnp.where(rem_row, shift_up(nslot_w, -1), nslot_w)))
    # active (i8 data selects; the engine re-widens to bool)
    act_o[:] = jnp.where(
        hot1 | hot2, jnp.ones((1, TL), jnp.int8),
        jnp.where(rem_row, shift_up(active_i8, 0), active_i8))


def prepass(state_fields, vmax, lane_len, daw=None, *,
            accel, d_jam, interpret=False):
    """-> (n_active f32 [L], back_new f32 [L], front [10, L] f32) — one
    fused read of the [K, L] state: occupancy reductions plus the front-row
    export consumed by the [L] decision logic."""
    pos = state_fields[0]
    K, L = pos.shape
    TL = _tile(L)
    grid = (pl.cdiv(L, TL),)
    vecs = jnp.stack([vmax, lane_len])  # (2, L)
    has_daw = daw is not None
    daw_in = daw if has_daw else jnp.zeros((1, 1), jnp.float32)
    kl_spec = pl.BlockSpec((K, TL), lambda j: (0, j))
    daw_spec = kl_spec if has_daw else pl.BlockSpec((1, 1), lambda j: (0, 0))
    out = pl.pallas_call(
        functools.partial(_prepass_kernel, accel, d_jam, has_daw),
        grid=grid,
        in_specs=[kl_spec] * 10 + [pl.BlockSpec((2, TL), lambda j: (0, j)),
                                   daw_spec],
        out_specs=[pl.BlockSpec((1, TL), lambda j: (0, j))] * 2
        + [pl.BlockSpec((10, TL), lambda j: (0, j))],
        out_shape=[jax.ShapeDtypeStruct((1, L), jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((10, L), jnp.float32)],
        interpret=interpret,
    )(*state_fields, vecs, daw_in)
    return out[0][0], out[1][0], out[2]


def outpass(state_fields, vecs, daw=None, *, accel, d_jam, interpret=False):
    """Fused output pass. ``state_fields`` = (pos, speed, wait, acc_wait,
    wait_cnt, depart, route, ridx, next_slot, active); ``vecs`` = packed
    (NV, L) f32 per-lane decision vectors (see IV_* rows). Returns the ten
    new state fields in the same order."""
    pos = state_fields[0]
    K, L = pos.shape
    TL = _tile(L)
    grid = (pl.cdiv(L, TL),)
    has_daw = daw is not None
    daw_in = daw if has_daw else jnp.zeros((1, 1), jnp.float32)
    kl = pl.BlockSpec((K, TL), lambda j: (0, j))
    daw_spec = kl if has_daw else pl.BlockSpec((1, 1), lambda j: (0, 0))
    dts = [jnp.float32, jnp.float32, jnp.float32, jnp.int16, jnp.int16,
           jnp.int16, jnp.int16, jnp.int16, jnp.int8, jnp.int8]
    # Each grid tile reads and writes only its own (K, TL) block, so the
    # ten outputs can alias their ten inputs; without this XLA double-
    # buffers the scan-carried state across the custom call (~35 MB of
    # identity copies per Monaco substep at B=64).
    out = pl.pallas_call(
        functools.partial(_outpass_kernel, accel, d_jam, has_daw),
        grid=grid,
        in_specs=[kl] * 10 + [pl.BlockSpec((NV, TL), lambda j: (0, j)),
                              daw_spec],
        out_specs=[kl] * 10,
        out_shape=[jax.ShapeDtypeStruct((K, L), dt) for dt in dts],
        input_output_aliases={i: i for i in range(10)},
        interpret=interpret,
    )(*state_fields, vecs, daw_in)
    return out


def _tile(L):
    """Lane-axis tile: one whole-lane tile wherever VMEM allows.

    Measured on Monaco (L=1087, K=22, B=64): TL=512 runs the outpass at
    879 us, TL=1152 (one tile per env) at 585 us — fewer, larger DMAs win;
    blocks stay ~100 KB/array so VMEM is nowhere near pressure. Fall back
    to 1024-wide tiles only for nets several times larger."""
    if L <= 4096:
        return _round_up(L, 128)
    return 1024


def _round_up(x, m):
    return ((x + m - 1) // m) * m
