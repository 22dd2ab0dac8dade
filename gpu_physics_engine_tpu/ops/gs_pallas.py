"""Pallas band kernels for the Gauss-Seidel parity solver (ops/gs_tiled.py).

Same schedule as the jnp formulation — tiles = reference cells, frozen
membership, 4 color passes of ordered in-cell sweeps — lowered to three
kernel families so the hot math runs on the VPU with banded VMEM reuse:

  R (rank, once per frame): per cell, test all 9*cap (neighbor, slot)
    candidates with the reference circle-vs-AABB membership
    (grid.wgsl:117-129) and select the <= K occupants in ascending-pid
    order (pids are unique).  Outputs per rank: the source code
    j*cap + s, the pid, the radius (all frozen for the frame), plus the
    per-cell occupant count for overflow accounting.
  C (solve, per color): resolve the ranked occupants' CURRENT positions
    through the source codes (static 36-way select — no dynamic
    indexing), run the sequential ascending (i, j) pair sweep with the
    scalar model's exact f32 op order, and write the K updated positions
    per cell.
  A (apply, per color): every particle pulls its updated position from
    the one active-color cell whose rank table names its pid (same-color
    cells are particle-disjoint, so the match is unique).

9 kernel launches per frame; per-launch overhead is ~0 (DESIGN.md §9) —
what matters is the banded traffic and the unrolled VPU math.

Like ops/gs_tiled.py this assumes storage tile == home cell (exact
relocation); the oracle tests drive it via interpret mode against the
scalar model and the jnp formulation.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpu_physics_engine_tpu.core.config import SimConfig
from gpu_physics_engine_tpu.ops.tiled import TileState, tile_geometry
from gpu_physics_engine_tpu.ops.tiled_pallas import (
    BAND, _interpret, _neighbor_rows, _sds)

MIN_DISTANCE = 1e-4
# python int (module-level jnp constants init the backend at import and
# are captured as constants by compiled pallas kernels — see gs_tiled.py)
_BIGPID = 2**31 - 1
_OFFS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


def _rows3(u, m, d):
    a, b = _neighbor_rows(u, m, d)
    return a, m, b


def _lane(a, dx: int):
    if dx == 0:
        return a
    return pltpu.roll(a, shift=(-dx) % a.shape[2], axis=2)


def _view(rows, dy: int, dx: int):
    return _lane(rows[dy + 1], dx)


def _noc(x, one):
    """No-contract guard (see ops/gs_tiled._noc): a*b + c contracts into
    a fused multiply-add — legal and more precise, but 1 ulp off the
    scalar model's separate f32 mul+add on ~1% of pairs.  Multiplying
    the addend by a TRACED 1.0 makes any contraction exact:
    fma(x, 1, c) == x + c bitwise."""
    return x * one


def _sweep(lx, ly, lr, lpid, active, stiffness, one):
    """Reference-ordered sequential pair sweep on rank-local values
    (collision_solver.wgsl:66-118 / reference_model.solve_colored)."""
    K = len(lx)
    for a in range(K - 1):
        for b in range(a + 1, K):
            dx = lx[a] - lx[b]
            dy = ly[a] - ly[b]
            dist = jnp.sqrt(_noc(dx * dx, one) + _noc(dy * dy, one))
            rsum = lr[a] + lr[b]
            hit = (active & (rsum * rsum > dist * dist)
                   & (dist > MIN_DISTANCE)
                   & (lpid[a] < _BIGPID) & (lpid[b] < _BIGPID))
            safe = jnp.maximum(dist, MIN_DISTANCE)
            pen = rsum - dist
            cx = dx / safe * pen * stiffness
            cy = dy / safe * pen * stiffness
            wa = lr[b] / jnp.maximum(rsum, MIN_DISTANCE)
            wb = lr[a] / jnp.maximum(rsum, MIN_DISTANCE)
            lx[a] = jnp.where(hit, lx[a] + _noc(cx * wa, one), lx[a])
            ly[a] = jnp.where(hit, ly[a] + _noc(cy * wa, one), ly[a])
            lx[b] = jnp.where(hit, lx[b] - _noc(cx * wb, one), lx[b])
            ly[b] = jnp.where(hit, ly[b] - _noc(cy * wb, one), ly[b])
    return lx, ly


def _rank_kernel(one_ref, xu, xm, xd, yu, ym, yd, ru, rm, rd, pu, pm, pd,
                 src_ref, rpid_ref, rrad_ref, count_ref,
                 *, cap: int, K: int, t: float):
    one = one_ref[0]
    x_rows = _rows3(xu[...], xm[...], xd[...])
    y_rows = _rows3(yu[...], ym[...], yd[...])
    r_rows = _rows3(ru[...], rm[...], rd[...])
    p_rows = _rows3(pu[...], pm[...], pd[...])

    band = xm.shape[1]
    i = pl.program_id(0)
    shape1 = (1, band, xm.shape[2])
    ty = (i * band + jax.lax.broadcasted_iota(jnp.int32, shape1, 1))
    tx = jax.lax.broadcasted_iota(jnp.int32, shape1, 2)
    tf = jnp.float32(t)
    lox = (tx - 1).astype(jnp.float32) * tf  # my cell's AABB (world coords)
    loy = (ty - 1).astype(jnp.float32) * tf

    # membership per (j, s): circle strictly overlaps my cell's AABB
    streams = []  # (pid_masked, rad, code)
    for j, (dy, dx) in enumerate(_OFFS):
        x_e = _view(x_rows, dy, dx)
        y_e = _view(y_rows, dy, dx)
        r_e = _view(r_rows, dy, dx)
        p_e = _view(p_rows, dy, dx)
        for s in range(cap):
            cx = x_e[s:s + 1]
            cy = y_e[s:s + 1]
            cr = r_e[s:s + 1]
            px = jnp.clip(cx, lox, lox + tf)
            py = jnp.clip(cy, loy, loy + tf)
            d2 = (_noc((cx - px) * (cx - px), one)
                  + _noc((cy - py) * (cy - py), one))
            member = (p_e[s:s + 1] >= 0) & (d2 < cr * cr)
            streams.append((jnp.where(member, p_e[s:s + 1], _BIGPID),
                            cr, j * cap + s))

    count = jnp.zeros(shape1, jnp.int32)
    for pid_m, _, _ in streams:
        count = count + (pid_m < _BIGPID).astype(jnp.int32)

    taken = [jnp.zeros(shape1, bool) for _ in streams]
    src_out, pid_out, rad_out = [], [], []
    for _ in range(K):
        minpid = jnp.full(shape1, _BIGPID, jnp.int32)
        for idx, (pid_m, _, _) in enumerate(streams):
            minpid = jnp.minimum(
                minpid, jnp.where(taken[idx], _BIGPID, pid_m))
        valid = minpid < _BIGPID
        src_q = jnp.full(shape1, -1, jnp.int32)
        rad_q = jnp.zeros(shape1, jnp.float32)
        for idx, (pid_m, cr, code) in enumerate(streams):
            hitq = valid & ~taken[idx] & (pid_m == minpid)
            src_q = jnp.where(hitq, code, src_q)
            rad_q = jnp.where(hitq, cr, rad_q)
            taken[idx] = taken[idx] | hitq
        src_out.append(src_q)
        pid_out.append(jnp.where(valid, minpid, _BIGPID))
        rad_out.append(rad_q)

    src_ref[...] = jnp.concatenate(src_out, axis=0)
    rpid_ref[...] = jnp.concatenate(pid_out, axis=0)
    rrad_ref[...] = jnp.concatenate(rad_out, axis=0)
    count_ref[...] = count[0]


def _solve_kernel(one_ref, xu, xm, xd, yu, ym, yd, src, rpid, rrad,
                  ux_ref, uy_ref, *, cap: int, K: int, color: int,
                  stiffness: float):
    one = one_ref[0]
    x_rows = _rows3(xu[...], xm[...], xd[...])
    y_rows = _rows3(yu[...], ym[...], yd[...])
    src_v = src[...]
    rpid_v = rpid[...]
    rrad_v = rrad[...]

    band = xm.shape[1]
    i = pl.program_id(0)
    shape1 = (1, band, xm.shape[2])
    ty = (i * band + jax.lax.broadcasted_iota(jnp.int32, shape1, 1))
    tx = jax.lax.broadcasted_iota(jnp.int32, shape1, 2)
    active = (1 + ((tx - 1) & 1) + 2 * ((ty - 1) & 1)) == color

    # resolve ranked occupants' CURRENT positions through the source codes
    views = [(_view(x_rows, dy, dx), _view(y_rows, dy, dx))
             for (dy, dx) in _OFFS]
    lx, ly, lr, lpid = [], [], [], []
    for q in range(K):
        code_q = src_v[q:q + 1]
        xq = jnp.zeros(shape1, jnp.float32)
        yq = jnp.zeros(shape1, jnp.float32)
        for j in range(9):
            vx, vy = views[j]
            for s in range(cap):
                hitq = code_q == j * cap + s
                xq = jnp.where(hitq, vx[s:s + 1], xq)
                yq = jnp.where(hitq, vy[s:s + 1], yq)
        lx.append(xq)
        ly.append(yq)
        lr.append(rrad_v[q:q + 1])
        lpid.append(rpid_v[q:q + 1])

    lx, ly = _sweep(lx, ly, lr, lpid, active, jnp.float32(stiffness), one)
    ux_ref[...] = jnp.concatenate(lx, axis=0)
    uy_ref[...] = jnp.concatenate(ly, axis=0)


def _apply_kernel(uxu, uxm, uxd, uyu, uym, uyd, rpu, rpm, rpd,
                  xm, ym, pm, ox_ref, oy_ref,
                  *, cap: int, K: int, color: int):
    ux_rows = _rows3(uxu[...], uxm[...], uxd[...])
    uy_rows = _rows3(uyu[...], uym[...], uyd[...])
    rp_rows = _rows3(rpu[...], rpm[...], rpd[...])
    x_mid = xm[...]
    y_mid = ym[...]
    pid_mid = pm[...]

    band = xm.shape[1]
    i = pl.program_id(0)
    shape1 = (1, band, xm.shape[2])
    ty = (i * band + jax.lax.broadcasted_iota(jnp.int32, shape1, 1))
    tx = jax.lax.broadcasted_iota(jnp.int32, shape1, 2)

    newx = [x_mid[k:k + 1] for k in range(cap)]
    newy = [y_mid[k:k + 1] for k in range(cap)]
    for (dy, dx) in _OFFS:
        # is the cell at offset (dy, dx) from my tile of this color?
        cell_active = (1 + ((tx + dx - 1) & 1)
                       + 2 * ((ty + dy - 1) & 1)) == color
        ux_e = _view(ux_rows, dy, dx)
        uy_e = _view(uy_rows, dy, dx)
        rp_e = _view(rp_rows, dy, dx)
        for k in range(cap):
            mypid = pid_mid[k:k + 1]
            occ = mypid >= 0
            for q in range(K):
                hit = occ & cell_active & (rp_e[q:q + 1] == mypid)
                newx[k] = jnp.where(hit, ux_e[q:q + 1], newx[k])
                newy[k] = jnp.where(hit, uy_e[q:q + 1], newy[k])
    ox_ref[...] = jnp.concatenate(newx, axis=0)
    oy_ref[...] = jnp.concatenate(newy, axis=0)


def gs_solve_pallas(state: TileState, config: SimConfig) -> TileState:
    """Drop-in Pallas replacement for ops/gs_tiled.gs_solve (single-chip).
    Same frozen-membership 4-color schedule; bit-matches the scalar model
    (tests/test_gs_tiled.py runs it in interpret mode)."""
    t, TY, TX = tile_geometry(config)
    cap = state.dims[0]
    K = config.max_occupancy
    pad = (-TY) % BAND
    x, y, r, pid = state.x, state.y, state.radius, state.pid
    if pad:
        width = ((0, 0), (0, pad), (0, 0))
        x = jnp.pad(x, width)
        y = jnp.pad(y, width)
        r = jnp.pad(r, width)
        pid = jnp.pad(pid, width, constant_values=-1)
    TYp = TY + pad
    nb = TYp // BAND

    def up(i):
        return (0, jnp.maximum(i - 1, 0), 0)

    def mid(i):
        return (0, i, 0)

    def dn(i):
        return (0, jnp.minimum(i + 1, nb - 1), 0)

    def spec3(c):
        return [pl.BlockSpec((c, BAND, TX), m, memory_space=pltpu.VMEM)
                for m in (up, mid, dn)]

    def spec1(c):
        return pl.BlockSpec((c, BAND, TX), mid, memory_space=pltpu.VMEM)

    vmem = pltpu.CompilerParams(vmem_limit_bytes=116 * (1 << 20))
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    # traced 1.0 for the fma-contraction guard (_noc)
    one = jnp.where(state.num_active >= 0, jnp.float32(1.0),
                    jnp.float32(2.0)).reshape((1,))

    src, rpid, rrad, count = pl.pallas_call(
        partial(_rank_kernel, cap=cap, K=K, t=t),
        grid=(nb,),
        in_specs=[smem] + spec3(cap) * 4,
        out_specs=(spec1(K), spec1(K), spec1(K),
                   pl.BlockSpec((BAND, TX), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(_sds((K, TYp, TX), jnp.int32),
                   _sds((K, TYp, TX), jnp.int32),
                   _sds((K, TYp, TX), jnp.float32),
                   _sds((TYp, TX), jnp.int32)),
        compiler_params=vmem,
        interpret=_interpret(),
    )(one, x, x, x, y, y, y, r, r, r, pid, pid, pid)

    overflow = jnp.sum(jnp.maximum(count - K, 0))

    for color in (1, 2, 3, 4):
        ux, uy = pl.pallas_call(
            partial(_solve_kernel, cap=cap, K=K, color=color,
                    stiffness=config.stiffness),
            grid=(nb,),
            in_specs=[smem] + spec3(cap) * 2 + [spec1(K)] * 3,
            out_specs=(spec1(K), spec1(K)),
            out_shape=(_sds((K, TYp, TX), jnp.float32),
                       _sds((K, TYp, TX), jnp.float32)),
            compiler_params=vmem,
            interpret=_interpret(),
        )(one, x, x, x, y, y, y, src, rpid, rrad)

        x, y = pl.pallas_call(
            partial(_apply_kernel, cap=cap, K=K, color=color),
            grid=(nb,),
            in_specs=[*spec3(K) * 2, *spec3(K),
                      spec1(cap), spec1(cap), spec1(cap)],
            out_specs=(spec1(cap), spec1(cap)),
            out_shape=(_sds((cap, TYp, TX), jnp.float32),
                       _sds((cap, TYp, TX), jnp.float32)),
            compiler_params=vmem,
            interpret=_interpret(),
        )(ux, ux, ux, uy, uy, uy, rpid, rpid, rpid, x, y, pid)

    if pad:
        x = x[:, :TY]
        y = y[:, :TY]
    return dataclasses.replace(
        state, x=x, y=y,
        overflow_count=state.overflow_count + overflow)
