"""Gauss-Seidel parity solver on persistent tile storage (tiles = cells).

Reference semantics (src/physics/collision_solver.wgsl:26-118 +
collision_cell_builder): the grid is built once per frame; four color
passes (checkerboard 1 + cx%2 + 2*(cy%2)) each process their cells'
occupant runs with a *sequential* ascending-(i, j) pair sweep, reading
positions updated by earlier pairs and earlier colors.  Cell membership is
frozen at frame start; occupant order is ascending object id (the stable
radix sort over pair index 4*obj+slot, radix_sort.wgsl:132-184).

TPU-native mapping — no sorted array, no gathers:

  * tile edge = cell size (SimConfig.tile_multiplier = 2.2 at parity),
    so a TileState tile IS a reference grid cell and occupants of cell C
    are stored in C's 3x3 tile neighborhood (r <= t/2.2 < t/2).
  * membership (the circle-vs-AABB test of grid.wgsl:117-129) is computed
    once per frame for all 9 (neighbor, slot) candidate streams per cell
    — 9 shifted boolean arrays, frozen across the color passes.
  * per color pass, each cell selects its <= K occupants in ascending-pid
    order (K argmin passes over the 36 candidate streams — pids are
    unique, so selection is exact), runs the K^2/2 ordered pair sweep on
    local values with the reference's exact f32 op order, and each
    particle *pulls* its own update back by pid-match from the one cell
    of this color it belongs to (same-color cells are particle-disjoint:
    cell_size >= 2*max_radius, SURVEY.md §2.3 — so the pull is unique).
  * runs longer than K are clamped to the K smallest pids with overflow
    counting (the dense-bound analog of the reference's unbounded loops;
    identical to ops/collision.py's max_occupancy clamp).

This module is the jnp/XLA formulation (correctness reference, CPU tests,
small scenes).  ops/gs_pallas.py lowers the same schedule to band kernels
for production speed.  Exact storage-tile == home-cell is assumed: drive
it behind the exact claim relocate (tiled_relocate="jnp"), not the
one-hop pull relocate.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp

from gpu_physics_engine_tpu.core.config import SimConfig
from gpu_physics_engine_tpu.ops.tiled import TileState, tile_geometry, _shift_tiles

_I32 = jnp.int32
MIN_DISTANCE = 1e-4  # collision_solver.wgsl:95
# python int, NOT jnp.int32: a module-level jnp constant initializes the
# backend at import (hangs when the TPU relay is down) and gets captured
# as a constant by compiled pallas kernels (rejected by Mosaic)
_BIGPID = 2**31 - 1

# the 9 candidate stream offsets, fixed order (dy, dx)
_OFFS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


def _shift2(a, dy: int, dx: int):
    """Neighbor view of a [TY, TX] per-tile array (cf. ops/tiled._shift_tiles
    for [cap, TY, TX])."""
    if dy == 0 and dx == 0:
        return a
    return jnp.roll(a, shift=(-dy, -dx), axis=(0, 1))


def _traced_one(state: TileState):
    """An f32 1.0 the compiler cannot constant-fold (derived from a traced
    scalar).  See _noc."""
    return jnp.where(state.num_active >= 0, jnp.float32(1.0),
                     jnp.float32(2.0))


def _noc(x, one):
    """No-contract guard: XLA freely contracts ``a*b + c`` into a fused
    multiply-add (one rounding instead of two) — a legal, precision-
    IMPROVING rewrite that nevertheless breaks bit-parity with the scalar
    model's separate f32 mul+add (~1% of pairs differ by 1 ulp, and
    neither optimization_barrier nor bitcast round-trips survive XLA
    simplification to prevent it).  Multiplying the addend by a TRACED
    1.0 makes any contraction exact: fma(x, 1, c) == x + c bitwise."""
    return x * one


def _cell_colors(shape: Tuple[int, int, int], ty0=0):
    """Static checkerboard color 1..4 per tile (collision_solver.wgsl:55-58).

    Tile (ty, tx) holds cell coords (ty-1, tx-1) — the +1 border offset of
    ops/tiled._tile_of.  ``ty0`` is the GLOBAL row of local row 0 (the
    sharded-GS prototype passes its slab offset; 0 = single-chip)."""
    ty = jax.lax.broadcasted_iota(_I32, shape[1:], 0) + ty0
    tx = jax.lax.broadcasted_iota(_I32, shape[1:], 1)
    return 1 + ((tx - 1) & 1) + 2 * (((ty - 1) & 1))


def _memberships(state: TileState, t: float, one=None, ty0=0):
    """Frozen candidate masks: member[j][cap, TY, TX] == True where the
    particle in neighbor-offset j's slot is an occupant of THIS cell
    (circle strictly overlaps this cell's AABB, grid.wgsl:117-129).
    ``ty0`` = GLOBAL row of local row 0 (sharded-GS prototype)."""
    if one is None:
        one = _traced_one(state)
    cap, TY, TX = state.dims
    tf = jnp.float32(t)
    ty = jax.lax.broadcasted_iota(_I32, state.x.shape, 1) + ty0
    tx = jax.lax.broadcasted_iota(_I32, state.x.shape, 2)
    # this cell's AABB (world coords; border offset -1)
    lox = (tx - 1).astype(jnp.float32) * tf
    loy = (ty - 1).astype(jnp.float32) * tf
    occ = state.pid >= 0

    member = []
    for dy, dx in _OFFS:
        # candidate = slot of tile (ty+dy, tx+dx), viewed from this cell
        cx = _shift_tiles(state.x, dy, dx)
        cy = _shift_tiles(state.y, dy, dx)
        cr = _shift_tiles(state.radius, dy, dx)
        cocc = _shift_tiles(occ, dy, dx)
        px = jnp.clip(cx, lox, lox + tf)
        py = jnp.clip(cy, loy, loy + tf)
        # separate mul+add like the scalar model (a contracted d2 flips
        # strict-< membership on boundary-touching circles) — see _noc
        d2 = (_noc((cx - px) * (cx - px), one)
              + _noc((cy - py) * (cy - py), one))
        member.append(cocc & (d2 < cr * cr))
    return member


def _select_occupants(state: TileState, member, K: int,
                      return_map: bool = False):
    """Per cell: the K ascending-pid occupants among the 36 candidate
    streams.  Returns lists of [TY, TX] arrays (x, y, r, pid per rank) and
    the overflow count (occupants beyond K, summed)."""
    cap = state.dims[0]
    streams = []  # (pid, x, y, r) per (offset j, slot s)
    for j, (dy, dx) in enumerate(_OFFS):
        pidj = _shift_tiles(state.pid, dy, dx)
        xj = _shift_tiles(state.x, dy, dx)
        yj = _shift_tiles(state.y, dy, dx)
        rj = _shift_tiles(state.radius, dy, dx)
        for s in range(cap):
            streams.append((jnp.where(member[j][s], pidj[s], _BIGPID),
                            xj[s], yj[s], rj[s]))

    taken = [jnp.zeros_like(streams[0][0], dtype=bool) for _ in streams]
    ox, oy, orad, opid = [], [], [], []
    for _ in range(K):
        minpid = streams[0][0]
        minpid = jnp.where(taken[0], _BIGPID, minpid)
        for i in range(1, len(streams)):
            minpid = jnp.minimum(
                minpid, jnp.where(taken[i], _BIGPID, streams[i][0]))
        ex = jnp.zeros_like(streams[0][1])
        ey = jnp.zeros_like(ex)
        er = jnp.zeros_like(ex)
        valid = minpid < _BIGPID
        for i, (pidi, xi, yi, ri) in enumerate(streams):
            hit = valid & ~taken[i] & (pidi == minpid)
            ex = jnp.where(hit, xi, ex)
            ey = jnp.where(hit, yi, ey)
            er = jnp.where(hit, ri, er)
            taken[i] = taken[i] | hit
        ox.append(ex)
        oy.append(ey)
        orad.append(er)
        opid.append(jnp.where(valid, minpid, _BIGPID))
    remaining = jnp.zeros_like(streams[0][0])
    for i, (pidi, *_rest) in enumerate(streams):
        remaining = remaining + (~taken[i] & (pidi < _BIGPID)).astype(_I32)
    if return_map:
        # per-cell overflow map (the sharded-GS prototype sums only its
        # authoritative rows, then psums — ext rows would double count)
        return ox, oy, orad, opid, remaining
    return ox, oy, orad, opid, jnp.sum(remaining)


def _ordered_sweep(lx: List, ly: List, lr: List, lpid: List, stiffness,
                   one):
    """The reference's sequential ascending (i, j) pair sweep on local
    occupant values — exact f32 op order of collision_solver.wgsl:66-118
    (division by dist, corr = dir*pen*stiffness, then the inverse-mass
    split), matching tests/reference_model.py::solve_colored.  ``one`` is
    the traced 1.0 of _noc (fma-contraction guard)."""
    K = len(lx)
    for a in range(K - 1):
        for b in range(a + 1, K):
            dx = lx[a] - lx[b]
            dy = ly[a] - ly[b]
            dist = jnp.sqrt(_noc(dx * dx, one) + _noc(dy * dy, one))
            rsum = lr[a] + lr[b]
            hit = ((rsum * rsum > dist * dist) & (dist > MIN_DISTANCE)
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


def gs_solve(state: TileState, config: SimConfig) -> TileState:
    """One frame of the 4-color Gauss-Seidel solve, reference semantics,
    on tile storage.  Positions move; storage/pid layout unchanged."""
    t, TY, TX = tile_geometry(config)
    cap = state.dims[0]
    K = config.max_occupancy
    stiffness = jnp.float32(config.stiffness)
    colors = _cell_colors(state.x.shape)
    one = _traced_one(state)

    # frozen membership + frame-start candidate clamp bookkeeping
    member = _memberships(state, t, one)

    x, y = state.x, state.y
    overflow = jnp.int32(0)
    first = True
    for color in (1, 2, 3, 4):
        cur = dataclasses.replace(state, x=x, y=y)
        ox, oy, orad, opid, over = _select_occupants(cur, member, K)
        if first:   # overflow is a per-frame quantity (membership frozen)
            overflow = over
            first = False
        active = colors == color
        ox, oy = _ordered_sweep(
            [jnp.where(active, v, 0.0) for v in ox],
            [jnp.where(active, v, 0.0) for v in oy],
            orad, opid, stiffness, one)

        # pull my update back from my color-`color` cell by pid match
        occm = state.pid >= 0
        newx, newy = x, y
        for j, (dy, dx) in enumerate(_OFFS):
            # cell at offset (dy, dx) from MY tile sees me as candidate
            # stream -(dy, dx); its sweep output lives at my tile + (dy, dx)
            act = _shift2(active, dy, dx)
            for q in range(K):
                pq = _shift2(opid[q], dy, dx)
                xq = _shift2(ox[q], dy, dx)
                yq = _shift2(oy[q], dy, dx)
                hit = occm & act[None] & (pq[None] == state.pid)
                newx = jnp.where(hit, xq[None], newx)
                newy = jnp.where(hit, yq[None], newy)
        x, y = newx, newy

    return dataclasses.replace(
        state, x=x, y=y,
        overflow_count=state.overflow_count + overflow)
