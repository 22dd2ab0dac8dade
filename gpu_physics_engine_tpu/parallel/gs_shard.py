"""Sharded reference-exact Gauss-Seidel — the measured-exclusion prototype.

PARITY.md records `tiled_solver="gs"` as single-chip by design; the
round-4 verdict asked for the exclusion argument (4 halo exchanges per
substep) to be MEASURED rather than principled.  This module is that
prototype: a slab-decomposed 4-color GS frame (the exact schedule of
ops/gs_tiled.gs_solve / collision_solver.wgsl:26-118) that stays
BIT-EXACT by construction:

  * within one color, cells are particle-disjoint (that is WHY the
    4-color schedule exists), so a color pass has no intra-pass
    ordering across cells — only across COLORS.  A slab can therefore
    compute any color pass locally if its ghost rows carry the
    positions updated by the previous color passes.
  * each slab extends itself by E=2 ghost tile rows per side: the
    sweep of boundary-adjacent cells (ghost row E-1) reads occupants
    one row further out.  Ghost sweeps are REDUNDANT compute — the
    neighbor computes the same cells authoritatively; f32 determinism
    makes the copies bitwise identical, so the boundary pull-back is
    local.
  * communication per GS frame: one frame-start exchange of the frozen
    membership fields (x, y, r, pid+occ — 2 rows x cap x TX each way)
    plus THREE per-color refreshes of (x, y) (colors 2..4; color 1
    reads the frame-start exchange).  That is the "4 exchanges per
    substep" of the exclusion, now countable: bytes_per_frame below.

The prototype validates on the virtual CPU mesh (tests/test_gs_shard.py
asserts bitwise equality with the single-chip gs_solve) and
scripts/tpu_probe_gs_shard.py measures the structure; PARITY.md holds
the verdict.  It is deliberately NOT wired into ShardedTiledEngine —
GS also requires storage == home every step, and the sharded exact
claim relocate restores that only at sweep cadence; a production
sharded GS would need the every-step relocate + migration chain too
(cost recorded by the probe's analytic section).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpu_physics_engine_tpu.core.config import SimConfig
from gpu_physics_engine_tpu.ops.gs_tiled import (
    _cell_colors, _memberships, _ordered_sweep, _select_occupants,
    _shift2, _traced_one, _OFFS)
from gpu_physics_engine_tpu.ops.tiled import TileState
from gpu_physics_engine_tpu.parallel.tiled_shard import (
    sharded_tile_geometry)

_I32 = jnp.int32
_E = 2  # ghost rows per side: boundary cell sweeps read one row past
        # the boundary cell, whose membership reads one further


def bytes_per_frame(config: SimConfig, n_shards: int) -> dict:
    """Communication bill of one sharded GS frame (per slab boundary,
    both directions summed) — the measured form of the PARITY.md
    exclusion argument."""
    t, TYp, TX, rows = sharded_tile_geometry(config, n_shards)
    cap = config.tile_cap
    row_block = cap * _E * TX * 4  # one 2-row f32/i32 plane block
    start = 5 * row_block * 2      # x, y, r, pid, occ — both directions
    per_color = 2 * row_block * 2  # x, y refresh
    return {"tile_rows": TYp, "tile_cols": TX, "cap": cap,
            "rows_per_shard": rows,
            "frame_start_bytes": start,
            "per_color_refresh_bytes": per_color,
            "total_bytes_per_frame": start + 3 * per_color,
            "exchanges_per_frame": 4}


def make_sharded_gs_solve(config: SimConfig, mesh: Mesh):
    """Jitted row-sharded GS frame: TileState (planes sharded P(None,
    axis, None)) -> TileState with positions solved, overflow psum'd.
    Bit-exact vs ops/gs_tiled.gs_solve on the gathered state."""
    axis = config.mesh_axis
    n = mesh.devices.size
    t, TYp, TX, rows = sharded_tile_geometry(config, n)
    assert rows > 2 * _E, (
        f"slab of {rows} tile rows cannot carry {2 * _E} ghost rows — "
        "fewer shards or a bigger world")
    K = config.max_occupancy
    up_perm = [(i, i - 1) for i in range(1, n)]
    dn_perm = [(i, i + 1) for i in range(n - 1)]

    def exch(field):
        """(from_above, from_below) — each [cap, E, TX].  ppermute
        zero-fills at the mesh edges; callers mask pid rows with the
        occ plane (a zero-filled pid row would read as live pid 0)."""
        from_below = jax.lax.ppermute(field[:, :_E, :], axis, up_perm)
        from_above = jax.lax.ppermute(field[:, -_E:, :], axis, dn_perm)
        return from_above, from_below

    def ext_join(f):
        top, bot = exch(f)
        return jnp.concatenate([top, f, bot], axis=1)

    def local_solve(x, y, px, py, r, pid, num_active, overflow):
        d = jax.lax.axis_index(axis)
        ty0 = d.astype(_I32) * rows - _E  # global row of ext row 0

        occ = (pid >= 0).astype(jnp.float32)
        ex, ey, er, eocc = (ext_join(f) for f in (x, y, r, occ))
        pa, pb = exch(pid)
        epid = jnp.concatenate(
            [jnp.where(eocc[:, :_E] > 0.5, pa, -1), pid,
             jnp.where(eocc[:, -_E:] > 0.5, pb, -1)], axis=1)

        est = TileState(x=ex, y=ey, px=ex, py=ey, radius=er, pid=epid,
                        num_active=num_active, overflow_count=overflow)
        one = _traced_one(est)
        member = _memberships(est, t, one, ty0=ty0)
        colors = _cell_colors(est.x.shape, ty0=ty0)
        stiffness = jnp.float32(config.stiffness)

        over_psum = jnp.int32(0)
        first = True
        for color in (1, 2, 3, 4):
            if not first:
                # ghost refresh: previous colors moved positions — my
                # ghosts are the neighbor's authoritative rows
                ax, ay = ex[:, _E:-_E, :], ey[:, _E:-_E, :]
                ta, tb = exch(ax)
                ex = jnp.concatenate([ta, ax, tb], axis=1)
                ta, tb = exch(ay)
                ey = jnp.concatenate([ta, ay, tb], axis=1)
            cur = dataclasses.replace(est, x=ex, y=ey)
            ox, oy, orad, opid, over_map = _select_occupants(
                cur, member, K, return_map=True)
            if first:
                # overflow is a per-frame quantity; count only my
                # authoritative rows' cells, summed across slabs
                over_psum = jax.lax.psum(
                    jnp.sum(over_map[_E:-_E, :]), axis)
                first = False
            active = colors == color
            ox, oy = _ordered_sweep(
                [jnp.where(active, v, 0.0) for v in ox],
                [jnp.where(active, v, 0.0) for v in oy],
                orad, opid, stiffness, one)
            occm = est.pid >= 0
            newx, newy = ex, ey
            for j, (dy, dx) in enumerate(_OFFS):
                act = _shift2(active, dy, dx)
                for q in range(K):
                    pq = _shift2(opid[q], dy, dx)
                    xq = _shift2(ox[q], dy, dx)
                    yq = _shift2(oy[q], dy, dx)
                    hit = occm & act[None] & (pq[None] == est.pid)
                    newx = jnp.where(hit, xq[None], newx)
                    newy = jnp.where(hit, yq[None], newy)
            ex, ey = newx, newy

        return (ex[:, _E:-_E, :], ey[:, _E:-_E, :],
                overflow + over_psum)

    plane = P(None, axis, None)
    rep = P()
    mapped = jax.shard_map(
        local_solve, mesh=mesh,
        in_specs=(plane,) * 6 + (rep, rep),
        out_specs=(plane, plane, rep))

    @jax.jit
    def solve(state: TileState) -> TileState:
        nx, ny, over = mapped(
            state.x, state.y, state.px, state.py, state.radius,
            state.pid, state.num_active, state.overflow_count)
        return dataclasses.replace(state, x=nx, y=ny,
                                   overflow_count=over)

    return solve
